"""CSV ledgers: per-epoch results + per-step attack timing.

Reproduces the reference's observability files: `results.csv` with the
9 tracked metrics (`train_AT_text_only.py:498-513`) and
`times_{attack}.csv` per-batch attack seconds (`utils_AT.py:298-311`) —
the repo's own attack-throughput benchmark hook.
"""
from __future__ import annotations

import csv
import os
import queue
import threading
import time
from typing import Dict, List, Optional


class ResultsLedger:
    """Append-per-epoch CSV with a stable, inferred column set.

    `fresh=True` ignores any pre-existing file (eval artifacts must not
    mix a previous run's rows in); `stream=True` appends rows
    incrementally instead of rewriting the whole file per append
    (eval ledgers with thousands of rows — training results.csv keeps
    the atomic whole-file rewrite for resume truncation)."""

    def __init__(self, path: str, columns: Optional[List[str]] = None,
                 fresh: bool = False, stream: bool = False):
        self.path = path
        self.columns = columns
        self.rows: List[Dict] = []
        self.stream = stream
        self._written = 0
        if os.path.exists(path) and not fresh:
            self.load()
            self._written = len(self.rows)

    def load(self):
        with open(self.path, newline="") as f:
            reader = csv.DictReader(f)
            self.columns = list(reader.fieldnames or [])
            self.rows = [dict(r) for r in reader]

    def append(self, row: Dict):
        if self.columns is None:
            self.columns = list(row.keys())
        self.rows.append(row)
        if self.stream:
            self._flush_incremental()
        else:
            self.flush()

    def _flush_incremental(self):
        header = self._written == 0 or not os.path.exists(self.path)
        with open(self.path, "w" if header else "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.columns,
                                    extrasaction="ignore")
            if header:
                writer.writeheader()
            writer.writerows(self.rows[self._written:])
        self._written = len(self.rows)

    def flush(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.columns,
                                    extrasaction="ignore")
            writer.writeheader()
            writer.writerows(self.rows)
        os.replace(tmp, self.path)

    def truncate_to_epoch(self, epoch: int, epoch_key: str = "epoch"):
        """Drop rows past `epoch` on resume."""
        self.rows = [r for r in self.rows
                     if float(r.get(epoch_key, -1)) <= epoch]
        if self.rows:
            self.flush()


class TimingLedger:
    """Streaming one-column CSV of per-batch attack wall times."""

    def __init__(self, path: str):
        self.path = path
        self.times: List[float] = []

    def append(self, seconds: float):
        # incremental append (this runs once per training batch —
        # rewriting the whole file per step is O(n²) I/O).  The FIRST
        # append of this ledger truncates: a stale times_*.csv from a
        # previous run must not have new rows appended to it.
        first = not self.times
        self.times.append(seconds)
        with open(self.path, "w" if first else "a", newline="") as f:
            writer = csv.writer(f)
            if first:
                writer.writerow(["0"])
            writer.writerow([seconds])


class AsyncAttackTimer:
    """Attack-only wall times for the *fused* LEAF step.

    The reference's `times_{use_charmer}.csv` times exactly the inner
    maximisation: the timer wraps the attack call, which fully syncs
    because it returns host strings (`utils_AT.py:298-311`).  The fused
    step never returns strings — its attack ends when the final
    candidate-scoring output (`info["attack_marker"]`) becomes ready on
    device, *before* the train update.  Blocking the training thread on
    that readiness would serialise the loop's host/device overlap, so a
    single worker thread waits on the markers FIFO and appends
    (t_ready − t_start) to the ledger.  Rows land in step order; the
    value logged inline (`last`) may lag the current step by one.

    On the default k=1 pipelined path the marker is the two halves'
    adversarial token buffers — scoring dispatches separate from the
    train update, so the measurement is exact.  On the unpipelined
    fused path the final scoring shares one XLA program with the train
    update, so the marker completes with the program and attack_seconds
    over-counts by that program's update tail (documented, non-default).
    """

    def __init__(self, ledger: TimingLedger):
        self.ledger = ledger
        self.last = 0.0
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, t_start: float, marker) -> None:
        """Enqueue a step: `t_start` from time.perf_counter() at attack
        start, `marker` a jax array/pytree whose readiness marks the end
        of the attack's device work."""
        self._q.put((t_start, marker))

    def _run(self):
        import jax  # deferred: this module is imported by jax-free tools
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                t_start, marker = item
                try:
                    jax.block_until_ready(marker)
                except Exception:  # noqa: BLE001 — a failed dispatch
                    pass           # surfaces in the main thread instead
                dt = time.perf_counter() - t_start
                self.last = dt
                self.ledger.append(dt)
            finally:
                self._q.task_done()

    def drain(self) -> None:
        """Block until every submitted step has been timed and written."""
        self._q.join()

    def close(self) -> None:
        self.drain()
        self._q.put(None)
        self._thread.join()
