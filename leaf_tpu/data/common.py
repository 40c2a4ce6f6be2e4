"""Shared data-pipeline plumbing.

Replaces the reference's torch DataLoader + worker-process machinery
(`/root/reference/data_AT.py:62-127`) with a host-side design suited to
JAX: datasets are plain Python iterables yielding numpy batches, wrapped
in a background-thread prefetcher so host data prep overlaps device
compute (the role DataLoader workers played).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional


@dataclasses.dataclass
class DataInfo:
    """Bundle of (batch iterable, sizes) — reference `data_AT.py:71-83`."""
    loader: Any
    num_batches: int = 0
    num_samples: int = 0

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)


class Prefetcher:
    """Iterate `source` on a background thread, keeping up to `depth`
    ready batches.  Exceptions propagate to the consumer."""

    def __init__(self, source: Iterable, depth: int = 2):
        self.source = source
        self.depth = depth

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        _END = object()
        _ERR = object()
        # set when the consumer abandons the iterator (e.g. the train
        # loop stops after N steps) so the worker stops pulling from
        # the source instead of racing interpreter shutdown
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.source:
                    if not put((None, item)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put((_ERR, e))
            finally:
                # must use the stop-aware put: dropping _END when the
                # queue is momentarily full would hang the consumer
                put((_END, None))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                tag, item = q.get()
                if tag is _END:
                    break
                if tag is _ERR:
                    raise item
                yield item
        finally:
            stop.set()


def bucket_for(n: int, bounds) -> int:
    """Smallest bucket boundary that fits length `n` (overflow → the
    largest).  `bounds` must be sorted ascending."""
    for b in bounds:
        if n <= b:
            return b
    return bounds[-1]


def bucket_batches(it: Iterator, batch_size: int,
                   length_of: Callable[[Any], int],
                   boundaries: Iterable[int]) -> Iterator[list]:
    """Group a (pre-shuffled) sample stream into length-homogeneous
    batches: each sample is routed to the smallest `boundaries` bucket
    that fits `length_of(sample)` (overflow → the largest), and a batch
    is emitted the moment any bucket fills.

    TPU-first rationale: the fused attack step pads every probe/
    candidate buffer to the BATCH's max context bucket
    (`attacks/engine.py::CONTEXT_BUCKETS`), so one 70-token caption in
    an otherwise-short batch makes all 128 samples pay 77-wide scoring.
    Grouping similar lengths recovers the short-caption rate on real
    long-tailed alt-text streams (the reference has no equivalent lever:
    it pads everything to 77 unconditionally,
    `/root/reference/src/open_clip/tokenizer.py:256-263`).

    Locality/ordering trade-off: like classic seq2seq length bucketing,
    batches are no longer an unbiased sample of the stream — lengths
    correlate within a batch.  At the end of the stream, leftovers are
    flushed longest-bucket-first in mixed batches (a final partial batch
    is yielded too; callers that need fixed batch sizes drop or roll it,
    as `WdsDataset.batches` does)."""
    bounds = sorted(boundaries)
    buckets: dict = {b: [] for b in bounds}
    for sample in it:
        buf = buckets[bucket_for(length_of(sample), bounds)]
        buf.append(sample)
        if len(buf) == batch_size:
            yield list(buf)
            buf.clear()
    leftovers = [s for b in reversed(bounds) for s in buckets[b]]
    for i in range(0, len(leftovers), batch_size):
        yield leftovers[i:i + batch_size]


def shuffle_buffer(it: Iterator, bufsize: int, initial: int, rng) -> Iterator:
    """Streaming reservoir shuffle (webdataset `_shuffle` semantics):
    fill a buffer of `bufsize`, then yield a random element per incoming
    sample; drain shuffled at the end.  `initial` lowers the fill level
    at which yielding starts (faster pipeline startup)."""
    del initial  # startup latency knob; buffer cap is what matters here
    buf = []
    for sample in it:
        if len(buf) >= bufsize:
            idx = rng.randrange(len(buf))
            out, buf[idx] = buf[idx], sample
            yield out
        else:
            buf.append(sample)
    rng.shuffle(buf)
    yield from buf
