"""Checkpoint save/resume (Orbax-backed, atomic, latest-discovery).

TPU-native equivalent of the reference's checkpointing
(`/root/reference/train_AT_text_only.py:155-187,516-569`): per-epoch
checkpoint of {params, optimizer state, epoch}, atomic writes (Orbax
finalises directories atomically, replacing the reference's
tmp + os.replace), `--resume latest` discovery, and the results.csv
ledger reload handled by the caller.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


def _globalize(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Multi-host: orbax can only serialize GLOBAL arrays.  Fresh
    optimizer-state counters (optax `tx.init`) and numpy leaves are
    host-local; they hold the same value on every host, so replicate
    them over all devices.  Single-process (and post-first-step states,
    whose leaves already come out of jit as global arrays) pass
    through untouched."""
    if jax.process_count() == 1:
        return payload
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    repl = NamedSharding(Mesh(np.asarray(jax.devices()), ("all",)), P())

    def fix(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return jax.device_put(np.asarray(x), repl)
        if isinstance(x, (np.ndarray, np.number, int, float)):
            return jax.device_put(np.asarray(x), repl)
        return x

    return jax.tree.map(fix, payload)


_ASYNC_CKPTR = None


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(ckpt_dir: str, epoch: int, payload: Dict[str, Any],
                    wait: bool = False):
    """Write `payload` (a pytree) to <ckpt_dir>/epoch_<N>.

    Uses Orbax async checkpointing: the device→host transfer happens
    before this returns (safe with donated buffers), the disk write
    overlaps training (the reference's background remote-sync spirit,
    `file_utils.py:10-62`).  `wait=True` blocks until committed."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{epoch}")
    ckptr = _async_checkpointer()
    ckptr.wait_until_finished()   # one in-flight save at a time
    ckptr.save(path, _globalize(payload), force=True)
    if wait:
        ckptr.wait_until_finished()


def save_named(ckpt_dir: str, name: str, payload: Dict[str, Any]):
    """One-off named sidecar checkpoint (e.g. the frozen anchor tower,
    saved once instead of inside every epoch payload).

    Blocks until committed: epoch payloads rely on the sidecar existing
    (they omit the frozen tower), so a crash mid-write must not leave a
    run whose checkpoints can never resume (ADVICE r2)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = _async_checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, _globalize(payload), force=True)
    ckptr.wait_until_finished()


def load_named(ckpt_dir: str, name: str) -> Dict[str, Any]:
    return load_checkpoint(os.path.join(os.path.abspath(ckpt_dir), name))


LATEST_NAME = "epoch_latest"


def save_latest(ckpt_dir: str, epoch: int, payload: Dict[str, Any]):
    """Rolling most-recent checkpoint (`--save-most-recent`, reference
    `train_AT_text_only.py:161-171` epoch_latest.pt): overwrite
    <ckpt_dir>/epoch_latest every epoch with an EPOCH sidecar for
    resume discovery."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), LATEST_NAME)
    ckptr = _async_checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, _globalize(payload), force=True)
    ckptr.wait_until_finished()   # sidecar must postdate the payload
    if jax.process_index() == 0:
        # every process runs the collective orbax save (internally
        # primary-gated), but the plain sidecar write must not race
        # across hosts on a shared filesystem
        with open(os.path.join(ckpt_dir, LATEST_NAME + ".epoch"), "w") as f:
            f.write(str(epoch))


def wait_for_checkpoints():
    """Block until any in-flight async save is committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    """(epoch, path) of the newest checkpoint, or None
    (`train_AT_text_only.py:71-84` get_latest_checkpoint)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = _EPOCH_RE.match(name)
        if m:
            e = int(m.group(1))
            if best is None or e > best[0]:
                best = (e, os.path.join(os.path.abspath(ckpt_dir), name))
    sidecar = os.path.join(ckpt_dir, LATEST_NAME + ".epoch")
    latest_dir = os.path.join(os.path.abspath(ckpt_dir), LATEST_NAME)
    if os.path.exists(sidecar) and os.path.isdir(latest_dir):
        e = int(open(sidecar).read().strip())
        if best is None or e > best[0]:
            best = (e, latest_dir)
    return best


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint pytree; `like` provides structure/dtypes for
    exact restoration."""
    import orbax.checkpoint as ocp
    if like is not None:
        return _checkpointer().restore(
            os.path.abspath(path), item=like)
    return _checkpointer().restore(os.path.abspath(path))


def resolve_resume(resume: Optional[str], ckpt_dir: str
                   ) -> Optional[Tuple[int, str]]:
    """Map --resume {latest,<path>} to (epoch, path).

    An explicit path must be named epoch_<N> — a silent epoch-0
    assumption would reset start_epoch and truncate the results ledger
    on what may be a perfectly valid checkpoint."""
    if not resume:
        return None
    if resume == "latest":
        return latest_checkpoint(ckpt_dir)
    base = os.path.basename(os.path.normpath(resume))
    if base == LATEST_NAME:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(os.path.normpath(resume))),
            LATEST_NAME + ".epoch")
        try:
            return int(open(sidecar).read().strip()), resume
        except (OSError, ValueError) as e:
            raise ValueError(
                f"--resume {resume!r} needs the {LATEST_NAME}.epoch "
                f"sidecar next to it to recover the completed-epoch "
                f"count; reading {sidecar!r} failed ({e!r})") from e
    m = _EPOCH_RE.match(base)
    if m is None:
        raise ValueError(
            f"--resume path {resume!r} is not named epoch_<N>; cannot "
            "infer the completed-epoch count (pass a checkpoint "
            "directory produced by this trainer, or 'latest')")
    return int(m.group(1)), resume
