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

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, epoch: int, payload: Dict[str, Any]):
    """Write `payload` (a pytree) to <ckpt_dir>/epoch_<N>."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{epoch}")
    _checkpointer().save(path, payload, force=True)


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
    """Map --resume {latest,<path>} to (epoch, path)."""
    if not resume:
        return None
    if resume == "latest":
        return latest_checkpoint(ckpt_dir)
    m = _EPOCH_RE.match(os.path.basename(os.path.normpath(resume)))
    epoch = int(m.group(1)) if m else 0
    return epoch, resume
