"""Device mesh & sharding helpers.

TPU-native replacement for the reference's torch.distributed layer
(`/root/reference/src/open_clip_train/distributed.py`): instead of
NCCL process groups, a single `jax.sharding.Mesh` over all devices;
parameters are replicated, batches are sharded over the `data` axis,
and XLA/GSPMD inserts the collectives (psum for grad averaging) over
ICI.  Multi-host topology uses one process per host with
`jax.distributed.initialize` and per-host data sharding
(`local_batch_slice`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Sequence[int]] = None,
                axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """Build a device mesh; default 1-D `data` mesh over all devices
    (LEAF's parallelism is pure DP — SURVEY.md §2.4)."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis of every leaf over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def local_batch_slice(global_batch: int,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """This host's slice of a globally-indexed batch (per-host data
    pipelines; equal-batch rounding as in `data_AT.py:513-521`)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
