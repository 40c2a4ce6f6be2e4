"""Parameter/batch sharding rules (DP + optional tensor parallelism).

LEAF's parallelism is pure data-parallel (SURVEY.md §2.4) — params
replicated, batch over the `data` axis.  For the largest tower
(ViT-bigG) a 2-D (data, model) mesh lets the MLP and attention-head
dimensions shard over `model` (the classic Megatron split expressed as
GSPMD annotations): column-parallel fc/qkv, row-parallel proj/out, so
each block needs a single psum on its output, inserted by XLA.

`clip_param_spec` maps our pytree layout → PartitionSpecs; everything
not matched is replicated.
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)


def clip_param_spec(params: Any, model_axis: Optional[str] = "model") -> Any:
    """PartitionSpec pytree for CLIP params.

    Stacked block leaves have a leading layer axis (never sharded).
    Sharding (Megatron-style, over `model_axis`):
      qkv_w  [L, D, 3D]   → (None, None, model)   column-parallel
      fc_w   [L, D, M]    → (None, None, model)   column-parallel
      out_w  [L, D, D]    → (None, model, None)   row-parallel
      proj_w [L, M, D]    → (None, model, None)   row-parallel
      qkv_b/fc_b [L, .]   → (None, model)
      token_embedding [V, D] → (model, None)      vocab-sharded lookup
    """
    m = model_axis

    def spec_for(path, leaf):
        keys = [getattr(e, "key", None) for e in path]
        if m is None:
            return P()
        ndim = np.ndim(leaf)
        if "attn" in keys or "mlp" in keys:
            # the Megatron specs assume the STACKED block layout
            # (leading layer axis); non-stacked attn/mlp subtrees —
            # MAP attention-pool heads, timm-trunk heads — have
            # lower-rank leaves and stay replicated
            leafname = keys[-1]
            if leafname in ("qkv_w", "fc_w") and ndim == 3:
                return P(None, None, m)
            if leafname in ("out_w", "proj_w") and ndim == 3:
                return P(None, m, None)
            if leafname in ("qkv_b", "fc_b") and ndim == 2:
                return P(None, m)
            return P()
        if keys[-1] == "token_embedding" and ndim == 2:
            return P(m, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh,
                 model_axis: Optional[str] = None) -> Any:
    """Place params on the mesh: replicated (DP) or TP-sharded when
    `model_axis` names a mesh axis of size > 1."""
    if model_axis is not None and model_axis in mesh.axis_names \
            and mesh.shape[model_axis] > 1:
        specs = clip_param_spec(params, model_axis)
    else:
        specs = jax.tree.map(lambda _: P(), params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def mesh_is_local(mesh: Mesh) -> bool:
    """True when every mesh device belongs to this process."""
    pi = jax.process_index()
    return all(d.process_index == pi for d in np.asarray(mesh.devices).flat)


_WARNED_UNEVEN = set()


def put_batch(tree: Any, mesh: Optional[Mesh], axis: str = "data") -> Any:
    """Place host batch arrays onto the mesh, leading axis sharded over
    `axis` (the reference's DDP batch split, `train_AT_text_only.py:
    310-317`, expressed as GSPMD sharding).

    * `mesh is None` → plain `jnp.asarray` (single-device path).
    * multi-host → each host's local arrays are stitched into one
      global array (`host_local_array_to_global_array`).
    * a leading dim not divisible by the axis size is replicated with a
      one-time warning (train batches should divide the data axis).
    """
    import jax.numpy as jnp

    if mesh is None:
        return jax.tree.map(jnp.asarray, tree)
    n_shards = mesh.shape[axis]
    # a mesh whose devices all belong to THIS process (a host-local
    # attack mesh in a multi-host run) behaves like the single-host
    # path: plain device_put, no cross-host stitching
    multi_host = jax.process_count() > 1 and not mesh_is_local(mesh)

    def put(x):
        if multi_host:
            if isinstance(x, jax.Array):
                return x  # already a global array (e.g. anchor feats)
            x = np.asarray(x)
            if x.ndim == 0:
                # scalars can't be batch-sharded: replicate (every host
                # holds the same value), same contract as single-host
                return jax.device_put(x, NamedSharding(mesh, P()))
            from jax.experimental import multihost_utils
            return multihost_utils.host_local_array_to_global_array(
                x, mesh, P(axis))
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        if np.ndim(x) == 0 or x.shape[0] % n_shards != 0:
            key = (x.shape[0] if np.ndim(x) else 0, n_shards)
            if key not in _WARNED_UNEVEN:
                _WARNED_UNEVEN.add(key)
                LOG.warning(
                    "batch dim %s not divisible by data axis size %d; "
                    "replicating instead of sharding",
                    np.shape(x)[:1], n_shards)
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, tree)


def host_local_batch(x, mesh: Optional[Mesh], axis: str = "data"):
    """Inverse of `put_batch` for result arrays: this host's rows of a
    batch-sharded global array, as numpy.  Single-host arrays (or
    replicated results) convert directly."""
    if mesh is None or jax.process_count() == 1 or mesh_is_local(mesh):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    if getattr(x, "sharding", None) is not None \
            and x.sharding.is_fully_replicated:
        return np.asarray(x)
    return np.asarray(multihost_utils.global_array_to_host_local_array(
        x, mesh, P(axis)))
