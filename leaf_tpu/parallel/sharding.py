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

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
        if "attn" in keys or "mlp" in keys:
            leafname = keys[-1]
            if leafname in ("qkv_w", "fc_w"):
                return P(None, None, m)
            if leafname in ("out_w", "proj_w"):
                return P(None, m, None)
            if leafname in ("qkv_b", "fc_b"):
                return P(None, m)
            return P()
        if keys[-1] == "token_embedding":
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
