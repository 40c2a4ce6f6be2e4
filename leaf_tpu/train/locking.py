"""LiT-style partial tower locking for the contrastive trainer.

TPU-native equivalent of the reference's `requires_grad` surgery
(`model.py:256-258,344-349`, `transformer.py:541-571` vision groups,
`hf_model.py:171-186` text layers): in a pure-functional setup the
clean mechanism is *update masking* — a pytree of 0/1 multipliers,
applied to the optimizer's final updates (so AdamW moments and weight
decay are masked too, exactly like an excluded parameter).

Stacked-layer subtlety: `init_block_stack` stores all L blocks in ONE
leaf of shape [L, ...] (scanned), so "unlock the last n layers" is a
*per-slice* multiplier `[L, 1, ...]` on that leaf — something
`optax.masked` (leaf-granular) cannot express.

Group semantics (reference `VisionTransformer.lock`,
`transformer.py:545-559`):
  groups = [stem(conv/cls/pos/ln_pre), block_0 .. block_{L-2},
            (block_{L-1} + ln_post), proj]
unlocked_groups=n unlocks the LAST n groups.

Text semantics (reference `HFTextModel.lock`, `hf_model.py:171-186`,
applied to the native tower): `[embeddings, block_0..block_{L-1}]
[:-unlocked_layers]` are frozen; ln_final + text_projection stay
trainable; within frozen modules, LayerNorm params follow
`freeze_layer_norm`.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]

_LN_KEYS = ("ln_1", "ln_2", "ln_pre", "ln_post", "ln_final", "ln_q", "ln_k")


def _full(tree, value: float):
    return jax.tree.map(
        lambda x: jnp.full((1,) * getattr(x, "ndim", 0), value, jnp.float32),
        tree)


def _n_layers(blocks: Params) -> int:
    return jax.tree.leaves(blocks)[0].shape[0]


def _per_layer(blocks: Params, layer_ok: jnp.ndarray,
               ln_override: bool) -> Params:
    """[L]-vector of 0/1 → per-leaf broadcastable multipliers; frozen
    layers' LayerNorm leaves stay trainable when ln_override."""
    out = {}
    for k, v in blocks.items():
        ok = (jnp.maximum(layer_ok, 1.0) if ln_override and k in _LN_KEYS
              else layer_ok)
        if isinstance(v, dict):
            out[k] = {kk: ok.reshape((-1,) + (1,) * (vv.ndim - 1))
                      for kk, vv in v.items()}
        else:
            out[k] = ok.reshape((-1,) + (1,) * (v.ndim - 1))
    return out


def vision_lock_multipliers(visual: Params, unlocked_groups: int = 0
                            ) -> Params:
    """reference `VisionTransformer.lock` groups; n=0 freezes all."""
    if "blocks" not in visual:
        if unlocked_groups:
            raise ValueError(
                "--lock-image-unlocked-groups is implemented for ViT "
                "towers (the reference defines separate group lists per "
                "trunk, transformer.py:541 vs modified_resnet.py); use "
                "full locking (0) for this tower")
        return _full(visual, 0.0)
    L = _n_layers(visual["blocks"])
    n = unlocked_groups
    # groups, last-to-first: proj | last block + ln_post | blocks[:-1]
    # (one group each) | stem.  total = L + 2.
    proj_ok = 1.0 if n >= 1 else 0.0
    last_ok = 1.0 if n >= 2 else 0.0
    n_mid_unlocked = max(0, min(n - 2, L - 1))   # of blocks[0..L-2]
    stem_ok = 1.0 if n >= L + 2 else 0.0
    layer_ok = jnp.zeros((L,), jnp.float32)
    if last_ok:
        layer_ok = layer_ok.at[L - 1].set(1.0)
    if n_mid_unlocked:
        layer_ok = layer_ok.at[L - 1 - n_mid_unlocked:L - 1].set(1.0)

    mult = {}
    for k, v in visual.items():
        if k == "blocks":
            mult[k] = _per_layer(v, layer_ok, ln_override=False)
        elif k == "proj":
            mult[k] = _full(v, proj_ok)
        elif k == "ln_post":
            mult[k] = _full(v, last_ok)
        else:  # stem: patch/class/positional embeddings, ln_pre
            mult[k] = _full(v, stem_ok)
    return mult


def text_lock_multipliers(text: Params, unlocked_layers: int = 0,
                          freeze_layer_norm: bool = True) -> Params:
    """reference `HFTextModel.lock` semantics on the native tower."""
    ln_override = not freeze_layer_norm
    if "blocks" not in text:
        # HF text tower (flax tree): full freeze; LayerNorm leaves
        # follow freeze_layer_norm (reference hf_model.py:172-175).
        # Per-layer unlocking of HF towers is not implemented.
        if unlocked_layers:
            raise ValueError(
                "--lock-text-unlocked-layers > 0 is implemented for the "
                "native text tower; HF towers support full locking only")

        def walk(node, in_ln=False):
            if isinstance(node, dict):
                return {k: walk(v, in_ln or "layernorm" in
                                k.lower().replace("_", ""))
                        for k, v in node.items()}
            return jnp.full((1,) * getattr(node, "ndim", 0),
                            1.0 if (in_ln and ln_override) else 0.0,
                            jnp.float32)

        return walk(text)
    L = _n_layers(text["blocks"])
    n = min(unlocked_layers, L)
    layer_ok = jnp.concatenate(
        [jnp.zeros((L - n,), jnp.float32), jnp.ones((n,), jnp.float32)])
    emb_ok = 0.0                       # embeddings always in the frozen set
    tail_ok = 1.0 if n > 0 else 0.0    # ln_final/proj not in the frozen
    #                                    modules list when n>0 (:182)
    mult = {}
    for k, v in text.items():
        if k == "blocks":
            mult[k] = _per_layer(v, layer_ok, ln_override)
        elif k in ("ln_final",):
            mult[k] = _full(v, tail_ok if freeze_layer_norm else 1.0)
        elif k in ("text_projection",):
            mult[k] = _full(v, tail_ok)
        else:
            mult[k] = _full(v, emb_ok)
    return mult


def lock_multipliers(params: Params, lock_image: bool = False,
                     lock_image_unlocked_groups: int = 0,
                     lock_text: bool = False,
                     lock_text_unlocked_layers: int = 0,
                     lock_text_freeze_layer_norm: bool = True) -> Params:
    """Full-model multiplier pytree (1.0 = trainable)."""
    mult = _full(params, 1.0)
    if lock_image and "visual" in params:
        mult["visual"] = vision_lock_multipliers(
            params["visual"], lock_image_unlocked_groups)
    if lock_text and "text" in params:
        mult["text"] = text_lock_multipliers(
            params["text"], lock_text_unlocked_layers,
            lock_text_freeze_layer_norm)
    return mult


def mask_updates(multipliers: Params) -> optax.GradientTransformation:
    """Element-wise multiply the final updates — frozen slices receive
    exactly zero update (incl. weight decay), like requires_grad=False."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m.astype(u.dtype),
                            updates, multipliers), state

    return optax.GradientTransformation(init_fn, update_fn)


def apply_locking(tx: optax.GradientTransformation, params: Params,
                  args) -> optax.GradientTransformation:
    """Wrap an optimizer with the lock mask derived from parsed args
    (`--lock-image[-unlocked-groups]`, `--lock-text[-unlocked-layers/
    -freeze-layer-norm]`, reference `main.py:316-325`)."""
    if not (getattr(args, "lock_image", False)
            or getattr(args, "lock_text", False)):
        return tx
    mult = lock_multipliers(
        params,
        lock_image=getattr(args, "lock_image", False),
        lock_image_unlocked_groups=getattr(
            args, "lock_image_unlocked_groups", 0),
        lock_text=getattr(args, "lock_text", False),
        lock_text_unlocked_layers=getattr(
            args, "lock_text_unlocked_layers", 0),
        lock_text_freeze_layer_norm=getattr(
            args, "lock_text_freeze_layer_norm", True))
    return optax.chain(tx, mask_updates(mult))
