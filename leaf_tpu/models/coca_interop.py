"""Reference/OpenCLIP CoCa state dict → leaf_tpu pytree.

Key layout verified against `open_clip.create_model('coca_ViT-B-32')`:
text.* (TextTransformer with cls_emb), visual.* (+ attn_pool with
separate q/k/v projection weights — torch MultiheadAttention with
kdim=vdim=vision width), text_decoder.* (resblocks + cross_attn blocks
with ln_1_kv).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from leaf_tpu.models.coca import CoCaConfig
from leaf_tpu.models.interop import _np, _openclip_block_stack, _stack

Params = Dict[str, Any]


def _hf_text_to_params(sd: Mapping[str, Any], cfg: CoCaConfig) -> Params:
    """`text.transformer.*` (torch HF keys) + `text.proj.weight` →
    {"hf": flax tree, "proj": {...}} via transformers' pt→flax
    converter (reference hf_model.py wraps the torch AutoModel; the
    linear proj is bias-free, hf_model.py:149-152)."""
    import torch
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    from leaf_tpu.models.coca import hf_text_tower
    tower = hf_text_tower(cfg)
    pt = {k[len("text.transformer."):]: torch.as_tensor(np.asarray(_np(v)))
          for k, v in sd.items() if k.startswith("text.transformer.")}
    flax_tree = convert_pytorch_state_dict_to_flax(pt, tower.module)
    proj = {}
    if "text.proj.weight" in sd:
        proj["w"] = _np(sd["text.proj.weight"]).T
    return {"hf": flax_tree, "proj": proj}


def coca_openclip_to_params(sd: Mapping[str, Any], cfg: CoCaConfig) -> Params:
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    if cfg.hf_text_name:
        text = _hf_text_to_params(sd, cfg)
        return _assemble(sd, cfg, text)
    text = {
        "token_embedding": _np(sd["text.token_embedding.weight"]),
        "positional_embedding": _np(sd["text.positional_embedding"]),
        "cls_emb": _np(sd["text.cls_emb"]),
        "blocks": _openclip_block_stack(sd, "text.transformer",
                                        cfg.text.layers),
        "ln_final": {"scale": _np(sd["text.ln_final.weight"]),
                     "bias": _np(sd["text.ln_final.bias"])},
        "text_projection": _np(sd["text.text_projection"]),
    }
    return _assemble(sd, cfg, text)


def _assemble(sd: Mapping[str, Any], cfg: CoCaConfig, text: Params) -> Params:
    conv = _np(sd["visual.conv1.weight"])
    visual = {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _np(sd["visual.ln_pre.weight"]),
                   "bias": _np(sd["visual.ln_pre.bias"])},
        "blocks": _openclip_block_stack(sd, "visual.transformer",
                                        cfg.vision.layers),
        "ln_post": {"scale": _np(sd["visual.ln_post.weight"]),
                    "bias": _np(sd["visual.ln_post.bias"])},
        "proj": _np(sd["visual.proj"]),
        "attn_pool": {
            "query": _np(sd["visual.attn_pool.query"]),
            "ln_q": {"scale": _np(sd["visual.attn_pool.ln_q.weight"]),
                     "bias": _np(sd["visual.attn_pool.ln_q.bias"])},
            "ln_k": {"scale": _np(sd["visual.attn_pool.ln_k.weight"]),
                     "bias": _np(sd["visual.attn_pool.ln_k.bias"])},
            "q_w": _np(sd["visual.attn_pool.attn.q_proj_weight"]).T,
            "k_w": _np(sd["visual.attn_pool.attn.k_proj_weight"]).T,
            "v_w": _np(sd["visual.attn_pool.attn.v_proj_weight"]).T,
            "qkv_b": _np(sd["visual.attn_pool.attn.in_proj_bias"]),
            "out_w": _np(sd["visual.attn_pool.attn.out_proj.weight"]).T,
            "out_b": _np(sd["visual.attn_pool.attn.out_proj.bias"]),
        },
    }

    L = cfg.multimodal.layers
    cross = {
        "ln_1": {"scale": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_1.weight"]) for i in range(L)]),
                 "bias": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_1.bias"]) for i in range(L)])},
        "attn": {
            "qkv_w": _stack([_np(sd[f"text_decoder.cross_attn.{i}.attn.in_proj_weight"]).T for i in range(L)]),
            "qkv_b": _stack([_np(sd[f"text_decoder.cross_attn.{i}.attn.in_proj_bias"]) for i in range(L)]),
            "out_w": _stack([_np(sd[f"text_decoder.cross_attn.{i}.attn.out_proj.weight"]).T for i in range(L)]),
            "out_b": _stack([_np(sd[f"text_decoder.cross_attn.{i}.attn.out_proj.bias"]) for i in range(L)]),
        },
        "ln_2": {"scale": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_2.weight"]) for i in range(L)]),
                 "bias": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_2.bias"]) for i in range(L)])},
        "mlp": {
            "fc_w": _stack([_np(sd[f"text_decoder.cross_attn.{i}.mlp.c_fc.weight"]).T for i in range(L)]),
            "fc_b": _stack([_np(sd[f"text_decoder.cross_attn.{i}.mlp.c_fc.bias"]) for i in range(L)]),
            "proj_w": _stack([_np(sd[f"text_decoder.cross_attn.{i}.mlp.c_proj.weight"]).T for i in range(L)]),
            "proj_b": _stack([_np(sd[f"text_decoder.cross_attn.{i}.mlp.c_proj.bias"]) for i in range(L)]),
        },
        "ln_1_kv": {"scale": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_1_kv.weight"]) for i in range(L)]),
                    "bias": _stack([_np(sd[f"text_decoder.cross_attn.{i}.ln_1_kv.bias"]) for i in range(L)])},
    }
    decoder = {
        "blocks": _openclip_block_stack(sd, "text_decoder", L),
        "cross_blocks": cross,
        "ln_final": {"scale": _np(sd["text_decoder.ln_final.weight"]),
                     "bias": _np(sd["text_decoder.ln_final.bias"])},
        "text_projection": _np(sd["text_decoder.text_projection"]),
    }
    return {"text": text, "visual": visual, "text_decoder": decoder,
            "logit_scale": _np(sd["logit_scale"]).reshape(())}
