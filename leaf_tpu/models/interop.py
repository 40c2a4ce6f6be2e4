"""Checkpoint interop: HF CLIPModel / OpenCLIP state dicts ↔ leaf_tpu pytrees.

TPU-native equivalent of the reference's conversion layer
(`/root/reference/conversion/convert_2.py:119-274` OpenCLIP→HF and
`conversion/convert_to_openclip.py:14-203` HF→OpenCLIP): LEAF trains in
OpenCLIP format and releases/evaluates in HF format, so the rebuild must
ingest and emit both.  Mapping rules re-derived here:

  * torch `nn.Linear` stores weight [out, in]; our convention is
    y = x @ w, so w = weight.T;
  * OpenCLIP fuses QKV (`attn.in_proj_weight` [3D, D]); HF splits into
    q/k/v projections — we store fused column-blocks [D, 3D];
  * the vision stride-p conv weight [width, 3, p, p] becomes our
    patch-matmul weight [p*p*3, width] via transpose to (ph, pw, c)
    pixel order (see `clip.patchify`);
  * per-layer torch blocks are stacked on a leading layer axis.

Round-trip and forward parity are pinned by `tests/test_model_parity.py`
and `tests/test_interop.py`.
"""
from __future__ import annotations

import logging
import math
import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

from leaf_tpu.models.config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch tensor / np array → float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _stack(per_layer):
    return np.stack(per_layer, axis=0)


# ---------------------------------------------------------------------------
# HF transformers CLIPModel → pytree
# ---------------------------------------------------------------------------

def _hf_block_stack(sd: Mapping[str, Any], prefix: str, layers: int) -> Params:
    def get(i, name):
        return _np(sd[f"{prefix}.layers.{i}.{name}"])

    qkv_w, qkv_b = [], []
    for i in range(layers):
        qkv_w.append(np.concatenate(
            [get(i, f"self_attn.{p}_proj.weight").T for p in ("q", "k", "v")],
            axis=1))
        qkv_b.append(np.concatenate(
            [get(i, f"self_attn.{p}_proj.bias") for p in ("q", "k", "v")]))
    return {
        "ln_1": {"scale": _stack([get(i, "layer_norm1.weight") for i in range(layers)]),
                 "bias": _stack([get(i, "layer_norm1.bias") for i in range(layers)])},
        "attn": {
            "qkv_w": _stack(qkv_w),
            "qkv_b": _stack(qkv_b),
            "out_w": _stack([get(i, "self_attn.out_proj.weight").T for i in range(layers)]),
            "out_b": _stack([get(i, "self_attn.out_proj.bias") for i in range(layers)]),
        },
        "ln_2": {"scale": _stack([get(i, "layer_norm2.weight") for i in range(layers)]),
                 "bias": _stack([get(i, "layer_norm2.bias") for i in range(layers)])},
        "mlp": {
            "fc_w": _stack([get(i, "mlp.fc1.weight").T for i in range(layers)]),
            "fc_b": _stack([get(i, "mlp.fc1.bias") for i in range(layers)]),
            "proj_w": _stack([get(i, "mlp.fc2.weight").T for i in range(layers)]),
            "proj_b": _stack([get(i, "mlp.fc2.bias") for i in range(layers)]),
        },
    }


def hf_text_to_params(sd: Mapping[str, Any], cfg: TextConfig) -> Params:
    p = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": _hf_block_stack(sd, "text_model.encoder", cfg.layers),
        "ln_final": {"scale": _np(sd["text_model.final_layer_norm.weight"]),
                     "bias": _np(sd["text_model.final_layer_norm.bias"])},
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    if "text_projection.bias" in sd:
        p["text_projection_bias"] = _np(sd["text_projection.bias"])
    return p


def hf_vision_to_params(sd: Mapping[str, Any], cfg: VisionConfig) -> Params:
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])  # [D,3,p,p]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    # HF spells it "pre_layrnorm" (sic)
    pre_key = ("vision_model.pre_layrnorm.weight"
               if "vision_model.pre_layrnorm.weight" in sd
               else "vision_model.pre_layernorm.weight")
    pre = pre_key.rsplit(".", 1)[0]
    return {
        "patch_embedding": patch_w,
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": {"scale": _np(sd[f"{pre}.weight"]), "bias": _np(sd[f"{pre}.bias"])},
        "blocks": _hf_block_stack(sd, "vision_model.encoder", cfg.layers),
        "ln_post": {"scale": _np(sd["vision_model.post_layernorm.weight"]),
                    "bias": _np(sd["vision_model.post_layernorm.bias"])},
        "proj": _np(sd["visual_projection.weight"]).T,
    }


def hf_to_params(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    """Full HF `CLIPModel.state_dict()` → leaf_tpu pytree."""
    p = {
        "text": hf_text_to_params(sd, cfg.text),
        "visual": hf_vision_to_params(sd, cfg.vision),
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    return p


# ---------------------------------------------------------------------------
# OpenCLIP state dict → pytree
# ---------------------------------------------------------------------------

def _openclip_block_stack(sd: Mapping[str, Any], prefix: str, layers: int) -> Params:
    def get(i, name):
        return _np(sd[f"{prefix}.resblocks.{i}.{name}"])

    return {
        "ln_1": {"scale": _stack([get(i, "ln_1.weight") for i in range(layers)]),
                 "bias": _stack([get(i, "ln_1.bias") for i in range(layers)])},
        "attn": {
            "qkv_w": _stack([get(i, "attn.in_proj_weight").T for i in range(layers)]),
            "qkv_b": _stack([get(i, "attn.in_proj_bias") for i in range(layers)]),
            "out_w": _stack([get(i, "attn.out_proj.weight").T for i in range(layers)]),
            "out_b": _stack([get(i, "attn.out_proj.bias") for i in range(layers)]),
        },
        "ln_2": {"scale": _stack([get(i, "ln_2.weight") for i in range(layers)]),
                 "bias": _stack([get(i, "ln_2.bias") for i in range(layers)])},
        "mlp": {
            "fc_w": _stack([get(i, "mlp.c_fc.weight").T for i in range(layers)]),
            "fc_b": _stack([get(i, "mlp.c_fc.bias") for i in range(layers)]),
            "proj_w": _stack([get(i, "mlp.c_proj.weight").T for i in range(layers)]),
            "proj_b": _stack([get(i, "mlp.c_proj.bias") for i in range(layers)]),
        },
    }


def openclip_to_params(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    """OpenCLIP `CLIP.state_dict()` → leaf_tpu pytree (ViT or
    ModifiedResNet vision tower, auto-detected by key schema)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    if "visual.attnpool.positional_embedding" in sd:
        from leaf_tpu.models.resnet import (
            ResNetVisionConfig,
            resnet_openclip_to_params,
        )
        assert cfg.resnet is not None, \
            f"checkpoint is a ResNet CLIP but config {cfg.name} is ViT"
        rcfg = ResNetVisionConfig(
            layers=cfg.resnet.layers, width=cfg.resnet.width,
            image_size=cfg.resnet.image_size, heads=cfg.resnet.heads,
            output_dim=cfg.resnet.output_dim)
        visual = resnet_openclip_to_params(sd, "visual.", rcfg)
        return {
            "text": {
                "token_embedding": _np(sd["token_embedding.weight"]),
                "positional_embedding": _np(sd["positional_embedding"]),
                "blocks": _openclip_block_stack(sd, "transformer",
                                                cfg.text.layers),
                "ln_final": {"scale": _np(sd["ln_final.weight"]),
                             "bias": _np(sd["ln_final.bias"])},
                "text_projection": _np(sd["text_projection"]),
            },
            "visual": visual,
            "logit_scale": _np(sd["logit_scale"]).reshape(()),
        }
    if any(k.startswith("visual.trunk.") for k in sd):
        # CustomTextCLIP with a timm vision trunk (timm_model.py);
        # its text tower lives under the `text.` prefix
        tp = "text." if "text.token_embedding.weight" in sd else ""
        if cfg.convnext is not None:
            from leaf_tpu.models.convnext import timm_convnext_to_params
            visual = timm_convnext_to_params(sd, cfg.convnext)
        elif cfg.trunk is not None:
            from leaf_tpu.models import trunks
            visual = trunks.from_timm(sd, cfg.trunk)
        else:
            from leaf_tpu.models.timm_vision import timm_vit_to_params
            # auto-detect the projection head kind from the state dict
            # (VisionConfig carries no timm_proj field): an MLP head
            # lives under visual.head.mlp.*
            proj = "mlp" if any(k.startswith("visual.head.mlp.")
                                for k in sd) else "linear"
            visual = timm_vit_to_params(sd, cfg.vision, proj=proj)
        text = {
            "token_embedding": _np(sd[tp + "token_embedding.weight"]),
            "positional_embedding": _np(
                sd[tp + "positional_embedding"]),
            "blocks": _openclip_block_stack(sd, tp + "transformer",
                                            cfg.text.layers),
            "ln_final": {"scale": _np(sd[tp + "ln_final.weight"]),
                         "bias": _np(sd[tp + "ln_final.bias"])},
        }
        if tp + "text_projection.weight" in sd:
            # Linear projection (SigLIP towers: proj_bias=True)
            text["text_projection"] = _np(
                sd[tp + "text_projection.weight"]).T
            if tp + "text_projection.bias" in sd:
                text["text_projection_bias"] = _np(
                    sd[tp + "text_projection.bias"])
        else:
            text["text_projection"] = _np(sd[tp + "text_projection"])
        out = {
            "text": text,
            "visual": visual,
            "logit_scale": _np(sd["logit_scale"]).reshape(()),
        }
        if "logit_bias" in sd:           # SigLIP sigmoid-loss bias
            out["logit_bias"] = _np(sd["logit_bias"]).reshape(())
        return out
    conv = _np(sd["visual.conv1.weight"])
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    tp = "text." if "text.token_embedding.weight" in sd else ""
    visual = {
        "patch_embedding": patch_w,
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "blocks": _openclip_block_stack(sd, "visual.transformer",
                                        cfg.vision.layers),
        "ln_post": {"scale": _np(sd["visual.ln_post.weight"]),
                    "bias": _np(sd["visual.ln_post.bias"])},
        "proj": _np(sd["visual.proj"]),
    }
    if "visual.ln_pre.weight" in sd:     # absent in CLIPA (no_ln_pre)
        visual["ln_pre"] = {"scale": _np(sd["visual.ln_pre.weight"]),
                            "bias": _np(sd["visual.ln_pre.bias"])}
    text = {
        "token_embedding": _np(sd[tp + "token_embedding.weight"]),
        "positional_embedding": _np(sd[tp + "positional_embedding"]),
        "blocks": _openclip_block_stack(sd, tp + "transformer",
                                        cfg.text.layers),
        "ln_final": {"scale": _np(sd[tp + "ln_final.weight"]),
                     "bias": _np(sd[tp + "ln_final.bias"])},
    }
    if tp + "text_projection.weight" in sd:
        text["text_projection"] = _np(sd[tp + "text_projection.weight"]).T
        if tp + "text_projection.bias" in sd:
            text["text_projection_bias"] = _np(
                sd[tp + "text_projection.bias"])
    else:
        text["text_projection"] = _np(sd[tp + "text_projection"])
    p = {
        "text": text,
        "visual": visual,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    if "logit_bias" in sd:
        p["logit_bias"] = _np(sd["logit_bias"]).reshape(())
    return p


# ---------------------------------------------------------------------------
# pytree → HF state dict (export, equivalent of conversion/convert_2.py)
# ---------------------------------------------------------------------------

def params_to_hf(params: Params, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """leaf_tpu pytree → HF CLIPModel state dict (numpy values)."""
    sd: Dict[str, np.ndarray] = {}

    def put(k, v):
        sd[k] = np.asarray(v, dtype=np.float32)

    t = params["text"]
    put("text_model.embeddings.token_embedding.weight", t["token_embedding"])
    put("text_model.embeddings.position_embedding.weight", t["positional_embedding"])
    put("text_model.final_layer_norm.weight", t["ln_final"]["scale"])
    put("text_model.final_layer_norm.bias", t["ln_final"]["bias"])
    put("text_projection.weight", np.asarray(t["text_projection"]).T)

    v = params["visual"]
    p = cfg.vision.patch_size
    width = cfg.vision.width
    conv = np.asarray(v["patch_embedding"]).reshape(p, p, 3, width)
    put("vision_model.embeddings.patch_embedding.weight", conv.transpose(3, 2, 0, 1))
    if "ln_pre" not in v or "class_embedding" not in v:
        raise ValueError(
            "transformers' CLIPModel has a mandatory pre_layrnorm and "
            "class embedding; this tower lacks them (CLIPA-style "
            "no_ln_pre / token-less) — export with --to openclip instead")
    put("vision_model.embeddings.class_embedding", v["class_embedding"])
    put("vision_model.embeddings.position_embedding.weight", v["positional_embedding"])
    put("vision_model.pre_layrnorm.weight", v["ln_pre"]["scale"])
    put("vision_model.pre_layrnorm.bias", v["ln_pre"]["bias"])
    put("vision_model.post_layernorm.weight", v["ln_post"]["scale"])
    put("vision_model.post_layernorm.bias", v["ln_post"]["bias"])
    put("visual_projection.weight", np.asarray(v["proj"]).T)
    put("logit_scale", params["logit_scale"])

    for tower, prefix, n_layers in ((t, "text_model.encoder", cfg.text.layers),
                                    (v, "vision_model.encoder", cfg.vision.layers)):
        b = tower["blocks"]
        D = np.asarray(b["attn"]["qkv_w"]).shape[1]
        for i in range(n_layers):
            base = f"{prefix}.layers.{i}"
            qkv_w = np.asarray(b["attn"]["qkv_w"][i])
            qkv_b = np.asarray(b["attn"]["qkv_b"][i])
            for j, name in enumerate(("q", "k", "v")):
                put(f"{base}.self_attn.{name}_proj.weight",
                    qkv_w[:, j * D:(j + 1) * D].T)
                put(f"{base}.self_attn.{name}_proj.bias", qkv_b[j * D:(j + 1) * D])
            put(f"{base}.self_attn.out_proj.weight", np.asarray(b["attn"]["out_w"][i]).T)
            put(f"{base}.self_attn.out_proj.bias", b["attn"]["out_b"][i])
            put(f"{base}.layer_norm1.weight", b["ln_1"]["scale"][i])
            put(f"{base}.layer_norm1.bias", b["ln_1"]["bias"][i])
            put(f"{base}.layer_norm2.weight", b["ln_2"]["scale"][i])
            put(f"{base}.layer_norm2.bias", b["ln_2"]["bias"][i])
            put(f"{base}.mlp.fc1.weight", np.asarray(b["mlp"]["fc_w"][i]).T)
            put(f"{base}.mlp.fc1.bias", b["mlp"]["fc_b"][i])
            put(f"{base}.mlp.fc2.weight", np.asarray(b["mlp"]["proj_w"][i]).T)
            put(f"{base}.mlp.fc2.bias", b["mlp"]["proj_b"][i])
    return sd


# ---------------------------------------------------------------------------
# File loaders
# ---------------------------------------------------------------------------

def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file (.safetensors or torch .pt/.bin) → numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    try:
        # OpenAI's released CLIP .pt files are TorchScript archives
        # (reference `src/open_clip/openai.py:46-57` jit-load-then-
        # state_dict path); plain torch.load cannot read them.
        ckpt = torch.jit.load(path, map_location="cpu").state_dict()
    except RuntimeError:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    # jit state dicts carry non-weight metadata tensors the reference
    # pops in build_model_from_openai_state_dict (`model.py:404-412`)
    skip = {"input_resolution", "context_length", "vocab_size"}
    return {k: _np(v) for k, v in ckpt.items() if k not in skip}


def checkpoint_quick_gelu(path: str) -> Optional[bool]:
    """Does the checkpoint at `path` (file or snapshot dir) declare a
    QuickGELU text tower?  None = no config metadata found (e.g. bare
    OpenAI TorchScript .pt files).

    Reads the config JSON sitting next to the weights, the same files
    the reference resolves a hub model's config from
    (`factory.py:200-207`, `conversion/convert_2.py:129-147`):
    `open_clip_config.json` (model_cfg.quick_gelu) or an HF
    `config.json` (text_config.hidden_act == "quick_gelu")."""
    import json

    if os.path.isfile(path):
        # per-file sidecar written by `resolve_pretrained` for registry
        # entries that declare the activation (the cache dir is shared
        # across weights, so a directory-level config would collide)
        sc = path + ".open_clip_config.json"
        if os.path.exists(sc):
            with open(sc) as f:
                return bool(json.load(f).get("model_cfg", {})
                            .get("quick_gelu", False))
    d = path if os.path.isdir(path) else os.path.dirname(path)
    if not d:
        # a bare filename has no config directory — reading ./config.json
        # would adopt an unrelated file's activation
        return None
    oc = os.path.join(d, "open_clip_config.json")
    if os.path.exists(oc):
        with open(oc) as f:
            mc = json.load(f).get("model_cfg", {})
        return bool(mc.get("quick_gelu", False))
    hf = os.path.join(d, "config.json")
    if os.path.exists(hf):
        with open(hf) as f:
            c = json.load(f)
        if c.get("model_type") not in (None, "clip"):
            return None
        tc = c.get("text_config", c)
        act = tc.get("hidden_act")
        if act is None:
            return None
        return act == "quick_gelu"
    return None


def resolve_checkpoint_file(path: str) -> str:
    """Snapshot dir → the weights file inside it (no-op for files)."""
    if os.path.isdir(path):
        for cand in ("open_clip_model.safetensors", "model.safetensors",
                     "open_clip_pytorch_model.bin", "pytorch_model.bin"):
            f = os.path.join(path, cand)
            if os.path.exists(f):
                return f
        raise FileNotFoundError(f"no checkpoint file found under {path}")
    return path


def load_pretrained(path: str, cfg: CLIPConfig) -> Params:
    """Load an HF or OpenCLIP checkpoint file/dir into a pytree,
    auto-detecting the key schema."""
    path = resolve_checkpoint_file(path)
    sd = load_state_dict_file(path)
    keys = set(sd.keys())
    if any(k.startswith("text_model.") for k in keys):
        return hf_to_params(sd, cfg)
    return openclip_to_params(sd, cfg)


def resize_vision_pos_embed(params: Params, cfg: CLIPConfig,
                            method: str = "cubic") -> Params:
    """Bicubic-interpolate a loaded ViT position-embedding grid to the
    config's resolution (reference `model.py:523-554` resize_pos_embed,
    invoked by `factory.py:172` on every load; class token — when
    present — passes through untouched).  No-op when the sequence
    length already matches or the tower is not grid-based."""
    import jax
    import jax.numpy as jnp

    # plain-ViT towers only: trunk families (MCi hybrid ViTs, EVA,
    # swin, ...) have their own pos-embed conventions, exactly like the
    # reference's resize_pos_embed handles only the ViT grid
    if cfg.trunk is not None or cfg.convnext is not None \
            or cfg.resnet is not None:
        return params
    visual = params.get("visual", {})
    pe = visual.get("positional_embedding")
    if pe is None or getattr(cfg.vision, "patch_size", 0) in (0, None):
        return params
    grid = cfg.vision.image_size // cfg.vision.patch_size
    extra = 1 if "class_embedding" in visual else 0
    new_len = grid * grid + extra
    if new_len == pe.shape[0]:
        return params
    tok, img = pe[:extra], pe[extra:]
    old_grid = int(math.isqrt(img.shape[0]))
    if old_grid * old_grid != img.shape[0]:
        raise ValueError(
            f"cannot resize a non-square position grid of {img.shape[0]}")
    logging.getLogger(__name__).info(
        "resizing position embedding grid %dx%d -> %dx%d",
        old_grid, old_grid, grid, grid)
    img = jnp.asarray(img, jnp.float32).reshape(old_grid, old_grid, -1)
    img = jax.image.resize(img, (grid, grid, img.shape[-1]), method=method,
                           antialias=True)
    img = img.reshape(grid * grid, -1)
    new_pe = jnp.concatenate([jnp.asarray(tok, jnp.float32), img], axis=0) \
        if extra else img
    out = dict(params)
    out["visual"] = dict(visual)
    out["visual"]["positional_embedding"] = new_pe.astype(pe.dtype)
    return out
