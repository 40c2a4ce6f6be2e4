"""Checkpoint conversion CLI: OpenCLIP ↔ HF ↔ leaf_tpu.

Equivalent of the reference's `conversion/convert_2.py` (OpenCLIP→HF)
and `conversion/convert_to_openclip.py` (HF→OpenCLIP): LEAF trains in
OpenCLIP format and releases in HF format, so both directions must
round-trip.  This CLI converts between the three formats through the
leaf_tpu pytree, with optional numerical parity verification (the
reference asserts allclose parity, `convert_2.py:237-265`).

Usage:
  python -m leaf_tpu.convert --model ViT-L-14 \
      --input ckpt.safetensors --output out_dir --to hf [--verify]
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import numpy as np

from leaf_tpu.models import interop
from leaf_tpu.models.config import CLIPConfig, get_model_config

Params = Dict[str, Any]


def params_to_openclip(params: Params, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """leaf_tpu pytree → OpenCLIP state dict (numpy values) — the
    reverse of `interop.openclip_to_params` (reference
    `convert_to_openclip.py:14-203`)."""
    sd: Dict[str, np.ndarray] = {}

    def put(k, v):
        sd[k] = np.asarray(v, dtype=np.float32)

    t = params["text"]
    put("token_embedding.weight", t["token_embedding"])
    put("positional_embedding", t["positional_embedding"])
    put("ln_final.weight", t["ln_final"]["scale"])
    put("ln_final.bias", t["ln_final"]["bias"])
    if "text_projection_bias" in t:
        # SigLIP-style Linear projection: open_clip (and our loaders)
        # read the bias only alongside the nn.Linear-style
        # 'text_projection.weight' ([out, in]) — the parameter-style
        # 'text_projection' key would silently drop it on reload
        put("text_projection.weight", np.asarray(t["text_projection"]).T)
        put("text_projection.bias", t["text_projection_bias"])
    else:
        put("text_projection", t["text_projection"])
    put("logit_scale", params["logit_scale"])
    if "logit_bias" in params:        # sigmoid-loss models
        put("logit_bias", params["logit_bias"])

    v = params["visual"]
    if cfg.resnet is not None:
        _resnet_to_openclip(sd, v, put)
        towers = ((t, "transformer", cfg.text.layers),)
    elif cfg.convnext is not None:
        from leaf_tpu.models.convnext import params_to_timm_convnext
        sd.update({k: np.asarray(w, np.float32) for k, w in
                   params_to_timm_convnext(v, cfg.convnext).items()})
        towers = ((t, "transformer", cfg.text.layers),)
    else:
        p = cfg.vision.patch_size
        conv = np.asarray(v["patch_embedding"]).reshape(
            p, p, 3, cfg.vision.width)
        put("visual.conv1.weight", conv.transpose(3, 2, 0, 1))
        if "class_embedding" in v:
            put("visual.class_embedding", v["class_embedding"])
        put("visual.positional_embedding", v["positional_embedding"])
        if "ln_pre" in v:             # absent in CLIPA (no_ln_pre)
            put("visual.ln_pre.weight", v["ln_pre"]["scale"])
            put("visual.ln_pre.bias", v["ln_pre"]["bias"])
        put("visual.ln_post.weight", v["ln_post"]["scale"])
        put("visual.ln_post.bias", v["ln_post"]["bias"])
        put("visual.proj", v["proj"])
        towers = ((t, "transformer", cfg.text.layers),
                  (v, "visual.transformer", cfg.vision.layers))

    for tower, prefix, n_layers in towers:
        b = tower["blocks"]
        for i in range(n_layers):
            base = f"{prefix}.resblocks.{i}"
            put(f"{base}.attn.in_proj_weight",
                np.asarray(b["attn"]["qkv_w"][i]).T)
            put(f"{base}.attn.in_proj_bias", b["attn"]["qkv_b"][i])
            put(f"{base}.attn.out_proj.weight",
                np.asarray(b["attn"]["out_w"][i]).T)
            put(f"{base}.attn.out_proj.bias", b["attn"]["out_b"][i])
            put(f"{base}.ln_1.weight", b["ln_1"]["scale"][i])
            put(f"{base}.ln_1.bias", b["ln_1"]["bias"][i])
            put(f"{base}.ln_2.weight", b["ln_2"]["scale"][i])
            put(f"{base}.ln_2.bias", b["ln_2"]["bias"][i])
            put(f"{base}.mlp.c_fc.weight", np.asarray(b["mlp"]["fc_w"][i]).T)
            put(f"{base}.mlp.c_fc.bias", b["mlp"]["fc_b"][i])
            put(f"{base}.mlp.c_proj.weight",
                np.asarray(b["mlp"]["proj_w"][i]).T)
            put(f"{base}.mlp.c_proj.bias", b["mlp"]["proj_b"][i])
    return sd


def _resnet_to_openclip(sd, v: Params, put):
    """ModifiedResNet visual pytree → `visual.*` torch state dict —
    inverse of `resnet.resnet_openclip_to_params`."""

    def conv(k, w):  # HWIO → torch OIHW
        put(k, np.asarray(w).transpose(3, 2, 0, 1))

    def bn(k, b):
        put(k + ".weight", b["scale"])
        put(k + ".bias", b["bias"])
        put(k + ".running_mean", b["mean"])
        put(k + ".running_var", b["var"])

    for i in (1, 2, 3):
        conv(f"visual.conv{i}.weight", v[f"conv{i}"])
        bn(f"visual.bn{i}", v[f"bn{i}"])
    for li in range(1, 5):
        for b, bp in enumerate(v[f"layer{li}"]):
            base = f"visual.layer{li}.{b}."
            for i in (1, 2, 3):
                conv(base + f"conv{i}.weight", bp[f"conv{i}"])
                bn(base + f"bn{i}", bp[f"bn{i}"])
            if "downsample" in bp:
                conv(base + "downsample.0.weight", bp["downsample"]["conv"])
                bn(base + "downsample.1", bp["downsample"]["bn"])
    ap = v["attnpool"]
    put("visual.attnpool.positional_embedding", ap["positional_embedding"])
    for name, key in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                      ("c_proj", "c")):
        put(f"visual.attnpool.{name}.weight", ap[f"{key}_w"])
        put(f"visual.attnpool.{name}.bias", ap[f"{key}_b"])


def hf_config_dict(cfg: CLIPConfig) -> Dict[str, Any]:
    """transformers CLIPConfig kwargs for a registry model — the
    per-size config block of `conversion/convert_2.py:128-216`,
    derived from our config instead of hand-enumerated."""
    act = "quick_gelu" if cfg.quick_gelu else "gelu"
    return dict(
        projection_dim=cfg.embed_dim,
        text_config=dict(
            hidden_act=act,
            hidden_size=cfg.text.width,
            intermediate_size=int(cfg.text.width * cfg.text.mlp_ratio),
            num_attention_heads=cfg.text.heads,
            num_hidden_layers=cfg.text.layers,
            max_position_embeddings=cfg.text.context_length,
            vocab_size=cfg.text.vocab_size,
        ),
        vision_config=dict(
            hidden_act=act,
            hidden_size=cfg.vision.width,
            intermediate_size=int(cfg.vision.width * cfg.vision.mlp_ratio),
            num_attention_heads=cfg.vision.heads,
            num_hidden_layers=cfg.vision.layers,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
        ),
    )


def save_hf_pretrained(params: Params, cfg: CLIPConfig, output_dir: str,
                       verify: bool = False) -> str:
    """Write an HF-loadable model directory — the release path
    (`README.md:96-98`: training in OpenCLIP format, release in HF):
    `transformers.CLIPModel.from_pretrained(output_dir)` round-trips.
    """
    import transformers
    assert cfg.resnet is None, "HF CLIPModel export requires a ViT tower"
    hf_cfg = transformers.CLIPConfig(**hf_config_dict(cfg))
    sd = interop.params_to_hf(params, cfg)
    import torch
    model = transformers.CLIPModel(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    # position_ids buffers may be "missing" (generated); nothing else may be
    real_missing = [k for k in missing if "position_ids" not in k]
    assert not real_missing and not unexpected, (real_missing, unexpected)
    if verify:
        verify_parity(params, cfg, model.state_dict(), "hf")
    model.save_pretrained(output_dir)
    return output_dir


def save_state_dict(sd: Dict[str, np.ndarray], output: str, fmt: str):
    os.makedirs(output, exist_ok=True)
    from safetensors.numpy import save_file
    name = ("model.safetensors" if fmt == "hf"
            else "open_clip_model.safetensors")
    # safetensors writes the raw buffer and IGNORES strides — the
    # transposed views params_to_{hf,openclip} produce must be
    # materialised or the file is silently corrupt
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(output, name))
    return os.path.join(output, name)


def verify_parity(params: Params, cfg: CLIPConfig, sd: Dict[str, np.ndarray],
                  fmt: str, atol: float = 1e-4):
    """Forward-parity check: converted state dict reloaded → identical
    text/image features (reference `convert_2.py:237-265`)."""
    import jax
    import jax.numpy as jnp
    from leaf_tpu.models import clip as lclip
    back = (interop.hf_to_params(sd, cfg) if fmt == "hf"
            else interop.openclip_to_params(sd, cfg))
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.text.vocab_size - 2, size=(2, cfg.text.context_length))
    tokens[:, 0] = 49406
    tokens[:, -1] = 49407
    tokens = jnp.asarray(tokens)
    images = jnp.asarray(rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))
    for name, fn in (("text", lambda p: lclip.encode_text(
            p["text"], cfg.text, tokens, cfg.quick_gelu)),
                     # dispatcher handles ViT / ResNet / ConvNeXt towers
                     ("image", lambda p: lclip.encode_image_model(
                         p, cfg, images))):
        a = np.asarray(fn(params))
        b = np.asarray(fn(back))
        if not np.allclose(a, b, atol=atol):
            raise AssertionError(
                f"{name} parity failed: max diff {np.abs(a - b).max()}")


def main(argv=None):
    p = argparse.ArgumentParser("leaf_tpu checkpoint converter")
    p.add_argument("--model", required=True, help="registry name")
    p.add_argument("--input", required=True,
                   help="checkpoint file/dir (HF or OpenCLIP, auto-detect)")
    p.add_argument("--output", required=True)
    p.add_argument("--to", choices=["hf", "openclip"], required=True)
    p.add_argument("--verify", action="store_true")
    args = p.parse_args(argv)

    cfg = get_model_config(args.model)
    params = interop.load_pretrained(args.input, cfg)
    if args.to == "hf":
        # full transformers-loadable directory (config.json + weights):
        # a bare safetensors file would not from_pretrained(), and the
        # activation metadata (hidden_act) would be lost for reloads
        path = save_hf_pretrained(params, cfg, args.output,
                                  verify=args.verify)
        print(f"wrote HF model directory {path}")
        return path
    sd = params_to_openclip(params, cfg)
    if args.verify:
        verify_parity(params, cfg, sd, args.to)
    path = save_state_dict(sd, args.output, args.to)
    print(f"wrote {path} ({len(sd)} tensors)")
    return path


if __name__ == "__main__":
    main()
