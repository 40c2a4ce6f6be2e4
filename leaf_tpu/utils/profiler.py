"""Model profiler: params / FLOPs / activation cost over the model zoo.

TPU-native equivalent of the reference profiler
(`/root/reference/src/open_clip_train/profiler.py`): instead of fvcore
and torch.profiler, XLA's own cost model — `jit(...).lower().compile()
.cost_analysis()` — provides compiled FLOPs and bytes-accessed; the
CLI sweeps the registry and writes the same kind of CSV.

Usage: python -m leaf_tpu.utils.profiler --model ViT-B-32 [--results out.csv]
"""
from __future__ import annotations

import argparse
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config, list_models
from leaf_tpu.models.clip import count_params


def _profile_coca(model_name: str, batch_size: int,
                  dtype=jnp.float32) -> Dict[str, float]:
    """CoCa models have their own config/param layout; profile the two
    contrastive encoders (the captioning decoder rides the text cost)."""
    from leaf_tpu.models import coca
    cfg = coca.get_coca_config(model_name)
    params = coca.init_coca(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((batch_size, cfg.text.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(49406).at[:, 1].set(49407)
    images = jnp.zeros((batch_size, cfg.vision.image_size,
                        cfg.vision.image_size, 3), dtype)

    def cost(fn, *args):
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return ca or {}

    img_cost = cost(lambda p, x: coca.encode_image_coca(
        p, cfg, x, dtype=dtype)[0], params, images)
    txt_cost = cost(lambda p, t: coca.encode_text_coca(
        p, cfg, t, dtype=dtype)[0], params, tokens)
    return {
        "model": model_name,
        "image_size": cfg.vision.image_size,
        "image_width": cfg.vision.width,
        "text_width": cfg.text.width,
        "embed_dim": cfg.embed_dim,
        "mparams": count_params(params) / 1e6,
        "mparams_image": count_params(params["visual"]) / 1e6,
        "mparams_text": count_params(params["text"]) / 1e6,
        "gflops_image": float(img_cost.get("flops", 0)) / 1e9,
        "gflops_text": float(txt_cost.get("flops", 0)) / 1e9,
        "gbytes_image": float(img_cost.get("bytes accessed", 0)) / 1e9,
        "gbytes_text": float(txt_cost.get("bytes accessed", 0)) / 1e9,
    }


def profile_model(model_name: str, batch_size: int = 1,
                  dtype=jnp.float32) -> Dict[str, float]:
    from leaf_tpu.models.coca import COCA_CONFIGS
    if model_name in COCA_CONFIGS:
        return _profile_coca(model_name, batch_size, dtype)
    cfg = get_model_config(model_name)
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((batch_size, cfg.text.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(49406).at[:, 1].set(49407)
    images = jnp.zeros((batch_size, cfg.vision.image_size,
                        cfg.vision.image_size, 3), dtype)

    def image_fwd(p, x):
        # dispatcher handles ViT / ResNet / ConvNeXt towers
        return lclip.encode_image_model({"visual": p}, cfg, x, dtype=dtype)

    def text_fwd(p, t):
        return lclip.encode_text(p, cfg.text, t, cfg.quick_gelu,
                                 dtype=dtype)

    def cost(fn, *args):
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0] if ca else {}
        return ca or {}

    img_cost = cost(image_fwd, params["visual"], images)
    txt_cost = cost(text_fwd, params["text"], tokens)

    return {
        "model": model_name,
        "image_size": cfg.vision.image_size,
        "image_width": cfg.vision.width,
        "text_width": cfg.text.width,
        "embed_dim": cfg.embed_dim,
        "mparams": count_params(params) / 1e6,
        "mparams_image": count_params(params["visual"]) / 1e6,
        "mparams_text": count_params(params["text"]) / 1e6,
        "gflops_image": float(img_cost.get("flops", 0)) / 1e9,
        "gflops_text": float(txt_cost.get("flops", 0)) / 1e9,
        "gbytes_image": float(img_cost.get("bytes accessed", 0)) / 1e9,
        "gbytes_text": float(txt_cost.get("bytes accessed", 0)) / 1e9,
    }


def main(argv=None):
    p = argparse.ArgumentParser("leaf_tpu model profiler")
    p.add_argument("--model", type=str, default="ViT-B-32",
                   help="comma-sep model names, or 'all'")
    p.add_argument("--results", type=str, default=None, help="output csv")
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args(argv)

    names = (list(list_models()) if args.model == "all"
             else args.model.split(","))
    rows: List[Dict] = []
    for name in names:
        try:
            row = profile_model(name, args.batch_size)
        except Exception as e:  # noqa: BLE001 — sweep continues
            print(f"{name}: FAILED ({e})")
            continue
        rows.append(row)
        print(f"{name}: {row['mparams']:.1f}M params, "
              f"image {row['gflops_image']:.2f} GF, "
              f"text {row['gflops_text']:.2f} GF")
    if args.results and rows:
        import csv
        with open(args.results, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows


if __name__ == "__main__":
    main()
