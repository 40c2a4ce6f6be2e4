"""ViTamin trunk family (models/vitamin.py).

No timm oracle in this container (see PARITY.md): these tests pin the
registry surface, stride/shape arithmetic, and the timm checkpoint-key
ingestion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.factory import create_model
from leaf_tpu.models.vitamin import (
    ViTaminVisionSpec,
    encode_image_vitamin,
    init_vitamin,
    timm_vitamin_to_params,
)

VITAMIN_NAMES = ["ViTamin-S", "ViTamin-S-LTT", "ViTamin-B", "ViTamin-B-LTT",
                 "ViTamin-L", "ViTamin-L-256", "ViTamin-L-336",
                 "ViTamin-L2", "ViTamin-L2-256", "ViTamin-L2-336",
                 "ViTamin-XL-256", "ViTamin-XL-336", "ViTamin-XL-384"]

TINY = ViTaminVisionSpec(name="vitamin-tiny", image_size=32,
                         dims=(8, 16, 32), depths=(1, 2), vit_depth=2,
                         heads=2, output_dim=24)


def test_all_reference_vitamin_configs_resolve():
    for name in VITAMIN_NAMES:
        cfg = get_model_config(name)
        spec = cfg.trunk
        assert isinstance(spec, ViTaminVisionSpec), name
        assert cfg.embed_dim == spec.output_dim
    assert get_model_config("ViTamin-L").trunk.dims == (160, 320, 1024)
    assert get_model_config("ViTamin-L").trunk.vit_depth == 31
    assert get_model_config("ViTamin-XL-336").trunk.dims == (192, 384, 1152)
    # S-LTT shares the S trunk but projects to a 768-wide CLIP space
    assert get_model_config("ViTamin-S-LTT").trunk.dims[2] == 384
    assert get_model_config("ViTamin-S-LTT").embed_dim == 768


def test_tiny_end_to_end():
    model = create_model("vitamin-tiny-test")
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    f = lclip.encode_image_model(model.params, model.cfg, jnp.asarray(x),
                                 normalize=True)
    assert f.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1),
                               1.0, atol=1e-5)


def test_stride_16_token_grid():
    """stem /2 → stage1 /4 → stage2 /8 → vit embed /16."""
    params = init_vitamin(jax.random.PRNGKey(0), TINY)
    for size in (32, 64):
        spec = ViTaminVisionSpec(name="t", image_size=size,
                                 dims=(8, 16, 32), depths=(1, 2),
                                 vit_depth=2, heads=2, output_dim=24)
        x = jnp.zeros((1, size, size, 3))
        out = encode_image_vitamin(params, spec, x)
        assert out.shape == (1, 24)
        assert spec.grid_size == size // 16


def _synthetic_timm_sd(spec: ViTaminVisionSpec, seed: int = 0):
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    d0, d1, d2 = spec.dims
    be = "visual.trunk.patch_embed.backbone."
    sd = {
        be + "stem.conv1.weight": f(d0, 3, 3, 3),
        be + "stem.conv1.bias": f(d0),
        be + "stem.norm1.weight": 1 + f(d0),
        be + "stem.norm1.bias": f(d0),
        be + "stem.conv2.weight": f(d0, d0, 3, 3),
        be + "stem.conv2.bias": f(d0),
        be + "pool.norm.weight": 1 + f(d1),
        be + "pool.norm.bias": f(d1),
        be + "pool.proj.weight": f(d2, d1, 3, 3),
        be + "pool.proj.bias": f(d2),
        "visual.trunk.fc_norm.weight": 1 + f(d2),
        "visual.trunk.fc_norm.bias": f(d2),
        "visual.head.proj.weight": f(spec.output_dim, d2),
    }
    for si, (cin, cout) in enumerate([(d0, d0), (d0, d1)]):
        for bi in range(spec.depths[si]):
            b = f"{be}stages.{si}.blocks.{bi}."
            ci = cin if bi == 0 else cout
            mid = cout * spec.expand_ratio
            sd.update({
                b + "pre_norm.weight": 1 + f(ci),
                b + "pre_norm.bias": f(ci),
                b + "conv1_1x1.weight": f(mid, ci, 1, 1),
                b + "conv1_1x1.bias": f(mid),
                b + "conv2_kxk.weight": f(mid, 1, 3, 3),
                b + "conv2_kxk.bias": f(mid),
                b + "conv3_1x1.weight": f(cout, mid, 1, 1),
                b + "conv3_1x1.bias": f(cout),
            })
            if bi == 0 and ci != cout:
                # stride-2 block: Downsample2d = avgpool + 1x1 expand;
                # the expand conv exists only when channels change
                # (timm makes it Identity for cin == cout, so real
                # checkpoints carry no weights there)
                sd[b + "shortcut.expand.weight"] = f(cout, ci, 1, 1)
                sd[b + "shortcut.expand.bias"] = f(cout)
    for i in range(spec.vit_depth):
        b = f"visual.trunk.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + f(d2), b + "norm1.bias": f(d2),
            b + "attn.qkv.weight": f(3 * d2, d2),
            b + "attn.qkv.bias": f(3 * d2),
            b + "attn.proj.weight": f(d2, d2),
            b + "attn.proj.bias": f(d2),
            b + "norm2.weight": 1 + f(d2), b + "norm2.bias": f(d2),
            b + "mlp.norm.weight": 1 + f(d2), b + "mlp.norm.bias": f(d2),
            b + "mlp.w0.weight": f(2 * d2, d2), b + "mlp.w0.bias": f(2 * d2),
            b + "mlp.w1.weight": f(2 * d2, d2), b + "mlp.w1.bias": f(2 * d2),
            b + "mlp.w2.weight": f(d2, 2 * d2), b + "mlp.w2.bias": f(d2),
        })
    return sd


def test_timm_ingestion():
    sd = _synthetic_timm_sd(TINY)
    params = jax.tree.map(jnp.asarray, timm_vitamin_to_params(sd, TINY))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3),
                    jnp.float32)
    out = encode_image_vitamin(params, TINY, x, normalize=True)
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()
    # perturbing a mapped key changes the output (guards mis-mapping)
    sd2 = dict(sd)
    k = "visual.trunk.patch_embed.backbone.stem.conv1.weight"
    # random (not uniform) noise — a constant shift across channels
    # would be cancelled exactly by the next LayerNorm
    sd2[k] = sd2[k] + 0.1 * np.random.RandomState(7).randn(
        *sd2[k].shape).astype(np.float32)
    params2 = jax.tree.map(jnp.asarray, timm_vitamin_to_params(sd2, TINY))
    assert np.abs(np.asarray(encode_image_vitamin(params2, TINY, x,
                                                  normalize=True))
                  - np.asarray(out)).max() > 1e-5


def test_interop_routes_vitamin_checkpoints():
    from leaf_tpu.models.interop import openclip_to_params
    cfg = get_model_config("vitamin-tiny-test")
    sd = _synthetic_timm_sd(cfg.trunk)
    r = np.random.RandomState(9)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    tw, tl = cfg.text.width, cfg.text.layers
    sd.update({
        "text.token_embedding.weight": f(cfg.text.vocab_size, tw),
        "text.positional_embedding": f(cfg.text.context_length, tw),
        "text.ln_final.weight": 1 + f(tw),
        "text.ln_final.bias": f(tw),
        "text.text_projection": f(tw, cfg.embed_dim),
        "logit_scale": np.float32(2.6592),
    })
    for i in range(tl):
        b = f"text.transformer.resblocks.{i}."
        sd.update({
            b + "ln_1.weight": 1 + f(tw), b + "ln_1.bias": f(tw),
            b + "attn.in_proj_weight": f(3 * tw, tw),
            b + "attn.in_proj_bias": f(3 * tw),
            b + "attn.out_proj.weight": f(tw, tw),
            b + "attn.out_proj.bias": f(tw),
            b + "ln_2.weight": 1 + f(tw), b + "ln_2.bias": f(tw),
            b + "mlp.c_fc.weight": f(4 * tw, tw),
            b + "mlp.c_fc.bias": f(4 * tw),
            b + "mlp.c_proj.weight": f(tw, 4 * tw),
            b + "mlp.c_proj.bias": f(tw),
        })
    params = jax.tree.map(jnp.asarray, openclip_to_params(sd, cfg))
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3),
                    jnp.float32)
    out = lclip.encode_image_model(params, cfg, x, normalize=True)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
