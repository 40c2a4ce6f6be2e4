"""EVA trunk family (models/eva.py).

No timm in this container, so there is no weight-level oracle for
these trunks (documented in PARITY.md); these tests pin the registry
surface, the architectural invariants the implementation relies on,
and the timm checkpoint-key ingestion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.eva import (
    EvaVisionSpec,
    encode_image_eva,
    init_eva,
    rope_sin_cos,
    timm_eva_to_params,
)
from leaf_tpu.models.factory import create_model

EVA_NAMES = ["EVA01-g-14", "EVA01-g-14-plus", "EVA02-B-16", "EVA02-L-14",
             "EVA02-L-14-336", "EVA02-E-14", "EVA02-E-14-plus"]


TINY = EvaVisionSpec(name="eva-tiny", image_size=32, patch_size=8,
                     width=64, layers=2, heads=2, mlp_hidden=128,
                     output_dim=64, swiglu=True, rope=True,
                     inner_attn_ln=True, mlp_ln=True, fused_qkv=False,
                     ref_feat_size=4)


def test_all_reference_eva_configs_resolve():
    """Every EVA*.json name from the reference registry resolves with
    the right trunk flags (reference model_configs/EVA02-L-14.json →
    timm eva02_large_patch14_clip_224)."""
    for name in EVA_NAMES:
        cfg = get_model_config(name)
        spec = cfg.trunk
        assert isinstance(spec, EvaVisionSpec), name
        if name.startswith("EVA01"):
            assert spec.fused_qkv and not spec.swiglu and not spec.rope
            assert spec.width == 1408 and spec.layers == 40
            assert spec.mlp_hidden == 6144
        elif "E-14" in name:
            assert spec.post_norm and not spec.swiglu and not spec.rope
            assert spec.width == 1792 and spec.layers == 64
        else:
            assert spec.swiglu and spec.rope and spec.inner_attn_ln
            assert not spec.fused_qkv and spec.mlp_ln
    assert get_model_config("EVA02-L-14-336").trunk.image_size == 336


def test_eva_tiny_end_to_end():
    model = create_model("eva-tiny-test")
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    f = lclip.encode_image_model(model.params, model.cfg, jnp.asarray(x),
                                 normalize=True)
    assert f.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1),
                               1.0, atol=1e-5)
    # text side + joint forward work through the standard machinery
    tokens = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 5].set(2)
    out = lclip.forward(model.params, model.cfg, jnp.asarray(x), tokens)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)


def test_rope_table_semantics():
    """Pin the timm RotaryEmbeddingCat construction: position 0 rows
    are (sin=0, cos=1); tables rescale positions by ref/grid; each
    frequency occupies an adjacent (even, odd) pair."""
    sc = rope_sin_cos(TINY)                  # grid 4, head_dim 32
    assert sc.shape == (2, 16, 32)
    sin, cos = sc
    # token (0, 0): both axes position 0
    np.testing.assert_allclose(sin[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(cos[0], 1.0, atol=1e-7)
    # pair-interleave: feature 2i and 2i+1 share a frequency
    np.testing.assert_allclose(sin[:, 0::2], sin[:, 1::2], atol=1e-7)
    # row axis occupies the first half of the bands, col axis the rest:
    # token (0, j) has zero row-axis freqs
    np.testing.assert_allclose(sin[3, :16], 0.0, atol=1e-7)
    assert np.abs(sin[3, 16:]).max() > 0
    # ref_feat_shape rescale: position grid 4 → ref 4 keeps t=arange
    t1 = np.sin(1.0)                         # band 0 freq = 1, pos 1
    np.testing.assert_allclose(sin[4, 0], t1, atol=1e-6)


def test_rope_preserves_token_norms():
    """Rotation is an isometry per token — pure rotation, no scaling."""
    from leaf_tpu.models.eva import _apply_rope
    sc = jnp.asarray(rope_sin_cos(TINY))
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32))
    q2 = _apply_rope(q, sc[0], sc[1])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q2), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1),
                               rtol=1e-5)


def test_fused_k_bias_is_softmax_invariant():
    """The EVA01 ingestion folds (q_bias, 0, v_bias) into a fused qkv
    bias; this is exact because a constant key bias shifts every logit
    of a query equally."""
    spec = EvaVisionSpec(name="t", image_size=32, patch_size=8, width=64,
                         layers=2, heads=2, mlp_hidden=128, output_dim=32)
    params = init_eva(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                    jnp.float32)
    base = encode_image_eva(params, spec, x)
    kb = params["blocks"]["attn"]["qkv_b"]
    kb = kb.at[:, 64:128].set(
        jax.random.normal(jax.random.PRNGKey(2), (2, 64)))
    params["blocks"]["attn"]["qkv_b"] = kb
    np.testing.assert_allclose(np.asarray(
        encode_image_eva(params, spec, x)), np.asarray(base), atol=1e-5)


def _synthetic_timm_sd(spec: EvaVisionSpec, seed: int = 0):
    """Numpy state dict in timm Eva key layout for `spec`."""
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    D, Hn, L = spec.width, spec.mlp_hidden, spec.layers
    sd = {
        "visual.trunk.patch_embed.proj.weight":
            f(D, 3, spec.patch_size, spec.patch_size),
        "visual.trunk.patch_embed.proj.bias": f(D),
        "visual.trunk.cls_token": f(1, 1, D),
        "visual.trunk.pos_embed": f(1, spec.grid_size ** 2 + 1, D),
        "visual.trunk.norm.weight": 1 + f(D),
        "visual.trunk.norm.bias": f(D),
        "visual.trunk.head.weight": f(spec.output_dim, D),
        "visual.trunk.head.bias": f(spec.output_dim),
    }
    for i in range(L):
        b = f"visual.trunk.blocks.{i}."
        sd[b + "norm1.weight"] = 1 + f(D)
        sd[b + "norm1.bias"] = f(D)
        sd[b + "norm2.weight"] = 1 + f(D)
        sd[b + "norm2.bias"] = f(D)
        if spec.fused_qkv:
            sd[b + "attn.qkv.weight"] = f(3 * D, D)
            sd[b + "attn.q_bias"] = f(D)
            sd[b + "attn.v_bias"] = f(D)
        else:
            sd[b + "attn.q_proj.weight"] = f(D, D)
            sd[b + "attn.q_proj.bias"] = f(D)
            sd[b + "attn.k_proj.weight"] = f(D, D)
            sd[b + "attn.v_proj.weight"] = f(D, D)
            sd[b + "attn.v_proj.bias"] = f(D)
        sd[b + "attn.proj.weight"] = f(D, D)
        sd[b + "attn.proj.bias"] = f(D)
        if spec.inner_attn_ln:
            sd[b + "attn.norm.weight"] = 1 + f(D)
            sd[b + "attn.norm.bias"] = f(D)
        if spec.swiglu:
            sd[b + "mlp.fc1_g.weight"] = f(Hn, D)
            sd[b + "mlp.fc1_g.bias"] = f(Hn)
            sd[b + "mlp.fc1_x.weight"] = f(Hn, D)
            sd[b + "mlp.fc1_x.bias"] = f(Hn)
            sd[b + "mlp.fc2.weight"] = f(D, Hn)
            sd[b + "mlp.fc2.bias"] = f(D)
        else:
            sd[b + "mlp.fc1.weight"] = f(Hn, D)
            sd[b + "mlp.fc1.bias"] = f(Hn)
            sd[b + "mlp.fc2.weight"] = f(D, Hn)
            sd[b + "mlp.fc2.bias"] = f(D)
        if spec.mlp_ln:
            sd[b + "mlp.norm.weight"] = 1 + f(Hn)
            sd[b + "mlp.norm.bias"] = f(Hn)
    return sd


@pytest.mark.parametrize("variant", ["eva01", "eva02", "postnorm"])
def test_timm_ingestion_layouts(variant):
    """Every timm key layout (fused EVA01 / split EVA02 / post-norm E)
    maps onto a runnable pytree with all keys consumed."""
    spec = {
        "eva01": EvaVisionSpec(name="t", image_size=32, patch_size=8,
                               width=64, layers=2, heads=2,
                               mlp_hidden=280, output_dim=48),
        "eva02": TINY,
        "postnorm": EvaVisionSpec(name="t", image_size=32, patch_size=8,
                                  width=64, layers=2, heads=2,
                                  mlp_hidden=128, output_dim=48,
                                  post_norm=True),
    }[variant]
    sd = _synthetic_timm_sd(spec)
    params = jax.tree.map(jnp.asarray, timm_eva_to_params(sd, spec))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3),
                    jnp.float32)
    out = encode_image_eva(params, spec, x, normalize=True)
    assert out.shape == (2, spec.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # changing the (ignored) k-bias-free slot must not alter results;
    # changing q must: guards against silent mis-mapping
    sd2 = dict(sd)
    key = ("visual.trunk.blocks.0.attn.qkv.weight" if spec.fused_qkv
           else "visual.trunk.blocks.0.attn.q_proj.weight")
    sd2[key] = sd2[key] + 0.1
    params2 = jax.tree.map(jnp.asarray, timm_eva_to_params(sd2, spec))
    assert np.abs(np.asarray(encode_image_eva(params2, spec, x,
                                              normalize=True))
                  - np.asarray(out)).max() > 1e-5


def test_post_norm_differs_from_pre_norm():
    spec_pre = EvaVisionSpec(name="t", image_size=32, patch_size=8,
                             width=64, layers=2, heads=2, mlp_hidden=128,
                             output_dim=48)
    spec_post = EvaVisionSpec(name="t", image_size=32, patch_size=8,
                              width=64, layers=2, heads=2, mlp_hidden=128,
                              output_dim=48, post_norm=True)
    params = init_eva(jax.random.PRNGKey(0), spec_pre)
    # same params, different wiring — identical outputs would mean the
    # post_norm flag is dead
    x = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32, 3),
                    jnp.float32)
    a = np.asarray(encode_image_eva(params, spec_pre, x))
    b = np.asarray(encode_image_eva(params, spec_post, x))
    assert np.abs(a - b).max() > 1e-4


def test_interop_routes_eva_trunk_checkpoints():
    """openclip_to_params auto-detects `visual.trunk.` + routes to the
    EVA ingestion when the config carries an Eva spec."""
    from leaf_tpu.models.interop import openclip_to_params
    cfg = get_model_config("eva-tiny-test")
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
