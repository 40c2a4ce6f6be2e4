"""Swin + relpos-ViT trunk families (models/swin.py, models/relpos_vit.py).

No timm in this container, so no weight-level oracle (documented in
PARITY.md); these tests pin the registry surface, the windowing /
relative-position machinery invariants, and checkpoint-key ingestion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models import relpos_vit, swin
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.factory import create_model
from leaf_tpu.models.relpos_vit import (
    RelPosViTSpec,
    encode_image_relpos,
    init_relpos,
    timm_relpos_to_params,
)
from leaf_tpu.models.swin import (
    SwinVisionSpec,
    encode_image_swin,
    init_swin,
    shift_attn_mask,
    timm_swin_to_params,
)

SWIN_TINY = SwinVisionSpec(name="swin-tiny", image_size=32, patch_size=4,
                           embed_dim=16, depths=(2, 2), heads=(2, 4),
                           window=4, output_dim=64)
RELPOS_TINY = RelPosViTSpec(name="relpos-tiny", image_size=32, patch_size=8,
                            width=64, layers=2, heads=2, rel_pos_dim=16,
                            output_dim=64)


# -- registry ----------------------------------------------------------------

def test_reference_configs_resolve():
    cfg = get_model_config("swin_base_patch4_window7_224")
    s = cfg.trunk
    assert isinstance(s, SwinVisionSpec)
    assert s.depths == (2, 2, 18, 2) and s.heads == (4, 8, 16, 32)
    assert s.embed_dim == 128 and s.window == 7 and cfg.embed_dim == 640
    cfg = get_model_config("vit_relpos_medium_patch16_cls_224")
    r = cfg.trunk
    assert isinstance(r, RelPosViTSpec)
    assert r.width == 512 and r.heads == 8 and r.layers == 12
    assert not r.qkv_bias and r.rel_pos_dim == 256


def test_unknown_family_names_raise():
    with pytest.raises(ValueError, match="unsupported swin trunk"):
        swin.match_swin("swin_large_patch4_window12_384", 640)
    with pytest.raises(ValueError, match="unsupported relpos"):
        relpos_vit.match_relpos("vit_relpos_base_patch16_224", 512)


@pytest.mark.parametrize("name", ["swin-tiny-test", "relpos-tiny-test"])
def test_tiny_end_to_end(name):
    model = create_model(name)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    f = lclip.encode_image_model(model.params, model.cfg, jnp.asarray(x),
                                 normalize=True)
    assert f.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1),
                               1.0, atol=1e-5)
    tokens = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 5].set(2)
    out = lclip.forward(model.params, model.cfg, jnp.asarray(x), tokens)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)


# -- swin window machinery ---------------------------------------------------

def test_swin_rel_pos_index():
    idx = swin.rel_pos_index(3)
    assert idx.shape == (9, 9)
    center = (3 - 1) * (2 * 3 - 1) + (3 - 1)     # Δ == 0 row of the table
    assert (np.diag(idx) == center).all()
    # relative index is translation-dependent only: pairs with the same
    # (Δy, Δx) share a table row
    assert idx[0, 1] == idx[1, 2] == idx[3, 4]
    # and antisymmetric pairs differ unless Δ == 0
    assert idx[0, 1] != idx[1, 0]


def test_swin_shift_mask_blocks_cross_region_pairs():
    grid, w, s = 8, 4, 2
    m = shift_attn_mask(grid, w, s)
    assert m.shape == ((grid // w) ** 2, w * w, w * w)
    # window 0 (top-left) contains one contiguous pre-shift region →
    # fully attendable; the bottom-right window mixes 4 regions
    assert (m[0] == 0).all()
    assert (m[-1] < 0).any()
    # mask is symmetric (token a sees b iff b sees a)
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))


def test_swin_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 5))
    y = swin._window_partition(x, 4)
    assert y.shape == (2 * 4, 16, 5)
    back = swin._window_reverse(y, 4, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_patch_merge_concat_order():
    """Pin the [x00, x10, x01, x11] neighbour order (timm/MSRA
    PatchMerging) — a silent order swap would still run but scramble
    ingested reduction weights."""
    B, H, W, C = 1, 4, 4, 2
    x = np.zeros((B, H, W, C), np.float32)
    x[0, 0, 0] = 1          # row-even col-even  → slot 0
    x[0, 1, 0] = 2          # row-odd  col-even  → slot 1
    x[0, 0, 1] = 3          # row-even col-odd   → slot 2
    x[0, 1, 1] = 4          # row-odd  col-odd   → slot 3
    p = {"norm": {"scale": jnp.ones((4 * C,)), "bias": jnp.zeros((4 * C,))},
         "reduction": jnp.eye(4 * C, 2 * C)}
    # bypass LN distortion: identity scale, then check pre-reduction
    # layout via a reduction that picks out each slot
    merged = swin._patch_merge(p, jnp.asarray(x), 1e-5)
    assert merged.shape == (1, 2, 2, 2 * C)
    # reconstruct the pre-LN concat directly
    xr = jnp.asarray(x).reshape(B, 2, 2, 2, 2, C)
    concat = xr.transpose(0, 1, 3, 4, 2, 5).reshape(B, 2, 2, 4 * C)
    want = np.asarray(concat)[0, 0, 0]
    assert want[0 * C] == 1 and want[1 * C] == 2
    assert want[2 * C] == 3 and want[3 * C] == 4


def test_swin_shift_mask_is_live(monkeypatch):
    """Zeroing the shift mask must change the encoding — proves the
    mask (and so the shifted-window path) is actually applied."""
    params = init_swin(jax.random.PRNGKey(0), SWIN_TINY)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                    jnp.float32)
    base = np.asarray(encode_image_swin(params, SWIN_TINY, x))
    monkeypatch.setattr(
        swin, "shift_attn_mask",
        lambda grid, w, s: np.zeros(((grid // w) ** 2, w * w, w * w),
                                    np.float32))
    nomask = np.asarray(encode_image_swin(params, SWIN_TINY, x))
    assert np.abs(base - nomask).max() > 1e-6


def test_swin_window_clamp_when_grid_small():
    # stage 1 of the tiny spec: grid 4 == window 4 → shift disabled
    assert SWIN_TINY.stage_window(1) == 4
    spec = SwinVisionSpec(name="t", image_size=16, patch_size=4,
                          embed_dim=16, depths=(2,), heads=(2,), window=7,
                          output_dim=32)
    assert spec.stage_window(0) == 4          # clamped to the grid


# -- relpos machinery --------------------------------------------------------

def test_relpos_log_coords():
    c = relpos_vit.rel_log_coords(3)
    assert c.shape == (25, 2)
    # antisymmetric sign-log: entry for Δ and -Δ are negatives
    np.testing.assert_allclose(c, -c[::-1], atol=1e-6)
    # center row is Δ == (0, 0)
    np.testing.assert_allclose(c[12], 0.0, atol=1e-7)
    np.testing.assert_allclose(c[-1], np.log1p(2.0), atol=1e-6)


def test_relpos_bias_zero_padded_for_cls():
    spec = RELPOS_TINY
    params = init_relpos(jax.random.PRNGKey(0), spec)
    p = jax.tree.map(lambda v: v[0], params["blocks"]["attn"]["rel_pos"])
    g = spec.grid_size
    bias = relpos_vit._rel_pos_bias(
        p, jnp.asarray(relpos_vit.rel_log_coords(g)),
        jnp.asarray(relpos_vit.rel_pos_index(g)), spec.heads, jnp.float32)
    N = g * g + 1
    assert bias.shape == (spec.heads, N, N)
    np.testing.assert_allclose(np.asarray(bias[:, 0, :]), 0.0)
    np.testing.assert_allclose(np.asarray(bias[:, :, 0]), 0.0)
    assert np.abs(np.asarray(bias[:, 1:, 1:])).max() > 0


def test_relpos_bias_translation_equivariance():
    """The bias for pairs with equal (Δy, Δx) must be identical — the
    whole point of relative attention."""
    g = 4
    idx = relpos_vit.rel_pos_index(g)
    # token (0,0)→(1,1) and (2,2)→(3,3) share Δ=(1,1)
    assert idx[0 * g + 0, 1 * g + 1] == idx[2 * g + 2, 3 * g + 3]


# -- checkpoint ingestion ----------------------------------------------------

def _relpos_timm_sd(spec: RelPosViTSpec, seed=0):
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    D, Hn, L, R = spec.width, spec.mlp_hidden, spec.layers, spec.rel_pos_dim
    sd = {
        "visual.trunk.patch_embed.proj.weight":
            f(D, 3, spec.patch_size, spec.patch_size),
        "visual.trunk.patch_embed.proj.bias": f(D),
        "visual.trunk.cls_token": f(1, 1, D),
        "visual.trunk.norm.weight": 1 + f(D),
        "visual.trunk.norm.bias": f(D),
        "visual.head.proj.weight": f(spec.output_dim, D),
    }
    for i in range(L):
        b = f"visual.trunk.blocks.{i}."
        sd.update({
            b + "norm1.weight": 1 + f(D), b + "norm1.bias": f(D),
            b + "norm2.weight": 1 + f(D), b + "norm2.bias": f(D),
            b + "attn.qkv.weight": f(3 * D, D),
            b + "attn.proj.weight": f(D, D), b + "attn.proj.bias": f(D),
            b + "attn.rel_pos.mlp.fc1.weight": f(R, 2),
            b + "attn.rel_pos.mlp.fc1.bias": f(R),
            b + "attn.rel_pos.mlp.fc2.weight": f(spec.heads, R),
            b + "attn.rel_pos.mlp.fc2.bias": f(spec.heads),
            b + "mlp.fc1.weight": f(Hn, D), b + "mlp.fc1.bias": f(Hn),
            b + "mlp.fc2.weight": f(D, Hn), b + "mlp.fc2.bias": f(D),
        })
    return sd


def test_relpos_ingestion():
    spec = RELPOS_TINY
    sd = _relpos_timm_sd(spec)
    params = jax.tree.map(jnp.asarray, timm_relpos_to_params(sd, spec))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    out = encode_image_relpos(params, spec, x, normalize=True)
    assert out.shape == (2, spec.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # perturbation guard: the relpos mlp must be live
    sd2 = dict(sd)
    sd2["visual.trunk.blocks.0.attn.rel_pos.mlp.fc2.weight"] = \
        sd2["visual.trunk.blocks.0.attn.rel_pos.mlp.fc2.weight"] + 0.5
    params2 = jax.tree.map(jnp.asarray, timm_relpos_to_params(sd2, spec))
    out2 = encode_image_relpos(params2, spec, x, normalize=True)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-5


def _swin_timm_sd(spec: SwinVisionSpec, seed=0, old_layout=False):
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    D = spec.embed_dim
    last = spec.stage_dim(len(spec.depths) - 1)
    sd = {
        "visual.trunk.patch_embed.proj.weight":
            f(D, 3, spec.patch_size, spec.patch_size),
        "visual.trunk.patch_embed.proj.bias": f(D),
        "visual.trunk.patch_embed.norm.weight": 1 + f(D),
        "visual.trunk.patch_embed.norm.bias": f(D),
        "visual.trunk.norm.weight": 1 + f(last),
        "visual.trunk.norm.bias": f(last),
        "visual.head.proj.weight": f(spec.output_dim, last),
    }
    for s in range(len(spec.depths)):
        C = spec.stage_dim(s)
        Hn = int(C * spec.mlp_ratio)
        w = spec.stage_window(s)
        for i in range(spec.depths[s]):
            b = f"visual.trunk.layers.{s}.blocks.{i}."
            sd.update({
                b + "norm1.weight": 1 + f(C), b + "norm1.bias": f(C),
                b + "norm2.weight": 1 + f(C), b + "norm2.bias": f(C),
                b + "attn.qkv.weight": f(3 * C, C),
                b + "attn.qkv.bias": f(3 * C),
                b + "attn.proj.weight": f(C, C), b + "attn.proj.bias": f(C),
                b + "attn.relative_position_bias_table":
                    f((2 * w - 1) ** 2, spec.heads[s]),
                b + "mlp.fc1.weight": f(Hn, C), b + "mlp.fc1.bias": f(Hn),
                b + "mlp.fc2.weight": f(C, Hn), b + "mlp.fc2.bias": f(C),
            })
        if s > 0:
            Cin = spec.stage_dim(s - 1)
            ds = (f"visual.trunk.layers.{s - 1}.downsample." if old_layout
                  else f"visual.trunk.layers.{s}.downsample.")
            sd.update({
                ds + "norm.weight": 1 + f(4 * Cin),
                ds + "norm.bias": f(4 * Cin),
                ds + "reduction.weight": f(2 * Cin, 4 * Cin),
            })
    return sd


def test_swin_ingestion_both_layouts():
    """The rewritten-timm (entry downsample) and original (exit
    downsample) key layouts ingest to identical pytrees."""
    spec = SWIN_TINY
    new = timm_swin_to_params(_swin_timm_sd(spec), spec)
    old = timm_swin_to_params(_swin_timm_sd(spec, old_layout=True), spec)
    for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    params = jax.tree.map(jnp.asarray, new)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    out = encode_image_swin(params, spec, x, normalize=True)
    assert out.shape == (2, spec.output_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_interop_routes_swin_trunk_checkpoints():
    from leaf_tpu.models.interop import openclip_to_params
    cfg = get_model_config("swin-tiny-test")
    sd = _swin_timm_sd(cfg.trunk)
    r = np.random.RandomState(9)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    tw, tl = cfg.text.width, cfg.text.layers
    sd.update({
        "text.token_embedding.weight": f(cfg.text.vocab_size, tw),
        "text.positional_embedding": f(cfg.text.context_length, tw),
        "text.ln_final.weight": 1 + f(tw), "text.ln_final.bias": f(tw),
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
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3), jnp.float32)
    out = lclip.encode_image_model(params, cfg, x, normalize=True)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_trunk_families_remat_forward():
    """grad checkpointing must work for every trunk family — the swin
    stage checkpoint used to crash on the non-static spec argument."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from leaf_tpu.models import factory
    from leaf_tpu.models import trunks
    for name in ("swin-tiny-test", "relpos-tiny-test", "eva-tiny-test",
                 "mci-vit-tiny-test", "vitamin-tiny-test"):
        m = factory.create_model(name, None)
        x = jnp.zeros((1, m.cfg.vision.image_size,
                       m.cfg.vision.image_size, 3), jnp.float32)
        f = trunks.encode(m.params["visual"], m.cfg.trunk, x, remat=True)
        assert np.isfinite(np.asarray(f)).all(), name
