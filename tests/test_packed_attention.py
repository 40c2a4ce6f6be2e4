"""Parity tests for the Pallas packed-attention kernel (interpret mode).

The kernel must be bit-compatible (up to fp reassociation) with the
XLA path `layers.attention` + `packed_block_mask` for every (S, G,
causal) combination the encoder produces, including the padded
single-group 77-token case, and its custom_vjp gradient must match.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leaf_tpu.models import clip as lclip
from leaf_tpu.models import layers
from leaf_tpu.ops.packed_attention import _reference, packed_attention


def _mk_qkv(rng, R, L, D3, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal((R, L, D3)) * 0.1, dtype)


@pytest.mark.parametrize("S,G,causal", [
    (16, 8, True),    # the bucketed-candidate hot case
    (16, 8, False),
    (32, 4, True),
    (77, 1, True),    # unpacked clean-token case (row padded 77 -> 128)
    (13, 3, True),    # L=39: padding + odd group length
])
def test_kernel_matches_xla_attention(S, G, causal):
    rng = np.random.default_rng(0)
    R, H, hd = 3, 4, 16
    D = H * hd
    L = G * S
    qkv = _mk_qkv(rng, R, L, 3 * D)

    out = packed_attention(qkv, H, S, causal, interpret=True)

    # oracle 1: the token-major einsum reference
    ref = _reference(qkv, H, S, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # oracle 2: layers.attention with the additive packed mask, fed the
    # same qkv by zeroing the projection weights appropriately
    p = {"qkv_w": jnp.eye(D, 3 * D), "qkv_b": jnp.zeros(3 * D),
         "out_w": jnp.eye(D), "out_b": jnp.zeros(D)}
    # x such that x @ qkv_w == qkv requires inverting; instead compare
    # attention cores directly: build mask and run the einsum core
    mask = lclip.packed_block_mask(S, G, causal)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(R, L, H, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k),
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    logits = logits + jnp.asarray(mask)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    core = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
    core = core.transpose(0, 2, 1, 3).reshape(R, L, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(core),
                               atol=1e-5, rtol=1e-5)


def test_kernel_bf16_close():
    rng = np.random.default_rng(1)
    qkv = _mk_qkv(rng, 2, 64, 3 * 64, jnp.bfloat16)
    out = packed_attention(qkv, 4, 16, True, interpret=True)
    ref = _reference(qkv, 4, 16, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_gradient_matches_reference():
    rng = np.random.default_rng(2)
    qkv = _mk_qkv(rng, 2, 32, 3 * 32)

    def f_kernel(t):
        return jnp.sum(jnp.sin(packed_attention(t, 2, 8, True,
                                                interpret=True)))

    def f_ref(t):
        return jnp.sum(jnp.sin(_reference(t, 2, 8, True)))

    g1 = jax.grad(f_kernel)(qkv)
    g2 = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_encode_text_kernel_path_equivalent(monkeypatch):
    """encode_text with the kernel forced on (interpret on CPU) must
    reproduce the default XLA path — packed and unpacked branches."""
    from leaf_tpu.models import create_model

    monkeypatch.delenv("LEAF_TPU_PACKED_ATTN", raising=False)
    model = create_model("ViT-tiny-test")
    cfg = model.cfg
    rng = np.random.default_rng(3)
    C = cfg.text.context_length
    tokens = rng.integers(1, cfg.text.vocab_size - 2,
                          size=(8, 16)).astype(np.int32)
    tokens[:, 0] = cfg.text.vocab_size - 2
    tokens[:, -1] = cfg.text.vocab_size - 1

    base = lclip.encode_text(model.params["text"], cfg.text,
                             jnp.asarray(tokens), cfg.quick_gelu)
    monkeypatch.setenv("LEAF_TPU_PACKED_ATTN", "1")
    kern = lclip.encode_text(model.params["text"], cfg.text,
                             jnp.asarray(tokens), cfg.quick_gelu)
    np.testing.assert_allclose(np.asarray(base), np.asarray(kern),
                               atol=1e-5, rtol=1e-5)


def test_enabled_flag(monkeypatch):
    from leaf_tpu.ops.packed_attention import enabled

    monkeypatch.setenv("LEAF_TPU_PACKED_ATTN", "0")
    assert not enabled()
    monkeypatch.setenv("LEAF_TPU_PACKED_ATTN", "1")
    assert enabled()
    monkeypatch.delenv("LEAF_TPU_PACKED_ATTN")
    # auto mode on the CPU test backend: off
    assert not enabled()


@pytest.mark.parametrize("S,G,causal", [(16, 8, True), (13, 3, False),
                                        (77, 1, True)])
def test_fused_block_matches_reference(S, G, causal):
    from leaf_tpu.ops.packed_attention import (_block_reference,
                                               fused_attention_block)

    rng = np.random.default_rng(4)
    R, H, hd = 4, 4, 16
    D = H * hd
    L = G * S
    x = jnp.asarray(rng.standard_normal((R, L, D)) * 0.1, jnp.float32)
    p = {"ln_1": {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(D),
                                       jnp.float32),
                  "bias": jnp.asarray(0.1 * rng.standard_normal(D),
                                      jnp.float32)},
         "attn": {"qkv_w": jnp.asarray(0.1 * rng.standard_normal((D, 3 * D)),
                                       jnp.float32),
                  "qkv_b": jnp.asarray(0.1 * rng.standard_normal(3 * D),
                                       jnp.float32),
                  "out_w": jnp.asarray(0.1 * rng.standard_normal((D, D)),
                                       jnp.float32),
                  "out_b": jnp.asarray(0.1 * rng.standard_normal(D),
                                       jnp.float32)}}
    out = fused_attention_block(p, x, H, S, causal, 1e-5, interpret=True)
    ref = _block_reference(p, x, H, S, causal, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)

    # and against layers.residual_block's attention half
    from leaf_tpu.models import clip as lclip
    from leaf_tpu.models import layers
    mask = lclip.packed_block_mask(S, G, causal)
    half = x + layers.attention(p["attn"],
                                layers.layer_norm(p["ln_1"], x, 1e-5),
                                jnp.asarray(mask), H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(half),
                               atol=1e-5, rtol=1e-4)


def test_fused_block_gradients():
    from leaf_tpu.ops.packed_attention import (_block_reference,
                                               fused_attention_block)

    rng = np.random.default_rng(5)
    H, hd, S, G, R = 2, 8, 8, 4, 2
    D = H * hd
    L = G * S
    x = jnp.asarray(rng.standard_normal((R, L, D)) * 0.1, jnp.float32)
    p = {"ln_1": {"scale": jnp.ones(D), "bias": jnp.zeros(D)},
         "attn": {"qkv_w": jnp.asarray(0.1 * rng.standard_normal((D, 3 * D)),
                                       jnp.float32),
                  "qkv_b": jnp.zeros(3 * D),
                  "out_w": jnp.asarray(0.1 * rng.standard_normal((D, D)),
                                       jnp.float32),
                  "out_b": jnp.zeros(D)}}

    def f_kernel(p_, x_):
        return jnp.sum(jnp.sin(fused_attention_block(p_, x_, H, S, True,
                                                     1e-5, interpret=True)))

    def f_ref(p_, x_):
        return jnp.sum(jnp.sin(_block_reference(p_, x_, H, S, True, 1e-5)))

    g1 = jax.grad(f_kernel, argnums=(0, 1))(p, x)
    g2 = jax.grad(f_ref, argnums=(0, 1))(p, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4), g1, g2)


def test_fused_block_supported_cutoff():
    from leaf_tpu.ops.packed_attention import fused_block_supported

    assert fused_block_supported(768, jnp.bfloat16)
    assert fused_block_supported(1024, jnp.bfloat16)
    assert not fused_block_supported(1280, jnp.float32)


def test_packed_attention_supported_cutoff():
    """fp32 ViT-L vision shapes (D=1024, 257 tokens → L_pad 384) blow
    the standalone kernel's 16 MB scoped-VMEM budget (measured
    compile-time OOM at 16.61 MB on v5e) and must take the XLA path;
    bf16 at the same shape and fp32 at text shapes fit."""
    from leaf_tpu.ops.packed_attention import packed_attention_supported

    assert not packed_attention_supported(1024, jnp.float32, 257)
    assert not packed_attention_supported(1280, jnp.float32, 257)
    assert packed_attention_supported(1024, jnp.bfloat16, 257)
    assert packed_attention_supported(1280, jnp.bfloat16, 257)
    assert packed_attention_supported(768, jnp.float32, 128)
