"""Causal-prefix-reuse scoring: exactness vs the full encode.

The suffix path must be *bit-level-equivalent math* (same key sets,
same fp32 LN/softmax) — asserted to tight fp32 tolerance over real
attack candidates (leaf probes and phase-2 edits, incl. identical
filtered rows)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.attacks import edits
from leaf_tpu.attacks.engine import bucket_tokens
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.prefix_encode import (
    clean_kv,
    encode_text_suffix,
    suffix_split,
)
from leaf_tpu.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer(context_length=cfg.text.context_length)
    rng = np.random.default_rng(0)
    words = "stocks rally tech chip world cup final ancient fossil".split()
    texts = [" ".join(rng.choice(words, size=4)) for _ in range(8)]
    return cfg, params, tok, texts, rng


def _attack_candidates(texts, tok, rng, rho=6):
    """Real leaf probes: space substitution at rho random positions."""
    space_u = edits.DEFAULT_VOCAB.index(ord(" "))
    cands, sent_idx = [], []
    for i, s in enumerate(texts):
        for z in edits.sample_positions(len(s), rho, rng=rng):
            cands.append(edits.apply_edit(s, int(z), space_u,
                                          alternative=-1))
            sent_idx.append(i)
    # one identical row (the constraint-filter replacement case)
    cands.append(texts[0])
    sent_idx.append(0)
    return np.asarray(tok(cands)), np.asarray(sent_idx, np.int32)


def test_suffix_encode_matches_full(setup):
    cfg, params, tok, texts, rng = setup
    clean = bucket_tokens(np.asarray(tok(texts)))
    cand_full, sent_idx = _attack_candidates(texts, tok, rng)
    cand = bucket_tokens(cand_full)
    S = clean.shape[1]
    assert cand.shape[1] == S

    full = np.asarray(lclip.encode_text(
        params["text"], cfg.text, jnp.asarray(cand), cfg.quick_gelu,
        True, jnp.float32))

    suffix, prefix_len = suffix_split(cand, clean, sent_idx)
    assert suffix.shape[1] < S  # there must be actual savings
    ks, vs = clean_kv(params["text"], cfg.text, jnp.asarray(clean),
                      cfg.quick_gelu, jnp.float32)
    ours = np.asarray(jax.jit(
        lambda p, s, si, pl, k, v: encode_text_suffix(
            p, cfg.text, s, si, pl, k, v, cfg.quick_gelu, True,
            jnp.float32))(params["text"], jnp.asarray(suffix),
                          jnp.asarray(sent_idx), jnp.asarray(prefix_len),
                          ks, vs))
    np.testing.assert_allclose(ours, full, atol=2e-5, rtol=1e-5)


def test_suffix_split_identical_candidate(setup):
    cfg, params, tok, texts, rng = setup
    clean = bucket_tokens(np.asarray(tok(texts)))
    cand = clean[:1].copy()
    suffix, prefix_len = suffix_split(cand, clean,
                                      np.zeros(1, np.int32))
    eot = int(clean[0].argmax())
    assert prefix_len[0] == eot
    assert suffix[0, 0] == clean[0, eot]          # EOT re-derived


def test_suffix_split_bucket_padding(setup):
    cfg, params, tok, texts, rng = setup
    clean = bucket_tokens(np.asarray(tok(texts)))
    cand, sent_idx = _attack_candidates(texts, tok, rng)
    cand = bucket_tokens(cand)
    suffix, _ = suffix_split(cand, clean, sent_idx, bucket=4)
    assert suffix.shape[1] % 4 == 0


def test_suffix_encode_packed_matches_full(setup):
    cfg, params, tok, texts, rng = setup
    from leaf_tpu.models.prefix_encode import encode_text_suffix_packed
    clean = bucket_tokens(np.asarray(tok(texts)))
    cand, sent_idx = _attack_candidates(texts, tok, rng)
    cand = bucket_tokens(cand)
    # drop the +1 identical row so N divides evenly into pack groups
    n = (cand.shape[0] // 8) * 8
    cand, sent_idx = cand[:n], sent_idx[:n]

    full = np.asarray(lclip.encode_text(
        params["text"], cfg.text, jnp.asarray(cand), cfg.quick_gelu,
        True, jnp.float32))
    suffix, prefix_len = suffix_split(cand, clean, sent_idx, bucket=4)
    ks, vs = clean_kv(params["text"], cfg.text, jnp.asarray(clean),
                      cfg.quick_gelu, jnp.float32)
    ours = np.asarray(jax.jit(
        lambda p, s, si, pl, k, v: encode_text_suffix_packed(
            p, cfg.text, s, si, pl, k, v, cfg.quick_gelu, True,
            jnp.float32, target=32))(
        params["text"], jnp.asarray(suffix), jnp.asarray(sent_idx),
        jnp.asarray(prefix_len), ks, vs))
    np.testing.assert_allclose(ours, full, atol=2e-5, rtol=1e-5)
