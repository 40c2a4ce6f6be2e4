"""CoCa smoke tests on a tiny config (fast CI; parity vs the reference
torch implementation lives in test_reference_parity.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import coca as lcoca
from leaf_tpu.models.coca import CoCaConfig, MultimodalConfig
from leaf_tpu.models.config import TextConfig, VisionConfig
from leaf_tpu.models.loss import coca_loss


@pytest.fixture(scope="module")
def tiny_coca():
    cfg = CoCaConfig(
        name="coca-tiny", embed_dim=64,
        text=TextConfig(context_length=12, vocab_size=1000, width=64,
                        heads=2, layers=2, output_dim=64),
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, head_width=32, output_dim=64),
        multimodal=MultimodalConfig(context_length=12, width=64, heads=2,
                                    layers=2, vocab_size=1000),
        n_queries=8, attn_pooler_heads=2)
    params = lcoca.init_coca(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, rng):
    B = 2
    S = cfg.text.context_length
    tokens = rng.integers(1, cfg.multimodal.vocab_size - 1, size=(B, S))
    tokens[:, 0] = 998
    tokens[:, 6] = 999
    tokens[:, 7:] = 0
    images = rng.standard_normal(
        (B, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(tokens)


def test_coca_forward_shapes(tiny_coca):
    cfg, params = tiny_coca
    images, tokens = make_batch(cfg, np.random.default_rng(0))
    out = jax.jit(lambda p, im, t: lcoca.forward(p, cfg, im, t))(
        params, images, tokens)
    B, S = tokens.shape
    assert out["image_features"].shape == (B, cfg.embed_dim)
    assert out["text_features"].shape == (B, cfg.embed_dim)
    assert out["logits"].shape == (B, S - 1, cfg.multimodal.vocab_size)
    assert out["labels"].shape == (B, S - 1)
    # contrastive latents are normalised
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)


def test_coca_loss_integration(tiny_coca):
    cfg, params = tiny_coca
    images, tokens = make_batch(cfg, np.random.default_rng(1))
    out = jax.jit(lambda p, im, t: lcoca.forward(p, cfg, im, t))(
        params, images, tokens)
    c, cap = coca_loss(out["image_features"], out["text_features"],
                       out["logits"], out["labels"],
                       out["logit_scale"])
    assert np.isfinite(float(c)) and np.isfinite(float(cap))
    # gradients flow to every tower
    def loss_fn(p):
        o = lcoca.forward(p, cfg, images, tokens)
        c, cap = coca_loss(o["image_features"], o["text_features"],
                           o["logits"], o["labels"], o["logit_scale"])
        return c + cap
    grads = jax.jit(jax.grad(loss_fn))(params)
    for tower in ("text", "visual", "text_decoder"):
        gmax = max(float(jnp.abs(g).max())
                   for g in jax.tree.leaves(grads[tower]))
        assert gmax > 0, tower


def test_coca_generate(tiny_coca):
    cfg, params = tiny_coca
    images, _ = make_batch(cfg, np.random.default_rng(2))
    out = jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=6, sot_token_id=998,
        eos_token_id=999))(images, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (2, cfg.multimodal.context_length)
    assert (out[:, 0] == 998).all()
    # generation is deterministic for top_k=1
    out2 = np.asarray(jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=6, sot_token_id=998,
        eos_token_id=999))(images, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(out, out2)


def test_decode_one_matches_full_forward(tiny_coca):
    """The KV-cached step (decode_one) reproduces the full
    encode_text_coca → decode logits at every position: the CLS sits at
    the END of the sequence so ordinary positions never attend to it,
    making the cache exact, not approximate."""
    cfg, params = tiny_coca
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    _, image_embs = lcoca.encode_image_coca(params, cfg, images)

    S = cfg.multimodal.context_length
    tokens = np.zeros((2, S), np.int32)
    tokens[:, 0] = 998
    tokens[:, 1:] = rng.integers(1, 900, size=(2, S - 1))

    _, token_embs = lcoca.encode_text_coca(params, cfg, jnp.asarray(tokens))
    full = np.asarray(lcoca.decode(params, cfg, image_embs, token_embs))

    cache = lcoca.init_generation_cache(params, cfg, image_embs)
    step = jax.jit(lambda t, p, c: lcoca.decode_one(params, cfg, t, p, c))
    for pos in range(S - 1):
        lg, cache = step(jnp.asarray(tokens[:, pos]), jnp.asarray(pos),
                         cache)
        np.testing.assert_allclose(np.asarray(lg), full[:, pos],
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"pos={pos}")


def test_cached_generation_matches_uncached(tiny_coca):
    """use_cache=True (the default) and the full-re-encode path make
    identical decisions for greedy sampling and for group beam search,
    including repetition penalty and min-length blocking."""
    cfg, params = tiny_coca
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    for kw in ({"top_k": 1}, {"top_k": 1, "repetition_penalty": 1.3}):
        a = jax.jit(lambda im, k: lcoca.generate(
            params, cfg, im, k, seq_len=9, min_seq_len=3, use_cache=True,
            sot_token_id=998, eos_token_id=999, **kw))(
                images, jax.random.PRNGKey(0))
        b = jax.jit(lambda im, k: lcoca.generate(
            params, cfg, im, k, seq_len=9, min_seq_len=3, use_cache=False,
            sot_token_id=998, eos_token_id=999, **kw))(
                images, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kw))

    a = jax.jit(lambda im: lcoca.generate_beamsearch(
        params, cfg, im, num_beams=4, num_beam_groups=2, min_seq_len=3,
        seq_len=9, repetition_penalty=1.2, use_cache=True,
        sot_token_id=998, eos_token_id=999))(images)
    b = jax.jit(lambda im: lcoca.generate_beamsearch(
        params, cfg, im, num_beams=4, num_beam_groups=2, min_seq_len=3,
        seq_len=9, repetition_penalty=1.2, use_cache=False,
        sot_token_id=998, eos_token_id=999))(images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_top_p_filter_matches_hf_warper():
    """top_p_filter vs the REAL HF TopPLogitsWarper (the class behind
    the reference's `generation_type="top_p"`, `coca_model.py:265-268`)
    on random logit batteries across top_p values, plus min_tokens_to_keep
    and an all-ties keep-count check."""
    torch = pytest.importorskip("torch")
    from transformers import TopPLogitsWarper

    rng = np.random.default_rng(11)
    for top_p in (0.1, 0.5, 0.9, 1.0):
        logits = rng.standard_normal((4, 257)).astype(np.float32) * 3
        ref = TopPLogitsWarper(top_p=top_p)(
            torch.zeros((4, 1), dtype=torch.long),
            torch.from_numpy(logits)).numpy()
        ours = np.asarray(lcoca.top_p_filter(jnp.asarray(logits), top_p))
        np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref),
                                      err_msg=f"top_p={top_p}")
        np.testing.assert_allclose(
            np.where(np.isinf(ours), 0.0, ours),
            np.where(np.isinf(ref), 0.0, ref), rtol=1e-6)
    # min_tokens_to_keep guards a peaked distribution at tiny top_p
    peaked = np.full((1, 50), -20.0, np.float32)
    peaked[0, 7] = 10.0
    out = np.asarray(lcoca.top_p_filter(jnp.asarray(peaked), 0.01))
    assert np.isfinite(out[0, 7]) and np.isinf(out[0, :7]).all()
    # exact ties: keep-count matches HF's (order within ties may differ)
    ties = np.zeros((1, 10), np.float32)
    ref = TopPLogitsWarper(top_p=0.35)(
        torch.zeros((1, 1), dtype=torch.long),
        torch.from_numpy(ties)).numpy()
    ours = np.asarray(lcoca.top_p_filter(jnp.asarray(ties), 0.35))
    assert np.isfinite(ours).sum() == np.isfinite(ref).sum()


def test_coca_generate_top_p(tiny_coca):
    """Nucleus sampling runs jitted, respects SOT/min-length, is
    deterministic per key, and top_p→tiny degenerates to greedy."""
    cfg, params = tiny_coca
    images, _ = make_batch(cfg, np.random.default_rng(4))
    gen = jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=8, top_p=0.9, min_seq_len=3,
        sot_token_id=998, eos_token_id=999))
    out = np.asarray(gen(images, jax.random.PRNGKey(0)))
    assert out.shape == (2, cfg.multimodal.context_length)
    assert (out[:, 0] == 998).all()
    assert not (out[:, 1:3] == 999).any()
    np.testing.assert_array_equal(
        out, np.asarray(gen(images, jax.random.PRNGKey(0))))
    # a vanishing nucleus keeps only the argmax → greedy decisions
    tiny = np.asarray(jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=8, top_p=1e-9, min_seq_len=3,
        sot_token_id=998, eos_token_id=999))(images, jax.random.PRNGKey(2)))
    greedy = np.asarray(jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=8, top_k=1, min_seq_len=3,
        sot_token_id=998, eos_token_id=999))(images, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(tiny, greedy)


def test_coca_registry():
    cfg = lcoca.get_coca_config("coca_ViT-B-32")
    assert cfg.embed_dim == 512
    assert cfg.text.context_length == 76
    with pytest.raises(KeyError):
        lcoca.get_coca_config("coca_nonexistent")


def test_beam_search_generate(tiny_coca):
    """Beam search runs, respects min length, and finds a sequence at
    least as likely as greedy decoding (min_seq_len=0 comparison)."""
    cfg, params = tiny_coca
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    out = jax.jit(lambda p, im: lcoca.generate_beamsearch(
        p, cfg, im, num_beams=4, num_beam_groups=2, min_seq_len=3,
        seq_len=8, eos_token_id=999, sot_token_id=998))(params, images)
    assert out.shape == (2, cfg.multimodal.context_length)
    assert (np.asarray(out)[:, 0] == 998).all()
    # min_seq_len: no EOS among the first 3 generated tokens
    assert not (np.asarray(out)[:, 1:3] == 999).any()

    def seq_logp(tokens):
        """Cumulative log-prob of generated tokens under the model."""
        _, token_embs = lcoca.encode_text_coca(params, cfg, tokens)
        logits = lcoca.decode(params, cfg,
                              lcoca.encode_image_coca(params, cfg,
                                                      images)[1],
                              token_embs)
        logp = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
        total = np.zeros(tokens.shape[0])
        for b in range(tokens.shape[0]):
            for t in range(1, tokens.shape[1]):
                tok = int(tokens[b, t])
                if tok == 0:
                    break
                total[b] += float(logp[b, t - 1, tok])
                if tok == 999:
                    break
        return total

    greedy = jax.jit(lambda p, im: lcoca.generate(
        p, cfg, im, jax.random.PRNGKey(0), seq_len=8, top_k=1,
        eos_token_id=999, sot_token_id=998))(params, images)
    beam = jax.jit(lambda p, im: lcoca.generate_beamsearch(
        p, cfg, im, num_beams=4, num_beam_groups=1, min_seq_len=0,
        seq_len=8, length_penalty=0.0,   # pure sum-logp comparison
        eos_token_id=999, sot_token_id=998))(params, images)
    lp_beam = seq_logp(np.asarray(beam))
    lp_greedy = seq_logp(np.asarray(greedy))
    assert (lp_beam >= lp_greedy - 1e-4).all()


# -- HF-text CoCa (coca_roberta-ViT-B-32 route) ------------------------------

def test_coca_registry_surfaces_reference_names():
    """All four reference coca_*.json names resolve, and the CLIP-side
    registry lists them (with a pointed error from get_model_config)."""
    from leaf_tpu.models.config import get_model_config, list_models
    names = list_models()
    for n in ("coca_ViT-B-32", "coca_ViT-L-14", "coca_base",
              "coca_roberta-ViT-B-32"):
        assert n in names
        assert lcoca.get_coca_config(n).name == n
        with pytest.raises(KeyError, match="CoCa"):
            get_model_config(n)
    cfg = lcoca.get_coca_config("coca_roberta-ViT-B-32")
    assert cfg.hf_text_name == "roberta-base"
    assert cfg.multimodal.width == 768
    # reference quirk kept: decoder vocab stays the CLIP-BPE 49408
    # even with an HF tower (coca_model.py:114-118)
    assert cfg.multimodal.vocab_size == 49408


def test_coca_roberta_tiny_forward_and_generate():
    from leaf_tpu.models.factory import create_model
    m = create_model("coca-roberta-tiny-test")
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    toks = jnp.asarray(
        np.random.RandomState(1).randint(2, 99, (2, 16)), jnp.int32)
    out = m.forward(x, toks)
    assert out["logits"].shape == (2, 15, 100)
    assert out["labels"].shape == (2, 15)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)
    # contrastive+caption loss is finite and differentiable end-to-end
    logits, labels = out["logits"], out["labels"]
    assert np.isfinite(np.asarray(logits)).all()
    gen = m.generate(x, seq_len=4, min_seq_len=2, sot_token_id=1,
                     eos_token_id=2)
    assert gen.shape == (2, m.cfg.multimodal.context_length)


def test_coca_roberta_hf_ingestion_parity_vs_torch():
    """Real oracle: a torch RobertaModel's state dict, prefixed the
    open_clip way (text.transformer.*), must ingest into the flax tower
    and reproduce the torch tower's last_hidden_state."""
    torch = pytest.importorskip("torch")
    import transformers

    from leaf_tpu.models.coca import hf_text_tower
    from leaf_tpu.models.coca_interop import _hf_text_to_params

    cfg = lcoca.get_coca_config("coca-roberta-tiny-test")
    tower = hf_text_tower(cfg)
    pt_model = transformers.RobertaModel(tower.config,
                                         add_pooling_layer=False).eval()
    sd = {"text.transformer." + k: v
          for k, v in pt_model.state_dict().items()}
    rng = np.random.RandomState(0)
    w = rng.randn(cfg.embed_dim, tower.config.hidden_size).astype(
        np.float32) * 0.05
    sd["text.proj.weight"] = torch.as_tensor(w)
    params = jax.tree.map(jnp.asarray, _hf_text_to_params(sd, cfg))

    ids = rng.randint(2, 99, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = pt_model(input_ids=torch.as_tensor(ids),
                       attention_mask=torch.as_tensor(mask)
                       ).last_hidden_state.numpy()
    pooled, toks = tower.call_with_tokens(params, jnp.asarray(ids),
                                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(toks), ref, atol=2e-5)
    # mean-pool + proj parity
    m = mask[..., None].astype(np.float32)
    want = (ref * m).sum(1) / m.sum(1) @ w.T
    np.testing.assert_allclose(np.asarray(pooled), want, atol=2e-5)


def test_coca_full_size_roberta_decoder_width_quirk_documented():
    """The reference's coca_roberta/coca_base captioning decoder is
    width-inconsistent upstream (512-wide image embs into a 768-wide
    kdim-less cross attention, coca_model.py:120-131) — pin that our
    faithful configs inherit the mismatch so the docstring caveat on
    coca_roberta_vit_b_32 stays true."""
    for name in ("coca_base", "coca_roberta-ViT-B-32"):
        cfg = lcoca.get_coca_config(name)
        assert cfg.embed_dim != cfg.multimodal.width


def test_get_tokenizer_selects_coca_context_and_hf():
    """get_tokenizer used to fall back to the 77-context CLIP BPE for
    CoCa names (crashing encode_text_coca on shape) and to CLIP BPE for
    the roberta variant (garbage ids, pad 0 vs roberta's 1)."""
    import numpy as np
    from leaf_tpu.models.factory import get_tokenizer
    t = get_tokenizer("coca-tiny-test")
    assert np.asarray(t(["hi"])).shape[1] == 16
    t2 = get_tokenizer("coca_ViT-B-32")
    assert np.asarray(t2(["hi"])).shape[1] == 76


def test_coca_generate_uses_config_special_ids():
    from leaf_tpu.models.coca import COCA_CONFIGS
    cfg = COCA_CONFIGS["coca_roberta-ViT-B-32"]()
    assert (cfg.pad_id, cfg.sot_token_id, cfg.eos_token_id) == (1, 0, 2)
