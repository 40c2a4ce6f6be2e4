"""End-to-end text attack tests on a tiny random CLIP model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.attacks import (
    CandidateScorer,
    WordConstraint,
    attack_text_bruteforce,
    attack_text_charmer_classification,
    attack_text_charmer_inference,
    attack_text_leaf,
)
from leaf_tpu.attacks.text import attack_text_charmer_constrained_ret
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.tokenizer import get_tokenizer
from tests.test_edits import lev


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    scorer = CandidateScorer(cfg, bucket=128)
    tok = get_tokenizer()
    return cfg, params, scorer, tok


SENTENCES = ["a photo of a cat", "wall street stocks fall", "hello world"]


def anchors_for(scorer, params, sentences, tok, normalize=False):
    return scorer.encode_text(params["text"], tok(sentences), normalize)


def test_leaf_attack_increases_l2(setup):
    cfg, params, scorer, tok = setup
    anchors = anchors_for(scorer, params, SENTENCES, tok)
    rng = np.random.default_rng(0)
    feats, adv = attack_text_leaf(scorer, params["text"], tok, SENTENCES,
                                  anchors, objective="l2", n=8, k=1, rng=rng)
    assert len(adv) == len(SENTENCES)
    assert feats.shape == (len(SENTENCES), cfg.embed_dim)
    for orig, a in zip(SENTENCES, adv):
        assert lev(orig, a) <= 1
    # returned features match re-encoding the adversarial sentences
    re_enc = np.asarray(anchors_for(scorer, params, adv, tok))
    np.testing.assert_allclose(feats, re_enc, atol=1e-4)
    # adversarial drift is positive
    drift = ((re_enc - np.asarray(anchors)) ** 2).sum(-1)
    assert (drift > 0).all()


def test_leaf_attack_deterministic(setup):
    cfg, params, scorer, tok = setup
    anchors = anchors_for(scorer, params, SENTENCES, tok)
    _, adv1 = attack_text_leaf(scorer, params["text"], tok, SENTENCES, anchors,
                               n=6, rng=np.random.default_rng(42))
    _, adv2 = attack_text_leaf(scorer, params["text"], tok, SENTENCES, anchors,
                               n=6, rng=np.random.default_rng(42))
    assert adv1 == adv2


def test_leaf_attack_k2(setup):
    cfg, params, scorer, tok = setup
    anchors = anchors_for(scorer, params, SENTENCES, tok)
    _, adv = attack_text_leaf(scorer, params["text"], tok, SENTENCES, anchors,
                              n=5, k=2, rng=np.random.default_rng(1))
    for orig, a in zip(SENTENCES, adv):
        assert lev(orig, a) <= 2


def test_bruteforce_beats_random(setup):
    """Bruteforce (exhaustive) must achieve ≥ drift of any single edit —
    check against the leaf attack's result on the same sentence."""
    cfg, params, scorer, tok = setup
    s = "hello world"
    anchor = anchors_for(scorer, params, [s], tok)[0]
    adv_bf, dist = attack_text_bruteforce(scorer, params["text"], tok, s, anchor)
    assert dist == 1 and lev(s, adv_bf) <= 1

    def drift(x):
        f = np.asarray(anchors_for(scorer, params, [x], tok)[0])
        return ((f - np.asarray(anchor)) ** 2).sum()

    _, adv_leaf = attack_text_leaf(scorer, params["text"], tok, [s],
                                   anchor[None], n=8,
                                   rng=np.random.default_rng(0))
    assert drift(adv_bf) >= drift(adv_leaf[0]) - 1e-5


def test_charmer_inference(setup):
    cfg, params, scorer, tok = setup
    s = "a photo of a cat"
    anchor = anchors_for(scorer, params, [s], tok)[0]
    adv, dist = attack_text_charmer_inference(
        scorer, params["text"], tok, s, anchor, n=5, k=1)
    assert dist == 1 and lev(s, adv) <= 1
    # charmer with full position coverage should also beat the leaf attack
    adv2, dist2 = attack_text_charmer_inference(
        scorer, params["text"], tok, s, anchor, n=5, k=2)
    assert lev(s, adv2) <= 2


def test_charmer_dual_encoder(setup):
    cfg, params, scorer, tok = setup
    params_b = lclip.init_clip(jax.random.PRNGKey(9), cfg)
    s = "hello world"
    a1 = anchors_for(scorer, params, [s], tok)[0]
    a2 = anchors_for(scorer, params_b, [s], tok)[0]
    adv, _ = attack_text_charmer_inference(
        scorer, params["text"], tok, s, a1, n=4, k=1,
        text_params2=params_b["text"], anchor_features2=a2)
    assert lev(s, adv) <= 1


def test_charmer_constrained(setup):
    cfg, params, scorer, tok = setup
    c = WordConstraint()
    s = "a photo of a cat"
    anchor = anchors_for(scorer, params, [s], tok)[0]
    adv, _ = attack_text_charmer_inference(
        scorer, params["text"], tok, s, anchor, n=5, k=1, constraint=c)
    # constrained attack must not create new dictionary words
    assert c.count(adv) < c.count(s) or adv == s


def test_charmer_classification_attack(setup):
    cfg, params, scorer, tok = setup
    # class anchors from text prompts (image-free stand-in)
    class_feats = anchors_for(scorer, params,
                              ["a photo of a dog", "a photo of a car"],
                              tok, normalize=True)
    s = "a photo of a dog"
    adv, dist = attack_text_charmer_classification(
        scorer, params["text"], tok, s, class_feats, label=0, n=5, k=2)
    assert lev(s, adv) <= 2


def test_charmer_constrained_ret_untargeted(setup):
    cfg, params, scorer, tok = setup
    s = "a photo of a cat"
    adv, _ = attack_text_charmer_constrained_ret(
        scorer, params["text"], tok, s, anchor_features=None,
        objective="l2", n=4, k=1)
    assert lev(s, adv) <= 1


def test_charmer_constrained_ret_with_anchor(setup):
    """With an anchor and 'l2', the reference semantics maximise
    distance from the anchor (`utils_attacks.py:799-803`); moving
    *toward* a target caption uses the 'sim' objective."""
    cfg, params, scorer, tok = setup
    s = "a photo of a cat"
    target = anchors_for(scorer, params, ["violent horrible imagery"], tok)[0]
    adv, _ = attack_text_charmer_constrained_ret(
        scorer, params["text"], tok, s, anchor_features=target,
        objective="l2", n=4, k=1)
    assert lev(s, adv) <= 1

    target_n = anchors_for(scorer, params, ["violent horrible imagery"],
                           tok, normalize=True)[0]
    adv_sim, _ = attack_text_charmer_constrained_ret(
        scorer, params["text"], tok, s, anchor_features=target_n,
        objective="sim", n=4, k=1)

    def cos(x):
        f = np.asarray(anchors_for(scorer, params, [x], tok, normalize=True)[0])
        return float((f * np.asarray(target_n)).sum())
    # 'sim' objective moves the caption toward the target
    assert cos(adv_sim) >= cos(s) - 1e-6


def test_scorer_bucketing_matches_unpadded(setup):
    cfg, params, scorer, tok = setup
    sentences = [f"sentence number {i}" for i in range(7)]
    tokens = tok(sentences)
    anchor = anchors_for(scorer, params, ["anchor text"], tok)[0]
    loss = scorer.score_flat(params["text"], tokens, anchor, "l2")
    assert loss.shape == (7,)
    feats = np.asarray(anchors_for(scorer, params, sentences, tok))
    ref = ((feats - np.asarray(anchor)) ** 2).sum(-1)
    np.testing.assert_allclose(loss, ref, rtol=1e-4)


def test_objectives_sign_conventions(setup):
    cfg, params, scorer, tok = setup
    s = ["aa", "bb"]
    tokens = tok(s)
    anchor = anchors_for(scorer, params, ["aa"], tok)[0]
    l2 = scorer.score_flat(params["text"], tokens, anchor, "l2")
    negl2 = scorer.score_flat(params["text"], tokens, anchor, "negl2")
    np.testing.assert_allclose(l2, -negl2, rtol=1e-5)
    anchor_n = anchors_for(scorer, params, ["aa"], tok, normalize=True)[0]
    sim = scorer.score_flat(params["text"], tokens, anchor_n, "sim")
    dissim = scorer.score_flat(params["text"], tokens, anchor_n, "dissim")
    np.testing.assert_allclose(sim, -dissim, rtol=1e-5)
    # self-similarity of normalized features is 1
    np.testing.assert_allclose(sim[0], 1.0, atol=1e-5)


def test_context_bucketing_exactness(setup):
    """Bucketed scoring must produce IDENTICAL losses to full 77-pad:
    under causal masking, post-EOT tokens cannot reach the EOT pool."""
    cfg, params, scorer, tok = setup
    from leaf_tpu.attacks.engine import bucket_tokens
    texts = ["short one", "a slightly longer caption here", "x"]
    tokens = tok(texts)
    b = bucket_tokens(tokens)
    assert b.shape[1] < 77
    anchor = anchors_for(scorer, params, ["anchor"], tok)[0]
    # score via full-width encode (bypassing the scorer's bucketing)
    import jax.numpy as jnp
    from leaf_tpu.models import clip as lclip
    full = np.asarray(lclip.encode_text(params["text"], cfg.text,
                                        jnp.asarray(tokens)))
    sliced = np.asarray(lclip.encode_text(params["text"], cfg.text,
                                          jnp.asarray(b)))
    np.testing.assert_allclose(full, sliced, atol=2e-5, rtol=1e-5)
    loss = scorer.score_flat(params["text"], tokens, anchor, "l2")
    ref = ((full - np.asarray(anchor)) ** 2).sum(-1)
    np.testing.assert_allclose(loss, ref, rtol=1e-4)


def test_charmer_batched_matches_sequential(setup):
    from leaf_tpu.attacks.text import attack_text_charmer_batched
    cfg, params, scorer, tok = setup
    sentences = ["a photo of a cat", "hello world", "stocks fall!"]
    anchors = anchors_for(scorer, params, sentences, tok)
    seq_out = []
    for i, s in enumerate(sentences):
        adv, _ = attack_text_charmer_inference(
            scorer, params["text"], tok, s, anchors[i], n=4, k=1)
        seq_out.append(adv)
    batched = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, n=4, k=1)
    assert batched == seq_out


def test_charmer_classification_batched_matches_sequential(setup):
    from leaf_tpu.attacks.text import (
        attack_text_charmer_classification_batched,
    )
    cfg, params, scorer, tok = setup
    class_feats = anchors_for(scorer, params,
                              ["a photo of a dog", "a photo of a car",
                               "a photo of a tree"], tok, normalize=True)
    sentences = ["a photo of a dog", "the car is red", "tall green tree"]
    labels = [0, 1, 2]
    seq = []
    for s, lab in zip(sentences, labels):
        adv, _ = attack_text_charmer_classification(
            scorer, params["text"], tok, s, class_feats, lab, n=4, k=2)
        seq.append(adv)
    batched = attack_text_charmer_classification_batched(
        scorer, params["text"], tok, sentences, class_feats, labels,
        n=4, k=2)
    assert batched == seq


def test_charmer_batched_fused_matches_string_path(setup, monkeypatch):
    """The C++ fused edit+tokenize charmer path (no candidate strings
    materialised) must make byte-identical decisions to the string
    path, incl. multi-round (k=2) and the sim objective."""
    import leaf_tpu.attacks.text as text_mod
    from leaf_tpu.attacks.text import attack_text_charmer_batched
    cfg, params, scorer, tok = setup
    if text_mod._native_of(tok) is None:
        pytest.skip("native tokenizer unavailable")
    sentences = ["a photo of a cat", "hello world", "stocks fall!", "x"]
    anchors = anchors_for(scorer, params, sentences, tok, normalize=True)
    fused = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, "sim", n=4, k=2)
    monkeypatch.setattr(text_mod, "_native_of", lambda t: None)
    plain = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, "sim", n=4, k=2)
    assert fused == plain


def test_charmer_batched_non_ascii_falls_back(setup):
    """Non-ASCII sentences must route to the string path (the native
    tokenizer is ASCII-only) and still return a valid attack."""
    from leaf_tpu.attacks.text import attack_text_charmer_batched
    cfg, params, scorer, tok = setup
    sentences = ["a photo of a cat", "café au lait"]
    anchors = anchors_for(scorer, params, sentences, tok)
    out = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, n=3, k=1)
    assert len(out) == 2 and all(isinstance(s, str) for s in out)
    assert all(lev(a, b) <= 1 for a, b in zip(out, sentences))


def test_charmer_classification_batched_fused_matches_string_path(
        setup, monkeypatch):
    """Fused-grid classification charmer must match the string path
    decision-for-decision, including the early-exit freeze (k=2)."""
    import leaf_tpu.attacks.text as text_mod
    from leaf_tpu.attacks.text import (
        attack_text_charmer_classification_batched,
    )
    cfg, params, scorer, tok = setup
    if text_mod._native_of(tok) is None:
        pytest.skip("native tokenizer unavailable")
    class_feats = anchors_for(scorer, params,
                              ["a photo of a dog", "a photo of a car",
                               "a photo of a tree"], tok, normalize=True)
    sentences = ["a photo of a dog", "the car is red", "tall green tree"]
    labels = [0, 1, 2]
    fused = attack_text_charmer_classification_batched(
        scorer, params["text"], tok, sentences, class_feats, labels,
        n=4, k=2)
    monkeypatch.setattr(text_mod, "_native_of", lambda t: None)
    plain = attack_text_charmer_classification_batched(
        scorer, params["text"], tok, sentences, class_feats, labels,
        n=4, k=2)
    assert fused == plain


def test_charmer_batched_constrained_fused_matches_string_path(
        setup, monkeypatch):
    """Constrained batched charmer through the fused grids + native
    word-validity masks must match the string path (filter_batched
    replaces invalid candidates with the original in place) —
    including the invalid-winner-freezes-sentence case."""
    import leaf_tpu.attacks.text as text_mod
    from leaf_tpu.attacks.text import attack_text_charmer_batched
    cfg, params, scorer, tok = setup
    c = WordConstraint()
    if text_mod._native_of(tok) is None or c._get_native() is None:
        pytest.skip("native tokenizer/word-dict unavailable")
    sentences = ["a photo of a cat", "hello world", "stocks fall!"]
    anchors = anchors_for(scorer, params, sentences, tok)
    fused = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, n=4, k=2,
        constraint=c)
    monkeypatch.setattr(text_mod, "_native_of", lambda t: None)
    plain = attack_text_charmer_batched(
        scorer, params["text"], tok, sentences, anchors, n=4, k=2,
        constraint=c)
    assert fused == plain
    for s0, s1 in zip(sentences, fused):
        assert c.count(s1) < c.count(s0) or s1 == s0


def test_bruteforce_fused_matches_string_path(setup, monkeypatch):
    """Fused-grid bruteforce == string-path bruteforce, unconstrained
    and constrained."""
    import leaf_tpu.attacks.text as text_mod
    from leaf_tpu.attacks.text import attack_text_bruteforce
    cfg, params, scorer, tok = setup
    if text_mod._native_of(tok) is None:
        pytest.skip("native tokenizer unavailable")
    c = WordConstraint()
    s = "a photo of a cat"
    anchor = anchors_for(scorer, params, [s], tok)[0]
    outs = {}
    for key, cons in (("plain", None), ("constrained", c)):
        if cons is not None and cons._get_native() is None:
            pytest.skip("native word dict unavailable")
        outs[key] = attack_text_bruteforce(
            scorer, params["text"], tok, s, anchor, constraint=cons)
    monkeypatch.setattr(text_mod, "_native_of", lambda t: None)
    for key, cons in (("plain", None), ("constrained", c)):
        ref = attack_text_bruteforce(
            scorer, params["text"], tok, s, anchor, constraint=cons)
        assert outs[key] == ref, key
