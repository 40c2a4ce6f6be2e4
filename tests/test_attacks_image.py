"""Image attack (PGD/APGD) + FARE training tests on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.attacks.apgd import apgd, ce_loss_fn, dlr_targeted_loss_fn
from leaf_tpu.attacks.image import (
    attack_image,
    attack_image_classification,
    pgd,
)
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.train.fare import FareConfig, encode_vision, train_fare

EPS = 8 / 255


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0.2, 0.8, size=(2, 64, 64, 3)).astype(np.float32))
    return cfg, params, images


def test_attack_image_ball_and_drift(setup):
    cfg, params, images = setup
    anchors = encode_vision(params["visual"], cfg, images, False)
    adv = attack_image(params, cfg, images, anchors, jax.random.PRNGKey(1),
                       objective="l2", eps=EPS, n_steps=3)
    delta = np.asarray(adv - images)
    assert np.abs(delta).max() <= EPS + 1e-6
    drift = np.square(np.asarray(
        encode_vision(params["visual"], cfg, adv, False) - anchors)).sum()
    assert drift > 0


def test_attack_image_classification_lowers_accuracy_signal(setup):
    cfg, params, images = setup
    # random classifier [D, K]
    classifier = jnp.asarray(np.random.default_rng(1).standard_normal(
        (cfg.embed_dim, 4)).astype(np.float32))
    classifier = classifier / jnp.linalg.norm(classifier, axis=0)
    labels = jnp.asarray([0, 1])
    adv = attack_image_classification(
        params, cfg, images, classifier, labels, jax.random.PRNGKey(2),
        eps=EPS, n_steps=3)
    assert np.abs(np.asarray(adv - images)).max() <= EPS + 1e-6

    def ce(imgs):
        feats = encode_vision(params["visual"], cfg, imgs, True)
        logits = feats @ classifier
        logp = jax.nn.log_softmax(logits)
        return -float(jnp.take_along_axis(logp, labels[:, None], 1).mean())

    assert ce(adv) >= ce(images) - 1e-5


def test_fare_pgd_respects_constraints(setup):
    cfg, params, images = setup
    anchors = encode_vision(params["visual"], cfg, images, False)

    def loss_fn(x):
        emb = encode_vision(params["visual"], cfg, x, False)
        return jnp.square(emb - anchors).sum()

    adv = pgd(loss_fn, images, norm="linf", eps=EPS, iterations=3,
              stepsize=EPS / 3)
    delta = np.asarray(adv - images)
    assert np.abs(delta).max() <= EPS + 1e-6
    assert np.asarray(adv).min() >= 0 and np.asarray(adv).max() <= 1

    adv2 = pgd(loss_fn, images, norm="l2", eps=1.0, iterations=3,
               stepsize=0.3)
    d2 = np.asarray(adv2 - images).reshape(2, -1)
    assert (np.linalg.norm(d2, axis=1) <= 1.0 + 1e-4).all()


def test_apgd_improves_loss_and_respects_ball(setup):
    cfg, params, images = setup
    anchors = encode_vision(params["visual"], cfg, images, False)

    def loss_fn(x):
        emb = encode_vision(params["visual"], cfg, x, False)
        return jnp.square(emb - anchors).sum(-1)

    adv = jax.jit(lambda im: apgd(loss_fn, im, norm="linf", eps=EPS,
                                  n_iter=8))(images)
    delta = np.asarray(adv - images)
    assert np.abs(delta).max() <= EPS + 1e-6
    assert np.asarray(adv).min() >= -1e-6 and np.asarray(adv).max() <= 1 + 1e-6
    # APGD must find a strictly adversarial point
    assert float(loss_fn(adv).sum()) > float(loss_fn(images).sum())


def test_apgd_loss_functions():
    logits = jnp.asarray([[2.0, 1.0, 0.5, 0.1, -1.0]])
    y = jnp.asarray([0])
    f = ce_loss_fn(lambda x: logits, y)
    assert f(jnp.zeros((1, 2))).shape == (1,)
    ft = dlr_targeted_loss_fn(lambda x: logits, y, jnp.asarray([1]))
    val = float(ft(jnp.zeros((1, 2)))[0])
    # -(z_y - z_t)/(z_1 - (z_3+z_4)/2) = -(2-1)/(2 - (0.5+0.1)/2)
    np.testing.assert_allclose(val, -(2 - 1) / (2 - 0.3), rtol=1e-5)


def test_fare_training_reduces_adv_drift(setup):
    cfg, params, images = setup
    fcfg = FareConfig(steps=3, warmup=1, lr=1e-4, eps=EPS,
                      iterations_adv=2, stepsize_adv=EPS / 2, log_freq=1)

    def data_iter():
        while True:
            yield np.asarray(images), None

    # on_step fires once per step with host floats (it is deferred one
    # step behind the dispatch and flushed after the loop)
    seen = []
    out = train_fare(params, cfg, fcfg, data_iter(), seed=0,
                     on_step=lambda s, m: seen.append((s, m)))
    assert out["steps"] == 3
    assert np.isfinite(out["final_loss"])
    assert [s for s, _ in seen] == [1, 2, 3]
    assert all(isinstance(m["loss"], float) for _, m in seen)
    # vision params moved, text untouched
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        out["params"]["visual"], params["visual"]))
    assert max(moved) > 0
    same = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        out["params"]["text"], params["text"]))
    assert max(same) == 0


def test_fare_training_bf16_compute(setup):
    """--precision bf16 must reach the encodes: train_fare(dtype=bf16)
    runs the PGD ladder and the update in bf16 (before the fix the CLI
    cast only the params and every encode computed fp32)."""
    cfg, params, images = setup
    fcfg = FareConfig(steps=2, warmup=1, lr=1e-4, eps=EPS,
                      iterations_adv=2, stepsize_adv=EPS / 2, log_freq=1)

    def data_iter():
        while True:
            yield np.asarray(images), None

    out = train_fare(params, cfg, fcfg, data_iter(), seed=0,
                     dtype=jnp.bfloat16)
    assert out["steps"] == 2
    assert np.isfinite(out["final_loss"])
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        out["params"]["visual"], params["visual"]))
    assert max(moved) > 0
    # params keep their storage dtype — only compute is bf16
    assert all(np.asarray(l).dtype == np.asarray(o).dtype
               for l, o in zip(jax.tree.leaves(out["params"]["visual"]),
                               jax.tree.leaves(params["visual"])))


def test_square_attack(setup):
    from leaf_tpu.attacks.square import make_margin_loss_fn, square_attack
    cfg, params, images = setup
    classifier = jnp.asarray(np.random.default_rng(5).standard_normal(
        (cfg.embed_dim, 4)).astype(np.float32))
    classifier = classifier / jnp.linalg.norm(classifier, axis=0)
    labels = np.asarray([0, 1])

    def logits_fn(x):
        feats = encode_vision(params["visual"], cfg, x, True)
        return 100.0 * feats @ classifier

    mfn = make_margin_loss_fn(logits_fn, labels)
    x = np.asarray(images)
    adv = square_attack(mfn, x, eps=EPS, n_iters=20, seed=0)
    assert np.abs(adv - x).max() <= EPS + 1e-6
    assert adv.min() >= 0 and adv.max() <= 1
    # the random search never decreases the best margin loss
    l0, _ = mfn(jnp.asarray(x))
    l1, _ = mfn(jnp.asarray(adv))
    assert (np.asarray(l1) >= np.asarray(l0) - 1e-4).any()


def test_fare_driver_end_to_end(tmp_path):
    """Full FARE CLI on a tiny image-folder dataset."""
    import os
    from PIL import Image
    from leaf_tpu.train import fare_driver
    rng = np.random.default_rng(0)
    for cls in ("c0", "c1"):
        os.makedirs(tmp_path / "data" / cls)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8).astype(np.uint8)
                            ).save(tmp_path / "data" / cls / f"{i}.png")
    out = fare_driver.main([
        "--model", "ViT-tiny-test",
        "--imagenet-root", str(tmp_path / "data"),
        "--steps", "2", "--warmup", "1", "--batch-size", "2",
        "--eps", "8", "--iterations-adv", "2", "--stepsize-adv", "4",
        "--precision", "fp32", "--fallback-freq", "1",
        "--output-dir", str(tmp_path / "out"),
        "--experiment-name", "smoke"])
    assert out["steps"] == 2
    assert np.isfinite(out["final_loss"])
    # completed runs GC ALL fallbacks (reference
    # adversarial_training_clip.py:253-255); milestones remain
    ck = tmp_path / "out" / "smoke" / "checkpoints"
    assert not [d for d in os.listdir(ck) if d.startswith("fallback_")]
    assert os.path.isdir(ck / "epoch_2")

    # --resume latest: params + optimizer moments + step from the
    # newest checkpoint; continues to the new step budget
    out2 = fare_driver.main([
        "--model", "ViT-tiny-test",
        "--imagenet-root", str(tmp_path / "data"),
        "--steps", "4", "--warmup", "1", "--batch-size", "2",
        "--eps", "8", "--iterations-adv", "2", "--stepsize-adv", "4",
        "--precision", "fp32", "--fallback-freq", "1",
        "--resume", "latest",
        "--output-dir", str(tmp_path / "out"),
        "--experiment-name", "smoke"])
    assert out2["steps"] == 4
    assert int(out2["state"].step) == 4


def test_l1_projection_matches_reference():
    """leaf_tpu's bisection l1_projection == the reference's exact
    sort-and-scan `L1_projection` (`apgd_train.py:25-78`), exec-
    extracted as a torch oracle."""
    import os
    torch = pytest.importorskip("torch")
    from leaf_tpu.attacks.apgd import l1_projection

    src = open("/root/reference/src/robust_vlm/train/apgd_train.py").read()
    start = src.index("def L1_projection")
    end = src.index("def dlr_loss")
    ns = {"torch": torch, "math": __import__("math")}
    exec(src[start:end], ns)  # noqa: S102 — test-only oracle

    rng = np.random.default_rng(0)
    for eps in (0.5, 5.0, 50.0):
        x = rng.uniform(0, 1, size=(4, 3, 8, 8)).astype(np.float32)
        y = rng.normal(0, 0.3, size=x.shape).astype(np.float32)
        ref = ns["L1_projection"](torch.from_numpy(x),
                                  torch.from_numpy(y), eps).numpy()
        ours = np.asarray(l1_projection(jnp.asarray(x), jnp.asarray(y),
                                        eps))
        d_ref = (y + ref).reshape(4, -1)
        d_ours = (y + ours).reshape(4, -1)
        # identical projected points (the deltas themselves agree too)
        np.testing.assert_allclose(d_ours, d_ref, atol=3e-5)
        assert (np.abs(d_ours).sum(-1) <= eps + 1e-3).all()
        assert ((x.reshape(4, -1) + d_ours >= -1e-6)
                & (x.reshape(4, -1) + d_ours <= 1 + 1e-6)).all()


def test_apgd_l1_improves_loss_and_respects_ball(setup):
    cfg, params, images = setup
    anchors = encode_vision(params["visual"], cfg, images, False)
    eps1 = 12.0

    def loss_fn(x):
        emb = encode_vision(params["visual"], cfg, x, False)
        return jnp.square(emb - anchors).sum(-1)

    adv = jax.jit(lambda im: apgd(loss_fn, im, norm="l1", eps=eps1,
                                  n_iter=10))(images)
    delta = np.asarray(adv - images).reshape(images.shape[0], -1)
    assert (np.abs(delta).sum(-1) <= eps1 + 1e-2).all()
    assert np.asarray(adv).min() >= -1e-6 and np.asarray(adv).max() <= 1 + 1e-6
    assert float(loss_fn(adv).sum()) > float(loss_fn(images).sum())
    # the L1 attack must actually be sparse (top-k sign steps)
    sparsity = (np.abs(delta) > 1e-10).mean()
    assert sparsity < 0.5


def test_apgd_cascade_l1_norm(setup):
    """AutoAttack-style cascade under the L1 preset (reference
    AutoAttack norm='L1'): ball + box respected, cascade runs CE +
    targeted stages."""
    from leaf_tpu.benchmark.zeroshot_classification import (
        _apgd_attack_batch,
    )
    from leaf_tpu.models.zero_shot import build_zero_shot_classifier
    from leaf_tpu.attacks.engine import CandidateScorer
    from leaf_tpu.tokenizer import get_tokenizer
    cfg, params, images = setup
    tok = get_tokenizer(context_length=cfg.text.context_length)
    scorer = CandidateScorer(cfg)
    classifier = build_zero_shot_classifier(
        lambda t: scorer.encode_text(params["text"], t), tok,
        ["cat", "dog", "bird"], ["a photo of a {}."])
    labels = jnp.asarray([0, 1])
    eps1 = 10.0
    adv, fooled = _apgd_attack_batch(
        params, cfg, classifier, images, labels, eps1, n_iter=6,
        n_targets=1, norm="l1")
    delta = np.asarray(adv - images).reshape(2, -1)
    assert (np.abs(delta).sum(-1) <= eps1 + 1e-2).all()
    assert np.asarray(adv).min() >= -1e-6
    assert np.asarray(adv).max() <= 1 + 1e-6
    assert fooled.shape == (2,)
