"""Image preprocessing: eval geometries, train augmentation, CLI knobs.

Covers the reference's `transform.py` surface (resize modes
:352-380, AugmentationCfg :62-72, train pipeline :307-351) and the
`--force-image-size` path (`factory.py:240-242` + `model.py:523-554`
position-embedding grid interpolation).
"""
import dataclasses

import numpy as np
import pytest

from leaf_tpu.models.preprocess import (
    AugmentationCfg,
    image_transform,
    train_image_transform,
)


def _img(h=50, w=70, seed=0):
    from PIL import Image
    arr = np.random.default_rng(seed).integers(
        0, 255, (h, w, 3)).astype(np.uint8)
    return Image.fromarray(arr)


# ---------------------------------------------------------------- eval


@pytest.mark.parametrize("resize_mode", ["shortest", "longest", "squash"])
@pytest.mark.parametrize("interpolation", ["bicubic", "bilinear", "random"])
def test_eval_geometry_shapes(resize_mode, interpolation):
    t = image_transform(32, resize_mode=resize_mode,
                        interpolation=interpolation)
    out = t(_img())
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32


def test_longest_mode_pads_with_zeros():
    t = image_transform(40, do_normalize=False, resize_mode="longest")
    out = t(_img(h=20, w=80))  # wide image → vertical padding bands
    # 40/80 scale → content 10 rows tall, centered: rows 0-14 zero
    assert np.all(out[:10] == 0.0) and np.all(out[-10:] == 0.0)
    assert out[20].max() > 0.0  # content band


def test_squash_mode_uses_whole_image():
    # squash keeps all content: a vertical gradient must survive in
    # order even from a very anisotropic input
    from PIL import Image
    arr = np.zeros((100, 10, 3), np.uint8)
    arr[:, :, 0] = np.linspace(0, 255, 100)[:, None]
    out = image_transform(32, do_normalize=False,
                          resize_mode="squash")(Image.fromarray(arr))
    col = out[:, 16, 0]
    assert col[0] < col[15] < col[31]


def test_shortest_is_the_default_and_matches_old_pipeline():
    img = _img()
    default = image_transform(32)(img)
    explicit = image_transform(32, resize_mode="shortest",
                               interpolation="bicubic")(img)
    np.testing.assert_array_equal(default, explicit)


def test_unknown_resize_mode_raises():
    with pytest.raises(ValueError, match="resize_mode"):
        image_transform(32, resize_mode="mystery")(_img())


def test_random_interpolation_is_bicubic_at_eval():
    """reference transform.py:294: 'random is ignored for
    interpolation_mode, so defaults to BICUBIC for inference'."""
    img = _img()
    a = image_transform(32, interpolation="random")(img)
    b = image_transform(32, interpolation="random")(img)
    c = image_transform(32, interpolation="bicubic")(img)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


# --------------------------------------------------------------- train


def test_train_transform_shape_and_determinism():
    img = _img()
    a = train_image_transform(32, seed=7)(img)
    b = train_image_transform(32, seed=7)(img)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)
    # a different seed must (with these scale bounds) pick another crop
    c = train_image_transform(32, seed=8)(img)
    assert not np.array_equal(a, c)


def test_train_transform_is_random_per_call():
    t = train_image_transform(32, seed=0, aug_cfg={"scale": (0.3, 1.0)})
    img = _img(h=100, w=100)
    outs = [t(img) for _ in range(4)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_train_transform_thread_safety():
    """The tar pipeline decodes in a thread pool; each thread must get
    its own rng stream without crashing or corrupting output."""
    from concurrent.futures import ThreadPoolExecutor
    t = train_image_transform(16, seed=0)
    img = _img(h=40, w=40)
    with ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(lambda _: t(img), range(64)))
    for o in outs:
        assert o.shape == (16, 16, 3) and np.isfinite(o).all()


def test_aug_cfg_parse_and_unknown_key():
    cfg = AugmentationCfg.parse({"scale": (0.5, 0.9)})
    assert cfg.scale == (0.5, 0.9)
    assert AugmentationCfg.parse(None).scale == (0.9, 1.0)  # ref default
    with pytest.raises(TypeError):
        AugmentationCfg.parse({"not_a_knob": 1})


def test_color_jitter_and_grayscale_paths():
    img = _img(h=64, w=64)
    plain = train_image_transform(32, do_normalize=False, seed=3)(img)
    jit = train_image_transform(
        32, do_normalize=False, seed=3,
        aug_cfg={"color_jitter": (0.8, 0.8, 0.8, 0.4),
                 "color_jitter_prob": 1.0})(img)
    assert not np.array_equal(plain, jit)
    gray = train_image_transform(
        32, do_normalize=False, seed=3,
        aug_cfg={"gray_scale_prob": 1.0})(img)
    # grayscale ⇒ all channels equal
    np.testing.assert_array_equal(gray[..., 0], gray[..., 1])
    np.testing.assert_array_equal(gray[..., 1], gray[..., 2])


def test_color_jitter_prob_without_tuple_raises():
    t = train_image_transform(32, aug_cfg={"color_jitter_prob": 0.5})
    with pytest.raises(ValueError, match="color_jitter"):
        t(_img())


# ------------------------------------------------- CLI kwargs parsing


def test_aug_cfg_flag_parses_key_value_literals():
    from leaf_tpu.train.params import parse_args
    ns = parse_args(["--model", "ViT-tiny-test", "--aug-cfg",
                     "scale=(0.6,1.0)", "gray_scale_prob=0.2",
                     "name=plain-string"])
    assert ns.aug_cfg == {"scale": (0.6, 1.0), "gray_scale_prob": 0.2,
                          "name": "plain-string"}
    assert parse_args(["--model", "ViT-tiny-test"]).aug_cfg == {}


# ------------------------------------- force_image_size + pos embed


def test_force_image_size_reinitialises_grid():
    from leaf_tpu.models import factory
    m = factory.create_model("ViT-tiny-test", None, force_image_size=64)
    g = 64 // m.cfg.vision.patch_size
    assert m.params["visual"]["positional_embedding"].shape[0] == g * g + 1


def test_force_image_size_rejects_non_vit():
    from leaf_tpu.models import factory
    with pytest.raises(ValueError, match="ViT"):
        factory.create_model("RN50", None, force_image_size=64)


def test_resize_vision_pos_embed_grid_interpolation():
    from leaf_tpu.models import factory
    from leaf_tpu.models.interop import resize_vision_pos_embed
    m = factory.create_model("ViT-tiny-test", None)
    pe = np.asarray(m.params["visual"]["positional_embedding"])
    # no-op when lengths match
    same = resize_vision_pos_embed(m.params, m.cfg)
    np.testing.assert_allclose(
        np.asarray(same["visual"]["positional_embedding"]), pe)
    # up-size: class token unchanged, grid row count = new grid²
    cfg2 = dataclasses.replace(
        m.cfg, vision=dataclasses.replace(m.cfg.vision, image_size=96))
    out = resize_vision_pos_embed(m.params, cfg2)
    new = np.asarray(out["visual"]["positional_embedding"])
    g2 = 96 // m.cfg.vision.patch_size
    assert new.shape == (g2 * g2 + 1, pe.shape[1])
    np.testing.assert_allclose(new[0], pe[0])
    # a CONSTANT grid must stay (numerically) constant under resize
    const = dict(m.params)
    const["visual"] = dict(m.params["visual"])
    old = const["visual"]["positional_embedding"]
    const["visual"]["positional_embedding"] = (
        np.concatenate([np.asarray(old[:1]),
                        np.full_like(old[1:], 0.25)], 0))
    out2 = resize_vision_pos_embed(const, cfg2)
    np.testing.assert_allclose(
        np.asarray(out2["visual"]["positional_embedding"][1:]), 0.25,
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", [
    "siglip-tiny-test", "eva-tiny-test", "convnext-tiny-test",
    "swin-tiny-test", "mci-vit-tiny-test", "fastvit-tiny-test",
    "vitamin-tiny-test", "relpos-tiny-test"])
def test_resize_pos_embed_noop_on_non_plain_vit_families(name):
    """Trunk/convnext families have their own pos-embed conventions —
    resize (run on every pretrained load) must pass them through
    untouched (an MCi hybrid ViT used to crash it)."""
    import jax
    from leaf_tpu.models import factory
    from leaf_tpu.models.interop import resize_vision_pos_embed
    m = factory.create_model(name, None)
    out = resize_vision_pos_embed(m.params, m.cfg)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        m.params, out))


def test_factory_transform_overrides():
    from leaf_tpu.models.factory import create_model_and_transforms
    img = _img()
    _, tr, ev = create_model_and_transforms(
        "ViT-tiny-test", None, image_mean=(0.0, 0.0, 0.0),
        image_std=(1.0, 1.0, 1.0), image_resize_mode="squash")
    out = ev(img)
    # identity normalisation ⇒ values stay in [0, 1]
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert tr is ev  # no aug_cfg → train == eval pipeline (LEAF AT)
    _, tr2, ev2 = create_model_and_transforms(
        "ViT-tiny-test", None, aug_cfg=AugmentationCfg())
    assert tr2 is not ev2
    assert tr2(img).shape == ev2(img).shape


# ----------------------------------------------- review-pass fixes


def test_parse_kwargs_missing_equals_is_usage_error():
    from leaf_tpu.train.params import parse_args
    with pytest.raises(SystemExit):
        parse_args(["--model", "ViT-tiny-test", "--aug-cfg", "scale"])


def test_image_mean_override_bakes_into_model_cfg():
    """--image-mean/std must reach every consumer: evals and attacks
    normalize from cfg.image_mean/std, so the factory bakes the
    override into the returned model's config."""
    from leaf_tpu.models.factory import create_model_and_transforms
    m, _, _ = create_model_and_transforms(
        "ViT-tiny-test", None, image_mean=(0.5, 0.5, 0.5),
        image_std=(0.25, 0.25, 0.25))
    assert m.cfg.image_mean == (0.5, 0.5, 0.5)
    assert m.cfg.image_std == (0.25, 0.25, 0.25)


def test_force_image_size_rejects_coca():
    from leaf_tpu.models import factory
    with pytest.raises(ValueError, match="CoCa"):
        factory.create_model("coca-tiny-test", None, force_image_size=64)


def test_pez_metrics_rejects_image_mode_results():
    from leaf_tpu.evals.pez_metrics import evaluate_results
    payload = {"results": [{"images": ["x.png"], "reconstructed": "p",
                            "cosine_sim": 0.5, "ids_rec": [1]}]}
    with pytest.raises(ValueError, match="reference captions"):
        evaluate_results(payload)


def test_leaf_driver_rejects_aug_cfg(tmp_path):
    from leaf_tpu.train.driver import main
    with pytest.raises(ValueError, match="aug-cfg"):
        main(["--model", "ViT-tiny-test", "--dataset-type", "synthetic",
              "--train-num-samples", "8", "--batch-size", "4",
              "--epochs", "1", "--aug-cfg", "scale=(0.5,1.0)",
              "--logs", str(tmp_path), "--name", "r"])
