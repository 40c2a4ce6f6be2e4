"""ConvNeXt vision tower: forward shapes, timm state-dict round-trip,
and numerics parity vs a functional torch re-computation of the timm
convnext forward (`timm/models/convnext.py` semantics: depthwise 7x7 →
LN(1e-6) → 4x MLP (exact GELU) → layer scale → residual; stem 4x4/4;
LN+2x2/2 downsamples; avg-pool → head-norm; open_clip linear/mlp proj
per `src/open_clip/timm_model.py:102-107`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models.convnext import (
    ConvNeXtVisionSpec,
    convnext_spec,
    encode_image_convnext,
    init_convnext,
    params_to_timm_convnext,
    timm_convnext_to_params,
)

SPEC = ConvNeXtVisionSpec(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                          image_size=64, output_dim=20, proj="linear")


def test_convnext_spec_from_timm_name():
    s = convnext_spec("convnext_base", 640, image_size=256)
    assert s.dims == (128, 256, 512, 1024) and s.depths == (3, 3, 27, 3)
    with pytest.raises(ValueError):
        convnext_spec("convnext_nano", 640)


@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_convnext_forward_shape(proj):
    spec = ConvNeXtVisionSpec(depths=SPEC.depths, dims=SPEC.dims,
                              image_size=64, output_dim=20, proj=proj)
    params = init_convnext(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    feats = jax.jit(lambda p, x: encode_image_convnext(p, spec, x, True))(
        params, x)
    assert feats.shape == (2, 20)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)


def test_convnext_timm_roundtrip():
    params = init_convnext(jax.random.PRNGKey(0), SPEC)
    sd = params_to_timm_convnext(params, SPEC)
    back = timm_convnext_to_params(sd, SPEC)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                 params, back)


def _torch_convnext_forward(sd, spec, x_nchw):
    """timm convnext forward recomputed with torch.nn.functional from a
    timm-layout state dict — independent of the JAX implementation."""
    import torch
    import torch.nn.functional as F

    def g(k):
        return torch.from_numpy(np.asarray(sd["visual.trunk." + k]))

    def ln(x, w, b):  # channels-last LN, eps 1e-6
        return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-6)

    x = F.conv2d(x_nchw, g("stem.0.weight"), g("stem.0.bias"), stride=4)
    x = x.permute(0, 2, 3, 1)
    x = ln(x, g("stem.1.weight"), g("stem.1.bias"))
    for si, depth in enumerate(spec.depths):
        if si > 0:
            x = ln(x, g(f"stages.{si}.downsample.0.weight"),
                   g(f"stages.{si}.downsample.0.bias"))
            x = x.permute(0, 3, 1, 2)
            x = F.conv2d(x, g(f"stages.{si}.downsample.1.weight"),
                         g(f"stages.{si}.downsample.1.bias"), stride=2)
            x = x.permute(0, 2, 3, 1)
        C = x.shape[-1]
        for bi in range(depth):
            p = f"stages.{si}.blocks.{bi}."
            h = F.conv2d(x.permute(0, 3, 1, 2), g(p + "conv_dw.weight"),
                         g(p + "conv_dw.bias"), padding=3, groups=C)
            h = h.permute(0, 2, 3, 1)
            h = ln(h, g(p + "norm.weight"), g(p + "norm.bias"))
            h = F.linear(h, g(p + "mlp.fc1.weight"), g(p + "mlp.fc1.bias"))
            h = F.gelu(h)
            h = F.linear(h, g(p + "mlp.fc2.weight"), g(p + "mlp.fc2.bias"))
            x = x + g(p + "gamma") * h
    x = x.mean(dim=(1, 2))
    x = ln(x, g("head.norm.weight"), g("head.norm.bias"))
    return x @ torch.from_numpy(
        np.asarray(sd["visual.head.proj.weight"])).T


def test_convnext_torch_parity():
    torch = pytest.importorskip("torch")
    params = init_convnext(jax.random.PRNGKey(42), SPEC)
    sd = params_to_timm_convnext(params, SPEC)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)

    ours = np.asarray(encode_image_convnext(params, SPEC, jnp.asarray(x)))
    with torch.no_grad():
        ref = _torch_convnext_forward(
            sd, SPEC, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_convnext_clip_model_forward():
    """Full CLIP model with a convnext tower through the factory path
    (reference `model_configs/convnext_base_w.json` schema)."""
    from leaf_tpu.models.factory import create_model

    model = create_model("convnext-tiny-test", seed=0)
    imgs = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    toks = np.zeros((2, model.cfg.text.context_length), np.int32)
    toks[:, 0], toks[:, 3] = 49406, 49407
    out = jax.jit(lambda im, tk: (
        jax.tree.map(lambda v: v, model.forward(im, tk))))(imgs, toks)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_convnext_openclip_checkpoint_load():
    """openclip_to_params auto-detects a convnext trunk checkpoint
    (visual.trunk.stem.* keys) and maps it; forward matches the source
    params."""
    from leaf_tpu.models.config import get_model_config
    from leaf_tpu.models.interop import openclip_to_params

    cfg = get_model_config("convnext-tiny-test")
    from leaf_tpu.models.clip import init_clip
    from leaf_tpu.convert import params_to_openclip
    params = init_clip(jax.random.PRNGKey(1), cfg)
    full_sd = params_to_openclip(params, cfg)
    back = openclip_to_params(full_sd, cfg)
    img = np.random.default_rng(3).standard_normal(
        (1, 64, 64, 3)).astype(np.float32)
    a = encode_image_convnext(params["visual"], cfg.convnext,
                              jnp.asarray(img))
    b = encode_image_convnext(jax.tree.map(jnp.asarray, back["visual"]),
                              cfg.convnext, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
