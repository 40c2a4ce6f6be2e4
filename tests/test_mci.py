"""MobileCLIP trunk family (models/mci.py).

No timm in this container (PARITY.md), so the tests pin what actually
carries the correctness risk:

  * the structural-reparameterization fusion math (MobileOne branches,
    RepMixer, RepCPE, ReparamLargeKernelConv) against explicit
    multi-branch forwards — fusion is exact algebra, so the oracle
    comparison is tight;
  * checkpoint-key ingestion for the timm train-form AND deploy-form
    layouts (reference reaches these trunks through
    `timm_model.py:30-90`; configs `MobileCLIP-{B,S1,S2}.json`);
  * the registry surface and the end-to-end encode through the
    standard factory machinery.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models import mci
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.factory import create_model
from leaf_tpu.models.mci import (
    FastVitSpec,
    MciViTSpec,
    _SD,
    _fuse_mobileone,
    _fuse_repcpe,
    _fuse_repmixer,
    _hwio,
    _lkc_params,
    encode_image_fastvit,
    encode_image_mci_vit,
    timm_fastvit_to_params,
    timm_mci_vit_to_params,
)

TINY_FV = FastVitSpec(name="fastvit-tiny", image_size=32,
                      dims=(8, 16, 32, 64), depths=(1, 2, 2, 1),
                      mlp_ratio=2.0, attn_head_dim=8, output_dim=64)
TINY_VIT = MciViTSpec(name="mci-vit-tiny", image_size=32, width=32,
                      layers=2, heads=2, stem_channels=(8, 8, 32),
                      stem_kernels=(4, 2, 2), output_dim=64)


# ---------------------------------------------------------------------------
# Registry surface
# ---------------------------------------------------------------------------

def test_mobileclip_configs_resolve():
    """MobileCLIP-{B,S1,S2} resolve to the right trunk specs with the
    reference's text cfg (`MobileCLIP-S1.json`: non-causal text) and
    the no-normalization preprocess stats (`pretrained.py:69-75`)."""
    b = get_model_config("MobileCLIP-B")
    assert isinstance(b.trunk, MciViTSpec)
    assert b.trunk.image_size == 224 and b.trunk.width == 768
    assert b.trunk.grid_size == 14          # stem stride 4*2*2 = 16
    assert not b.text.no_causal_mask
    for name, dims in (("MobileCLIP-S1", (64, 128, 256, 512)),
                       ("MobileCLIP-S2", (80, 160, 320, 640))):
        cfg = get_model_config(name)
        assert isinstance(cfg.trunk, FastVitSpec), name
        assert cfg.trunk.dims == dims and cfg.trunk.image_size == 256
        assert cfg.trunk.depths == (4, 12, 24, 4)
        assert cfg.text.no_causal_mask
        assert cfg.text.context_length == 77 and cfg.text.width == 512
    for cfg in (b, get_model_config("MobileCLIP-S1")):
        assert cfg.image_mean == (0.0, 0.0, 0.0)
        assert cfg.image_std == (1.0, 1.0, 1.0)
        assert cfg.embed_dim == 512


def test_mobileclip_pretrained_tags():
    from leaf_tpu.models.pretrained import get_pretrained_cfg
    assert "apple/MobileCLIP-B-OpenCLIP" in str(
        get_pretrained_cfg("MobileCLIP-B", "datacompdr"))
    assert get_pretrained_cfg("MobileCLIP-S2", "datacompdr") is not None


def test_unknown_mci_trunk_is_loud():
    with pytest.raises(ValueError, match="unsupported MobileCLIP trunk"):
        mci.match_mci("fastvit_mci9", 512)


@pytest.mark.parametrize("name", ["mci-vit-tiny-test", "fastvit-tiny-test"])
def test_tiny_end_to_end(name):
    model = create_model(name)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    f = lclip.encode_image_model(model.params, model.cfg, jnp.asarray(x),
                                 normalize=True)
    assert f.shape == (2, 64)
    # init must not produce degenerate (≈0) features — norm 1 after
    # normalize means the pre-norm features had real magnitude
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1),
                               1.0, atol=1e-4)
    tokens = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 5].set(2)
    out = lclip.forward(model.params, model.cfg, jnp.asarray(x), tokens)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)


# ---------------------------------------------------------------------------
# Fusion oracles — multi-branch forward vs fused single conv
# ---------------------------------------------------------------------------

def _bn_ref(y: np.ndarray, g, b, m, v, eps: float = 1e-5) -> np.ndarray:
    """Inference BatchNorm over NHWC channels-last."""
    return (y - m) / np.sqrt(v + eps) * g + b


def _conv_ref(x: np.ndarray, w_oihw: np.ndarray, stride=1, groups=1,
              padding=None) -> np.ndarray:
    y = mci._conv(jnp.asarray(x), jnp.asarray(_hwio(w_oihw)),
                  stride=stride, groups=groups, padding=padding)
    return np.asarray(y)


def _bn_keys(r, prefix: str, c: int):
    return {prefix + "weight": 0.5 + r.rand(c).astype(np.float32),
            prefix + "bias": r.randn(c).astype(np.float32) * 0.1,
            prefix + "running_mean": r.randn(c).astype(np.float32) * 0.1,
            prefix + "running_var": 0.5 + r.rand(c).astype(np.float32)}


def _mobileone_sd(r, prefix: str, k: int, cin: int, cout: int,
                  groups: int, n_branches: int = 2,
                  scale: bool = True, identity: bool = True):
    """Synthetic train-form MobileOneBlock keys + a numpy forward."""
    sd = {}
    for i in range(n_branches):
        sd[f"{prefix}conv_kxk.{i}.conv.weight"] = \
            r.randn(cout, cin // groups, k, k).astype(np.float32) * 0.2
        sd.update(_bn_keys(r, f"{prefix}conv_kxk.{i}.bn.", cout))
    if scale and k > 1:
        sd[prefix + "conv_scale.conv.weight"] = \
            r.randn(cout, cin // groups, 1, 1).astype(np.float32) * 0.2
        sd.update(_bn_keys(r, prefix + "conv_scale.bn.", cout))
    if identity and cin == cout:
        sd.update(_bn_keys(r, prefix + "identity.", cout))
    return sd


def _mobileone_ref(sd, prefix: str, x: np.ndarray, k: int, stride: int,
                   groups: int) -> np.ndarray:
    """Explicit branch-by-branch MobileOne forward (linear part)."""
    y = np.zeros(1, np.float32)
    i = 0
    while f"{prefix}conv_kxk.{i}.conv.weight" in sd:
        p = f"{prefix}conv_kxk.{i}."
        z = _conv_ref(x, sd[p + "conv.weight"], stride, groups)
        y = y + _bn_ref(z, sd[p + "bn.weight"], sd[p + "bn.bias"],
                        sd[p + "bn.running_mean"], sd[p + "bn.running_var"])
        i += 1
    if prefix + "conv_scale.conv.weight" in sd:
        p = prefix + "conv_scale."
        z = _conv_ref(x, sd[p + "conv.weight"], stride, groups, padding=0)
        y = y + _bn_ref(z, sd[p + "bn.weight"], sd[p + "bn.bias"],
                        sd[p + "bn.running_mean"], sd[p + "bn.running_var"])
    if prefix + "identity.weight" in sd:
        y = y + _bn_ref(x, sd[prefix + "identity.weight"],
                        sd[prefix + "identity.bias"],
                        sd[prefix + "identity.running_mean"],
                        sd[prefix + "identity.running_var"])
    return y


@pytest.mark.parametrize("case", [
    # (k, cin, cout, groups, stride, n_branches, scale, identity)
    (3, 8, 8, 1, 1, 1, True, True),      # full 3-branch, dense
    (3, 8, 8, 8, 1, 2, True, True),      # depthwise, 2 kxk branches
    (3, 3, 8, 1, 2, 1, True, False),     # stem: stride 2, cin≠cout
    (7, 8, 16, 8, 2, 1, True, False),    # grouped large-kernel s2
    (1, 8, 8, 1, 1, 1, False, True),     # pointwise + identity
])
def test_mobileone_fusion_exact(case):
    """Fused single conv ≡ sum of conv+BN branches + BN identity —
    reparameterization is exact algebra, so tolerances are tight."""
    k, cin, cout, groups, stride, nb, scale, ident = case
    r = np.random.RandomState(hash(case) % 2**31)
    sd = _mobileone_sd(r, "m.", k, cin, cout, groups, nb, scale, ident)
    x = r.randn(2, 8, 8, cin).astype(np.float32)
    ref = _mobileone_ref(sd, "m.", x, k, stride, groups)
    w, b = _fuse_mobileone(_SD(sd, "m."), k, groups)
    got = _conv_ref(x, w, stride, groups) + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_repmixer_fusion_exact():
    """Deploy RepMixer dw conv ≡ x + γ·(mixer(x) − norm(x)) with
    mixer/norm as train-form MobileOne dw blocks."""
    dim = 8
    r = np.random.RandomState(7)
    sd = {}
    sd.update(_mobileone_sd(r, "t.mixer.", 3, dim, dim, dim,
                            n_branches=1, scale=False, identity=True))
    sd.update(_mobileone_sd(r, "t.norm.", 3, dim, dim, dim,
                            n_branches=1, scale=False, identity=False))
    gamma = (r.rand(dim, 1, 1).astype(np.float32) * 0.1)
    sd["t.layer_scale.gamma"] = gamma
    x = r.randn(2, 6, 6, dim).astype(np.float32)
    ref = x + gamma.reshape(-1) * (
        _mobileone_ref(sd, "t.mixer.", x, 3, 1, dim)
        - _mobileone_ref(sd, "t.norm.", x, 3, 1, dim))
    w, b = _fuse_repmixer(_SD(sd, "t."), dim)
    got = _conv_ref(x, w, 1, dim) + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_repcpe_fusion_exact():
    """RepCPE: fused conv ≡ x + dw-conv(x)."""
    dim = 8
    r = np.random.RandomState(11)
    sd = {"p.proj.weight": r.randn(dim, 1, 7, 7).astype(np.float32) * 0.2,
          "p.proj.bias": r.randn(dim).astype(np.float32) * 0.1}
    x = r.randn(2, 8, 8, dim).astype(np.float32)
    ref = x + _conv_ref(x, sd["p.proj.weight"], 1, dim) + sd["p.proj.bias"]
    w, b = _fuse_repcpe(_SD(sd, "p."), dim)
    got = _conv_ref(x, w, 1, dim) + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_large_kernel_conv_fusion_exact():
    """ReparamLargeKernelConv: fused 7×7 ≡ BN(7×7 s2) + BN(3×3 s2,
    center-padded)."""
    cin, cout = 8, 16
    r = np.random.RandomState(13)
    sd = {"d.large_conv.conv.weight":
          r.randn(cout, 1, 7, 7).astype(np.float32) * 0.2,
          "d.small_conv.conv.weight":
          r.randn(cout, 1, 3, 3).astype(np.float32) * 0.2}
    sd.update(_bn_keys(r, "d.large_conv.bn.", cout))
    sd.update(_bn_keys(r, "d.small_conv.bn.", cout))
    x = r.randn(2, 8, 8, cin).astype(np.float32)
    ref = (_bn_ref(_conv_ref(x, sd["d.large_conv.conv.weight"], 2, cin),
                   sd["d.large_conv.bn.weight"], sd["d.large_conv.bn.bias"],
                   sd["d.large_conv.bn.running_mean"],
                   sd["d.large_conv.bn.running_var"])
           + _bn_ref(_conv_ref(x, sd["d.small_conv.conv.weight"], 2, cin,
                               padding=1),
                     sd["d.small_conv.bn.weight"],
                     sd["d.small_conv.bn.bias"],
                     sd["d.small_conv.bn.running_mean"],
                     sd["d.small_conv.bn.running_var"]))
    p = _lkc_params(_SD(sd, "d."), cin)
    got = np.asarray(mci._conv(jnp.asarray(x), jnp.asarray(p["w"]),
                               stride=2, groups=cin)) + p["b"]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Full checkpoint ingestion
# ---------------------------------------------------------------------------

def _synthetic_fastvit_sd(spec: FastVitSpec, seed: int = 0,
                          prefix: str = "visual.trunk."):
    """Train-form timm FastVit state dict for `spec`."""
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.1
    d0 = spec.dims[0]
    sd = {}
    sd.update(_mobileone_sd(r, prefix + "stem.0.", 3, 3, d0, 1,
                            n_branches=1, identity=False))
    # stem.1 is stride 2: timm's MobileOneBlock only builds the BN
    # identity branch for in_chs == out_chs AND stride == 1
    sd.update(_mobileone_sd(r, prefix + "stem.1.", 3, d0, d0, d0,
                            n_branches=1, identity=False))
    sd.update(_mobileone_sd(r, prefix + "stem.2.", 1, d0, d0, 1,
                            n_branches=1, scale=False))
    for s in range(len(spec.depths)):
        L, C = spec.depths[s], spec.dims[s]
        Hn = int(C * spec.mlp_ratio)
        pre = f"{prefix}stages.{s}."
        if s > 0:
            Cin = spec.dims[s - 1]
            sd[pre + "downsample.proj.0.large_conv.conv.weight"] = \
                f(C, 1, 7, 7)
            sd.update(_bn_keys(r, pre + "downsample.proj.0.large_conv.bn.",
                               C))
            sd[pre + "downsample.proj.0.small_conv.conv.weight"] = \
                f(C, 1, 3, 3)
            sd.update(_bn_keys(r, pre + "downsample.proj.0.small_conv.bn.",
                               C))
            if spec.se_downsamples[s]:
                rd = max(1, C // 16)
                sd[pre + "downsample.proj.0.se.fc1.weight"] = f(rd, C, 1, 1)
                sd[pre + "downsample.proj.0.se.fc1.bias"] = f(rd)
                sd[pre + "downsample.proj.0.se.fc2.weight"] = f(C, rd, 1, 1)
                sd[pre + "downsample.proj.0.se.fc2.bias"] = f(C)
            sd.update(_mobileone_sd(r, pre + "downsample.proj.1.", 1, C, C,
                                    1, n_branches=1, scale=False))
        if s in spec.pos_emb_stages:
            sd[pre + "pos_emb.proj.weight"] = f(C, 1, 7, 7)
            sd[pre + "pos_emb.proj.bias"] = f(C)
        for j in range(L):
            b = pre + f"blocks.{j}."
            if spec.token_mixers[s] == "repmixer":
                sd.update(_mobileone_sd(r, b + "token_mixer.mixer.", 3, C,
                                        C, C, n_branches=1, scale=False))
                sd.update(_mobileone_sd(r, b + "token_mixer.norm.", 3, C,
                                        C, C, n_branches=1, scale=False,
                                        identity=False))
                sd[b + "token_mixer.layer_scale.gamma"] = f(C, 1, 1)
                sd[b + "layer_scale.gamma"] = f(C, 1, 1)
            else:
                sd.update(_bn_keys(r, b + "norm.", C))
                sd[b + "token_mixer.qkv.weight"] = f(3 * C, C)
                sd[b + "token_mixer.qkv.bias"] = f(3 * C)
                sd[b + "token_mixer.proj.weight"] = f(C, C)
                sd[b + "token_mixer.proj.bias"] = f(C)
                sd[b + "layer_scale_1.gamma"] = f(C, 1, 1)
                sd[b + "layer_scale_2.gamma"] = f(C, 1, 1)
            sd[b + "mlp.conv.conv.weight"] = f(C, 1, 7, 7)
            sd.update(_bn_keys(r, b + "mlp.conv.bn.", C))
            sd[b + "mlp.fc1.weight"] = f(Hn, C, 1, 1)
            sd[b + "mlp.fc1.bias"] = f(Hn)
            sd[b + "mlp.fc2.weight"] = f(C, Hn, 1, 1)
            sd[b + "mlp.fc2.bias"] = f(C)
    Cl, fin = spec.dims[-1], spec.final_dim
    sd.update(_mobileone_sd(r, prefix + "final_conv.", 3, Cl, fin, Cl,
                            n_branches=1, identity=False))
    rd = max(1, fin // 16)
    sd[prefix + "final_conv.se.fc1.weight"] = f(rd, fin, 1, 1)
    sd[prefix + "final_conv.se.fc1.bias"] = f(rd)
    sd[prefix + "final_conv.se.fc2.weight"] = f(fin, rd, 1, 1)
    sd[prefix + "final_conv.se.fc2.bias"] = f(fin)
    sd[prefix + "head.fc.weight"] = f(spec.output_dim, fin)
    sd[prefix + "head.fc.bias"] = f(spec.output_dim)
    return sd


def test_fastvit_train_form_ingestion():
    sd = _synthetic_fastvit_sd(TINY_FV)
    params = jax.tree.map(jnp.asarray, timm_fastvit_to_params(sd, TINY_FV))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    out = encode_image_fastvit(params, TINY_FV, x, normalize=True)
    assert out.shape == (2, TINY_FV.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # deep-layer sensitivity: a perturbed stage-3 attention weight must
    # change the output (guards against silently dropped keys)
    sd2 = dict(sd)
    key = "visual.trunk.stages.3.blocks.0.token_mixer.qkv.weight"
    sd2[key] = sd2[key] + 0.3
    p2 = jax.tree.map(jnp.asarray, timm_fastvit_to_params(sd2, TINY_FV))
    out2 = encode_image_fastvit(p2, TINY_FV, x, normalize=True)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-5


def test_fastvit_deploy_form_roundtrip():
    """Writing the fused stem conv back as deploy-form `reparam_conv`
    keys reingests to identical parameters."""
    sd = _synthetic_fastvit_sd(TINY_FV)
    params = timm_fastvit_to_params(sd, TINY_FV)
    sd2 = {k: v for k, v in sd.items()
           if not k.startswith("visual.trunk.stem.0.")}
    w = params["stem"][0]["w"]            # HWIO → back to OIHW
    sd2["visual.trunk.stem.0.reparam_conv.weight"] = w.transpose(3, 2, 0, 1)
    sd2["visual.trunk.stem.0.reparam_conv.bias"] = params["stem"][0]["b"]
    params2 = timm_fastvit_to_params(sd2, TINY_FV)
    np.testing.assert_allclose(params2["stem"][0]["w"],
                               params["stem"][0]["w"], rtol=1e-6)
    np.testing.assert_allclose(params2["stem"][0]["b"],
                               params["stem"][0]["b"], rtol=1e-6)


def _se_ref(sd, prefix: str, x: np.ndarray) -> np.ndarray:
    """Squeeze-excite: GAP → 1×1 relu → 1×1 sigmoid gate (numpy)."""
    s = x.mean(axis=(1, 2), keepdims=True)
    s = _conv_ref(s, sd[prefix + "fc1.weight"], padding=0) \
        + sd[prefix + "fc1.bias"]
    s = np.maximum(s, 0.0)
    s = _conv_ref(s, sd[prefix + "fc2.weight"], padding=0) \
        + sd[prefix + "fc2.bias"]
    return x * (1.0 / (1.0 + np.exp(-s)))


def _gelu_np(x: np.ndarray) -> np.ndarray:
    # exact (erf) GELU — torch nn.GELU default
    import math

    import torch
    erf = torch.erf(torch.from_numpy(
        np.asarray(x / math.sqrt(2.0)))).numpy()
    return x * 0.5 * (1.0 + erf)


def _mob_full_ref(sd, prefix: str, x, k, stride, groups,
                  act=True) -> np.ndarray:
    """Train-form MobileOneBlock incl. SE and activation."""
    y = _mobileone_ref(sd, prefix, x, k, stride, groups)
    if prefix + "se.fc1.weight" in sd:
        y = _se_ref(sd, prefix + "se.", y)
    return _gelu_np(y) if act else y


def _convmlp_ref(sd, prefix: str, x, dim) -> np.ndarray:
    """ConvMlp: dw7×7 conv+BN, 1×1 fc1 → GELU → 1×1 fc2."""
    y = _bn_ref(_conv_ref(x, sd[prefix + "conv.conv.weight"], 1, dim),
                sd[prefix + "conv.bn.weight"], sd[prefix + "conv.bn.bias"],
                sd[prefix + "conv.bn.running_mean"],
                sd[prefix + "conv.bn.running_var"])
    y = _gelu_np(_conv_ref(y, sd[prefix + "fc1.weight"], padding=0)
                 + sd[prefix + "fc1.bias"])
    return _conv_ref(y, sd[prefix + "fc2.weight"], padding=0) \
        + sd[prefix + "fc2.bias"]


def _attention_ref(sd, prefix: str, x, head_dim) -> np.ndarray:
    B, H, W, C = x.shape
    nh = C // head_dim
    t = x.reshape(B, H * W, C)
    qkv = t @ sd[prefix + "qkv.weight"].T + sd[prefix + "qkv.bias"]
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(B, H * W, nh, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    a = np.einsum("bhqd,bhkd->bhqk", q, k) * head_dim ** -0.5
    a = a - a.max(-1, keepdims=True)
    a = np.exp(a)
    a = a / a.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    o = o @ sd[prefix + "proj.weight"].T + sd[prefix + "proj.bias"]
    return o.reshape(B, H, W, C)


def test_fastvit_full_forward_matches_trainform_oracle():
    """END-TO-END oracle: the published train-form FastViT network
    (multi-branch MobileOne stem, ReparamLargeKernelConv+SE
    downsamples, RepCPE, RepMixer blocks x = tm(x); x += γ·ConvMlp(x)
    with tm(x) = x + γ_m·(mixer(x) − norm(x)), BN-normed attention
    blocks, SE'd final conv, GAP head) composed in numpy branch by
    branch from the same synthetic train-form state dict that
    `timm_fastvit_to_params` fuses — the fused deploy-form JAX forward
    must reproduce it.  This pins the composed *wiring* (block order,
    residual placement, layer-scale application, SE/act positions),
    not just the per-block fusion algebra the tests above pin."""
    spec = TINY_FV
    sd_full = _synthetic_fastvit_sd(spec)
    sd = {k.replace("visual.trunk.", ""): v for k, v in sd_full.items()}
    r = np.random.RandomState(5)
    x = r.rand(2, spec.image_size, spec.image_size, 3).astype(np.float32)

    # ---- numpy train-form forward
    y = _mob_full_ref(sd, "stem.0.", x, 3, 2, 1)
    y = _mob_full_ref(sd, "stem.1.", y, 3, 2, spec.dims[0])
    y = _mob_full_ref(sd, "stem.2.", y, 1, 1, 1)
    for s in range(len(spec.depths)):
        C = spec.dims[s]
        pre = f"stages.{s}."
        if s > 0:
            Cin = spec.dims[s - 1]
            d = pre + "downsample.proj.0."
            z = (_bn_ref(_conv_ref(y, sd[d + "large_conv.conv.weight"], 2,
                                   Cin),
                         sd[d + "large_conv.bn.weight"],
                         sd[d + "large_conv.bn.bias"],
                         sd[d + "large_conv.bn.running_mean"],
                         sd[d + "large_conv.bn.running_var"])
                 + _bn_ref(_conv_ref(y, sd[d + "small_conv.conv.weight"], 2,
                                     Cin, padding=1),
                           sd[d + "small_conv.bn.weight"],
                           sd[d + "small_conv.bn.bias"],
                           sd[d + "small_conv.bn.running_mean"],
                           sd[d + "small_conv.bn.running_var"]))
            if d + "se.fc1.weight" in sd:
                z = _se_ref(sd, d + "se.", z)
            y = _gelu_np(z)
            y = _mob_full_ref(sd, pre + "downsample.proj.1.", y, 1, 1, 1)
        if s in spec.pos_emb_stages:
            y = y + _conv_ref(y, sd[pre + "pos_emb.proj.weight"], 1, C) \
                + sd[pre + "pos_emb.proj.bias"]
        for j in range(spec.depths[s]):
            b = pre + f"blocks.{j}."
            if spec.token_mixers[s] == "repmixer":
                gm = sd[b + "token_mixer.layer_scale.gamma"].reshape(-1)
                y = y + gm * (
                    _mobileone_ref(sd, b + "token_mixer.mixer.", y, 3, 1, C)
                    - _mobileone_ref(sd, b + "token_mixer.norm.", y, 3, 1, C))
                g2 = sd[b + "layer_scale.gamma"].reshape(-1)
                y = y + g2 * _convmlp_ref(sd, b + "mlp.", y, C)
            else:
                n = _bn_ref(y, sd[b + "norm.weight"], sd[b + "norm.bias"],
                            sd[b + "norm.running_mean"],
                            sd[b + "norm.running_var"])
                g1 = sd[b + "layer_scale_1.gamma"].reshape(-1)
                y = y + g1 * _attention_ref(sd, b + "token_mixer.", n,
                                            spec.attn_head_dim)
                g2 = sd[b + "layer_scale_2.gamma"].reshape(-1)
                y = y + g2 * _convmlp_ref(sd, b + "mlp.", y, C)
    y = _mob_full_ref(sd, "final_conv.", y, 3, 1, spec.dims[-1])
    pooled = y.mean(axis=(1, 2))
    want = pooled @ sd["head.fc.weight"].T + sd["head.fc.bias"]

    # ---- fused deploy-form JAX forward over the ingested params
    params = jax.tree.map(jnp.asarray, timm_fastvit_to_params(sd_full,
                                                              spec))
    got = np.asarray(encode_image_fastvit(params, spec, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fastvit_missing_key_is_loud():
    sd = _synthetic_fastvit_sd(TINY_FV)
    del sd["visual.trunk.stem.0.conv_kxk.0.conv.weight"]
    with pytest.raises(KeyError, match="no conv_kxk.0/reparam_conv"):
        timm_fastvit_to_params(sd, TINY_FV)


def _synthetic_mci_vit_sd(spec: MciViTSpec, seed: int = 0,
                          prefix: str = "visual.trunk."):
    r = np.random.RandomState(seed)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.05
    D = spec.width
    chans = (3,) + spec.stem_channels
    sd = {}
    for i, k in enumerate(spec.stem_kernels):
        sd[f"{prefix}patch_embed.backbone.{i}.conv.weight"] = \
            f(chans[i + 1], chans[i], k, k)
        sd.update(_bn_keys(r, f"{prefix}patch_embed.backbone.{i}.bn.",
                           chans[i + 1]))
    sd[prefix + "patch_embed.proj.weight"] = f(D, spec.stem_channels[-1],
                                               1, 1)
    sd[prefix + "patch_embed.proj.bias"] = f(D)
    sd[prefix + "cls_token"] = f(1, 1, D)
    sd[prefix + "pos_embed"] = f(1, spec.grid_size ** 2, D)
    for i in range(spec.layers):
        b = f"{prefix}blocks.{i}."
        Hn = int(D * spec.mlp_ratio)
        sd.update({b + "norm1.weight": 1 + f(D), b + "norm1.bias": f(D),
                   b + "attn.qkv.weight": f(3 * D, D),
                   b + "attn.qkv.bias": f(3 * D),
                   b + "attn.proj.weight": f(D, D),
                   b + "attn.proj.bias": f(D),
                   b + "norm2.weight": 1 + f(D), b + "norm2.bias": f(D),
                   b + "mlp.fc1.weight": f(Hn, D), b + "mlp.fc1.bias": f(Hn),
                   b + "mlp.fc2.weight": f(D, Hn), b + "mlp.fc2.bias": f(D)})
    sd[prefix + "norm.weight"] = 1 + f(D)
    sd[prefix + "norm.bias"] = f(D)
    sd[prefix + "head.weight"] = f(spec.output_dim, D)
    sd[prefix + "head.bias"] = f(spec.output_dim)
    return sd


def test_mci_vit_full_forward_matches_torch_oracle():
    """Composed oracle for the hybrid MCi-ViT (timm vit_base_mci_224):
    ConvStem (conv+BN+GELU per layer, kernel == stride, pad 0) →
    HybridEmbed 1×1 proj → no_embed_class (pos embed on patch tokens,
    cls prepended after) → pre-LN ViT blocks → final LN → token pool →
    trunk head.  Written in torch from the published architecture,
    consuming the same timm-layout state dict the ingestion fuses."""
    import torch
    import torch.nn.functional as F

    spec = TINY_VIT
    sd_np = _synthetic_mci_vit_sd(spec)
    sd = {k.replace("visual.trunk.", ""): torch.from_numpy(np.asarray(v))
          for k, v in sd_np.items()}
    r = np.random.RandomState(9)
    imgs = r.rand(2, spec.image_size, spec.image_size, 3).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        for i, k in enumerate(spec.stem_kernels):
            p = f"patch_embed.backbone.{i}."
            x = F.conv2d(x, sd[p + "conv.weight"], stride=k)
            x = F.batch_norm(x, sd[p + "bn.running_mean"],
                             sd[p + "bn.running_var"],
                             sd[p + "bn.weight"], sd[p + "bn.bias"],
                             training=False)
            x = F.gelu(x)
        x = F.conv2d(x, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"])
        B, D, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = x + sd["pos_embed"]                     # no_embed_class
        x = torch.cat([sd["cls_token"].expand(B, -1, -1), x], dim=1)
        hd = D // spec.heads
        for i in range(spec.layers):
            b = f"blocks.{i}."
            y = F.layer_norm(x, (D,), sd[b + "norm1.weight"],
                             sd[b + "norm1.bias"], spec.ln_eps)
            qkv = F.linear(y, sd[b + "attn.qkv.weight"],
                           sd[b + "attn.qkv.bias"])
            q, k, v = qkv.chunk(3, dim=-1)
            q = q.reshape(B, -1, spec.heads, hd).transpose(1, 2)
            k = k.reshape(B, -1, spec.heads, hd).transpose(1, 2)
            v = v.reshape(B, -1, spec.heads, hd).transpose(1, 2)
            a = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, -1, D)
            x = x + F.linear(o, sd[b + "attn.proj.weight"],
                             sd[b + "attn.proj.bias"])
            y = F.layer_norm(x, (D,), sd[b + "norm2.weight"],
                             sd[b + "norm2.bias"], spec.ln_eps)
            h = F.gelu(F.linear(y, sd[b + "mlp.fc1.weight"],
                                sd[b + "mlp.fc1.bias"]))
            x = x + F.linear(h, sd[b + "mlp.fc2.weight"],
                             sd[b + "mlp.fc2.bias"])
        x = F.layer_norm(x, (D,), sd["norm.weight"], sd["norm.bias"],
                         spec.ln_eps)
        want = F.linear(x[:, 0], sd["head.weight"],
                        sd["head.bias"]).numpy()

    params = jax.tree.map(jnp.asarray, timm_mci_vit_to_params(sd_np, spec))
    got = np.asarray(mci.encode_image_mci_vit(params, spec,
                                              jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mci_vit_ingestion():
    """ConvStem fusion + no_embed_class pos embed (patch tokens only,
    timm `vision_transformer_hybrid` layout) map onto a runnable tree."""
    sd = _synthetic_mci_vit_sd(TINY_VIT)
    assert sd["visual.trunk.pos_embed"].shape[1] == 4   # grid 2×2, no cls
    params = jax.tree.map(jnp.asarray, timm_mci_vit_to_params(sd, TINY_VIT))
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3), jnp.float32)
    out = encode_image_mci_vit(params, TINY_VIT, x, normalize=True)
    assert out.shape == (2, TINY_VIT.output_dim)
    assert np.isfinite(np.asarray(out)).all()
    # cls sensitivity: token pool reads position 0 — perturbing the cls
    # token must move the output (random direction: a CONSTANT shift is
    # a LayerNorm null direction and provably cancels)
    sd2 = dict(sd)
    sd2["visual.trunk.cls_token"] = (
        sd2["visual.trunk.cls_token"]
        + np.random.RandomState(8).randn(1, 1, TINY_VIT.width)
        .astype(np.float32))
    p2 = jax.tree.map(jnp.asarray, timm_mci_vit_to_params(sd2, TINY_VIT))
    out2 = encode_image_mci_vit(p2, TINY_VIT, x, normalize=True)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-5


def test_interop_routes_mci_trunk_checkpoints():
    """openclip_to_params auto-routes `visual.trunk.` checkpoints to
    the MCI ingestion when the config carries a FastVit spec."""
    from leaf_tpu.models.interop import openclip_to_params
    cfg = get_model_config("fastvit-tiny-test")
    sd = _synthetic_fastvit_sd(cfg.trunk)
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
    x = jnp.asarray(np.random.RandomState(6).rand(2, 32, 32, 3), jnp.float32)
    out = lclip.encode_image_model(params, cfg, x, normalize=True)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
