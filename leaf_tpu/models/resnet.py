"""ModifiedResNet vision tower (RN50-family CLIP models).

Re-expression of `/root/reference/src/open_clip/modified_resnet.py`:
3-conv stem with avgpool, anti-aliased strided bottlenecks (avgpool
before the stride-carrying conv), and a QKV attention-pool head whose
query is the mean token with a 2-D positional embedding.

NHWC layout throughout; convolutions are `lax.conv_general_dilated`.
BatchNorm runs in inference form (running stats); `train_mode=True`
normalises with batch statistics and returns updated running stats —
the functional equivalent of torch's train-mode BN.

Parity vs the reference torch model is pinned by
`tests/test_reference_parity.py::test_rn50_forward_parity`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models.clip import l2_normalize

Params = Dict[str, Any]
EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class ResNetVisionConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    image_size: int = 224
    heads: int = 32               # attn-pool heads = vision_width*32/64
    output_dim: int = 1024

    @property
    def embed_width(self) -> int:
        return self.width * 32

    @property
    def spacial_dim(self) -> int:
        return self.image_size // 32


# -- primitive ops -----------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: int = 0) -> jnp.ndarray:
    """NHWC conv; w is [kh, kw, cin, cout] (cast to x's dtype — bf16
    towers crash the conv on mixed dtypes otherwise)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(p: Params, x: jnp.ndarray, train_mode: bool = False,
               eps: float = 1e-5, momentum: float = 0.1):
    """Torch-semantics BN over NHWC channels; returns (y, new_stats)."""
    if train_mode:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        # torch: running_mean ← (1-m)·running + m·batch_mean;
        #        running_var  ← (1-m)·running + m·unbiased_batch_var
        new_stats = {"mean": (1 - momentum) * p["mean"] + momentum * mean,
                     "var": (1 - momentum) * p["var"] + momentum * unbiased}
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    # BN statistics in fp32 (bf16 rsqrt of tiny variances is lossy),
    # output back in x's dtype
    y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
         * p["scale"] + p["bias"])
    return y.astype(x.dtype), new_stats


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


# -- init --------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    bound = (1 / fan_in) ** 0.5
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                              -bound, bound)


def _init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _init_bottleneck(key, inplanes, planes, stride):
    k = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(k[0], 1, 1, inplanes, planes),
        "bn1": _init_bn(planes),
        "conv2": _init_conv(k[1], 3, 3, planes, planes),
        "bn2": _init_bn(planes),
        "conv3": _init_conv(k[2], 1, 1, planes, planes * EXPANSION),
        "bn3": _init_bn(planes * EXPANSION),
    }
    if stride > 1 or inplanes != planes * EXPANSION:
        p["downsample"] = {
            "conv": _init_conv(k[3], 1, 1, inplanes, planes * EXPANSION),
            "bn": _init_bn(planes * EXPANSION),
        }
    return p


def init_resnet(key, cfg: ResNetVisionConfig) -> Params:
    keys = jax.random.split(key, 8 + sum(cfg.layers))
    w = cfg.width
    p: Params = {
        "conv1": _init_conv(keys[0], 3, 3, 3, w // 2), "bn1": _init_bn(w // 2),
        "conv2": _init_conv(keys[1], 3, 3, w // 2, w // 2),
        "bn2": _init_bn(w // 2),
        "conv3": _init_conv(keys[2], 3, 3, w // 2, w), "bn3": _init_bn(w),
    }
    ki = 3
    inplanes = w
    for li, (blocks, planes, stride) in enumerate(zip(
            cfg.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))):
        layer = []
        for b in range(blocks):
            layer.append(_init_bottleneck(
                keys[ki], inplanes, planes, stride if b == 0 else 1))
            inplanes = planes * EXPANSION
            ki += 1
        p[f"layer{li + 1}"] = layer
    D = cfg.embed_width
    std = D ** -0.5
    kq, kk, kv, kc, kp = jax.random.split(keys[ki], 5)
    p["attnpool"] = {
        "positional_embedding": std * jax.random.normal(
            kp, (cfg.spacial_dim ** 2 + 1, D)),
        "q_w": std * jax.random.normal(kq, (D, D)), "q_b": jnp.zeros((D,)),
        "k_w": std * jax.random.normal(kk, (D, D)), "k_b": jnp.zeros((D,)),
        "v_w": std * jax.random.normal(kv, (D, D)), "v_b": jnp.zeros((D,)),
        "c_w": std * jax.random.normal(kc, (cfg.output_dim, D)),
        "c_b": jnp.zeros((cfg.output_dim,)),
    }
    return p


# -- forward -----------------------------------------------------------------

def _bottleneck(p: Params, x, stride: int, train_mode: bool):
    identity = x
    out, _ = batch_norm(p["bn1"], conv2d(x, p["conv1"]), train_mode)
    out = jax.nn.relu(out)
    out, _ = batch_norm(p["bn2"], conv2d(out, p["conv2"], padding=1),
                        train_mode)
    out = jax.nn.relu(out)
    if stride > 1:
        out = avg_pool(out, stride)
    out, _ = batch_norm(p["bn3"], conv2d(out, p["conv3"]), train_mode)
    if "downsample" in p:
        identity = avg_pool(x, stride) if stride > 1 else x
        identity = conv2d(identity, p["downsample"]["conv"])
        identity, _ = batch_norm(p["downsample"]["bn"], identity, train_mode)
    return jax.nn.relu(out + identity)


def attention_pool_2d(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, output_dim] (reference AttentionPool2d)."""
    B, H, W, C = x.shape
    dtype = x.dtype
    tokens = x.reshape(B, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)
    tokens = tokens + p["positional_embedding"].astype(dtype)
    q = tokens[:, :1] @ p["q_w"].astype(dtype).T + p["q_b"].astype(dtype)
    k = tokens @ p["k_w"].astype(dtype).T + p["k_b"].astype(dtype)
    v = tokens @ p["v_w"].astype(dtype).T + p["v_b"].astype(dtype)
    head_dim = C // n_heads

    def heads(t):
        return t.reshape(B, t.shape[1], n_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * head_dim ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return out @ p["c_w"].astype(dtype).T + p["c_b"].astype(dtype)


def encode_image_resnet(params: Params, cfg: ResNetVisionConfig,
                        images: jnp.ndarray, normalize: bool = False,
                        train_mode: bool = False,
                        dtype=jnp.float32) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    x = images.astype(dtype)
    x, _ = batch_norm(params["bn1"], conv2d(x, params["conv1"], stride=2,
                                            padding=1), train_mode)
    x = jax.nn.relu(x)
    x, _ = batch_norm(params["bn2"], conv2d(x, params["conv2"], padding=1),
                      train_mode)
    x = jax.nn.relu(x)
    x, _ = batch_norm(params["bn3"], conv2d(x, params["conv3"], padding=1),
                      train_mode)
    x = jax.nn.relu(x)
    x = avg_pool(x, 2)
    for li in range(1, 5):
        for b, bp in enumerate(params[f"layer{li}"]):
            stride = 2 if (b == 0 and li > 1) else 1
            x = _bottleneck(bp, x, stride, train_mode)
    pooled = attention_pool_2d(params["attnpool"], x, cfg.heads)
    return l2_normalize(pooled) if normalize else pooled


# -- interop -----------------------------------------------------------------

def _t2j_conv(w) -> np.ndarray:
    """torch conv weight [cout, cin, kh, kw] → HWIO."""
    import numpy as _np
    a = w.detach().cpu().float().numpy() if hasattr(w, "detach") else _np.asarray(w)
    return a.transpose(2, 3, 1, 0)


def resnet_openclip_to_params(sd, prefix: str,
                              cfg: ResNetVisionConfig) -> Params:
    """Reference `visual.*` ModifiedResNet state dict → pytree."""
    import numpy as _np

    def np_(k):
        v = sd[prefix + k]
        return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
                else _np.asarray(v, dtype=_np.float32))

    def bn(name):
        return {"scale": np_(f"{name}.weight"), "bias": np_(f"{name}.bias"),
                "mean": np_(f"{name}.running_mean"),
                "var": np_(f"{name}.running_var")}

    p: Params = {
        "conv1": _t2j_conv(sd[prefix + "conv1.weight"]), "bn1": bn("bn1"),
        "conv2": _t2j_conv(sd[prefix + "conv2.weight"]), "bn2": bn("bn2"),
        "conv3": _t2j_conv(sd[prefix + "conv3.weight"]), "bn3": bn("bn3"),
    }
    for li in range(1, 5):
        blocks = []
        b = 0
        while f"{prefix}layer{li}.{b}.conv1.weight" in sd:
            base = f"layer{li}.{b}."
            bp = {
                "conv1": _t2j_conv(sd[prefix + base + "conv1.weight"]),
                "bn1": bn(base + "bn1"),
                "conv2": _t2j_conv(sd[prefix + base + "conv2.weight"]),
                "bn2": bn(base + "bn2"),
                "conv3": _t2j_conv(sd[prefix + base + "conv3.weight"]),
                "bn3": bn(base + "bn3"),
            }
            if f"{prefix}{base}downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _t2j_conv(sd[prefix + base + "downsample.0.weight"]),
                    "bn": bn(base + "downsample.1"),
                }
            blocks.append(bp)
            b += 1
        p[f"layer{li}"] = blocks
    ap = "attnpool."
    p["attnpool"] = {
        "positional_embedding": np_(ap + "positional_embedding"),
        "q_w": np_(ap + "q_proj.weight"), "q_b": np_(ap + "q_proj.bias"),
        "k_w": np_(ap + "k_proj.weight"), "k_b": np_(ap + "k_proj.bias"),
        "v_w": np_(ap + "v_proj.weight"), "v_b": np_(ap + "v_proj.bias"),
        "c_w": np_(ap + "c_proj.weight"), "c_b": np_(ap + "c_proj.bias"),
    }
    return p
