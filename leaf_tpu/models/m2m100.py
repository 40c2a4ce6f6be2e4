"""Native JAX M2M100 text encoder (the NLLB-CLIP text tower).

transformers ships no Flax implementation of M2M100, so the nllb-clip
registry entries (reference `model_configs/nllb-clip-*.json`, which wrap
`facebook/nllb-200-distilled-{600M,1.3B}` via torch `AutoModel`,
`hf_model.py:87-104`) get a scan-stacked JAX encoder here instead.
Architecture (HF `modeling_m2m_100.py::M2M100Encoder`):

  * token embedding scaled by sqrt(d_model) (`scale_embedding`),
  * sinusoidal positions indexed by pad-aware position ids
    (`create_position_ids_from_input_ids`: pads stay at padding_idx,
    real tokens count up from padding_idx+1; the table has a +2 offset
    worth of extra rows),
  * pre-norm encoder layers (ln -> MHA -> residual, ln -> relu MLP ->
    residual), final LayerNorm after the stack.

Parity vs the torch `M2M100Model` encoder is pinned in
tests/test_m2m100.py (transformers torch is in the container).
"""
from __future__ import annotations

import dataclasses
import math
from types import SimpleNamespace
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class M2M100Spec:
    vocab_size: int
    d_model: int
    layers: int
    heads: int
    ffn_dim: int
    max_positions: int = 1024
    pad_token_id: int = 1
    scale_embedding: bool = True
    ln_eps: float = 1e-5

    @classmethod
    def from_hf_config(cls, config) -> "M2M100Spec":
        return cls(vocab_size=config.vocab_size, d_model=config.d_model,
                   layers=config.encoder_layers,
                   heads=config.encoder_attention_heads,
                   ffn_dim=config.encoder_ffn_dim,
                   max_positions=config.max_position_embeddings,
                   pad_token_id=config.pad_token_id,
                   scale_embedding=config.scale_embedding)


def sinusoid_table(n_pos: int, dim: int, padding_idx: int) -> np.ndarray:
    """HF `M2M100SinusoidalPositionalEmbedding.get_embedding`: [sin|cos]
    concatenated (not interleaved), padding_idx row zeroed."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64)
                  * -(math.log(10000.0) / (half - 1)))
    ang = np.arange(n_pos, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n_pos, 1))], axis=1)
    emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def position_ids_from_tokens(input_ids, pad: int):
    """`create_position_ids_from_input_ids`: pads -> pad, tokens ->
    pad + 1, pad + 2, ..."""
    mask = (input_ids != pad).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad


def init_m2m100_encoder(key, spec: M2M100Spec) -> Params:
    ks = jax.random.split(key, 6)
    D, H, L = spec.d_model, spec.ffn_dim, spec.layers
    s = 0.02

    def nrm(k, *shape):
        return s * jax.random.normal(k, shape, jnp.float32)

    embed = nrm(ks[0], spec.vocab_size, D)
    embed = embed.at[spec.pad_token_id].set(0.0)  # torch padding_idx init
    lk = jax.random.split(ks[1], 6)
    return {
        "embed_tokens": embed,
        "layers": {
            "ln_attn": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
            "attn": {
                "q_w": nrm(lk[0], L, D, D), "q_b": jnp.zeros((L, D)),
                "k_w": nrm(lk[1], L, D, D), "k_b": jnp.zeros((L, D)),
                "v_w": nrm(lk[2], L, D, D), "v_b": jnp.zeros((L, D)),
                "out_w": nrm(lk[3], L, D, D), "out_b": jnp.zeros((L, D)),
            },
            "ln_mlp": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
            "fc1_w": nrm(lk[4], L, D, H), "fc1_b": jnp.zeros((L, H)),
            "fc2_w": nrm(lk[5], L, H, D), "fc2_b": jnp.zeros((L, D)),
        },
        "ln_final": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(
        x.dtype)


def m2m100_encode(params: Params, spec: M2M100Spec, input_ids,
                  attention_mask=None, dtype=jnp.float32) -> jnp.ndarray:
    """[B, S] token ids -> [B, S, D] final hidden states."""
    if attention_mask is None:
        attention_mask = (input_ids != spec.pad_token_id).astype(jnp.int32)
    scale = math.sqrt(spec.d_model) if spec.scale_embedding else 1.0
    h = params["embed_tokens"].astype(dtype)[input_ids] * scale
    table = jnp.asarray(sinusoid_table(spec.max_positions + 2, spec.d_model,
                                       spec.pad_token_id), dtype)
    h = h + table[position_ids_from_tokens(input_ids, spec.pad_token_id)]

    # additive key mask, [B, 1, 1, S]
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    nh = spec.heads
    hd = spec.d_model // nh
    eps = spec.ln_eps

    def block(h, lp):
        res = h
        x = _ln(h, lp["ln_attn"]["scale"], lp["ln_attn"]["bias"], eps)
        a = lp["attn"]
        B, S, D = x.shape
        q = (x @ a["q_w"].astype(dtype) + a["q_b"].astype(dtype)) * (
            hd ** -0.5)
        k = x @ a["k_w"].astype(dtype) + a["k_b"].astype(dtype)
        v = x @ a["v_w"].astype(dtype) + a["v_b"].astype(dtype)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        w = jax.nn.softmax(logits + bias, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
        h = res + (o @ a["out_w"].astype(dtype) + a["out_b"].astype(dtype))

        res = h
        x = _ln(h, lp["ln_mlp"]["scale"], lp["ln_mlp"]["bias"], eps)
        x = jax.nn.relu(x @ lp["fc1_w"].astype(dtype)
                        + lp["fc1_b"].astype(dtype))
        h = res + (x @ lp["fc2_w"].astype(dtype)
                   + lp["fc2_b"].astype(dtype))
        return h, None

    h, _ = jax.lax.scan(block, h, params["layers"])
    return _ln(h, params["ln_final"]["scale"], params["ln_final"]["bias"],
               eps)


def m2m100_from_torch(sd: Mapping[str, Any], spec: M2M100Spec,
                      prefix: str = "model.") -> Params:
    """torch M2M100Model / nllb-clip state dict (encoder part) -> pytree.

    `prefix` is everything before `encoder.` — e.g. `model.` for a bare
    `M2M100Model`, `text.transformer.model.` for open_clip nllb-clip
    checkpoints."""
    def g(k):
        v = sd[prefix + k]
        return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
                else np.asarray(v, np.float32))

    emb_key = ("encoder.embed_tokens.weight"
               if prefix + "encoder.embed_tokens.weight" in sd
               else "shared.weight")

    def stack(fmt, transpose=False):
        per = []
        for i in range(spec.layers):
            w = g(fmt.format(i))
            per.append(w.T if transpose else w)
        return np.stack(per)

    lf = "encoder.layers.{}."
    return {
        "embed_tokens": g(emb_key),
        "layers": {
            "ln_attn": {
                "scale": stack(lf + "self_attn_layer_norm.weight"),
                "bias": stack(lf + "self_attn_layer_norm.bias")},
            "attn": {
                "q_w": stack(lf + "self_attn.q_proj.weight", True),
                "q_b": stack(lf + "self_attn.q_proj.bias"),
                "k_w": stack(lf + "self_attn.k_proj.weight", True),
                "k_b": stack(lf + "self_attn.k_proj.bias"),
                "v_w": stack(lf + "self_attn.v_proj.weight", True),
                "v_b": stack(lf + "self_attn.v_proj.bias"),
                "out_w": stack(lf + "self_attn.out_proj.weight", True),
                "out_b": stack(lf + "self_attn.out_proj.bias")},
            "ln_mlp": {
                "scale": stack(lf + "final_layer_norm.weight"),
                "bias": stack(lf + "final_layer_norm.bias")},
            "fc1_w": stack(lf + "fc1.weight", True),
            "fc1_b": stack(lf + "fc1.bias"),
            "fc2_w": stack(lf + "fc2.weight", True),
            "fc2_b": stack(lf + "fc2.bias"),
        },
        "ln_final": {"scale": g("encoder.layer_norm.weight"),
                     "bias": g("encoder.layer_norm.bias")},
    }


class M2M100EncoderModule:
    """FlaxAutoModel-shaped adapter so HFTextTower can drive the native
    encoder: exposes `.config`, `.params`, and
    `module(input_ids=..., attention_mask=..., params=...)` returning an
    object with `.last_hidden_state`."""

    def __init__(self, config, seed: int = 0):
        self.config = config
        self.spec = M2M100Spec.from_hf_config(config)
        self.params = init_m2m100_encoder(jax.random.PRNGKey(seed),
                                          self.spec)

    @classmethod
    def from_pretrained(cls, name_or_path: str, config=None):
        from leaf_tpu.models import interop
        if config is None:
            from leaf_tpu.models.hf_text import resolve_hf_config
            config = resolve_hf_config(name_or_path)
        self = cls.__new__(cls)
        self.config = config
        self.spec = M2M100Spec.from_hf_config(config)
        sd = interop.load_state_dict_file(
            interop.resolve_checkpoint_file(name_or_path))
        prefix = ("model." if any(k.startswith("model.encoder.")
                                  for k in sd) else "")
        self.params = m2m100_from_torch(sd, self.spec, prefix=prefix)
        return self

    def __call__(self, input_ids=None, attention_mask=None, params=None):
        h = m2m100_encode(params if params is not None else self.params,
                          self.spec, input_ids, attention_mask)
        return SimpleNamespace(last_hidden_state=h, pooler_output=None)
