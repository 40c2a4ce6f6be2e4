"""CoCa (Contrastive Captioner) model family.

Re-expression of the reference's CoCa
(`/root/reference/src/open_clip/coca_model.py` +
`transformer.py:187-208` AttentionalPooler, `:812-920`
MultimodalTransformer):

  * vision tower + 256-query attentional pooler → (contrastive latent =
    pooled token 0, image embs = tokens 1..n);
  * text tower with a CLS embedding appended at the END of the
    sequence, pooled at the CLS position with ln_final after pooling
    (reference `transformer.py:795-801`), per-sample additive mask =
    causal + pad mask (`build_cls_mask`, `transformer.py:767-774`);
  * multimodal decoder: per layer a causal self-attention block then a
    cross-attention block over the image embs, final LN + projection to
    the vocabulary.

Parity vs the reference torch implementation is pinned by
`tests/test_reference_parity.py::test_coca_forward_parity`.
Greedy/top-k/top-p generation is `generate()` — one jitted `lax.scan`;
group beam search (`generate_beamsearch`) is decision-equal to the
reference's `_generate_beamsearch` + HF BeamSearchScorer, pinned by
`test_reference_parity.py::test_coca_beamsearch_decision_parity`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers
from leaf_tpu.models.clip import causal_mask, l2_normalize, patchify
from leaf_tpu.models.config import TextConfig, VisionConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MultimodalConfig:
    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    vocab_size: int = 49408
    ln_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class CoCaConfig:
    name: str
    embed_dim: int
    text: TextConfig
    vision: VisionConfig
    multimodal: MultimodalConfig
    n_queries: int = 256
    attn_pooler_heads: int = 8
    quick_gelu: bool = False
    init_logit_scale: float = 2.6592
    pad_id: int = 0
    # generation special ids (CLIP BPE defaults; HF towers override —
    # roberta: bos 0 / eos 2 / pad 1)
    sot_token_id: int = 49406
    eos_token_id: int = 49407
    # set → the text tower is a HuggingFace model (reference
    # `coca_roberta-ViT-B-32.json`: hf_model_name + custom_text); the
    # multimodal decoder width must equal the HF hidden size, and the
    # decoder vocab stays text.vocab_size (the reference keeps the
    # CLIP-BPE decoder vocab even for HF towers, coca_model.py:114-118)
    hf_text_name: Optional[str] = None
    hf_pooler: str = "mean_pooler"
    hf_proj: Optional[str] = "linear"
    # per-model preprocess statistics (None → OpenAI CLIP stats), same
    # contract as CLIPConfig.image_mean/image_std
    image_mean: Optional[Tuple[float, float, float]] = None
    image_std: Optional[Tuple[float, float, float]] = None


# -- registry ----------------------------------------------------------------

def coca_vit_b_32() -> CoCaConfig:
    """reference `model_configs/coca_ViT-B-32.json`"""
    return CoCaConfig(
        name="coca_ViT-B-32", embed_dim=512,
        text=TextConfig(context_length=76, width=512, heads=8, layers=12,
                        output_dim=512),
        vision=VisionConfig(image_size=224, patch_size=32, width=768,
                            layers=12, output_dim=512),
        multimodal=MultimodalConfig(context_length=76, width=512, heads=8,
                                    layers=12))


def coca_vit_l_14() -> CoCaConfig:
    """reference `model_configs/coca_ViT-L-14.json`"""
    return CoCaConfig(
        name="coca_ViT-L-14", embed_dim=768,
        text=TextConfig(context_length=76, width=768, heads=12, layers=12,
                        output_dim=768),
        vision=VisionConfig(image_size=224, patch_size=14, width=1024,
                            layers=24, output_dim=768),
        multimodal=MultimodalConfig(context_length=76, width=768, heads=12,
                                    layers=12))


def coca_base() -> CoCaConfig:
    """reference `model_configs/coca_base.json` (the 64k-vocab paper
    config: 288px/patch-18 vision, width-768 towers)."""
    return CoCaConfig(
        name="coca_base", embed_dim=512,
        text=TextConfig(context_length=76, vocab_size=64000, width=768,
                        heads=12, layers=12, output_dim=512),
        vision=VisionConfig(image_size=288, patch_size=18, width=768,
                            layers=12, output_dim=512),
        multimodal=MultimodalConfig(context_length=76, vocab_size=64000,
                                    width=768, heads=12, layers=12),
        n_queries=256, attn_pooler_heads=8)


def coca_roberta_vit_b_32() -> CoCaConfig:
    """reference `model_configs/coca_roberta-ViT-B-32.json`: roberta-base
    text tower (output_tokens), ViT-B-32 vision, width-768 decoder.

    NOTE (upstream-faithful): the captioning decoder of this config is
    width-inconsistent in the reference itself — the attentional pooler
    emits embed_dim(512)-wide image embs while the decoder's cross
    attention is a plain width(768) nn.MultiheadAttention with no kdim
    (`coca_model.py:120-131`, `transformer.py:836-849`), so its
    forward/generate raise upstream exactly as they do here (coca_base
    shares the same inconsistency).  The contrastive towers
    (encode_image/encode_text) are fully functional."""
    return CoCaConfig(
        name="coca_roberta-ViT-B-32", embed_dim=512,
        text=TextConfig(context_length=76, width=768, heads=12, layers=12,
                        output_dim=512),
        vision=VisionConfig(image_size=224, patch_size=32, width=768,
                            layers=12, output_dim=512),
        multimodal=MultimodalConfig(context_length=76, width=768, heads=8,
                                    layers=12),
        hf_text_name="roberta-base",
        pad_id=1, sot_token_id=0, eos_token_id=2)


def coca_roberta_tiny_test() -> CoCaConfig:
    """CI-sized HF-text CoCa (not in the reference): a 2-layer roberta
    tower standing in for roberta-base."""
    return CoCaConfig(
        name="coca-roberta-tiny-test", embed_dim=64,
        text=TextConfig(context_length=16, width=64, heads=2, layers=2,
                        output_dim=64),
        vision=VisionConfig(image_size=64, patch_size=16, width=64,
                            layers=2, head_width=32, output_dim=64),
        # self-consistent widths (embed == mm width == hf hidden) so the
        # captioning path actually runs — unlike the reference's
        # full-size config, see coca_roberta_vit_b_32
        multimodal=MultimodalConfig(context_length=16, width=64, heads=2,
                                    layers=2, vocab_size=100),
        n_queries=8, attn_pooler_heads=2,
        hf_text_name="_tiny_roberta_test")


def coca_tiny_test() -> CoCaConfig:
    """CI-sized CoCa (not in the reference; mirrors ViT-tiny-test)."""
    return CoCaConfig(
        name="coca-tiny-test", embed_dim=64,
        text=TextConfig(context_length=16, width=64, heads=2, layers=2,
                        output_dim=64),
        vision=VisionConfig(image_size=64, patch_size=16, width=64,
                            layers=2, head_width=32, output_dim=64),
        multimodal=MultimodalConfig(context_length=16, width=64, heads=2,
                                    layers=2),
        n_queries=8, attn_pooler_heads=2)


COCA_CONFIGS = {"coca_ViT-B-32": coca_vit_b_32, "coca_ViT-L-14": coca_vit_l_14,
                "coca_base": coca_base, "coca-tiny-test": coca_tiny_test,
                "coca_roberta-ViT-B-32": coca_roberta_vit_b_32,
                "coca-roberta-tiny-test": coca_roberta_tiny_test}


@functools.lru_cache(maxsize=8)
def _hf_tower_cached(name: str, pooler: str, proj: Optional[str],
                     embed_dim: int):
    from leaf_tpu.models.hf_text import HFTextTower
    return HFTextTower(name, output_dim=embed_dim, pooler_type=pooler,
                       proj_type=proj)


def hf_text_tower(cfg: CoCaConfig):
    """The (stateless-apply) HF text tower for an hf_text CoCa config.
    Cached: module construction is expensive and the tower is pure —
    all weights live in the params pytree."""
    return _hf_tower_cached(cfg.hf_text_name, cfg.hf_pooler, cfg.hf_proj,
                            cfg.embed_dim)


def get_coca_config(name: str) -> CoCaConfig:
    if name not in COCA_CONFIGS:
        raise KeyError(f"unknown CoCa model {name!r}; "
                       f"available: {sorted(COCA_CONFIGS)}")
    return COCA_CONFIGS[name]()


def create_coca_model(name: str, pretrained: Optional[str] = None,
                      seed: int = 0):
    """(params, cfg) for a CoCa model; `pretrained` is an OpenCLIP
    checkpoint path."""
    cfg = get_coca_config(name)
    if pretrained:
        from leaf_tpu.models.coca_interop import coca_openclip_to_params
        from leaf_tpu.models.interop import load_state_dict_file
        params = coca_openclip_to_params(load_state_dict_file(pretrained), cfg)
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = init_coca(jax.random.PRNGKey(seed), cfg)
    return params, cfg


# -- initialisation ----------------------------------------------------------

def _init_attn_pooler(key, d_model: int, context_dim: int,
                      n_queries: int) -> Params:
    k = jax.random.split(key, 5)
    s = d_model ** -0.5
    return {
        "query": jax.random.normal(k[0], (n_queries, d_model), jnp.float32),
        "ln_q": layers.init_layer_norm(d_model),
        "ln_k": layers.init_layer_norm(context_dim),
        "q_w": s * jax.random.normal(k[1], (d_model, d_model), jnp.float32),
        "k_w": s * jax.random.normal(k[2], (context_dim, d_model), jnp.float32),
        "v_w": s * jax.random.normal(k[3], (context_dim, d_model), jnp.float32),
        "qkv_b": jnp.zeros((3 * d_model,), jnp.float32),
        "out_w": s * jax.random.normal(k[4], (d_model, d_model), jnp.float32),
        "out_b": jnp.zeros((d_model,), jnp.float32),
    }


def init_coca(key, cfg: CoCaConfig) -> Params:
    from leaf_tpu.models.clip import init_text_tower, init_vision_tower
    kt, kv, kp, km, kc = jax.random.split(key, 5)
    if cfg.hf_text_name:
        text = hf_text_tower(cfg).params
    else:
        text = init_text_tower(kt, cfg.text)
        # CLS embedding + one extra positional slot (num_pos = ctx + 1)
        text["cls_emb"] = 0.01 * jax.random.normal(
            kc, (cfg.text.width,), jnp.float32)
        text["positional_embedding"] = 0.01 * jax.random.normal(
            kt, (cfg.text.context_length + 1, cfg.text.width), jnp.float32)

    vision = init_vision_tower(kv, cfg.vision)
    # with attentional pooling, ln_post/proj act on embed_dim
    vision["ln_post"] = layers.init_layer_norm(cfg.embed_dim)
    vision["proj"] = (cfg.embed_dim ** -0.5) * jax.random.normal(
        kv, (cfg.embed_dim, cfg.embed_dim), jnp.float32)
    vision["attn_pool"] = _init_attn_pooler(kp, cfg.embed_dim,
                                            cfg.vision.width, cfg.n_queries)

    m = cfg.multimodal
    mlp_w = int(m.width * m.mlp_ratio)
    k1, k2, k3 = jax.random.split(km, 3)
    decoder = {
        "blocks": layers.init_block_stack(k1, m.layers, m.width, mlp_w),
        "cross_blocks": layers.init_block_stack(k2, m.layers, m.width, mlp_w),
        "ln_final": layers.init_layer_norm(m.width),
        "text_projection": (m.width ** -0.5) * jax.random.normal(
            k3, (m.width, m.vocab_size), jnp.float32),
    }
    # cross blocks need a kv layer norm
    decoder["cross_blocks"]["ln_1_kv"] = {
        "scale": jnp.ones((m.layers, m.width), jnp.float32),
        "bias": jnp.zeros((m.layers, m.width), jnp.float32),
    }
    return {"text": text, "visual": vision, "text_decoder": decoder,
            "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32)}


# -- forward pieces ----------------------------------------------------------

def attentional_pool(p: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, N, context_dim] → [B, n_queries, d_model]
    (reference `transformer.py:187-208`)."""
    dtype = x.dtype
    B = x.shape[0]
    keys = layers.layer_norm(p["ln_k"], x)
    q_in = layers.layer_norm(p["ln_q"], p["query"].astype(dtype)[None])
    d_model = p["q_w"].shape[1]
    b_q, b_k, b_v = jnp.split(p["qkv_b"].astype(dtype), 3)
    q = q_in @ p["q_w"].astype(dtype) + b_q
    k = keys @ p["k_w"].astype(dtype) + b_k
    v = keys @ p["v_w"].astype(dtype) + b_v
    head_dim = d_model // n_heads

    def heads(t, n):
        return t.reshape(t.shape[0], n, n_heads, head_dim).transpose(0, 2, 1, 3)

    q = jnp.broadcast_to(heads(q, q.shape[1]), (B, n_heads, q_in.shape[1],
                                                head_dim))
    k, v = heads(k, k.shape[1]), heads(v, v.shape[1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * head_dim ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, -1, d_model)
    return out @ p["out_w"].astype(dtype) + p["out_b"].astype(dtype)


def encode_image_coca(params: Params, cfg: CoCaConfig, images: jnp.ndarray,
                      normalize: bool = True, dtype=jnp.float32
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (image latent [B, D], image embs [B, n_queries-1, D])
    (reference `transformer.py:630-636` attn-pool branch +
    `coca_model.py:169-172`)."""
    p = params["visual"]
    vc = cfg.vision
    x = patchify(images.astype(dtype), vc.patch_size)
    x = x @ p["patch_embedding"].astype(dtype)
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype),
                           (x.shape[0], 1, vc.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    x = layers.layer_norm(p["ln_pre"], x, vc.ln_eps)
    act = layers.quick_gelu if cfg.quick_gelu else layers.gelu
    x = layers.transformer_stack(p["blocks"], x, None, vc.heads, act,
                                 vc.ln_eps, packed=(x.shape[1], False))
    x = attentional_pool(p["attn_pool"], x, cfg.attn_pooler_heads)
    x = layers.layer_norm(p["ln_post"], x, vc.ln_eps)
    pooled, tokens = x[:, 0], x[:, 1:]
    pooled = pooled @ p["proj"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled, tokens


def _cls_mask(tokens: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """Per-sample additive mask [B, S+1, S+1] (reference
    `build_cls_mask`, `transformer.py:767-774`): ONLY the appended CLS
    row (the last query) masks pad columns — ordinary token rows are
    governed by the causal mask alone (the reference F.pads the top S
    rows with True).  Masking pad columns for every row changes no live
    computation (trailing pads are causally invisible to live queries
    and the caption loss masks pad labels) but makes pad-position
    activations diverge from the reference; row-S-only keeps them
    bit-equal."""
    B, S = tokens.shape
    col_ok = jnp.concatenate(
        [jnp.ones((B, 1), bool), tokens != pad_id], axis=1)  # [B, S+1]
    cls_row = jnp.where(col_ok, 0.0, -jnp.inf).astype(jnp.float32)
    add = jnp.zeros((B, S + 1, S + 1), jnp.float32)
    return add.at[:, S, :].set(cls_row)


def encode_text_coca(params: Params, cfg: CoCaConfig, tokens: jnp.ndarray,
                     normalize: bool = True, dtype=jnp.float32
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (text latent [B, D], token embs [B, S, width])
    (reference `transformer.py:776-809` with embed_cls=True: CLS
    appended at the END, pooled='last', ln_final after pooling).

    HF-text configs (coca_roberta-ViT-B-32) route through the HF tower's
    output_tokens path instead (reference hf_model.py:157-168)."""
    if cfg.hf_text_name:
        pooled, token_embs = hf_text_tower(cfg).call_with_tokens(
            params["text"], tokens)
        if normalize:
            pooled = l2_normalize(pooled)
        return pooled.astype(dtype), token_embs.astype(dtype)
    p = params["text"]
    tc = cfg.text
    B, S = tokens.shape
    x = p["token_embedding"].astype(dtype)[tokens]
    cls = jnp.broadcast_to(p["cls_emb"].astype(dtype), (B, 1, tc.width))
    x = jnp.concatenate([x, cls], axis=1)
    x = x + p["positional_embedding"][:S + 1].astype(dtype)
    mask = causal_mask(S + 1)[None] + _cls_mask(tokens, cfg.pad_id)
    act = layers.quick_gelu if cfg.quick_gelu else layers.gelu
    x = layers.transformer_stack(p["blocks"], x, mask, tc.heads, act,
                                 tc.ln_eps)
    pooled, token_embs = x[:, -1], x[:, :-1]
    pooled = layers.layer_norm(p["ln_final"], pooled, tc.ln_eps)
    pooled = pooled @ p["text_projection"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled, token_embs


def decode(params: Params, cfg: CoCaConfig, image_embs: jnp.ndarray,
           token_embs: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Multimodal decoder → vocab logits [B, S, V]
    (reference `transformer.py:884-911`)."""
    p = params["text_decoder"]
    m = cfg.multimodal
    S = token_embs.shape[1]
    mask = causal_mask(m.context_length)[:S, :S]
    act = layers.quick_gelu if cfg.quick_gelu else layers.gelu
    x = token_embs.astype(dtype)
    image_embs = image_embs.astype(dtype)

    cross = dict(p["cross_blocks"])
    ln_1_kv = cross.pop("ln_1_kv")

    def body(h, layer_p):
        self_p, cross_p, kv_ln = layer_p
        h = layers.residual_block(self_p, h, mask, m.heads, act, m.ln_eps)
        # cross-attention block (reference ResidualAttentionBlock with
        # is_cross_attention=True): q from ln_1(h), kv from ln_1_kv(img)
        q_in = layers.layer_norm(cross_p["ln_1"], h, m.ln_eps)
        kv_in = layers.layer_norm(kv_ln, image_embs, m.ln_eps)
        h = h + _cross_attention(cross_p["attn"], q_in, kv_in, m.heads)
        h = h + layers.mlp(cross_p["mlp"],
                           layers.layer_norm(cross_p["ln_2"], h, m.ln_eps),
                           act)
        return h, None

    x, _ = jax.lax.scan(body, x, (p["blocks"], cross, ln_1_kv))
    x = layers.layer_norm(p["ln_final"], x, m.ln_eps)
    return x @ p["text_projection"].astype(dtype)


def _cross_attention(p: Params, q_in, kv_in, n_heads: int):
    """Cross-attention with fused qkv weights: q block applied to the
    queries, k/v blocks to the keys/values (torch MultiheadAttention
    packed layout)."""
    dtype = q_in.dtype
    D = q_in.shape[-1]
    w = p["qkv_w"].astype(dtype)
    b = p["qkv_b"].astype(dtype)
    q = q_in @ w[:, :D] + b[:D]
    k = kv_in @ w[:, D:2 * D] + b[D:2 * D]
    v = kv_in @ w[:, 2 * D:] + b[2 * D:]
    head_dim = D // n_heads
    B = q.shape[0]

    def heads(t):
        return t.reshape(B, t.shape[1], n_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * head_dim ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, -1, D)
    return out @ p["out_w"].astype(dtype) + p["out_b"].astype(dtype)


# -- KV-cached incremental decoding ------------------------------------------
#
# The generation scans below historically re-encoded the full prefix
# every step, exactly as the reference loop does (`coca_model.py:
# 289-298,389-396` — it passes `past_key_values` nowhere).  Both the
# CLIP-style text tower and the multimodal decoder are strictly causal
# in their token positions — the appended CLS sits at the END of the
# sequence (`transformer.py:784-789`), so ordinary positions never
# attend to it — which makes standard KV caching EXACT: each step
# projects one new position, appends its K/V into a fixed-shape cache,
# and attends over the position-masked cache.  Cross-attention K/V
# depend only on the image embeddings and are computed once per
# generation.  HF text towers (coca_roberta-*) are bidirectional
# (mean-pooled), so their token embeddings are NOT prefix-stable and
# generation keeps the full re-encode for them.

def _split_heads(t: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    N, S, D = t.shape
    return t.reshape(N, S, n_heads, D // n_heads).transpose(0, 2, 1, 3)


def _cached_self_attention(p: Params, q_in, cache_k, cache_v, pos,
                           n_heads: int):
    """One-position self-attention over a fixed-shape KV cache.
    q_in [N,1,D]; cache_[kv] [N,H,S,hd].  Writes position `pos`, then
    attends the new query over columns <= pos (identical key set, and
    per-key dot products, as the full causal row)."""
    dtype = q_in.dtype
    D = q_in.shape[-1]
    qkv = q_in @ p["qkv_w"].astype(dtype) + p["qkv_b"].astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, _split_heads(k, n_heads).astype(cache_k.dtype),
        (0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, _split_heads(v, n_heads).astype(cache_v.dtype),
        (0, 0, pos, 0))
    hd = D // n_heads
    logits = jnp.einsum("bhqd,bhkd->bhqk", _split_heads(q, n_heads),
                        cache_k.astype(dtype),
                        preferred_element_type=jnp.float32) * hd ** -0.5
    logits = logits + jnp.where(jnp.arange(cache_k.shape[2]) <= pos,
                                0.0, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, cache_v.astype(dtype))
    out = out.transpose(0, 2, 1, 3).reshape(-1, 1, D)
    return (out @ p["out_w"].astype(dtype) + p["out_b"].astype(dtype),
            cache_k, cache_v)


def init_generation_cache(params: Params, cfg: CoCaConfig,
                          image_embs: jnp.ndarray, dtype=jnp.float32):
    """Build the `decode_one` cache for N rows: zeroed text-tower and
    decoder self-attention K/V (stacked over layers, sized by the
    multimodal context) plus the per-layer cross-attention K/V
    projected once from ln_1_kv(image_embs)."""
    N = image_embs.shape[0]
    tc, m = cfg.text, cfg.multimodal
    S = m.context_length
    zeros = lambda L, H, W: jnp.zeros((L, N, H, S, W // H), dtype)  # noqa: E731
    tk = zeros(tc.layers, tc.heads, tc.width)
    dk = zeros(m.layers, m.heads, m.width)

    pd = params["text_decoder"]
    cross = dict(pd["cross_blocks"])
    ln_kv = cross.pop("ln_1_kv")
    D = m.width
    img = image_embs.astype(dtype)

    def one(cp, lnp):
        kv_in = layers.layer_norm(lnp, img, m.ln_eps)
        w = cp["attn"]["qkv_w"].astype(dtype)
        b = cp["attn"]["qkv_b"].astype(dtype)
        k = kv_in @ w[:, D:2 * D] + b[D:2 * D]
        v = kv_in @ w[:, 2 * D:] + b[2 * D:]
        return _split_heads(k, m.heads), _split_heads(v, m.heads)

    ck_img, cv_img = jax.vmap(one)(cross, ln_kv)
    return (tk, tk, dk, dk, ck_img, cv_img)


def decode_one(params: Params, cfg: CoCaConfig, tok: jnp.ndarray, pos,
               cache, dtype=jnp.float32):
    """One cached generation step: token ids [N] sitting at position
    `pos` → vocab logits for position pos+1 [N, V] + updated cache.
    Numerically the take-at-`pos` row of encode_text_coca → decode."""
    tk, tv, dk, dv, ck_img, cv_img = cache
    tc, m = cfg.text, cfg.multimodal
    act = layers.quick_gelu if cfg.quick_gelu else layers.gelu
    pt = params["text"]
    x = pt["token_embedding"].astype(dtype)[tok][:, None, :]
    x = x + jax.lax.dynamic_slice_in_dim(
        pt["positional_embedding"].astype(dtype), pos, 1, 0)

    def tbody(h, layer):
        lp, ck, cv = layer
        a, ck, cv = _cached_self_attention(
            lp["attn"], layers.layer_norm(lp["ln_1"], h, tc.ln_eps),
            ck, cv, pos, tc.heads)
        h = h + a
        h = h + layers.mlp(lp["mlp"],
                           layers.layer_norm(lp["ln_2"], h, tc.ln_eps), act)
        return h, (ck, cv)

    x, (tk, tv) = jax.lax.scan(tbody, x, (pt["blocks"], tk, tv))

    pd = params["text_decoder"]
    cross = dict(pd["cross_blocks"])
    cross.pop("ln_1_kv")
    D = m.width
    hd = D // m.heads

    def dbody(h, layer):
        sp, cp, ck, cv, ki, vi = layer
        a, ck, cv = _cached_self_attention(
            sp["attn"], layers.layer_norm(sp["ln_1"], h, m.ln_eps),
            ck, cv, pos, m.heads)
        h = h + a
        h = h + layers.mlp(sp["mlp"],
                           layers.layer_norm(sp["ln_2"], h, m.ln_eps), act)
        q_in = layers.layer_norm(cp["ln_1"], h, m.ln_eps)
        w = cp["attn"]["qkv_w"].astype(dtype)
        b = cp["attn"]["qkv_b"].astype(dtype)
        q = _split_heads(q_in @ w[:, :D] + b[:D], m.heads)
        lg = jnp.einsum("bhqd,bhkd->bhqk", q, ki.astype(dtype),
                        preferred_element_type=jnp.float32) * hd ** -0.5
        pr = jax.nn.softmax(lg, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", pr, vi.astype(dtype))
        o = o.transpose(0, 2, 1, 3).reshape(-1, 1, D)
        h = h + (o @ cp["attn"]["out_w"].astype(dtype)
                 + cp["attn"]["out_b"].astype(dtype))
        h = h + layers.mlp(cp["mlp"],
                           layers.layer_norm(cp["ln_2"], h, m.ln_eps), act)
        return h, (ck, cv)

    x, (dk, dv) = jax.lax.scan(dbody, x,
                               (pd["blocks"], cross, dk, dv, ck_img, cv_img))
    x = layers.layer_norm(pd["ln_final"], x, m.ln_eps)
    logits = (x @ pd["text_projection"].astype(dtype))[:, 0]
    return logits, (tk, tv, dk, dv, ck_img, cv_img)


def forward(params: Params, cfg: CoCaConfig, images, tokens,
            dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Training forward (reference `coca_model.py:167-201`): labels are
    tokens[:, 1:], decoder sees token embs[:, :-1] (teacher forcing)."""
    image_latent, image_embs = encode_image_coca(params, cfg, images,
                                                 dtype=dtype)
    text_latent, token_embs = encode_text_coca(params, cfg, tokens,
                                               dtype=dtype)
    labels = tokens[:, 1:]
    logits = decode(params, cfg, image_embs, token_embs[:, :-1], dtype)
    if logits.shape[1] != labels.shape[1]:
        raise ValueError(
            f"decoder logits length {logits.shape[1]} != labels "
            f"{labels.shape[1]}: a cls-pooled HF tower drops a position; "
            f"use mean_pooler as the reference's CoCa-HF configs do")
    return {
        "image_features": image_latent,
        "text_features": text_latent,
        "logits": logits,
        "labels": labels,
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def top_p_filter(logits: jnp.ndarray, top_p: float,
                 min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Nucleus filtering, semantics-equal to HF's TopPLogitsWarper
    (transformers logits_process.py; the reference's
    `generation_type="top_p"` warper, `coca_model.py:265-268`):
    ascending sort, drop tokens whose inclusive cumulative probability
    is <= 1 - top_p, always keeping the `min_tokens_to_keep` most
    probable; dropped logits become -inf."""
    if not 0.0 <= top_p <= 1.0:
        raise ValueError(f"top_p must be in [0, 1], got {top_p}")
    V = logits.shape[-1]
    order = jnp.argsort(logits, axis=-1)              # ascending, stable
    sorted_logits = jnp.take_along_axis(logits, order, -1)
    cum = jnp.cumsum(
        jax.nn.softmax(sorted_logits.astype(jnp.float32), -1), -1)
    remove_sorted = (cum <= (1.0 - top_p)) \
        & (jnp.arange(V) < V - min_tokens_to_keep)
    # unsort the removal mask back to vocabulary order
    inv = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, -1)
    return jnp.where(remove, -jnp.inf, logits)


def generate(params: Params, cfg: CoCaConfig, images, key,
             seq_len: int = 30, top_k: int = 1, temperature: float = 1.0,
             top_p: Optional[float] = None,
             min_seq_len: int = 5, repetition_penalty: float = 1.0,
             sot_token_id: Optional[int] = None,
             eos_token_id: Optional[int] = None,
             pad_id: Optional[int] = None,
             use_cache: bool = True,
             dtype=jnp.float32) -> jnp.ndarray:
    """Autoregressive caption sampling (top-k; top_k=1 is greedy) as a
    single jitted scan, decision-equal to the reference's HF-style loop
    (`coca_model.py:204-327`): `seq_len` counts the SOT slot
    (MaxLengthCriteria semantics, so seq_len-1 tokens are generated),
    EOS is blocked while the sequence is shorter than `min_seq_len`
    (MinLengthLogitsProcessor), the final slot is forced to EOS for
    still-running rows (`coca_model.py:314`), and tokens already in the
    sequence — including SOT — are discounted by `repetition_penalty`
    (RepetitionPenaltyLogitsProcessor; 1.0 is a no-op).

    `top_p` set selects nucleus sampling instead of top-k (the
    reference's `generation_type="top_p"`): the keep-set is computed
    from the processed logits BEFORE temperature, exactly as the
    reference applies its warper before `softmax(logits/T)`
    (`coca_model.py:308-309`)."""
    assert seq_len > min_seq_len, "seq_len must be larger than min_seq_len"
    # special ids default from the CONFIG (an HF tower's pad/bos/eos
    # differ from CLIP BPE's; roberta pads with 1 — filling with 0 would
    # let the bidirectional tower attend to phantom slots)
    sot_token_id = cfg.sot_token_id if sot_token_id is None else sot_token_id
    eos_token_id = cfg.eos_token_id if eos_token_id is None else eos_token_id
    pad_id = cfg.pad_id if pad_id is None else pad_id
    B = images.shape[0]
    if seq_len > cfg.multimodal.context_length:
        # the reference supports longer captions via a sliding window
        # over the last context_length tokens (`coca_model.py:300`,
        # out[:, -max_seq_len:]); the fixed-shape scan caps at the
        # context instead — say so rather than silently shortening
        # (ADVICE r4)
        import logging
        logging.getLogger(__name__).warning(
            "generate: seq_len=%d exceeds the multimodal context length "
            "%d; capping (the reference would slide its window — "
            "captions will be shorter than requested)", seq_len,
            cfg.multimodal.context_length)
    seq_len = min(seq_len, cfg.multimodal.context_length)
    use_cache = use_cache and not cfg.hf_text_name  # roberta: bidirectional
    _, image_embs = encode_image_coca(params, cfg, images, dtype=dtype)

    def select(cur, pos, done, seen, key):
        """Processors + sampling for one step's logits row [B, V]."""
        if repetition_penalty != 1.0:
            cur = jnp.where(
                seen,
                jnp.where(cur < 0, cur * repetition_penalty,
                          cur / repetition_penalty), cur)
        # MinLengthLogitsProcessor: EOS blocked while len(seq) < min
        cur = cur.at[:, eos_token_id].add(
            jnp.where(pos < min_seq_len, -jnp.inf, 0.0))
        if top_p is not None:
            # nucleus: keep-set from pre-temperature logits (the
            # reference warps before softmax(logits/T))
            cur = top_p_filter(cur, top_p) / temperature
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, cur, axis=-1)
        elif top_k > 1:
            cur = cur / temperature
            kth = jnp.sort(cur, axis=-1)[:, -top_k][:, None]
            cur = jnp.where(cur < kth, -jnp.inf, cur)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, cur, axis=-1)
        else:
            nxt = jnp.argmax(cur, axis=-1)
        # the reference forces EOS into the final slot of running rows
        nxt = jnp.where(pos == seq_len - 1, eos_token_id, nxt)
        nxt = jnp.where(done, pad_id, nxt)
        seen = seen | jax.nn.one_hot(nxt, seen.shape[-1], dtype=bool)
        done = done | (nxt == eos_token_id)
        return nxt, done, seen, key

    def step(carry, _):
        tokens, pos, done, seen, key = carry
        _, token_embs = encode_text_coca(params, cfg, tokens, dtype=dtype)
        logits = decode(params, cfg, image_embs, token_embs, dtype)
        cur = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(B, 0), axis=1)[:, 0]
        nxt, done, seen, key = select(cur, pos, done, seen, key)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos))
        return (tokens, pos + 1, done, seen, key), None

    def step_cached(carry, _):
        tokens, pos, done, seen, key, cache = carry
        prev = jax.lax.dynamic_slice(tokens, (0, pos - 1), (B, 1))[:, 0]
        cur, cache = decode_one(params, cfg, prev, pos - 1, cache, dtype)
        nxt, done, seen, key = select(cur, pos, done, seen, key)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos))
        return (tokens, pos + 1, done, seen, key, cache), None

    tokens0 = jnp.full((B, cfg.multimodal.context_length), pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(sot_token_id)
    seen0 = jnp.zeros((B, cfg.multimodal.vocab_size), bool) \
        .at[:, sot_token_id].set(True)
    carry = (tokens0, jnp.asarray(1), jnp.zeros((B,), bool), seen0, key)
    if use_cache:
        cache0 = init_generation_cache(params, cfg, image_embs, dtype)
        (tokens, *_), _ = jax.lax.scan(step_cached, carry + (cache0,),
                                       None, length=seq_len - 1)
    else:
        (tokens, *_), _ = jax.lax.scan(step, carry, None,
                                       length=seq_len - 1)
    return tokens


def generate_beamsearch(params: Params, cfg: CoCaConfig, images,
                        num_beams: int = 6, num_beam_groups: int = 3,
                        min_seq_len: int = 5, seq_len: int = 30,
                        length_penalty: float = 1.0,
                        repetition_penalty: float = 1.0,
                        sot_token_id: Optional[int] = None,
                        eos_token_id: Optional[int] = None,
                        pad_id: Optional[int] = None,
                        use_cache: bool = True,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Group beam search as one jitted scan, decision-equal to the
    reference's `_generate_beamsearch` (`coca_model.py:329-476`) built
    on HF's BeamSearchScorer (length_penalty fixed at the scorer's
    default there; exposed here for generality).

    Faithful HF/reference semantics, in order of surprise:

    - **Raw logits accumulate** — the reference never log-softmaxes
      (`coca_model.py:416-419`), so beam scores are sums of logits,
      not log-probs.
    - Beam scores start at -1e9 except each group's first beam at 0
      (`coca_model.py:374-377`).
    - Per group and step, the top `2*bg` of the `bg*V` candidate grid
      are taken **sorted**; EOS candidates at rank < bg are moved into
      a per-(image, group) hypothesis pool of size bg with
      replace-worst eviction (BeamHypotheses.add), normalised by
      `(cur_len)**length_penalty` where cur_len counts the SOT *and*
      the (unstored) EOS; non-EOS candidates fill the next live beams
      until bg are placed and the rest are dropped
      (BeamSearchScorer.process).
    - A group retires when its pool is full AND the pool's worst
      normalised score >= best_candidate_sum / cur_len**lp (the HF
      early_stopping=False heuristic); retired groups emit pad at
      score 0 and are skipped by finalize.
    - MinLengthLogitsProcessor blocks EOS while the prefix (incl. SOT)
      is shorter than min_seq_len; RepetitionPenaltyLogitsProcessor
      discounts every token already in the beam's prefix (the
      reference's generate() installs both, `coca_model.py:232-237`).
    - Finalize adds all live beams of non-retired groups (normalised
      by the final prefix length), then returns the best pooled
      hypothesis per image, EOS appended when it fits
      (BeamSearchScorer.finalize); ties across groups resolve to the
      later group, as HF's stable sort + pop does.

    Output is fixed-shape [B, context_length], pad-filled past the
    hypothesis (the reference's fixed_output_length=True layout)."""
    sot_token_id = cfg.sot_token_id if sot_token_id is None else sot_token_id
    eos_token_id = cfg.eos_token_id if eos_token_id is None else eos_token_id
    pad_id = cfg.pad_id if pad_id is None else pad_id
    B = images.shape[0]
    K, G = num_beams, num_beam_groups
    assert K % G == 0, "num_beams must divide into num_beam_groups"
    bg = K // G
    S = cfg.multimodal.context_length
    V = cfg.multimodal.vocab_size
    steps = min(seq_len, S) - 1          # MaxLengthCriteria counts the SOT
    final_len = steps + 1
    lp = length_penalty
    use_cache = use_cache and not cfg.hf_text_name  # roberta: bidirectional
    _, image_embs = encode_image_coca(params, cfg, images, dtype=dtype)
    image_embs_b = jnp.repeat(image_embs, K, axis=0)

    tokens0 = jnp.full((B, G, bg, S), pad_id, jnp.int32)
    tokens0 = tokens0.at[..., 0].set(sot_token_id)
    seen0 = jnp.zeros((B, G, bg, V), bool).at[..., sot_token_id].set(True)
    scores0 = jnp.where(jnp.arange(bg) == 0, 0.0, -1e9)[None, None, :] \
        .astype(jnp.float32).repeat(B, 0).repeat(G, 1)
    pool_s0 = jnp.full((B, G, bg), -jnp.inf, jnp.float32)
    pool_t0 = jnp.full((B, G, bg, S), pad_id, jnp.int32)
    pool_l0 = jnp.zeros((B, G, bg), jnp.int32)
    pool_n0 = jnp.zeros((B, G), jnp.int32)
    done0 = jnp.zeros((B, G), bool)

    def pool_add(pool, add_mask, score_norm, hyp_tokens, hyp_len):
        """BeamHypotheses.add: insert where the pool has room or the
        candidate beats the worst entry (evicting it).  -inf marks an
        empty slot, so argmin lands on empties first — matching HF's
        append-then-delete-min exactly (delete-min ties go to the
        first index on both sides)."""
        pool_s, pool_t, pool_l, pool_n = pool
        ok = add_mask & ((pool_n < bg) | (score_norm > pool_s.min(-1)))
        slot = jax.nn.one_hot(jnp.argmin(pool_s, -1), bg,
                              dtype=bool) & ok[..., None]
        pool_s = jnp.where(slot, score_norm[..., None], pool_s)
        pool_t = jnp.where(slot[..., None], hyp_tokens[:, :, None, :],
                           pool_t)
        pool_l = jnp.where(slot, hyp_len, pool_l)
        pool_n = jnp.where(ok, jnp.minimum(pool_n + 1, bg), pool_n)
        return pool_s, pool_t, pool_l, pool_n

    def step(carry, _):
        if use_cache:
            tokens, seen, scores, pool, done, pos, cache = carry
            prev = jax.lax.dynamic_slice(
                tokens, (0, 0, 0, pos - 1), (B, G, bg, 1)).reshape(B * K)
            cur, cache = decode_one(params, cfg, prev, pos - 1, cache,
                                    dtype)
            cur = cur.astype(jnp.float32).reshape(B, G, bg, V)
        else:
            tokens, seen, scores, pool, done, pos = carry
            _, token_embs = encode_text_coca(
                params, cfg, tokens.reshape(B * K, S), dtype=dtype)
            logits = decode(params, cfg, image_embs_b, token_embs, dtype)
            cur = jnp.take_along_axis(
                logits, (pos - 1)[None, None, None].repeat(B * K, 0),
                axis=1)[:, 0].astype(jnp.float32).reshape(B, G, bg, V)
        # MinLengthLogitsProcessor: cur_len (incl. SOT) < min_seq_len
        cur = cur.at[..., eos_token_id].add(
            jnp.where(pos < min_seq_len, -jnp.inf, 0.0))
        if repetition_penalty != 1.0:
            cur = jnp.where(
                seen, jnp.where(cur < 0, cur * repetition_penalty,
                                cur / repetition_penalty), cur)

        total = scores[..., None] + cur                     # [B,G,bg,V]
        cand_s, cand_i = jax.lax.top_k(
            total.reshape(B, G, bg * V), 2 * bg)            # sorted desc
        cand_src = cand_i // V                              # group-local
        cand_tok = (cand_i % V).astype(jnp.int32)

        # BeamSearchScorer.process: walk the sorted candidates, routing
        # rank<bg EOS hits to the pool and filling live slots with the
        # rest.  2*bg is small and static, so this unrolls.
        cur_len = (pos + 1).astype(jnp.float32)   # prefix + pending token
        nb_s = jnp.zeros((B, G, bg), jnp.float32)
        nb_tok = jnp.full((B, G, bg), pad_id, jnp.int32)
        nb_src = jnp.zeros((B, G, bg), jnp.int32)
        fill = jnp.zeros((B, G), jnp.int32)
        for r in range(2 * bg):
            s, tok, src = cand_s[..., r], cand_tok[..., r], cand_src[..., r]
            is_eos = tok == eos_token_id
            if r < bg:
                hyp = jnp.take_along_axis(
                    tokens, src[:, :, None, None].repeat(S, 3),
                    axis=2)[:, :, 0]
                pool = pool_add(pool, ~done & is_eos,
                                s / jnp.power(cur_len, lp), hyp, pos)
            put = ~done & ~is_eos & (fill < bg)
            sel = jax.nn.one_hot(fill, bg, dtype=bool) & put[..., None]
            nb_s = jnp.where(sel, s[..., None], nb_s)
            nb_tok = jnp.where(sel, tok[..., None], nb_tok)
            nb_src = jnp.where(sel, src[..., None], nb_src)
            fill = fill + put
        # retired groups emit pad at score 0 from their beam 0
        nb_s = jnp.where(done[..., None], 0.0, nb_s)
        nb_tok = jnp.where(done[..., None], pad_id, nb_tok)
        nb_src = jnp.where(done[..., None], 0, nb_src)
        # BeamHypotheses.is_done (early_stopping=False heuristic)
        pool_s, _, _, pool_n = pool
        done = done | ((pool_n >= bg)
                       & (pool_s.min(-1)
                          >= cand_s[..., 0] / jnp.power(cur_len, lp)))

        gather = lambda x: jnp.take_along_axis(  # noqa: E731
            x, nb_src.reshape(B, G, bg, *([1] * (x.ndim - 3))), axis=2)
        tokens = jax.lax.dynamic_update_slice(
            gather(tokens), nb_tok[..., None], (0, 0, 0, pos))
        seen = gather(seen) | jax.nn.one_hot(nb_tok, V, dtype=bool)
        if use_cache:
            # beam reorder: each surviving beam inherits its source
            # beam's K/V history (cross K/V skipped — identical across
            # a group's rows by construction)
            def reorder(c):
                c2 = c.reshape(c.shape[0], B, G, bg, *c.shape[2:])
                idx = nb_src.reshape(1, B, G, bg, *([1] * (c.ndim - 2)))
                return jnp.take_along_axis(c2, idx, axis=3) \
                    .reshape(c.shape)
            tk, tv, dk, dv, ki, vi = cache
            cache = (reorder(tk), reorder(tv), reorder(dk), reorder(dv),
                     ki, vi)
            return (tokens, seen, nb_s, pool, done, pos + 1, cache), None
        return (tokens, seen, nb_s, pool, done, pos + 1), None

    carry0 = (tokens0, seen0, scores0,
              (pool_s0, pool_t0, pool_l0, pool_n0), done0, jnp.asarray(1))
    if use_cache:
        carry0 = carry0 + (init_generation_cache(params, cfg, image_embs_b,
                                                 dtype),)
    out, _ = jax.lax.scan(step, carry0, None, length=steps)
    tokens, _, scores, pool, done = out[:5]

    # finalize: live beams of non-retired groups join their pools
    for k in range(bg):
        pool = pool_add(pool, ~done,
                        scores[..., k] / float(final_len) ** lp,
                        tokens[:, :, k], final_len)
    pool_s, pool_t, pool_l, _ = pool
    flat_s = pool_s.reshape(B, G * bg)
    # HF tie-break (stable sort + pop): last max wins
    best = G * bg - 1 - jnp.argmax(flat_s[:, ::-1], axis=1)
    hyp = jnp.take_along_axis(
        pool_t.reshape(B, G * bg, S), best[:, None, None], axis=1)[:, 0]
    hyp_len = jnp.take_along_axis(
        pool_l.reshape(B, G * bg), best[:, None], axis=1)[:, 0]
    # finalize appends one EOS when the hypothesis is shorter than the cap
    col = jnp.arange(S)[None, :]
    return jnp.where((col == hyp_len[:, None]) & (hyp_len[:, None]
                                                  < final_len),
                     eos_token_id, hyp)
