"""Causal-prefix-reuse text encoding for candidate scoring.

Every LEAF attack candidate is the clean sentence with ONE character
edited (`utils_attacks.py:169-213` generate_sentence), so its BPE
token sequence shares a prefix with the clean sentence's tokens up to
the edited word.  Under causal attention the hidden states of that
shared prefix are bit-identical to the clean sentence's — so the
clean batch can be encoded ONCE per step (B sequences), its per-layer
K/V kept, and each candidate only needs its *suffix* tokens run
through the stack, attending to [clean-prefix KV ‖ own-suffix KV].
This is mathematically exact (causal suffix queries see exactly the
same keys/values as a full encode), and cuts candidate-encode FLOPs by
the mean prefix fraction (~40-50% for ρ-position edits over ~10-word
captions).

TPU shape discipline: suffix buffers are bucketed to a fixed width
`T`; per-candidate `prefix_len`/`pos offsets` are data, not shapes, so
one compilation serves every step.  The packed variant concatenates G
suffixes per 128-token row (same trick as `clip.packed_block_mask`)
with per-block gathered prefix KV.

No reference counterpart — the reference re-encodes all B·ρ candidates
full-length each round (`utils_attacks.py:297-393`).

Status: exact (fp32-tight equivalence tests) but NOT wired into the
fused step.  Measured on the v5e (ViT-L text, 6400 candidates,
2026-08-16): packed full encode 182 ms; this path 331 ms single-bucket
/ 264 ms two-bucket.  The GEMM-FLOP saving is real, but per-block
prefix K/V doubles the attention key width and the per-row additive
masks materialize ~100 MB read per layer — and the full encode is
GEMM-bound, not attention-bound, so the trade loses.

The once-recorded follow-up (ragged prefix gathers inside a
flash-style kernel) was CEILING-MEASURED on 2026-08-17 and is dead:
the kernel-path packed encode is not length-proportional at these
shapes — 6400 sequences of 16 tokens take 151 ms, of 8 tokens 119 ms,
of 4 tokens 104 ms (v5e, bf16).  Even a zero-overhead ragged kernel
that processed only suffix tokens (mean ~10/16) would therefore save
~15% of the candidate encode, ~8% end-to-end — far below the kernel's
complexity budget.  Larger packed rows were also measured and lose
(target 256: 314 ms, 512: 205 ms vs 128: 151 ms).  Sub-linear scaling
comes from fixed per-row/per-layer costs, not attention FLOPs, so
FLOP-reduction levers on this op are exhausted; the remaining
throughput path is multi-chip scaling (shard_map'd fused step,
train/fused.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers
from leaf_tpu.models.clip import _act, l2_normalize, text_pool
from leaf_tpu.models.config import TextConfig

Params = Dict[str, Any]


def clean_kv(params: Params, cfg: TextConfig, clean_tokens: jnp.ndarray,
             quick_gelu: bool = False, dtype=jnp.float32
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode the clean batch [B, S], returning per-layer pre-head
    K and V — each [L, B, S, D] — for suffix attention reuse.

    The clean pass itself is standard (same numerics as encode_text);
    only K/V are kept."""
    from leaf_tpu.models.clip import causal_mask, embed_tokens

    B, S = clean_tokens.shape
    x = embed_tokens(params, clean_tokens, dtype)
    x = x + params["positional_embedding"][:S].astype(dtype)
    mask = None if cfg.no_causal_mask else jnp.asarray(causal_mask(S))
    act = _act(quick_gelu)

    def body(h, p):
        x_ln = layers.layer_norm(p["ln_1"], h, cfg.ln_eps)
        qkv = (x_ln @ p["attn"]["qkv_w"].astype(dtype)
               + p["attn"]["qkv_b"].astype(dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = _mha(q, k, v, mask, cfg.heads, p["attn"], dtype)
        h = h + attn
        h = h + layers.mlp(p["mlp"], layers.layer_norm(p["ln_2"], h,
                                                       cfg.ln_eps), act)
        return h, (k, v)

    _, (ks, vs) = jax.lax.scan(body, x, params["blocks"])
    return ks, vs   # [L, B, S, D] each


def _mha(q, k, v, mask, n_heads: int, p: Params, dtype):
    """Attention core given projected q/k/v [B, Sq/Sk, D]."""
    B, Sq, D = q.shape
    Sk = k.shape[1]
    hd = D // n_heads

    def heads(t, S):
        return t.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, Sq), heads(k, Sk), heads(v, Sk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim == 3:
            m = m[:, None]
        logits = logits + m
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Sq, D)
    return out @ p["out_w"].astype(dtype) + p["out_b"].astype(dtype)


def encode_text_suffix(params: Params, cfg: TextConfig,
                       suffix_tokens: jnp.ndarray,   # [N, T]
                       sent_idx: jnp.ndarray,        # [N] int32
                       prefix_len: jnp.ndarray,      # [N] int32
                       ks: jnp.ndarray, vs: jnp.ndarray,  # [L, B, S, D]
                       quick_gelu: bool = False,
                       normalize: bool = False,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Candidate features [N, output_dim] from suffix tokens only.

    `suffix_tokens[n, t]` is the candidate's token at absolute position
    `prefix_len[n] + t` (0-padded past its end); positions ≥ its true
    suffix length MUST be pad (id 0) so argmax-EOT pooling stays in
    range.  Exactness: suffix query t attends to clean-prefix keys
    j < prefix_len[n] (bit-identical to the candidate's own prefix
    states) plus causal suffix keys — the same key set as a full
    encode."""
    N, T = suffix_tokens.shape
    S = ks.shape[2]
    D = ks.shape[3]
    act = _act(quick_gelu)

    from leaf_tpu.models.clip import embed_tokens

    pos = prefix_len[:, None] + jnp.arange(T)[None, :]          # [N, T]
    pos = jnp.minimum(pos, params["positional_embedding"].shape[0] - 1)
    x = embed_tokens(params, suffix_tokens, dtype)
    x = x + params["positional_embedding"].astype(dtype)[pos]

    # additive mask [N, T, S+T]: prefix keys j < prefix_len, then causal
    j_pre = jnp.arange(S)[None, None, :] < prefix_len[:, None, None]
    pre_mask = jnp.where(j_pre, 0.0, -jnp.inf)                  # [N, 1, S]
    pre_mask = jnp.broadcast_to(pre_mask, (N, T, S))
    suf_mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)
    mask = jnp.concatenate(
        [pre_mask, jnp.broadcast_to(suf_mask[None], (N, T, T))], axis=-1)

    def body(h, layer):
        p, k_pre_l, v_pre_l = layer
        x_ln = layers.layer_norm(p["ln_1"], h, cfg.ln_eps)
        qkv = (x_ln @ p["attn"]["qkv_w"].astype(dtype)
               + p["attn"]["qkv_b"].astype(dtype))
        q, k_suf, v_suf = jnp.split(qkv, 3, axis=-1)
        k = jnp.concatenate([k_pre_l[sent_idx].astype(dtype), k_suf], 1)
        v = jnp.concatenate([v_pre_l[sent_idx].astype(dtype), v_suf], 1)
        attn = _mha(q, k, v, mask, cfg.heads, p["attn"], dtype)
        h = h + attn
        h = h + layers.mlp(p["mlp"], layers.layer_norm(p["ln_2"], h,
                                                       cfg.ln_eps), act)
        return h, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], ks, vs))
    x = layers.layer_norm(params["ln_final"], x, cfg.ln_eps)
    pooled = text_pool(x, suffix_tokens, cfg.pool_type)
    pooled = pooled @ params["text_projection"].astype(dtype)
    if "text_projection_bias" in params:
        pooled = pooled + params["text_projection_bias"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled


def suffix_split(cand_tokens: np.ndarray, clean_tokens: np.ndarray,
                 sent_idx: np.ndarray, bucket: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: per-candidate common-prefix length with its clean
    sentence and the rolled suffix buffer.

    Returns (suffix_tokens [N, T], prefix_len [N]).  prefix_len is
    capped so every candidate keeps ≥1 suffix token (a candidate
    identical to its clean sentence — e.g. a constraint-filtered row —
    re-derives only its EOT position).  `bucket` pads T up (0 = max
    observed suffix)."""
    N, S = cand_tokens.shape
    clean = clean_tokens[sent_idx]
    diff = cand_tokens != clean
    any_diff = diff.any(axis=1)
    first_diff = np.where(any_diff, diff.argmax(axis=1), S - 1)
    # the candidate's EOT must live in the suffix (argmax pooling);
    # an identical candidate re-derives exactly its EOT token
    eot = cand_tokens.argmax(axis=1)
    prefix_len = np.minimum(first_diff, eot).astype(np.int32)
    suf_lens = S - prefix_len
    T = int(suf_lens.max())
    if bucket:
        T = int(np.ceil(T / bucket) * bucket)
    idx = prefix_len[:, None] + np.arange(T)[None, :]
    valid = idx < S
    suffix = np.where(valid, np.take_along_axis(
        cand_tokens, np.minimum(idx, S - 1), axis=1), 0)
    return suffix.astype(cand_tokens.dtype), prefix_len


def _packed_suffix_masks(T: int, S: int, G: int):
    """Static parts of the packed mask: block-diagonal causal
    suffix↔suffix [G·T, G·T] and the block-selector [G·T, G·S] pattern
    (query block g may see only key block g; per-row prefix-length
    validity is applied dynamically)."""
    within = np.tril(np.ones((T, T), bool))
    suf = np.where(np.kron(np.eye(G, dtype=bool), within), 0.0,
                   -np.inf).astype(np.float32)
    blocksel = np.kron(np.eye(G, dtype=bool),
                       np.ones((T, S), bool))          # [G·T, G·S]
    return jnp.asarray(suf), jnp.asarray(blocksel)


def encode_text_suffix_packed(params: Params, cfg: TextConfig,
                              suffix_tokens: jnp.ndarray,  # [N, T]
                              sent_idx: jnp.ndarray,       # [N]
                              prefix_len: jnp.ndarray,     # [N]
                              ks: jnp.ndarray, vs: jnp.ndarray,
                              quick_gelu: bool = False,
                              normalize: bool = False,
                              dtype=jnp.float32,
                              target: int = 128) -> jnp.ndarray:
    """Packed variant of `encode_text_suffix`: G = target//T suffixes
    concatenate into one row (the `clip.packed_block_mask` trick), and
    each block's clean-prefix K/V are gathered into a per-row prefix
    bundle.  Exact: same key sets per query as the full encode.
    N must be divisible by G (pad with copies and drop the results)."""
    N, T = suffix_tokens.shape
    S, D = ks.shape[2], ks.shape[3]
    G = max(1, target // T)
    while G > 1 and N % G:
        G -= 1
    if G <= 1:
        return encode_text_suffix(params, cfg, suffix_tokens, sent_idx,
                                  prefix_len, ks, vs, quick_gelu,
                                  normalize, dtype)
    R = N // G
    act = _act(quick_gelu)

    from leaf_tpu.models.clip import embed_tokens

    pos = prefix_len[:, None] + jnp.arange(T)[None, :]
    pos = jnp.minimum(pos, params["positional_embedding"].shape[0] - 1)
    x = embed_tokens(params, suffix_tokens, dtype)
    x = x + params["positional_embedding"].astype(dtype)[pos]
    x = x.reshape(R, G * T, D)

    suf_mask, blocksel = _packed_suffix_masks(T, S, G)
    # per-key validity: key j of block g is real iff j < prefix_len
    valid = (jnp.arange(S)[None, :]
             < prefix_len.reshape(R, G)[:, :, None])      # [R, G, S]
    valid = valid.reshape(R, 1, G * S)
    pre_mask = jnp.where(blocksel[None] & valid, 0.0, -jnp.inf)  # [R,GT,GS]
    mask = jnp.concatenate(
        [pre_mask, jnp.broadcast_to(suf_mask[None], (R, G * T, G * T))],
        axis=-1)                                          # [R, GT, GS+GT]

    def body(h, layer):
        p, k_pre_l, v_pre_l = layer
        x_ln = layers.layer_norm(p["ln_1"], h, cfg.ln_eps)
        qkv = (x_ln @ p["attn"]["qkv_w"].astype(dtype)
               + p["attn"]["qkv_b"].astype(dtype))
        q, k_suf, v_suf = jnp.split(qkv, 3, axis=-1)
        k_pre = k_pre_l[sent_idx].astype(dtype).reshape(R, G * S, D)
        v_pre = v_pre_l[sent_idx].astype(dtype).reshape(R, G * S, D)
        k = jnp.concatenate([k_pre, k_suf], axis=1)
        v = jnp.concatenate([v_pre, v_suf], axis=1)
        attn = _mha(q, k, v, mask, cfg.heads, p["attn"], dtype)
        h = h + attn
        h = h + layers.mlp(p["mlp"], layers.layer_norm(p["ln_2"], h,
                                                       cfg.ln_eps), act)
        return h, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], ks, vs))
    x = layers.layer_norm(params["ln_final"], x, cfg.ln_eps)
    x = x.reshape(N, T, D)
    pooled = text_pool(x, suffix_tokens, cfg.pool_type)
    pooled = pooled @ params["text_projection"].astype(dtype)
    if "text_projection_bias" in params:
        pooled = pooled + params["text_projection_bias"].astype(dtype)
    return l2_normalize(pooled) if normalize else pooled
