"""HuggingFace text towers (Flax) for CustomTextCLIP-style models.

Re-expression of the reference's HF adapter
(`/root/reference/src/open_clip/hf_model.py`): wrap a transformers text
model as the CLIP text tower with a configurable pooler
(mean/max/cls/cls_last_hidden_state — `hf_model.py:36-97`) and a
linear or MLP projection head (`hf_model.py:142-160`).  TPU-native via
the *Flax* model classes, so the whole tower stays a jit-able pytree.

Offline-first: towers build from a `transformers` config object with
random weights (`pretrained=False` path of the reference); pretrained
weights load with `from_pretrained` when a local checkpoint exists.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

POOLERS = ("mean_pooler", "max_pooler", "cls_pooler",
           "cls_last_hidden_state_pooler")


def _offline_hf_config(name: str):
    """Known hub configs reconstructible without network access (the
    container has no hub cache).  Values are the published config.json
    of the named checkpoint."""
    import transformers
    if name == "roberta-base":
        return transformers.RobertaConfig(
            vocab_size=50265, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=1,
            layer_norm_eps=1e-5, pad_token_id=1, bos_token_id=0,
            eos_token_id=2)
    if name == "_tiny_roberta_test":
        # CI-sized stand-in used by coca-roberta-tiny-test
        return transformers.RobertaConfig(
            vocab_size=100, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=40, type_vocab_size=1,
            pad_token_id=1)
    if name in ("xlm-roberta-base", "xlm-roberta-large"):
        large = name.endswith("large")
        return transformers.XLMRobertaConfig(
            vocab_size=250002,
            hidden_size=1024 if large else 768,
            num_hidden_layers=24 if large else 12,
            num_attention_heads=16 if large else 12,
            intermediate_size=4096 if large else 3072,
            max_position_embeddings=514, type_vocab_size=1,
            layer_norm_eps=1e-5, pad_token_id=1, bos_token_id=0,
            eos_token_id=2)
    if name in ("google/mt5-base", "google/mt5-xl"):
        xl = name.endswith("xl")
        return transformers.MT5Config(
            vocab_size=250112,
            d_model=2048 if xl else 768,
            d_kv=64,
            d_ff=5120 if xl else 2048,
            num_layers=24 if xl else 12,
            num_heads=32 if xl else 12,
            relative_attention_num_buckets=32, dropout_rate=0.1,
            layer_norm_epsilon=1e-6, feed_forward_proj="gated-gelu",
            tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
            decoder_start_token_id=0)
    if name in ("facebook/nllb-200-distilled-600M",
                "facebook/nllb-200-distilled-1.3B"):
        big = name.endswith("1.3B")
        return transformers.M2M100Config(
            vocab_size=256206, d_model=1024,
            encoder_layers=24 if big else 12,
            decoder_layers=24 if big else 12,
            encoder_attention_heads=16, decoder_attention_heads=16,
            encoder_ffn_dim=8192 if big else 4096,
            decoder_ffn_dim=8192 if big else 4096,
            max_position_embeddings=1024, activation_function="relu",
            scale_embedding=True, pad_token_id=1, bos_token_id=0,
            eos_token_id=2, decoder_start_token_id=2)
    return None


def resolve_hf_config(name: str):
    """AutoConfig for `name`, preferring a local cache, then the known
    offline table (zero-egress container), then the hub."""
    import transformers
    try:
        return transformers.AutoConfig.from_pretrained(
            name, local_files_only=True)
    except (OSError, EnvironmentError, ValueError):
        pass
    cfg = _offline_hf_config(name)
    if cfg is not None:
        return cfg
    return transformers.AutoConfig.from_pretrained(name)


def _pool(last_hidden: jnp.ndarray, pooler_output, attention_mask,
          pooler_type: str) -> jnp.ndarray:
    mask = attention_mask.astype(last_hidden.dtype)[..., None]
    if pooler_type == "mean_pooler":
        return (last_hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-9)
    if pooler_type == "max_pooler":
        neg = jnp.where(mask > 0, last_hidden, -jnp.inf)
        return neg.max(axis=1)
    if pooler_type == "cls_pooler":
        if pooler_output is not None:
            return pooler_output
        return last_hidden[:, 0]
    if pooler_type == "cls_last_hidden_state_pooler":
        return last_hidden[:, 0]
    raise ValueError(f"unknown pooler {pooler_type!r}")


def _build_module(config, pooler_type: str, pretrained_from=None):
    """Architecture-aware module construction (reference
    `hf_model.py:87-110`: encoder-decoder towers use only the encoder):

      * m2m_100 (the nllb-clip towers) — transformers has no Flax
        M2M100, so the native JAX encoder in models/m2m100.py is used;
      * t5/mt5 — `FlaxAutoModel` would build the full encoder-decoder
        (whose __call__ demands decoder inputs); build the
        `Flax*EncoderModel` instead;
      * everything else — `FlaxAutoModel` (bert/roberta-family, which
        also accepts `add_pooling_layer`).
    """
    import transformers

    mt = getattr(config, "model_type", "")
    if mt == "m2m_100":
        from leaf_tpu.models.m2m100 import M2M100EncoderModule
        if pretrained_from is not None:
            return M2M100EncoderModule.from_pretrained(pretrained_from,
                                                       config=config)
        return M2M100EncoderModule(config)
    if mt in ("t5", "mt5"):
        cls = (transformers.FlaxMT5EncoderModel if mt == "mt5"
               else transformers.FlaxT5EncoderModel)
        if pretrained_from is not None:
            return cls.from_pretrained(pretrained_from)
        return cls(config)
    if pretrained_from is not None:
        return transformers.FlaxAutoModel.from_pretrained(
            pretrained_from, add_pooling_layer=(pooler_type == "cls_pooler"))
    return transformers.FlaxAutoModel.from_config(
        config, add_pooling_layer=(pooler_type == "cls_pooler"))


class HFTextTower:
    """Flax HF model + pooler + projection as (params pytree, apply fn).

    params layout: {"hf": <flax params>, "proj": {...}}.
    """

    def __init__(self, config_or_name, output_dim: int,
                 pooler_type: str = "mean_pooler",
                 proj_type: Optional[str] = "linear",
                 pretrained: bool = False, seed: int = 0):
        import transformers

        if isinstance(config_or_name, str) and pretrained:
            self.config = resolve_hf_config(config_or_name)
            module = _build_module(self.config, pooler_type,
                                   pretrained_from=config_or_name)
            hf_params = module.params
        else:
            self.config = (resolve_hf_config(config_or_name)
                           if isinstance(config_or_name, str)
                           else config_or_name)
            module = _build_module(self.config, pooler_type)
            hf_params = module.params
        self.module = module
        self.pooler_type = pooler_type
        self.proj_type = proj_type
        self.output_dim = output_dim
        self.vocab_size = getattr(self.config, "vocab_size", 0)
        self.context_length = getattr(self.config, "max_position_embeddings", 0)

        d_model = getattr(self.config, "hidden_size",
                          getattr(self.config, "d_model", None))
        key = jax.random.PRNGKey(seed)
        # reference hf_model.py:142-152: Identity ONLY when proj_type
        # is None and dims match; 'linear' always builds the Linear
        # (bias-free), 'mlp' is a bias-free two-layer GELU MLP
        if proj_type == "linear":
            proj = {"w": (d_model ** -0.5) * jax.random.normal(
                key, (d_model, output_dim), jnp.float32)}
        elif proj_type == "mlp":
            hidden = (d_model + output_dim) // 2
            k1, k2 = jax.random.split(key)
            proj = {
                "w1": (d_model ** -0.5) * jax.random.normal(
                    k1, (d_model, hidden), jnp.float32),
                "w2": (hidden ** -0.5) * jax.random.normal(
                    k2, (hidden, output_dim), jnp.float32),
            }
        else:
            proj = {}
        self.params = {"hf": hf_params, "proj": proj}

    def __call__(self, params: Dict[str, Any], input_ids,
                 attention_mask=None, normalize: bool = False):
        if attention_mask is None:
            # reference hf_model.py:150: mask from the tower's own pad id
            pad = getattr(self.config, "pad_token_id", 0) or 0
            attention_mask = (jnp.asarray(input_ids) != pad).astype(jnp.int32)
        out = self.module(input_ids=jnp.asarray(input_ids),
                          attention_mask=attention_mask,
                          params=params["hf"])
        pooler_output = getattr(out, "pooler_output", None)
        pooled = _pool(out.last_hidden_state, pooler_output, attention_mask,
                       self.pooler_type)
        proj = params["proj"]
        if "w" in proj:
            pooled = pooled @ proj["w"]
        elif "w1" in proj:
            h = jax.nn.gelu(pooled @ proj["w1"], approximate=False)
            pooled = h @ proj["w2"]
        if normalize:
            from leaf_tpu.models.clip import l2_normalize
            pooled = l2_normalize(pooled)
        return pooled

    def call_with_tokens(self, params: Dict[str, Any], input_ids,
                         attention_mask=None, normalize: bool = False):
        """(projected pooled [B, out], token states [B, S(-1), width]) —
        the reference's `output_tokens=True` path (`hf_model.py:157-168`):
        the cls position is dropped from the token states only for the
        cls pooler; token states are NOT projected."""
        if attention_mask is None:
            pad = getattr(self.config, "pad_token_id", 0) or 0
            attention_mask = (jnp.asarray(input_ids) != pad).astype(jnp.int32)
        out = self.module(input_ids=jnp.asarray(input_ids),
                          attention_mask=attention_mask,
                          params=params["hf"])
        pooler_output = getattr(out, "pooler_output", None)
        pooled = _pool(out.last_hidden_state, pooler_output, attention_mask,
                       self.pooler_type)
        proj = params["proj"]
        if "w" in proj:
            pooled = pooled @ proj["w"]
        elif "w1" in proj:
            h = jax.nn.gelu(pooled @ proj["w1"], approximate=False)
            pooled = h @ proj["w2"]
        if normalize:
            from leaf_tpu.models.clip import l2_normalize
            pooled = l2_normalize(pooled)
        tokens = out.last_hidden_state
        if self.pooler_type == "cls_pooler":
            # reference drops the cls position ONLY for ClsPooler (a
            # strict type check, hf_model.py:160-164);
            # cls_last_hidden_state_pooler keeps every position
            tokens = tokens[:, 1:]
        return pooled, tokens


def create_custom_text_clip(vision_cfg, hf_text: HFTextTower, embed_dim: int,
                            seed: int = 0):
    """CustomTextCLIP-style bundle (reference `model.py:318+`): our ViT
    vision tower + an HF text tower; returns (params, encode_image_fn,
    encode_text_fn)."""
    from leaf_tpu.models import clip as lclip

    kv = jax.random.PRNGKey(seed + 1)
    vision_params = lclip.init_vision_tower(kv, vision_cfg)
    params = {
        "visual": vision_params,
        "text": hf_text.params,
        "logit_scale": jnp.asarray(2.6592, jnp.float32),
    }

    def encode_image(p, images, normalize=False):
        return lclip.encode_image(p["visual"], vision_cfg, images,
                                  normalize=normalize)

    def encode_text(p, input_ids, attention_mask=None, normalize=False):
        return hf_text(p["text"], input_ids, attention_mask, normalize)

    return params, encode_image, encode_text
