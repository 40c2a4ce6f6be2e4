"""Numerical parity: leaf_tpu CLIP vs HuggingFace CLIPModel.

The reference's own conversion layer asserts allclose parity between
OpenCLIP and HF forwards (`conversion/convert_2.py:237-265`); we hold
ourselves to the same gate, offline: build a randomly-initialised HF
CLIPModel, convert its weights into a leaf_tpu pytree, and require
matching text/image features and logits.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from leaf_tpu.models import clip as lclip  # noqa: E402
from leaf_tpu.models import interop  # noqa: E402
from leaf_tpu.models.config import CLIPConfig, TextConfig, VisionConfig  # noqa: E402

WIDTH, LAYERS, HEADS, EMBED = 64, 2, 2, 32
IMG, PATCH = 32, 16
VOCAB, CTX = 1000, 16


def make_pair(hidden_act: str):
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=VOCAB, hidden_size=WIDTH,
                         intermediate_size=WIDTH * 4, num_hidden_layers=LAYERS,
                         num_attention_heads=HEADS, max_position_embeddings=CTX,
                         hidden_act=hidden_act, eos_token_id=VOCAB - 1),
        vision_config=dict(hidden_size=WIDTH, intermediate_size=WIDTH * 4,
                           num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                           image_size=IMG, patch_size=PATCH,
                           hidden_act=hidden_act),
        projection_dim=EMBED,
    )
    hf = transformers.CLIPModel(hf_cfg).eval()
    cfg = CLIPConfig(
        name="parity-test", embed_dim=EMBED,
        quick_gelu=(hidden_act == "quick_gelu"),
        text=TextConfig(context_length=CTX, vocab_size=VOCAB, width=WIDTH,
                        heads=HEADS, layers=LAYERS, output_dim=EMBED),
        vision=VisionConfig(image_size=IMG, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, head_width=WIDTH // HEADS,
                            output_dim=EMBED),
    )
    params = interop.hf_to_params(hf.state_dict(), cfg)
    return hf, cfg, params


def rand_batch(rng):
    # tokens: sot-ish start, random middle, max-id EOT at varying position
    B = 4
    tokens = rng.integers(1, VOCAB - 1, size=(B, CTX))
    for i in range(B):
        eot = rng.integers(3, CTX)
        tokens[i, eot] = VOCAB - 1       # EOT = highest id (argmax pooling)
        tokens[i, eot + 1:] = 0
    images = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    return tokens.astype(np.int64), images


@pytest.mark.parametrize("hidden_act", ["gelu", "quick_gelu"])
def test_text_and_image_parity(hidden_act):
    hf, cfg, params = make_pair(hidden_act)
    tokens, images = rand_batch(np.random.default_rng(42))

    with torch.no_grad():
        ref_t = hf.get_text_features(torch.from_numpy(tokens)).numpy()
        # HF wants NCHW
        ref_i = hf.get_image_features(
            torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()

    ours_t = np.asarray(lclip.encode_text(
        params["text"], cfg.text, jnp.asarray(tokens), cfg.quick_gelu))
    ours_i = np.asarray(lclip.encode_image(
        params["visual"], cfg.vision, jnp.asarray(images), cfg.quick_gelu))

    np.testing.assert_allclose(ours_t, ref_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(ours_i, ref_i, atol=2e-4, rtol=1e-3)


def test_logits_parity():
    hf, cfg, params = make_pair("quick_gelu")
    tokens, images = rand_batch(np.random.default_rng(7))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(tokens),
                 pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2)))
        ref_logits = out.logits_per_image.numpy()
    ours_img, ours_txt = lclip.get_logits(
        params, cfg, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours_img), ref_logits,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_txt), ref_logits.T,
                               atol=5e-4, rtol=1e-3)


def test_hf_roundtrip():
    """pytree → HF state dict → pytree is the identity."""
    _, cfg, params = make_pair("gelu")
    sd = interop.params_to_hf(params, cfg)
    back = interop.hf_to_params(sd, cfg)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encode_text_embedding_matches_encode_text():
    _, cfg, params = make_pair("gelu")
    tokens, _ = rand_batch(np.random.default_rng(3))
    tok = jnp.asarray(tokens)
    direct = lclip.encode_text(params["text"], cfg.text, tok)
    embeds = lclip.embed_tokens(params["text"], tok)
    via_embeds = lclip.encode_text_embedding(params["text"], cfg.text, embeds, tok)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_embeds),
                               atol=1e-6)
