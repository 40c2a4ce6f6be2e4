"""Native JAX M2M100 encoder vs the torch oracle (transformers).

The nllb-clip text towers are `facebook/nllb-200-distilled-*` encoders
(reference `model_configs/nllb-clip-*.json`); transformers ships no Flax
M2M100, so models/m2m100.py implements the encoder natively — these
tests pin it, weight-for-weight, against `transformers.M2M100Model`'s
torch encoder.
"""
import numpy as np
import pytest

pytest.importorskip("torch")
import torch  # noqa: E402
import transformers  # noqa: E402

from leaf_tpu.models.m2m100 import (  # noqa: E402
    M2M100EncoderModule,
    M2M100Spec,
    m2m100_encode,
    m2m100_from_torch,
    position_ids_from_tokens,
    sinusoid_table,
)

TINY = dict(vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_position_embeddings=64, pad_token_id=1, bos_token_id=0,
            eos_token_id=2, scale_embedding=True)


def _tiny_torch():
    torch.manual_seed(0)
    cfg = transformers.M2M100Config(**TINY)
    model = transformers.M2M100Model(cfg).eval()
    return cfg, model


def _tokens():
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, size=(3, 10)).astype(np.int64)
    ids[0, 7:] = 1   # padded row
    ids[2, 4:] = 1   # shorter row
    mask = (ids != 1).astype(np.int64)
    return ids, mask


def test_sinusoid_table_matches_torch():
    from transformers.models.m2m_100.modeling_m2m_100 import (
        M2M100SinusoidalPositionalEmbedding,
    )
    emb = M2M100SinusoidalPositionalEmbedding(16, 32, padding_idx=1)
    ours = sinusoid_table(16 + 2, 32, padding_idx=1)
    np.testing.assert_allclose(ours, emb.weights.detach().numpy(),
                               atol=1e-6)


def test_position_ids_match_torch():
    from transformers.models.m2m_100.modeling_m2m_100 import (
        create_position_ids_from_input_ids,
    )
    ids, _ = _tokens()
    theirs = create_position_ids_from_input_ids(
        torch.tensor(ids), padding_idx=1).numpy()
    ours = np.asarray(position_ids_from_tokens(ids, 1))
    np.testing.assert_array_equal(ours, theirs)


def test_encoder_parity_with_torch():
    cfg, model = _tiny_torch()
    ids, mask = _tokens()
    with torch.no_grad():
        ref = model.encoder(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask))
    spec = M2M100Spec.from_hf_config(cfg)
    params = m2m100_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()}, spec,
        prefix="")
    ours = np.asarray(m2m100_encode(params, spec, ids, mask))
    np.testing.assert_allclose(ours, ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_encoder_parity_mask_from_pad():
    """attention_mask=None must derive the HF mask from pad ids."""
    cfg, model = _tiny_torch()
    ids, mask = _tokens()
    with torch.no_grad():
        ref = model.encoder(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask))
    spec = M2M100Spec.from_hf_config(cfg)
    params = m2m100_from_torch(
        {k: v.numpy() for k, v in model.state_dict().items()}, spec,
        prefix="")
    ours = np.asarray(m2m100_encode(params, spec, ids, None))
    np.testing.assert_allclose(ours, ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_hf_text_tower_routes_m2m100():
    """HFTextTower(config with model_type=m2m_100) must build the native
    module and produce [B, output_dim] via the cls pooler (the nllb-clip
    binding, config.py)."""
    from leaf_tpu.models.hf_text import HFTextTower

    cfg = transformers.M2M100Config(**TINY)
    tower = HFTextTower(cfg, output_dim=16, pooler_type="cls_pooler")
    assert isinstance(tower.module, M2M100EncoderModule)
    ids, _ = _tokens()
    out = tower(tower.params, ids)
    assert out.shape == (3, 16)
    # cls pooling == first-token hidden state @ proj
    h = m2m100_encode(tower.params["hf"], tower.module.spec, ids)
    expect = np.asarray(h[:, 0] @ tower.params["proj"]["w"])
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_from_pretrained_reads_m2m100_model_layout(tmp_path):
    """Ingestion from a saved torch M2M100Model dir (model.safetensors,
    `model.encoder.*` keys via save_pretrained)."""
    cfg, model = _tiny_torch()
    d = tmp_path / "nllb"
    model.save_pretrained(d)
    module = M2M100EncoderModule.from_pretrained(str(d), config=cfg)
    ids, mask = _tokens()
    with torch.no_grad():
        ref = model.encoder(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask))
    out = module(input_ids=ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
