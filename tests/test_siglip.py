"""SigLIP end-to-end: config, towers (MAP pool, no cls token), parity
vs transformers' SiglipModel, open_clip-format checkpoint ingestion.

Reference anchors: `model_configs/ViT-*-SigLIP*.json` (config values),
timm `vit_*_siglip_*` trunks (tower layout), `loss.py:219-363`
(sigmoid ring loss, covered by tests/test_loss.py).
"""
import dataclasses

import jax
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip, create_model
from leaf_tpu.models.config import get_model_config, list_models


def test_siglip_configs_registered():
    names = [n for n in list_models() if "SigLIP" in n]
    assert len(names) >= 9
    c = get_model_config("ViT-B-16-SigLIP")
    assert c.vision.attn_pool and not c.vision.cls_token
    assert c.text.no_causal_mask and c.text.pool_type == "last"
    assert c.text.proj_bias and c.text.vocab_size == 32000
    assert c.init_logit_bias == -10
    assert c.text.ln_eps == pytest.approx(1e-6)
    so = get_model_config("ViT-SO400M-14-SigLIP")
    assert so.vision.width == 1152 and so.vision.layers == 27
    assert so.vision.heads == 16
    assert so.text.mlp_ratio == pytest.approx(3.7362)
    # 384/14 is not integral: conv floor semantics -> 27x27 grid
    so384 = get_model_config("ViT-SO400M-14-SigLIP-384")
    assert so384.vision.grid_size == 27
    assert so384.vision.num_tokens == 27 * 27


def test_siglip_tiny_forward_shapes():
    model = create_model("siglip-tiny-test")
    cfg = model.cfg
    assert "class_embedding" not in model.params["visual"]
    assert "attn_pool" in model.params["visual"]
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, 500, size=(4, 16)).astype(np.int32)
    images = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    out = lclip.forward(model.params, cfg, images=images, tokens=tokens)
    assert out["image_features"].shape == (4, 64)
    assert out["text_features"].shape == (4, 64)
    assert "logit_bias" in out
    np.testing.assert_allclose(float(out["logit_bias"]), -10.0)
    img_logits, txt_logits = lclip.get_logits(model.params, cfg, images,
                                              tokens)
    # sigmoid-loss logits include the bias
    assert np.isfinite(np.asarray(img_logits)).all()


@pytest.fixture(scope="module")
def hf_siglip():
    transformers = pytest.importorskip("transformers")
    cfg = transformers.SiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=512, hidden_act="gelu", layer_norm_eps=1e-6),
        transformers.SiglipVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=16,
            hidden_act="gelu", layer_norm_eps=1e-6))
    import torch
    torch.manual_seed(0)
    model = transformers.SiglipModel(cfg).eval()
    return model


def _t(x):
    return x.detach().numpy().astype(np.float32)


def _hf_block_stack(layers_mod):
    qkv_w, qkv_b, out_w, out_b = [], [], [], []
    ln1s, ln1b, ln2s, ln2b = [], [], [], []
    fcw, fcb, pw, pb = [], [], [], []
    for lyr in layers_mod:
        a = lyr.self_attn
        qkv_w.append(np.concatenate(
            [_t(a.q_proj.weight).T, _t(a.k_proj.weight).T,
             _t(a.v_proj.weight).T], axis=1))
        qkv_b.append(np.concatenate(
            [_t(a.q_proj.bias), _t(a.k_proj.bias), _t(a.v_proj.bias)]))
        out_w.append(_t(a.out_proj.weight).T)
        out_b.append(_t(a.out_proj.bias))
        ln1s.append(_t(lyr.layer_norm1.weight))
        ln1b.append(_t(lyr.layer_norm1.bias))
        ln2s.append(_t(lyr.layer_norm2.weight))
        ln2b.append(_t(lyr.layer_norm2.bias))
        fcw.append(_t(lyr.mlp.fc1.weight).T)
        fcb.append(_t(lyr.mlp.fc1.bias))
        pw.append(_t(lyr.mlp.fc2.weight).T)
        pb.append(_t(lyr.mlp.fc2.bias))
    st = np.stack
    return {
        "ln_1": {"scale": st(ln1s), "bias": st(ln1b)},
        "attn": {"qkv_w": st(qkv_w), "qkv_b": st(qkv_b),
                 "out_w": st(out_w), "out_b": st(out_b)},
        "ln_2": {"scale": st(ln2s), "bias": st(ln2b)},
        "mlp": {"fc_w": st(fcw), "fc_b": st(fcb),
                "proj_w": st(pw), "proj_b": st(pb)},
    }


def test_siglip_vision_parity_vs_transformers(hf_siglip):
    """Our cls-less tower + MAP attention pool must reproduce
    transformers' SiglipVisionModel bit-for-bit (fp32)."""
    import torch

    vm = hf_siglip.vision_model
    D = 64
    conv = _t(vm.embeddings.patch_embedding.weight)  # [D, 3, p, p]
    p = conv.shape[-1]
    head = vm.head
    in_w = _t(head.attention.in_proj_weight)         # [3D, D]
    in_b = _t(head.attention.in_proj_bias)
    params = {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, D),
        "patch_bias": _t(vm.embeddings.patch_embedding.bias),
        "positional_embedding": _t(vm.embeddings.position_embedding.weight),
        "blocks": _hf_block_stack(vm.encoder.layers),
        "ln_post": {"scale": _t(vm.post_layernorm.weight),
                    "bias": _t(vm.post_layernorm.bias)},
        "attn_pool": {
            "probe": _t(head.probe).reshape(1, D),
            "q_w": in_w[:D].T, "q_b": in_b[:D],
            "kv_w": in_w[D:].T, "kv_b": in_b[D:],
            "proj_w": _t(head.attention.out_proj.weight).T,
            "proj_b": _t(head.attention.out_proj.bias),
            "ln": {"scale": _t(head.layernorm.weight),
                   "bias": _t(head.layernorm.bias)},
            "mlp": {"fc_w": _t(head.mlp.fc1.weight).T,
                    "fc_b": _t(head.mlp.fc1.bias),
                    "proj_w": _t(head.mlp.fc2.weight).T,
                    "proj_b": _t(head.mlp.fc2.bias)},
        },
    }
    vcfg = get_model_config("siglip-tiny-test").vision

    rng = np.random.default_rng(3)
    images = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf_siglip.get_image_features(
            pixel_values=torch.from_numpy(
                images.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(lclip.encode_image(params, vcfg, images))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_siglip_text_parity_vs_transformers(hf_siglip):
    import torch

    tm = hf_siglip.text_model
    params = {
        "token_embedding": _t(tm.embeddings.token_embedding.weight),
        "positional_embedding": _t(tm.embeddings.position_embedding.weight),
        "blocks": _hf_block_stack(tm.encoder.layers),
        "ln_final": {"scale": _t(tm.final_layer_norm.weight),
                     "bias": _t(tm.final_layer_norm.bias)},
        "text_projection": _t(tm.head.weight).T,
        "text_projection_bias": _t(tm.head.bias),
    }
    tcfg = get_model_config("siglip-tiny-test").text

    rng = np.random.default_rng(5)
    tokens = rng.integers(2, 500, size=(4, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf_siglip.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64))).numpy()
    ours = np.asarray(lclip.encode_text(params, tcfg, tokens))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_siglip_openclip_checkpoint_ingestion():
    """open_clip CustomTextCLIP(SigLIP) state-dict naming — timm trunk
    with attn_pool, `text.`-prefixed tower, Linear text projection,
    logit_bias — must load through interop.openclip_to_params."""
    from leaf_tpu.models import interop

    cfg = get_model_config("siglip-tiny-test")
    rng = np.random.default_rng(0)
    D, L = 64, 2
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02

    sd = {
        "visual.trunk.patch_embed.proj.weight": r(D, 3, 16, 16),
        "visual.trunk.patch_embed.proj.bias": r(D),
        "visual.trunk.pos_embed": r(1, 16, D),
        "visual.trunk.norm.weight": r(D), "visual.trunk.norm.bias": r(D),
        "visual.trunk.attn_pool.latent": r(1, 1, D),
        "visual.trunk.attn_pool.q.weight": r(D, D),
        "visual.trunk.attn_pool.q.bias": r(D),
        "visual.trunk.attn_pool.kv.weight": r(2 * D, D),
        "visual.trunk.attn_pool.kv.bias": r(2 * D),
        "visual.trunk.attn_pool.proj.weight": r(D, D),
        "visual.trunk.attn_pool.proj.bias": r(D),
        "visual.trunk.attn_pool.norm.weight": r(D),
        "visual.trunk.attn_pool.norm.bias": r(D),
        "visual.trunk.attn_pool.mlp.fc1.weight": r(4 * D, D),
        "visual.trunk.attn_pool.mlp.fc1.bias": r(4 * D),
        "visual.trunk.attn_pool.mlp.fc2.weight": r(D, 4 * D),
        "visual.trunk.attn_pool.mlp.fc2.bias": r(D),
        "text.token_embedding.weight": r(512, D),
        "text.positional_embedding": r(16, D),
        "text.ln_final.weight": r(D), "text.ln_final.bias": r(D),
        "text.text_projection.weight": r(D, D),
        "text.text_projection.bias": r(D),
        "logit_scale": np.asarray(1.0, np.float32),
        "logit_bias": np.asarray(-10.0, np.float32),
    }
    for i in range(L):
        for mod in ("visual.trunk",):
            sd[f"{mod}.blocks.{i}.norm1.weight"] = r(D)
            sd[f"{mod}.blocks.{i}.norm1.bias"] = r(D)
            sd[f"{mod}.blocks.{i}.attn.qkv.weight"] = r(3 * D, D)
            sd[f"{mod}.blocks.{i}.attn.qkv.bias"] = r(3 * D)
            sd[f"{mod}.blocks.{i}.attn.proj.weight"] = r(D, D)
            sd[f"{mod}.blocks.{i}.attn.proj.bias"] = r(D)
            sd[f"{mod}.blocks.{i}.norm2.weight"] = r(D)
            sd[f"{mod}.blocks.{i}.norm2.bias"] = r(D)
            sd[f"{mod}.blocks.{i}.mlp.fc1.weight"] = r(4 * D, D)
            sd[f"{mod}.blocks.{i}.mlp.fc1.bias"] = r(4 * D)
            sd[f"{mod}.blocks.{i}.mlp.fc2.weight"] = r(D, 4 * D)
            sd[f"{mod}.blocks.{i}.mlp.fc2.bias"] = r(D)
        sd[f"text.transformer.resblocks.{i}.ln_1.weight"] = r(D)
        sd[f"text.transformer.resblocks.{i}.ln_1.bias"] = r(D)
        sd[f"text.transformer.resblocks.{i}.attn.in_proj_weight"] = r(3 * D, D)
        sd[f"text.transformer.resblocks.{i}.attn.in_proj_bias"] = r(3 * D)
        sd[f"text.transformer.resblocks.{i}.attn.out_proj.weight"] = r(D, D)
        sd[f"text.transformer.resblocks.{i}.attn.out_proj.bias"] = r(D)
        sd[f"text.transformer.resblocks.{i}.ln_2.weight"] = r(D)
        sd[f"text.transformer.resblocks.{i}.ln_2.bias"] = r(D)
        sd[f"text.transformer.resblocks.{i}.mlp.c_fc.weight"] = r(4 * D, D)
        sd[f"text.transformer.resblocks.{i}.mlp.c_fc.bias"] = r(4 * D)
        sd[f"text.transformer.resblocks.{i}.mlp.c_proj.weight"] = r(D, 4 * D)
        sd[f"text.transformer.resblocks.{i}.mlp.c_proj.bias"] = r(D)

    params = interop.openclip_to_params(sd, cfg)
    assert "attn_pool" in params["visual"]
    assert "class_embedding" not in params["visual"]
    assert "text_projection_bias" in params["text"]
    assert float(params["logit_bias"]) == -10.0

    tokens = np.random.default_rng(1).integers(
        2, 500, size=(2, 16)).astype(np.int32)
    images = np.random.default_rng(2).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    out = lclip.forward(params, cfg, images=images, tokens=tokens)
    assert np.isfinite(np.asarray(out["image_features"])).all()
    assert np.isfinite(np.asarray(out["text_features"])).all()


def test_clipa_config_and_forward():
    """CLIPA: no ln_pre, avg pooling with ln_post AFTER pooling."""
    cfg = get_model_config("ViT-L-14-CLIPA")
    assert cfg.vision.final_ln_after_pool and not cfg.vision.ln_pre
    assert cfg.text.no_causal_mask and cfg.text.pool_type == "last"
    tiny = dataclasses.replace(
        get_model_config("ViT-tiny-test"),
        vision=dataclasses.replace(
            get_model_config("ViT-tiny-test").vision,
            ln_pre=False, pool_type="avg_patch", final_ln_after_pool=True))
    params = lclip.init_clip(jax.random.PRNGKey(0), tiny)
    assert "ln_pre" not in params["visual"]
    images = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    feats = lclip.encode_image(params["visual"], tiny.vision, images)
    assert feats.shape == (2, 64)
    assert np.isfinite(np.asarray(feats)).all()


def test_siglip_contrastive_train_step_on_mesh():
    """Sigmoid ring loss + SigLIP model end-to-end on the 8-device
    mesh: one contrastive train step must run and move the loss."""
    import jax.numpy as jnp

    from leaf_tpu.parallel.mesh import create_mesh, replicate
    from leaf_tpu.train.contrastive import make_contrastive_train_step
    from leaf_tpu.train.optim import make_optimizer
    from leaf_tpu.train.schedules import cosine_lr
    from leaf_tpu.train.step import TrainState

    model = create_model("siglip-tiny-test")
    mesh = create_mesh()
    params = replicate(model.params, mesh)
    tx = make_optimizer(cosine_lr(1e-3, 1, 10), weight_decay=1e-4)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step = make_contrastive_train_step(model.cfg, tx, mesh=mesh,
                                       siglip=True)

    from leaf_tpu.parallel.sharding import put_batch
    rng = np.random.default_rng(0)
    images = put_batch(rng.standard_normal((8, 64, 64, 3))
                       .astype(np.float32), mesh)
    tokens = put_batch(rng.integers(2, 500, size=(8, 16))
                       .astype(np.int32), mesh)
    state, metrics = step(state, images, tokens)
    l0 = float(metrics["loss"])
    state, metrics = step(state, images, tokens)
    assert np.isfinite(l0) and np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0


def test_registry_breadth_and_hf_text_route(tmp_path):
    """Registry must cover >=60 reference configs; HF-text configs
    resolve and create_model builds the CustomTextCLIP route (local
    roberta config, no network)."""
    import transformers

    from leaf_tpu.models import factory
    from leaf_tpu.models.config import register_model, \
        config_from_open_clip_dict

    assert len(list_models()) >= 60
    # named HF-text entries resolve with tower metadata
    for n in ["roberta-ViT-B-32", "mt5-base-ViT-B-32", "nllb-clip-base",
              "xlm-roberta-large-ViT-H-14", "nllb-clip-large-siglip"]:
        c = get_model_config(n)
        assert c.text.hf_model_name and c.text.hf_tokenizer_name

    # tiny local roberta config -> the factory builds an HF-text model
    rcfg = transformers.RobertaConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=20)
    d = tmp_path / "tiny-roberta"
    rcfg.save_pretrained(str(d))
    register_model(config_from_open_clip_dict("tiny-roberta-test", {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 64,
                       "patch_size": 16},
        "text_cfg": {"hf_model_name": str(d), "hf_tokenizer_name": str(d),
                     "hf_pooler_type": "mean_pooler"},
    }))
    model = factory.create_model("tiny-roberta-test")
    assert model.hf_text is not None
    ids = np.array([[0, 5, 7, 2, 0, 0]], np.int32)
    feats = np.asarray(model.encode_text(ids, normalize=True))
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               rtol=1e-5)
    imgs = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    assert np.asarray(model.encode_image(imgs)).shape == (2, 16)
    with pytest.raises(ValueError, match="HF-text-tower"):
        factory.create_model("tiny-roberta-test", pretrained="x.pt")


def test_patch_dropout_cls_less_tower():
    """patch_dropout on a class-token-less tower must treat ALL tokens
    as droppable patches (no index-0 pinning)."""
    from leaf_tpu.models.clip import patch_dropout

    x = np.arange(4 * 8 * 2, dtype=np.float32).reshape(4, 8, 2)
    out = patch_dropout(jax.numpy.asarray(x), 0.5, jax.random.PRNGKey(0),
                        cls_token=False)
    assert out.shape == (4, 4, 2)
    # with cls: token 0 kept verbatim, 3 of 7 patches
    out2 = patch_dropout(jax.numpy.asarray(x), 0.5, jax.random.PRNGKey(0),
                         cls_token=True)
    assert out2.shape == (4, 4, 2)
    np.testing.assert_array_equal(np.asarray(out2[:, 0]), x[:, 0])


def test_siglip_preprocess_uses_inception_stats():
    """SigLIP configs carry (0.5, 0.5, 0.5) stats; the transform and
    the device-side normalizer must honor them (reference `_slpcfg`
    mean/std)."""
    from PIL import Image

    from leaf_tpu.attacks.image import _normalize_images
    from leaf_tpu.models import create_model_and_transforms

    model, preprocess, _ = create_model_and_transforms("siglip-tiny-test")
    gray = Image.new("RGB", (64, 64), (128, 128, 128))
    arr = preprocess(gray)
    # (128/255 - 0.5) / 0.5 ~= 0.0039 — near zero, NOT the OpenAI-stats
    # value (~0.07..0.28 depending on channel)
    assert abs(float(np.mean(arr))) < 0.01

    x = jax.numpy.full((1, 4, 4, 3), 0.5)
    dev = np.asarray(_normalize_images(x, model.cfg))
    np.testing.assert_allclose(dev, 0.0, atol=1e-6)
    # default stats still OpenAI for non-SigLIP configs
    dev2 = np.asarray(_normalize_images(x, get_model_config("ViT-tiny-test")))
    assert abs(float(dev2.mean())) > 0.05
