"""Hub release path: open_clip-layout directory + model card + config
round-trip (reference `src/open_clip/push_to_hf_hub.py`)."""
import json

import jax
import numpy as np
import pytest

from leaf_tpu.models.clip import init_clip
from leaf_tpu.models.config import (
    config_from_open_clip_dict,
    get_model_config,
)
from leaf_tpu.push_to_hf_hub import (
    config_to_open_clip_dict,
    generate_readme,
    main,
    save_for_hub,
)


@pytest.mark.parametrize("name", ["ViT-B-32", "RN50",
                                  "convnext_base_w", "ViT-B-16-quickgelu"])
def test_config_dict_roundtrip(name):
    cfg = get_model_config(name)
    back = config_from_open_clip_dict(name, config_to_open_clip_dict(cfg))
    assert back.embed_dim == cfg.embed_dim
    assert back.quick_gelu == cfg.quick_gelu
    assert back.resnet == cfg.resnet
    assert back.convnext == cfg.convnext
    assert back.vision.image_size == cfg.vision.image_size
    assert back.text == cfg.text


def test_save_for_hub_and_reload(tmp_path):
    cfg = get_model_config("ViT-tiny-test")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    d = save_for_hub(params, cfg, str(tmp_path / "hub"),
                     model_card={"description": "test model",
                                 "details": {"Dataset": "synthetic"},
                                 "citation": "@article{x}"})
    hub_cfg = json.load(open(tmp_path / "hub" / "open_clip_config.json"))
    assert hub_cfg["model_cfg"]["embed_dim"] == 64
    assert hub_cfg["preprocess_cfg"]["mean"][0] == pytest.approx(0.4814547)
    readme = open(tmp_path / "hub" / "README.md").read()
    assert readme.startswith("---\ntags:\n- clip\n")
    assert "datasets:\n- synthetic" in readme and "```bibtex" in readme

    # the directory is loadable by the standard checkpoint loader
    from leaf_tpu.models.interop import load_pretrained
    back = load_pretrained(d, cfg)
    np.testing.assert_allclose(
        np.asarray(params["visual"]["proj"]),
        np.asarray(back["visual"]["proj"]), atol=1e-7)


def test_push_cli_local_dir_only(tmp_path):
    cfg = get_model_config("ViT-tiny-test")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    from leaf_tpu.convert import params_to_openclip, save_state_dict
    ckpt = save_state_dict(params_to_openclip(params, cfg),
                           str(tmp_path / "in"), "openclip")
    main(["--model", "ViT-tiny-test", "--input", ckpt,
          "--repo-id", "me/tiny", "--local-dir", str(tmp_path / "out"),
          "--local-dir-only", "--description", "d"])
    assert (tmp_path / "out" / "open_clip_model.safetensors").exists()
    assert (tmp_path / "out" / "README.md").exists()


def test_open_clip_config_round_trips_architecture_deltas():
    """config_to_open_clip_dict must emit every field
    config_from_open_clip_dict reads — CLIPA/SigLIP towers reloaded
    from a published open_clip_config.json used to silently degrade to
    a vanilla causal argmax CLIP."""
    from leaf_tpu.models.config import (
        config_from_open_clip_dict,
        get_model_config,
        list_models,
    )
    from leaf_tpu.push_to_hf_hub import config_to_open_clip_dict

    names = [n for n in list_models()
             if "tiny-test" in n or "CLIPA" in n]
    checked = 0
    for name in names:
        try:
            cfg = get_model_config(name)
        except KeyError:
            continue
        if cfg.trunk is not None or cfg.convnext is not None \
                or cfg.resnet is not None or cfg.text.hf_model_name:
            continue   # non-ViT towers serialize via timm names
        d = config_to_open_clip_dict(cfg)
        back = config_from_open_clip_dict(name, d)
        assert back.vision.pool_type == cfg.vision.pool_type, name
        assert back.vision.ln_pre == cfg.vision.ln_pre, name
        assert back.vision.final_ln_after_pool \
            == cfg.vision.final_ln_after_pool, name
        assert back.text.no_causal_mask == cfg.text.no_causal_mask, name
        assert back.text.pool_type == cfg.text.pool_type, name
        assert back.text.proj_bias == cfg.text.proj_bias, name
        assert back.text.mlp_ratio == cfg.text.mlp_ratio, name
        assert back.quick_gelu == cfg.quick_gelu, name
        assert back.init_logit_scale == cfg.init_logit_scale, name
        assert back.init_logit_bias == cfg.init_logit_bias, name
        checked += 1
    assert checked >= 5, f"only {checked} configs exercised"
