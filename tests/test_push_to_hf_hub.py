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
