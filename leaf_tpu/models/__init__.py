from leaf_tpu.models.config import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    get_model_config,
    list_models,
    register_model,
)
from leaf_tpu.models.factory import (
    CLIPModel,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
)
from leaf_tpu.models import clip, interop, layers, preprocess

__all__ = [
    "CLIPConfig", "TextConfig", "VisionConfig", "get_model_config",
    "list_models", "register_model", "CLIPModel", "create_model",
    "create_model_and_transforms", "get_tokenizer", "clip", "interop",
    "layers", "preprocess",
]
