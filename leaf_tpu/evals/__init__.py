from leaf_tpu.evals.retrieval import (
    RETRIEVAL_TARGETS,
    eval_retrieval,
    evaluate_scores,
    pre_caption,
)
from leaf_tpu.evals.textfare import eval_textfare
from leaf_tpu.evals.zero_shot import (
    run_imagenet_eval,
    run_text_classification,
    zero_shot_eval,
)
from leaf_tpu.evals.zero_shot_text import (
    class_anchor_features,
    eval_zero_shot_text,
)

__all__ = [
    "RETRIEVAL_TARGETS", "eval_retrieval", "evaluate_scores", "pre_caption",
    "eval_textfare", "run_imagenet_eval", "run_text_classification",
    "zero_shot_eval", "class_anchor_features", "eval_zero_shot_text",
]
