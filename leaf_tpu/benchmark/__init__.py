"""Broad benchmark suite (the reference's vendored LAION
clip_benchmark, `/root/reference/src/clip_benchmark/`): zero-shot
classification (clean + APGD-robust), zero-shot retrieval, and linear
probing over local datasets, with a subcommand CLI writing JSON
results.
"""
from leaf_tpu.benchmark.zeroshot_classification import (
    evaluate_zeroshot_classification,
)
from leaf_tpu.benchmark.zeroshot_retrieval import evaluate_zeroshot_retrieval
from leaf_tpu.benchmark.linear_probe import evaluate_linear_probe

__all__ = [
    "evaluate_zeroshot_classification",
    "evaluate_zeroshot_retrieval",
    "evaluate_linear_probe",
]
