"""leaf_tpu — a TPU-native adversarially-robust-CLIP framework.

Built from scratch in JAX/XLA (pjit + Pallas) with the capabilities of
LIONS-EPFL/LEAF (reference layout documented in SURVEY.md).  Subpackages:

  models     — pure-JAX CLIP towers, config registry, factory, HF/OpenCLIP interop
  tokenizer  — byte-BPE CLIP tokenizer (host-side, batched, cached; C++ fast path)
  attacks    — Levenshtein-k text attacks (LEAF/Charmer/bruteforce) + PGD/APGD image attacks
  train      — adversarial finetuning drivers (LEAF text AT, FARE image AT)
  data       — host-side data pipelines (webdataset tars, HF datasets, synthetic)
  evals      — TextFARE, zero-shot text, ImageNet, retrieval evaluation suite
  parallel   — device-mesh / sharding helpers
  utils      — logging, metrics ledger, schedulers, misc
"""

__version__ = "0.1.0"
