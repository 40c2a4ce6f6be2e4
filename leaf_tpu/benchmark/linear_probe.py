"""Linear probing benchmark.

Re-expression of `src/clip_benchmark/metrics/linear_probe.py`: freeze
the image tower, extract features once, train a logistic-regression
head with AdamW (the reference trains a torch linear layer with
validation-based weight-decay search), report test accuracy.  The probe
training is one jitted full-batch optimisation.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from leaf_tpu.attacks.image import _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def extract_features(params, cfg: CLIPConfig, loader) -> Tuple[np.ndarray,
                                                               np.ndarray]:
    feats, labels = [], []
    enc_jit = jax.jit(
        lambda p, im: lclip.encode_image_model(
            p, cfg, _normalize_images(im, cfg),
            normalize=True))  # reference F.normalize before the probe
    enc = lambda im: enc_jit(params, im)  # params as arg, not constant
    for images, lab in loader:
        feats.append(np.asarray(enc(jnp.asarray(images))))
        labels.append(np.asarray(lab))
    return np.concatenate(feats), np.concatenate(labels)


def train_probe(features: np.ndarray, labels: np.ndarray, n_classes: int,
                lr: float = 0.1, weight_decay: float = 0.0,
                epochs: int = 100, seed: int = 0):
    """Full-batch AdamW logistic regression; returns (W, b)."""
    D = features.shape[1]
    key = jax.random.PRNGKey(seed)
    params = {"w": 0.01 * jax.random.normal(key, (D, n_classes)),
              "b": jnp.zeros((n_classes,))}
    if epochs <= 0:
        raise ValueError(f"linear probe needs epochs > 0, got {epochs}")
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)
    X = jnp.asarray(features)
    y = jnp.asarray(labels)

    # X/y as jit ARGUMENTS: closing over them would bake the whole
    # feature matrix into the executable as constants and retrace per
    # train_probe call (the weight-decay sweep calls this repeatedly)
    @jax.jit
    def step(params, opt_state, X, y):
        def loss_fn(p):
            logits = X @ p["w"] + p["b"]
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, y[:, None], 1).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state, X, y)
    return params, float(loss)


def evaluate_linear_probe(
    params,
    cfg: CLIPConfig,
    train_loader,
    test_loader,
    n_classes: int,
    lr: float = 0.1,
    weight_decays: Sequence[float] = (0.0,),
    epochs: int = 100,
    val_fraction: float = 0.2,
    seed: int = 0,
    fewshot_k: int = -1,
) -> Dict[str, float]:
    """Feature extraction → (optional) wd search on a val split →
    final probe → test accuracy + mean per-class recall.

    `fewshot_k > 0` keeps k train examples per class (the reference's
    `--fewshot_k`, `linear_probe.py`)."""
    Xtr, ytr = extract_features(params, cfg, train_loader)
    Xte, yte = extract_features(params, cfg, test_loader)
    if fewshot_k and fewshot_k > 0:
        rng = np.random.default_rng(seed)
        keep = []
        for c in np.unique(ytr):
            idx = np.nonzero(ytr == c)[0]
            rng.shuffle(idx)
            keep.extend(idx[:fewshot_k])
        keep = np.sort(np.asarray(keep))
        Xtr, ytr = Xtr[keep], ytr[keep]

    best_wd = weight_decays[0]
    if len(weight_decays) > 1:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(Xtr))
        n_val = max(1, int(val_fraction * len(Xtr)))
        vi, ti = idx[:n_val], idx[n_val:]
        best_acc = -1.0
        for wd in weight_decays:
            probe, _ = train_probe(Xtr[ti], ytr[ti], n_classes, lr, wd,
                                   epochs, seed)
            pred = np.asarray(Xtr[vi] @ probe["w"] + probe["b"]).argmax(-1)
            acc = float((pred == ytr[vi]).mean())
            if acc > best_acc:
                best_acc, best_wd = acc, wd

    probe, final_loss = train_probe(Xtr, ytr, n_classes, lr, best_wd,
                                    epochs, seed)
    pred = np.asarray(Xte @ probe["w"] + probe["b"]).argmax(-1)
    acc = float((pred == yte).mean())
    per_class = []
    for c in range(n_classes):
        m = yte == c
        if m.any():
            per_class.append(float((pred[m] == c).mean()))
    return {"lp_acc1": acc,
            "lp_mean_per_class_recall": float(np.mean(per_class)),
            "lp_weight_decay": best_wd,
            "lp_train_loss": final_loss,
            "n_train": len(ytr), "n_test": len(yte)}
