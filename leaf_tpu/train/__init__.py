from leaf_tpu.train.optim import make_optimizer, weight_decay_mask
from leaf_tpu.train.schedules import (
    const_lr,
    const_lr_cooldown,
    cosine_lr,
    make_scheduler,
)
from leaf_tpu.train.step import (
    TrainState,
    clamp_logit_scale,
    make_anchor_encode,
    make_train_step,
    textfare_loss,
)

__all__ = [
    "make_optimizer", "weight_decay_mask", "const_lr", "const_lr_cooldown",
    "cosine_lr", "make_scheduler", "TrainState", "clamp_logit_scale",
    "make_anchor_encode", "make_train_step", "textfare_loss",
]
