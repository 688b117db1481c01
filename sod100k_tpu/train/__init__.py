"""Training stack: losses, optimizers, steps, schedules, checkpoints."""

from .optim import cosine_lr, make_adam, make_adam_dwd, make_sgd, multistep_lr
from .params import merge, partition, update_state
from .step import bce_with_logits, make_eval_step, make_train_step, quantized_mae

__all__ = [
    "bce_with_logits", "cosine_lr", "make_adam", "make_adam_dwd",
    "make_eval_step", "make_sgd", "make_train_step", "merge", "multistep_lr",
    "partition", "quantized_mae", "update_state",
]
