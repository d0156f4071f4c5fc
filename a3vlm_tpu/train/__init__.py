from a3vlm_tpu.train.losses import next_token_loss
from a3vlm_tpu.train.lr_sched import adjust_learning_rate_epoch, cosine_lr
from a3vlm_tpu.train.step import (
    TrainState,
    default_llm_loss,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "next_token_loss",
    "adjust_learning_rate_epoch",
    "cosine_lr",
    "TrainState",
    "default_llm_loss",
    "make_optimizer",
    "make_train_step",
]
