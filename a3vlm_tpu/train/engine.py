"""One-epoch training loop (reference engine_finetune.py:13-105):

- cosine LR adjusted per optimizer update (the reference adjusts at every
  grad-accum boundary, :41-42; here one train-step call IS one boundary)
- loss from the jitted train step (autocast bf16 is the params' dtype)
- non-finite loss aborts the run (:56-58)
- MetricLogger + TensorBoard/JSONL logging with the effective-epoch x1000
  x-axis (:87-91)
- in-epoch checkpointing every ``save_iteration_interval`` (:93-100)
"""

from __future__ import annotations

import math
from typing import Callable, Optional

from a3vlm_tpu.train.lr_sched import adjust_learning_rate_epoch
from a3vlm_tpu.utils.logging import MetricLogger


def train_one_epoch(
    train_step: Callable,
    state,
    loader,
    epoch: int,
    *,
    lr: float,
    min_lr: float,
    warmup_epochs: float,
    epochs: float,
    print_freq: int = 10,
    tb_logger=None,
    save_fn: Optional[Callable] = None,
    save_iteration_interval: int = 5000,
):
    """``train_step(state, batch) -> (state, metrics)`` must be jitted and
    embed the LR schedule (make_epoch_schedule) — the ``cur_lr`` computed
    here is the same value, logged host-side.
    ``save_fn(state, epoch, it)`` for in-epoch checkpointing."""
    metric_logger = MetricLogger()
    header = f"Epoch: [{epoch}]"
    n_iters = len(loader)

    for it, batch in enumerate(
        metric_logger.log_every(loader, print_freq, header, total=n_iters)
    ):
        epoch_frac = epoch + it / max(n_iters, 1)
        cur_lr = adjust_learning_rate_epoch(
            epoch_frac, lr=lr, min_lr=min_lr, warmup_epochs=warmup_epochs,
            epochs=epochs,
        )
        state, metrics = train_step(state, batch)
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            raise FloatingPointError(
                f"loss is {loss} at epoch {epoch} iter {it}, stopping "
                f"training (engine_finetune.py:56-58 semantics)"
            )

        metric_logger.update(
            closs=loss, lr=cur_lr, grad_norm=float(metrics["grad_norm"])
        )
        if tb_logger is not None:
            x = int((epoch_frac) * 1000)
            tb_logger.add_scalar("c_train_loss", loss, x)
            tb_logger.add_scalar("lr", cur_lr, x)

        if (
            save_fn is not None
            and (it + 1) % save_iteration_interval == 0
            and it + 1 != n_iters
        ):
            save_fn(state, epoch, it + 1)

    print(f"Averaged stats: {metric_logger}")
    return state, {
        k: meter.global_avg for k, meter in metric_logger.meters.items()
    }
