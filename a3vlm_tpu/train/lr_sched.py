"""Cosine LR schedule with linear warmup (reference util/lr_sched.py:3-35),
iteration- and epoch-based variants, plus per-group ``lr_scale``."""

from __future__ import annotations

import math


def cosine_lr(
    it: float,
    *,
    lr: float,
    min_lr: float,
    warmup_iters: float,
    total_iters: float,
) -> float:
    """LR at (fractional) iteration ``it``."""
    if warmup_iters > 0 and it < warmup_iters:
        return lr * it / warmup_iters
    progress = (it - warmup_iters) / max(total_iters - warmup_iters, 1e-8)
    return min_lr + (lr - min_lr) * 0.5 * (1.0 + math.cos(math.pi * progress))


def adjust_learning_rate_epoch(
    epoch_frac: float, *, lr: float, min_lr: float, warmup_epochs: float,
    epochs: float,
) -> float:
    """Epoch-fraction variant (util/lr_sched.py — called every grad-accum
    boundary with epoch + i/len(loader), engine_finetune.py:41-42)."""
    return cosine_lr(
        epoch_frac,
        lr=lr,
        min_lr=min_lr,
        warmup_iters=warmup_epochs,
        total_iters=epochs,
    )
