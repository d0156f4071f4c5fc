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


def make_epoch_schedule(
    *, lr: float, min_lr: float, warmup_epochs: float, epochs: float,
    updates_per_epoch: int, start_epoch: int = 0,
):
    """optax schedule: update count -> LR, matching the reference's
    per-accum-boundary epoch-fraction cosine (engine_finetune.py:41-42).
    jit-traceable (jnp math on the count)."""
    import jax.numpy as jnp

    def schedule(count):
        frac = start_epoch + count / max(updates_per_epoch, 1)
        warm = lr * frac / jnp.maximum(warmup_epochs, 1e-8)
        progress = (frac - warmup_epochs) / max(epochs - warmup_epochs, 1e-8)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        if warmup_epochs > 0:
            return jnp.where(frac < warmup_epochs, warm, cos)
        return cos

    return schedule


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
