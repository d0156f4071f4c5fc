"""Training losses (reference model/accessory/model/meta.py:234-263).

Semantics carried over:
- logits are shifted left, labels right (next-token prediction).
- label id 0 is ignored (CE ``ignore_index=0``, meta.py:67) — the datasets
  zero-fill pads and mask prompts with 0 after clamping (alpaca.py:177-199).
- an all-ignored batch yields exactly zero loss (meta.py:260-261).

The reference also right-trims all-pad tail columns before the forward
(meta.py:235-248) — a dynamic-shape trick XLA can't use; with static shapes
the ignore-mask yields identical loss because trimmed columns are causal
suffixes that never influence earlier positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def next_token_loss(
    logits: jnp.ndarray,  # [B, S, V] (text positions)
    labels: jnp.ndarray,  # [B, S] int, 0 = ignore
    vocab_size: int | None = None,  # true vocab when V is lane-padded
) -> jnp.ndarray:
    if vocab_size is not None and vocab_size < logits.shape[-1]:
        pad_mask = jnp.arange(logits.shape[-1]) >= vocab_size
        logits = jnp.where(pad_mask, -1e30, logits)
    logits = logits[:, :-1, :]
    labels = labels[:, 1:]
    valid = labels != 0
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.sum(valid)
    loss = -jnp.sum(jnp.where(valid, token_ll, 0.0))
    return jnp.where(n_valid > 0, loss / jnp.maximum(n_valid, 1), 0.0)
