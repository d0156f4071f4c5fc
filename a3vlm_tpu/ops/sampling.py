"""Sampling ops for generation (reference model/accessory/model/meta.py:568-583)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_top_p(rng: jax.Array, probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Top-p (nucleus) sampling. ``probs``: [B, V] float -> [B] int32.

    Matches the reference exactly: sort descending, keep tokens while the
    cumulative probability *excluding* the current token is <= p, renormalize,
    sample.
    """
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(probs_sort, axis=-1)
    keep = (cum - probs_sort) <= p
    probs_sort = jnp.where(keep, probs_sort, 0.0)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    choice = jax.random.categorical(rng, jnp.log(probs_sort + 1e-20), axis=-1)
    return jnp.take_along_axis(sort_idx, choice[:, None], axis=-1)[:, 0]


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: float,
    top_p: float,
) -> jnp.ndarray:
    """Greedy when ``temperature == 0`` (meta.py:458-461), else top-p."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    return sample_top_p(rng, probs, top_p).astype(jnp.int32)
