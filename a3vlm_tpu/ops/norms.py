"""Normalization ops.

RMSNorm matches reference model/accessory/model/components.py:10-53 (the
pure-torch fallback for apex FusedRMSNorm): normalize in float32, cast back,
then scale. On TPU, XLA fuses this chain into neighbouring ops; no custom
kernel is needed for speed-of-light here (it is bandwidth-bound and fully
fused into the surrounding matmuls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Standard LayerNorm (used by the visual projectors and ViT towers)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )
