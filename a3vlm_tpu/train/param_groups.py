"""Layer-wise LR decay for (vision-encoder) parameter groups — the reference
util/param_group.py semantics (per-layer ``lr_scale = decay^(n_layers -
layer)``) expressed as an optax transform: instead of materialized optimizer
param groups, a pytree of per-leaf LR scales multiplies the updates."""

from __future__ import annotations

from typing import Any

import jax
import optax


def layerwise_scale_tree(
    params: Any,
    layer_decay: float,
    layers_key: str = "layers",
) -> Any:
    """Pytree of scales matching ``params``. Leaves under ``layers_key``
    (stacked [L, ...] arrays) get a per-layer vector scale
    ``decay^(L - 1 - layer)`` broadcast over the layer axis; the embedding
    gets ``decay^L``; everything else 1.0 (param_group.py:18-33)."""
    import jax.numpy as jnp

    def scale_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if layers_key in keys:
            L = leaf.shape[0]
            per_layer = layer_decay ** (L - 1 - jnp.arange(L, dtype=jnp.float32))
            return per_layer.reshape((L,) + (1,) * (leaf.ndim - 1))
        if "tok_embeddings" in keys or "patch_embed" in keys or (
            "class_embedding" in keys or "positional_embedding" in keys
        ):
            # deepest decay for the stem/embeddings
            return jnp.asarray(layer_decay, jnp.float32) ** 24
        return jnp.asarray(1.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(scale_for, params)


def scale_updates_by(scales: Any) -> optax.GradientTransformation:
    """optax transform multiplying updates by the per-leaf scale tree."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
