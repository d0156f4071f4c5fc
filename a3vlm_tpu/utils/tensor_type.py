"""Parameter dtype policy (reference util/tensor_type.py): the torch version
is a default-dtype context-manager stack plus
``promote_trainable_params_to_fp32`` (:60-66). Functionally in JAX: cast
trainable leaves to fp32 master precision and frozen leaves to the compute
dtype."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def promote_trainable_params_to_fp32(params, trainable_mask):
    """Trainable leaves -> float32, frozen leaves unchanged
    (tensor_type.py:60-66 semantics)."""

    def cast(p, t):
        if t and hasattr(p, "dtype") and p.dtype in (
            jnp.bfloat16, jnp.float16
        ):
            return p.astype(jnp.float32)
        return p

    return jax.tree_util.tree_map(cast, params, trainable_mask)


def cast_params(params, dtype, only_floating: bool = True):
    """Uniform dtype cast (the default_tensor_type context's role)."""

    def cast(p):
        if not hasattr(p, "dtype"):
            return p
        if only_floating and not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        return p.astype(dtype)

    return jax.tree_util.tree_map(cast, params)


def mixed_precision_policy(params, trainable_mask, compute_dtype=jnp.bfloat16):
    """Frozen -> compute dtype (bf16), trainable -> fp32 masters — the
    reference's bf16-model + fp32-trainables recipe (tensor_type.py +
    main_finetune.py:217)."""

    def cast(p, t):
        if not hasattr(p, "dtype") or not jnp.issubdtype(
            p.dtype, jnp.floating
        ):
            return p
        return p.astype(jnp.float32 if t else compute_dtype)

    from a3vlm_tpu.quant import QuantizedWeight

    def cast_node(p, t):
        # packed QuantizedWeight bases keep their layout: the int payload
        # is not floating and the f32 group scales must NOT round-trip
        # through bf16 (the fused kernels consume f32 scales)
        if isinstance(p, QuantizedWeight):
            return p
        return cast(p, t)

    return jax.tree_util.tree_map(
        cast_node, params, trainable_mask,
        is_leaf=lambda x: isinstance(x, QuantizedWeight),
    )
