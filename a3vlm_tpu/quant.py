"""Weight-only quantization (the reference's bitsandbytes NF4/int8 path,
util/quant.py, rebuilt TPU-native):

- symmetric per-output-channel int8, or group-wise int4 (packed two nibbles
  per int8 byte) — the TPU-friendly analogues of ``Linear8bitLt`` /
  ``Linear4bit``.
- quantization wraps weights only; the matmul runs in the activation dtype
  after an on-the-fly dequant that XLA fuses into the dot's operand load
  (a Pallas fused dequant-matmul is the planned upgrade path).
- blocklist semantics: subtrees named by the model's ``quant_blocklist``
  (vision towers + projectors, llama_ens5.py:541-550) stay dense, as do
  1-D params (norms/biases), matching util/quant.py:18-93's layer filter.

A quantized leaf is a ``QuantizedWeight`` pytree node ((q, scale) as
children; (bits, group, in_dim) static aux) that ``dequantize_params`` turns
back into dense weights inside jit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

GROUP_SIZE = 64  # int4 quant group along the input dim


class QuantizedWeight:
    """Pytree node: (q, scale) as children, (bits, group, in_dim) static."""

    def __init__(self, q, scale, bits: int, group: int = 0, in_dim: int = 0):
        self.q = q
        self.scale = scale
        self.bits = bits
        self.group = group
        self.in_dim = in_dim

    def tree_flatten(self):
        return (self.q, self.scale), (self.bits, self.group, self.in_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    QuantizedWeight,
    lambda qw: qw.tree_flatten(),
    QuantizedWeight.tree_unflatten,
)


def _quantize_leaf_int8(w: np.ndarray) -> QuantizedWeight:
    scale = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(scale, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QuantizedWeight(
        jnp.asarray(q), jnp.asarray(scale.astype(np.float32)), bits=8
    )


def _quantize_leaf_int4(w: np.ndarray) -> QuantizedWeight:
    """Group-wise symmetric int4 over the second-to-last dim; nibbles packed
    along that dim (two rows per byte)."""
    *lead, in_dim, out_dim = w.shape
    assert in_dim % 2 == 0, "int4 packing needs an even input dim"
    g = min(GROUP_SIZE, in_dim)
    while in_dim % g:
        g //= 2
    wg = w.reshape(*lead, in_dim // g, g, out_dim)
    scale = np.max(np.abs(wg), axis=-2, keepdims=True)
    scale = np.maximum(scale, 1e-8) / 7.0
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)
    q = q.reshape(*lead, in_dim, out_dim)
    lo = q[..., 0::2, :] & 0x0F
    hi = (q[..., 1::2, :] & 0x0F) << 4
    packed = (lo | hi).astype(np.int8)
    return QuantizedWeight(
        jnp.asarray(packed), jnp.asarray(scale.astype(np.float32)),
        bits=4, group=g, in_dim=in_dim,
    )


def _dequantize_leaf(leaf: QuantizedWeight, dtype=jnp.bfloat16):
    if leaf.bits == 8:
        return (leaf.q.astype(jnp.float32) * leaf.scale).astype(dtype)
    packed = leaf.q
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    *lead, half, out_dim = packed.shape
    q = jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * half, out_dim)
    g, in_dim = leaf.group, leaf.in_dim
    qg = q.reshape(*lead, in_dim // g, g, out_dim).astype(jnp.float32)
    w = qg * leaf.scale
    return w.reshape(*lead, in_dim, out_dim).astype(dtype)


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, QuantizedWeight)


def quantize_params(
    params: Any,
    bits: int = 4,
    blocklist: Sequence[str] = (),
) -> Any:
    """Quantize all >=2-D weight leaves outside blocklisted top-level
    subtrees."""
    assert bits in (4, 8)

    def quantize_tree(tree):
        def leaf_fn(x):
            x = np.asarray(x)
            if x.ndim < 2:
                return jnp.asarray(x)
            if bits == 8 or x.shape[-2] % 2:
                return _quantize_leaf_int8(x)
            return _quantize_leaf_int4(x)

        return jax.tree_util.tree_map(leaf_fn, tree)

    out = {}
    for key, sub in params.items():
        if key in blocklist:
            out[key] = sub
        else:
            out[key] = quantize_tree(sub)
    return out


def dequantize_params(qparams: Any, dtype=jnp.bfloat16) -> Any:
    """Reconstitute dense weights (call inside jit so XLA fuses the dequant
    into consumers)."""

    return jax.tree_util.tree_map(
        lambda x: _dequantize_leaf(x, dtype) if _is_quantized_leaf(x) else x,
        qparams,
        is_leaf=_is_quantized_leaf,
    )


def quantized_size_bytes(qparams: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(qparams):
        total += np.asarray(leaf).nbytes
    return total
