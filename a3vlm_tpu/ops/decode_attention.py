"""Pallas TPU decode-attention kernel: single-query attention over a
fixed-size KV cache.

The XLA lowering of per-step decode attention costs ~170 us/layer on v5e
(batch 16, 192-slot cache) against a ~63 us memory bound — softmax
intermediates and the mask/where chain don't fuse into one HBM pass over
the cache. This kernel reads each (batch, kv-head) cache panel exactly
once: qk^T, the valid-length mask, the f32 softmax, and p@v all happen in
VMEM.

Layouts (chosen so the caller does no transposes on the hot path):
- q: [B, Hkv, G, D]  (G = query heads per kv head — GQA group)
- k, v: [B, Hkv, S, D] — the LAYERED decode cache layout (llama.KVCache
  with layered=True stores per-layer [B, Hkv, S, D] buffers)
- valid: [B] int32 — keys at index >= valid[b] are masked (the
  ``kv_valid_len`` contract of ops.attention.sdpa_reference)

Grid is (B,); each program reads one batch element's full [Hkv, S, D] k/v
panels (one big DMA instead of Hkv small ones — a (B, Hkv) grid was
measured launch-bound at 215 us). Compute is VPU mult-reduce rather than
MXU dots: single-query attention is a batch of matvecs, which would use
one MXU sublane per head; elementwise multiply + tree-reduce uses all
lanes.

The kernel's second job is structural: a custom call pins its operands to
the default layout, which stops XLA's layout assignment from relaying out
the loop-carried cache every decode step (measured 229 us/layer in-loop
for XLA attention that costs 69 us in isolation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
    k = k_ref[0].astype(jnp.float32)  # [Hkv, S, D]
    v = v_ref[0].astype(jnp.float32)  # [Hkv, S, D]
    # scores: contract D with a lane reduce — [Hkv, G, S]
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=-1) * sm_scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # out: contract S with a sublane reduce — [Hkv, G, D]
    out = jnp.sum(p[:, :, :, None] * v[:, None, :, :], axis=2) / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd(q, k, v, valid, interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    kernel = functools.partial(_decode_kernel, sm_scale=D ** -0.5)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D), lambda b, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D), lambda b, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, G, D), lambda b, valid: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v)


def decode_attention_eligible(q_shape, k_shape, dtype) -> bool:
    """q [B,1,Hq,D], cache [B,Hkv,S,D]: kernel wants lane-aligned D and a
    sublane-aligned cache length."""
    B, Sq, Hq, D = q_shape
    S = k_shape[2]
    return (
        Sq == 1
        and D % 128 == 0
        and S % 8 == 0
        and dtype != jnp.float32
        and jax.devices()[0].platform == "tpu"
    )


def decode_attention(q, k, v, valid, interpret=False):
    """q [B, 1, Hq, D]; k, v [B, Hkv, S, D] (layered decode-cache layout);
    valid [B]. Returns [B, 1, Hq, D]."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    out = _decode_attention_bhgd(qg, k, v, valid, interpret=interpret)
    return out.reshape(B, Sq, Hq, D)
