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

Kernel variants:
- SINGLE-BLOCK (S <= 512): grid (B,); each program reads one batch
  element's full [Hkv, S, D] k/v panels (one big DMA instead of Hkv small
  ones — a (B, Hkv) grid was measured launch-bound at 215 us). Compute is
  VPU mult-reduce: at short S, single-query attention is a batch of
  matvecs that would use one MXU sublane per head.
- BLOCKED (S > 512): grid (B, nS) with online-softmax scratch carried
  across 256-slot cache blocks (the whole-panel form OOMs scoped vmem).
  Contraction runs on the MXU via batched dot_general — the mult-reduce
  is VPU-bound at long S (measured 247 -> 735 tok/s full-depth 7B at
  S=1920 from the switch).
- Both exist in a _q8 form over int8 QuantizedKV caches with the dequant
  folded in at score granularity.
- Under multi-device runtimes all variants go through custom_partitioning
  wrappers that run the kernel per (batch, kv-head) cache shard with zero
  collectives (a bare pallas_call does not SPMD-partition).

The kernels' second job is structural: a custom call pins its operands to
the default layout, which stops XLA's layout assignment from relaying out
the loop-carried cache every decode step (measured 229 us/layer in-loop
for XLA attention that costs 69 us in isolation).

This module also owns the shared decode-cache helpers
(update_decode_cache / attend_decode_cache) used by models/llama.py and
models/falcon.py, including quantize-on-write for QuantizedKV caches and
the flash-kernel route for chunked prefill.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class QuantizedKV(NamedTuple):
    """int8 KV-cache buffer (one layer, layered bhsd layout): halves decode
    cache HBM traffic and doubles the cache capacity per chip. The
    reference has no analogue (bitsandbytes quantizes weights only) — this
    is a TPU-serving extension.

    ``qv``: int8 [B, Hkv, S, D]; ``scale``: f32 [B, Hkv, S] — symmetric
    per-token-per-head scales. The dequant folds into the attention at
    SCORE granularity (s *= kscale per column; p *= vscale before the pv
    reduce), so the kernel never materializes dequantized panels."""

    qv: jnp.ndarray
    scale: jnp.ndarray


def quantize_kv_tokens(x):
    """[B, S, Hkv, D] new k or v -> (int8 [B, Hkv, S, D], f32 [B, Hkv, S])
    with symmetric per-(batch, head, token) scales."""
    xt = x.transpose(0, 2, 1, 3).astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xt), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xt / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(kv: QuantizedKV, dtype=jnp.bfloat16):
    """[B, Hkv, S, D] dense panels (the XLA fallback path)."""
    return (kv.qv.astype(jnp.float32) * kv.scale[..., None]).astype(dtype)


def kv_cache_dtype(kv_bits):
    """The one place the kv_cache_bits -> cache dtype policy lives."""
    if kv_bits == 8:
        return jnp.int8
    return (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
            else jnp.float32)


def make_quantized_kv(batch, kv_heads, seq_len, head_dim) -> QuantizedKV:
    """Zero-initialized int8 panel + f32 scale plane (one layer)."""
    return QuantizedKV(
        jnp.zeros((batch, kv_heads, seq_len, head_dim), jnp.int8),
        jnp.zeros((batch, kv_heads, seq_len), jnp.float32),
    )


def quantized_kv_spec(b_ax, h_ax) -> QuantizedKV:
    """PartitionSpecs matching make_quantized_kv's pytree."""
    from jax.sharding import PartitionSpec as P

    return QuantizedKV(P(b_ax, h_ax, None, None), P(b_ax, h_ax, None))


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


def _decode_kernel_blocked(valid_ref, q_ref, k_ref, v_ref, o_ref,
                           m_scr, l_scr, acc_scr, *, sm_scale, bs, ns,
                           s_actual):
    """Online-softmax variant for long caches: grid (B, nS), the S axis
    innermost with running (max, sum, acc) scratch — the whole-panel kernel
    VMEM-OOMs above ~512 cache slots (38.8M scoped at S=1520)."""
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # MXU batched dots, NOT the single-block kernel's VPU mult-reduce: at
    # long S the mult-reduce is VPU-bound (~750M VPU ops/layer at S=1920;
    # measured 65 ms/step full-depth 7B); the dots leave the VPU only the
    # [Hkv, G, bs] softmax
    q = q_ref[0]  # [Hkv, G, D]
    k = k_ref[0]  # [Hkv, bs, D]
    v = v_ref[0]
    if s_actual % bs:
        # ragged ceil-grid boundary: out-of-range v is GARBAGE (possibly
        # NaN) and p @ v would propagate it through p == 0; k garbage is
        # harmless (its scores are where'd to -inf below)
        vcols = si * bs + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(vcols < s_actual, v, jnp.zeros_like(v))
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [Hkv, G, bs]
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)

    m_prev = m_scr[:, :, :1]  # [Hkv, G, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hkv, G, D]
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_blocked(q, k, v, valid, interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)  # ceil-grid; padded keys read garbage but cols >=
    # valid masks them (valid <= S always)
    kernel = functools.partial(
        _decode_kernel_blocked, sm_scale=D ** -0.5, bs=bs, ns=ns, s_actual=S
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, s, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, G, D), lambda b, s, valid: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, 128), jnp.float32),  # running max
                pltpu.VMEM((Hkv, G, 128), jnp.float32),  # running sum
                pltpu.VMEM((Hkv, G, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v)


def _decode_kernel_q8(valid_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      o_ref, *, sm_scale):
    """Single-block kernel over int8 cache panels: scales fold in at score
    granularity — the dequantized [Hkv, S, D] panels never materialize."""
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
    k = k_ref[0].astype(jnp.float32)  # int8 -> f32 [Hkv, S, D]
    v = v_ref[0].astype(jnp.float32)
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=-1) * sm_scale
    s = s * ks_ref[0][:, None, :]  # per-(head, token) k scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = p * vs_ref[0][:, None, :]  # fold the v scale into p
    out = jnp.sum(pv[:, :, :, None] * v[:, None, :, :], axis=2) / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_q8(q, k, v, ks, vs, valid, interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    kernel = functools.partial(_decode_kernel_q8, sm_scale=D ** -0.5)
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
                pl.BlockSpec((1, Hkv, S), lambda b, valid: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S), lambda b, valid: (b, 0, 0),
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
            bytes_accessed=k.size + v.size,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v, ks, vs)


def _decode_kernel_blocked_q8(valid_ref, q_ref, k_ref, v_ref, ks_ref,
                              vs_ref, o_ref, m_scr, l_scr, acc_scr, *,
                              sm_scale, bs, ns, s_actual):
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # same MXU-dot structure as _decode_kernel_blocked; int8 panels cast
    # to bf16 for the dots (exact for [-127, 127]), scales fold in at
    # score granularity
    mxdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[0]
    k = k_ref[0].astype(mxdt)
    v = v_ref[0].astype(mxdt)
    vs = vs_ref[0]
    if s_actual % bs:
        # int8 garbage cannot be NaN, but the SCALES can: zero both at the
        # ragged boundary so p * vs and s * ks stay finite
        scols = si * bs + jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
        vs = jnp.where(scols < s_actual, vs, 0.0)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    ks = ks_ref[0]
    if s_actual % bs:
        ks = jnp.where(scols < s_actual, ks, 0.0)
    s = s * ks[:, None, :]
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        (p * vs[:, None, :]).astype(mxdt), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_blocked_q8(q, k, v, ks, vs, valid,
                                      interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)
    kernel = functools.partial(
        _decode_kernel_blocked_q8, sm_scale=D ** -0.5, bs=bs, ns=ns,
        s_actual=S,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, s, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs), lambda b, s, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs), lambda b, s, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, G, D), lambda b, s, valid: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=k.size + v.size,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v, ks, vs)


# whole-panel kernel above this cache length would blow the scoped-vmem
# stack (f32 score/product temps scale with Hkv * S * D)
_SINGLE_BLOCK_MAX_S = 512
# ... and the S cap alone is NOT sufficient: the whole-panel kernels
# materialize two f32 [Hkv, S, D] temps (k and v casts), so the stack
# footprint scales with Hkv too. The 7B (Hkv=32) q8 fused kernel OOMed
# the 16M scoped-vmem limit at S=384 on real hardware (16.55M; round-4
# continuous-batching bench) while the Hkv=8 validation shapes fit at
# S=512. Budget chosen so the validated Hkv=8/S=512/D=128 shape (4.2M of
# panel temps) stays on the single-pass kernel and 7B caps at S<=176.
_SINGLE_PANEL_BYTES = 6 * 1024 * 1024


def _use_blocked(Hkv: int, S: int, D: int) -> bool:
    return S > _SINGLE_BLOCK_MAX_S or Hkv * S * D * 8 > _SINGLE_PANEL_BYTES


def _decode_impl(q, k, v, valid, interpret=False):
    """Local (per-shard) kernel dispatch on bhgd operands."""
    if _use_blocked(k.shape[1], k.shape[2], k.shape[3]):
        return _decode_attention_bhgd_blocked(q, k, v, valid,
                                              interpret=interpret)
    return _decode_attention_bhgd(q, k, v, valid, interpret=interpret)


@functools.lru_cache(maxsize=2)
def _spmd_decode(interpret: bool):
    """custom_partitioning wrapper: under a multi-device mesh the kernel
    runs per-shard on the (batch, kv-head) grid dims — the serving cache
    sharding P("data", "model", None, None) partitions with ZERO
    collectives (validated for exactness on the 8-device CPU mesh,
    tests/test_ops.py). S and D stay replicated: the softmax normalizes
    over the whole cache row and the dot contracts D."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, k, v, valid):
        # custom_partitioning requires an all-positional callee
        return _decode_impl(q, k, v, valid, interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        # follow the CACHE's sharding (the big operand): q/valid reshard
        # to it, never the other way around
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (
            mesh,
            _positional,
            opshard,
            (opshard, opshard, opshard, vshard),
        )

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # factors: b h g i | b h s i | b h s j | b -> b h g j; only b/h may
        # shard (g/i/s/j need-replication, listed in factor-index order)
        sharding_rule="b h g i, b h s i, b h s j, b -> b h g j",
        need_replication_factors=("g", "i", "s", "j"),
    )
    return fn


def decode_attention_eligible(q_shape, k_shape, dtype) -> bool:
    """q [B,1,Hq,D], cache [B,Hkv,S,D]: kernel wants lane-aligned D and a
    sublane-aligned cache length. (D % 128: at falcon's head_dim 64 the
    kernel runs half-empty lanes and was measured SLOWER than XLA —
    179 vs 115 us on v5e B16 H72 S192 — so D=64 stays on the XLA path.)"""
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
    valid [B]. Returns [B, 1, Hq, D].

    Under a multi-device runtime the call goes through a
    custom_partitioning wrapper so the kernel runs per-shard along the
    cache's (batch, kv-head) sharding instead of XLA all-gathering the
    panels (a bare pallas_call does not SPMD-partition)."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    if len(jax.devices()) > 1:
        out = _spmd_decode(bool(interpret))(qg, k, v, valid)
    else:
        out = _decode_impl(qg, k, v, valid, interpret=interpret)
    return out.reshape(B, Sq, Hq, D)


def _decode_impl_q8(q, kq, vq, ks, vs, valid, interpret=False):
    """Local (per-shard) quantized kernel dispatch on bhgd operands."""
    if _use_blocked(kq.shape[1], kq.shape[2], kq.shape[3]):
        return _decode_attention_bhgd_blocked_q8(
            q, kq, vq, ks, vs, valid, interpret=interpret
        )
    return _decode_attention_bhgd_q8(q, kq, vq, ks, vs, valid,
                                     interpret=interpret)


@functools.lru_cache(maxsize=2)
def _spmd_decode_q8(interpret: bool):
    """custom_partitioning wrapper for the quantized kernels (same
    (batch, kv-head) sharding contract as _spmd_decode; the per-token
    scale operands carry the s factor and follow the cache sharding)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, kq, vq, ks, vs, valid):
        return _decode_impl_q8(q, kq, vq, ks, vs, valid,
                               interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        sshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (
            mesh,
            _positional,
            opshard,
            (opshard, opshard, opshard, sshard, sshard, vshard),
        )

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h g i, b h s i, b h s j, b h s, b h s, b -> b h g j",
        need_replication_factors=("g", "i", "s", "j"),
    )
    return fn


def decode_attention_quant(q, kq: QuantizedKV, vq: QuantizedKV, valid,
                           interpret=False):
    """q [B, 1, Hq, D]; int8 cache panels + per-token scales; valid [B].
    Multi-device runtimes go through the custom_partitioning wrapper
    (per-shard along the cache's batch/kv-head sharding)."""
    B, Sq, Hq, D = q.shape
    Hkv = kq.qv.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    if len(jax.devices()) > 1:
        out = _spmd_decode_q8(bool(interpret))(
            qg, kq.qv, vq.qv, kq.scale, vq.scale, valid
        )
    else:
        out = _decode_impl_q8(qg, kq.qv, vq.qv, kq.scale, vq.scale, valid,
                              interpret=interpret)
    return out.reshape(B, Sq, Hq, D)


# ---------------------------------------------------------------------------
# multi-token VERIFY attention (round 4): the speculative verify forward
# attends a K-token window (K = draft_k or draft_k+1, 2..8) over the decode
# cache with causal-within-window masking — query row i of batch b sees
# cache cols < valid_b - K + 1 + i (ops/attention.py right-aligned-causal
# semantics). The XLA route materializes [B, H, K, S] f32 scores AND un-pins
# the loop-carried cache layout; measured in-loop it made a K=8 verify round
# cost ~1.7x a plain decode step, which put realized lookup speculation at
# 1.03-1.05x vanilla (a loss) despite 1.5 tokens/round acceptance
# (PERFORMANCE.md round-4 section). These kernels are the blocked
# online-softmax decode kernels with K folded into the q-row axis and a
# per-ROW mask threshold; same VMEM budget, same custom_partitioning
# story. No reference analogue (the torch stack has no speculative mode).
# ---------------------------------------------------------------------------


def _verify_kernel_blocked(valid_ref, q_ref, k_ref, v_ref, o_ref,
                           m_scr, l_scr, acc_scr, *, sm_scale, bs, ns,
                           s_actual, span):
    """q rows are [Hkv, G*span] with row r = g*span + i; row i's visible
    prefix ends at valid - span + i (inclusive)."""
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [Hkv, G*span, D]
    k = k_ref[0]  # [Hkv, bs, D]
    v = v_ref[0]
    if s_actual % bs:
        vcols = si * bs + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(vcols < s_actual, v, jnp.zeros_like(v))
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [Hkv, G*span, bs]
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    thr = valid_ref[b] - span + 1 + rows % span
    s = jnp.where(cols < thr, s, _NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("span", "interpret"))
def _verify_attention_bhgd(q, k, v, valid, span, interpret=False):
    B, Hkv, GK, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)
    kernel = functools.partial(
        _verify_kernel_blocked, sm_scale=D ** -0.5, bs=bs, ns=ns,
        s_actual=S, span=span,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, GK, D), lambda b, s, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, GK, D), lambda b, s, valid: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, GK, 128), jnp.float32),
                pltpu.VMEM((Hkv, GK, 128), jnp.float32),
                pltpu.VMEM((Hkv, GK, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GK, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * GK * S * D,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=B * Hkv * GK * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v)


def _verify_kernel_blocked_q8(valid_ref, q_ref, k_ref, v_ref, ks_ref,
                              vs_ref, o_ref, m_scr, l_scr, acc_scr, *,
                              sm_scale, bs, ns, s_actual, span):
    b = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    mxdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[0]
    k = k_ref[0].astype(mxdt)
    v = v_ref[0].astype(mxdt)
    vs = vs_ref[0]
    ks = ks_ref[0]
    if s_actual % bs:
        scols = si * bs + jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
        vs = jnp.where(scols < s_actual, vs, 0.0)
        ks = jnp.where(scols < s_actual, ks, 0.0)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    s = s * ks[:, None, :]
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    thr = valid_ref[b] - span + 1 + rows % span
    s = jnp.where(cols < thr, s, _NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        (p * vs[:, None, :]).astype(mxdt), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("span", "interpret"))
def _verify_attention_bhgd_q8(q, k, v, ks, vs, valid, span,
                              interpret=False):
    B, Hkv, GK, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)
    kernel = functools.partial(
        _verify_kernel_blocked_q8, sm_scale=D ** -0.5, bs=bs, ns=ns,
        s_actual=S, span=span,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, GK, D), lambda b, s, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D), lambda b, s, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs), lambda b, s, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs), lambda b, s, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, GK, D), lambda b, s, valid: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, GK, 128), jnp.float32),
                pltpu.VMEM((Hkv, GK, 128), jnp.float32),
                pltpu.VMEM((Hkv, GK, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GK, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * GK * S * D,
            bytes_accessed=k.size + v.size,
            transcendentals=B * Hkv * GK * S,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k, v, ks, vs)


@functools.lru_cache(maxsize=8)
def _spmd_verify(span: int, interpret: bool):
    """custom_partitioning for the verify kernel: identical (batch,
    kv-head) contract to _spmd_decode — the q-row axis (g*span) and
    s/d stay replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, k, v, valid):
        return _verify_attention_bhgd(q, k, v, valid, span,
                                      interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (mesh, _positional, opshard,
                (opshard, opshard, opshard, vshard))

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h g i, b h s i, b h s j, b -> b h g j",
        need_replication_factors=("g", "i", "s", "j"),
    )
    return fn


@functools.lru_cache(maxsize=8)
def _spmd_verify_q8(span: int, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, kq, vq, ks, vs, valid):
        return _verify_attention_bhgd_q8(q, kq, vq, ks, vs, valid, span,
                                         interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        sshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (mesh, _positional, opshard,
                (opshard, opshard, opshard, sshard, sshard, vshard))

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h g i, b h s i, b h s j, b h s, b h s, b -> b h g j",
        need_replication_factors=("g", "i", "s", "j"),
    )
    return fn


VERIFY_KERNEL_MAX_SPAN = 16


def verify_attention_eligible(q_shape, k_shape, dtype) -> bool:
    """q [B, Sq, Hq, D] with 1 < Sq <= 16; cache [B, Hkv, S, D]."""
    B, Sq, Hq, D = q_shape
    S = k_shape[2]
    return (
        1 < Sq <= VERIFY_KERNEL_MAX_SPAN
        and D % 128 == 0
        and S % 8 == 0
        and dtype != jnp.float32
        and jax.devices()[0].platform == "tpu"
    )


def verify_attention(q, k, v, valid, interpret=False):
    """Causal-within-window attention of a [B, Sq, Hq, D] verify window
    over bf16 cache panels [B, Hkv, S, D]; valid [B] counts the populated
    prefix INCLUDING the window (kv_valid_len semantics of
    ops/attention.py: query i attends cols <= valid - Sq + i)."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * Sq, D)
    if len(jax.devices()) > 1:
        out = _spmd_verify(Sq, bool(interpret))(qg, k, v, valid)
    else:
        out = _verify_attention_bhgd(qg, k, v, valid, Sq,
                                     interpret=interpret)
    return (out.reshape(B, Hkv, G, Sq, D)
            .transpose(0, 3, 1, 2, 4)
            .reshape(B, Sq, Hq, D))


def verify_attention_quant(q, kq: QuantizedKV, vq: QuantizedKV, valid,
                           interpret=False):
    B, Sq, Hq, D = q.shape
    Hkv = kq.qv.shape[1]
    G = Hq // Hkv
    qg = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * Sq, D)
    if len(jax.devices()) > 1:
        out = _spmd_verify_q8(Sq, bool(interpret))(
            qg, kq.qv, vq.qv, kq.scale, vq.scale, valid
        )
    else:
        out = _verify_attention_bhgd_q8(
            qg, kq.qv, vq.qv, kq.scale, vq.scale, valid, Sq,
            interpret=interpret,
        )
    return (out.reshape(B, Hkv, G, Sq, D)
            .transpose(0, 3, 1, 2, 4)
            .reshape(B, Sq, Hq, D))


# ---------------------------------------------------------------------------
# fused update+attend: ONE custom call writes this step's k/v into the cache
# and attends over it. The two-step path costs 2 dynamic_update_slice ops per
# layer (~8.6 us each at batch 16 — launch-bound partial-tile RMWs, 0.55
# ms/step of the round-3 trace) plus the transpose/astype copies feeding
# them; here the kernel fixes the stale row in VMEM (the panels are already
# loaded for attention), writes back ONLY the 8-row sublane tile containing
# the position, and the cache outputs alias the inputs so the rest of the
# buffer is untouched. ``pos`` rides as a second scalar-prefetch operand, so
# ragged (per-slot) continuous-batching positions work unchanged.
# ---------------------------------------------------------------------------


def _decode_kernel_fused(pos_ref, valid_ref, q_ref, k_ref, v_ref, nk_ref,
                         nv_ref, o_ref, ok_ref, ov_ref, *, sm_scale):
    b = pl.program_id(0)
    pos = pos_ref[b]
    kb = k_ref[0]  # [Hkv, S, D] cache dtype
    vb = v_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
    kb = jnp.where(rows == pos, nk_ref[0].astype(kb.dtype), kb)
    vb = jnp.where(rows == pos, nv_ref[0].astype(vb.dtype), vb)
    # write-back tile: dynamic-slice the INPUT ref (Mosaic has no
    # dynamic_slice on values) and fix the one row on the small tile
    base = (pos // 8) * 8
    ktile = k_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]  # [Hkv, 8, D]
    vtile = v_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
    trows = base + jax.lax.broadcasted_iota(jnp.int32, ktile.shape, 1)
    ok_ref[0] = jnp.where(trows == pos, nk_ref[0].astype(ktile.dtype), ktile)
    ov_ref[0] = jnp.where(trows == pos, nv_ref[0].astype(vtile.dtype), vtile)
    q = q_ref[0].astype(jnp.float32)
    k = kb.astype(jnp.float32)
    v = vb.astype(jnp.float32)
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=-1) * sm_scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.sum(p[:, :, :, None] * v[:, None, :, :], axis=2) / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_fused(q, k, v, nk, nv, pos, valid,
                                 interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    kernel = functools.partial(_decode_kernel_fused, sm_scale=D ** -0.5)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        # flat input indices INCLUDE the scalar-prefetch operands
        # (pos=0, valid=1, q=2, k=3, v=4, nk=5, nv=6)
        input_output_aliases={3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), valid.astype(jnp.int32), q, k, v, nk, nv)


def _decode_kernel_blocked_fused(pos_ref, valid_ref, q_ref, k_ref, v_ref,
                                 nk_ref, nv_ref, o_ref, ok_ref, ov_ref,
                                 m_scr, l_scr, acc_scr, *, sm_scale, bs, ns,
                                 s_actual):
    b = pl.program_id(0)
    si = pl.program_id(1)
    pos = pos_ref[b]

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    k = k_ref[0]  # [Hkv, bs, D]
    v = v_ref[0]
    rows = si * bs + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k = jnp.where(rows == pos, nk_ref[0].astype(k.dtype), k)
    v = jnp.where(rows == pos, nv_ref[0].astype(v.dtype), v)

    @pl.when(si == pos // bs)
    def _writeback():
        base = (pos // 8) * 8 - si * bs
        ktile = k_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
        vtile = v_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
        trows = (si * bs + base
                 + jax.lax.broadcasted_iota(jnp.int32, ktile.shape, 1))
        ok_ref[0] = jnp.where(trows == pos,
                              nk_ref[0].astype(ktile.dtype), ktile)
        ov_ref[0] = jnp.where(trows == pos,
                              nv_ref[0].astype(vtile.dtype), vtile)

    if s_actual % bs:
        vcols = si * bs + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(vcols < s_actual, v, jnp.zeros_like(v))
    s = jax.lax.dot_general(
        q_ref[0], k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_blocked_fused(q, k, v, nk, nv, pos, valid,
                                         interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)
    kernel = functools.partial(
        _decode_kernel_blocked_fused, sm_scale=D ** -0.5, bs=bs, ns=ns,
        s_actual=S,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D),
                             lambda b, s, pos, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D),
                             lambda b, s, pos, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, s, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, s, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        input_output_aliases={3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), valid.astype(jnp.int32), q, k, v, nk, nv)


def _quantize_new_kv(nk_ref, nv_ref):
    """In-kernel analogue of ``quantize_kv_tokens`` for one [Hkv, 1, D]
    token: same f32 math (max-abs per head, 1e-8 clamp, /127, round)."""
    nk = nk_ref[0].astype(jnp.float32)
    nv = nv_ref[0].astype(jnp.float32)
    nks = jnp.maximum(jnp.max(jnp.abs(nk), axis=-1), 1e-8) / 127.0  # [Hkv,1]
    nvs = jnp.maximum(jnp.max(jnp.abs(nv), axis=-1), 1e-8) / 127.0
    nkq = jnp.clip(jnp.round(nk / nks[..., None]), -127, 127).astype(jnp.int8)
    nvq = jnp.clip(jnp.round(nv / nvs[..., None]), -127, 127).astype(jnp.int8)
    return nkq, nvq, nks, nvs


def _decode_kernel_q8_fused(pos_ref, valid_ref, q_ref, k_ref, v_ref, ks_ref,
                            vs_ref, nk_ref, nv_ref, o_ref, ok_ref, ov_ref,
                            oks_ref, ovs_ref, *, sm_scale):
    b = pl.program_id(0)
    pos = pos_ref[b]
    nkq, nvq, nks, nvs = _quantize_new_kv(nk_ref, nv_ref)
    kb = k_ref[0]  # int8 [Hkv, S, D]
    vb = v_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
    kb = jnp.where(rows == pos, nkq, kb)
    vb = jnp.where(rows == pos, nvq, vb)
    ksb = ks_ref[0]  # f32 [Hkv, S]
    vsb = vs_ref[0]
    cols2 = jax.lax.broadcasted_iota(jnp.int32, ksb.shape, 1)
    ksb = jnp.where(cols2 == pos, nks, ksb)
    vsb = jnp.where(cols2 == pos, nvs, vsb)
    base = (pos // 8) * 8
    ktile = k_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
    vtile = v_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
    trows = base + jax.lax.broadcasted_iota(jnp.int32, ktile.shape, 1)
    ok_ref[0] = jnp.where(trows == pos, nkq, ktile)
    ov_ref[0] = jnp.where(trows == pos, nvq, vtile)
    # the scale planes are small (S f32 lanes/head): rewrite them whole —
    # a dynamic LANE-dim slice would not legalize, a full-plane store does
    oks_ref[0] = ksb
    ovs_ref[0] = vsb
    q = q_ref[0].astype(jnp.float32)
    k = kb.astype(jnp.float32)
    v = vb.astype(jnp.float32)
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=-1) * sm_scale
    s = s * ksb[:, None, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = p * vsb[:, None, :]
    out = jnp.sum(pv[:, :, :, None] * v[:, None, :, :], axis=2) / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_q8_fused(q, k, v, ks, vs, nk, nv, pos, valid,
                                    interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    kernel = functools.partial(_decode_kernel_q8_fused, sm_scale=D ** -0.5)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S), lambda b, pos, valid: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S), lambda b, pos, valid: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, Hkv, S), lambda b, pos, valid: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, S), lambda b, pos, valid: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ),
        # (pos=0, valid=1, q=2, k=3, v=4, ks=5, vs=6, nk=7, nv=8)
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=k.size + v.size,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), valid.astype(jnp.int32), q, k, v, ks, vs,
      nk, nv)


def _decode_kernel_blocked_q8_fused(pos_ref, valid_ref, q_ref, k_ref, v_ref,
                                    ks_ref, vs_ref, nk_ref, nv_ref, o_ref,
                                    ok_ref, ov_ref, oks_ref, ovs_ref, m_scr,
                                    l_scr, acc_scr, *, sm_scale, bs, ns,
                                    s_actual):
    b = pl.program_id(0)
    si = pl.program_id(1)
    pos = pos_ref[b]

    @pl.when(si == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    nkq, nvq, nks, nvs = _quantize_new_kv(nk_ref, nv_ref)
    kq8 = k_ref[0]  # int8 [Hkv, bs, D]
    vq8 = v_ref[0]
    rows = si * bs + jax.lax.broadcasted_iota(jnp.int32, kq8.shape, 1)
    kq8 = jnp.where(rows == pos, nkq, kq8)
    vq8 = jnp.where(rows == pos, nvq, vq8)
    ks = ks_ref[0]  # f32 [Hkv, bs]
    vs = vs_ref[0]
    scols = si * bs + jax.lax.broadcasted_iota(jnp.int32, ks.shape, 1)
    ks = jnp.where(scols == pos, nks, ks)
    vs = jnp.where(scols == pos, nvs, vs)

    # write-backs BEFORE the ragged-boundary zeroing (which is math-only;
    # the zeroed lanes are outside the array and dropped on store anyway)
    @pl.when(si == pos // bs)
    def _writeback():
        base = (pos // 8) * 8 - si * bs
        ktile = k_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
        vtile = v_ref[0, :, pl.ds(pl.multiple_of(base, 8), 8), :]
        trows = (si * bs + base
                 + jax.lax.broadcasted_iota(jnp.int32, ktile.shape, 1))
        ok_ref[0] = jnp.where(trows == pos, nkq, ktile)
        ov_ref[0] = jnp.where(trows == pos, nvq, vtile)

    oks_ref[0] = ks
    ovs_ref[0] = vs

    mxdt = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    k = kq8.astype(mxdt)
    v = vq8.astype(mxdt)
    if s_actual % bs:
        vs = jnp.where(scols < s_actual, vs, 0.0)
        ks = jnp.where(scols < s_actual, ks, 0.0)
    s = jax.lax.dot_general(
        q_ref[0], k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    s = s * ks[:, None, :]
    cols = si * bs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(cols < valid_ref[b], s, _NEG_INF)

    m_prev = m_scr[:, :, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        (p * vs[:, None, :]).astype(mxdt), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(si == ns - 1)
    def _done():
        l = l_scr[:, :, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_bhgd_blocked_q8_fused(q, k, v, ks, vs, nk, nv, pos,
                                            valid, interpret=False):
    B, Hkv, G, D = q.shape
    S = k.shape[2]
    bs = 256
    ns = -(-S // bs)
    kernel = functools.partial(
        _decode_kernel_blocked_q8_fused, sm_scale=D ** -0.5, bs=bs, ns=ns,
        s_actual=S,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D),
                             lambda b, s, pos, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs, D),
                             lambda b, s, pos, valid: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs),
                             lambda b, s, pos, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs),
                             lambda b, s, pos, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Hkv, G, D),
                             lambda b, s, pos, valid: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, s, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Hkv, 8, D),
                    lambda b, s, pos, valid: (b, 0, pos[b] // 8, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, Hkv, bs),
                             lambda b, s, pos, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, bs),
                             lambda b, s, pos, valid: (b, 0, s),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, 128), jnp.float32),
                pltpu.VMEM((Hkv, G, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ),
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * S * D,
            bytes_accessed=k.size + v.size,
            transcendentals=B * Hkv * G * S,
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), valid.astype(jnp.int32), q, k, v, ks, vs,
      nk, nv)


def _decode_update_impl(q, k, v, nk, nv, pos, valid, interpret=False):
    if _use_blocked(k.shape[1], k.shape[2], k.shape[3]):
        return _decode_attention_bhgd_blocked_fused(
            q, k, v, nk, nv, pos, valid, interpret=interpret
        )
    return _decode_attention_bhgd_fused(q, k, v, nk, nv, pos, valid,
                                        interpret=interpret)


def _decode_update_impl_q8(q, kq, vq, ks, vs, nk, nv, pos, valid,
                           interpret=False):
    if _use_blocked(kq.shape[1], kq.shape[2], kq.shape[3]):
        return _decode_attention_bhgd_blocked_q8_fused(
            q, kq, vq, ks, vs, nk, nv, pos, valid, interpret=interpret
        )
    return _decode_attention_bhgd_q8_fused(q, kq, vq, ks, vs, nk, nv, pos,
                                           valid, interpret=interpret)


@functools.lru_cache(maxsize=2)
def _spmd_decode_update(interpret: bool):
    """custom_partitioning wrapper for the fused update+attend op — same
    (batch, kv-head) cache-sharding contract as ``_spmd_decode``; the new
    k/v token operands follow the cache sharding, pos/valid follow batch."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, k, v, nk, nv, pos, valid):
        return _decode_update_impl(q, k, v, nk, nv, pos, valid,
                                   interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (
            mesh,
            _positional,
            (opshard, opshard, opshard),
            (opshard, opshard, opshard, opshard, opshard, vshard, vshard),
        )

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        return (opshard, opshard, opshard)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b h g i, b h s i, b h s j, b h u i, b h u j, b, b "
            "-> b h g j, b h s i, b h s j"
        ),
        need_replication_factors=("g", "i", "s", "j", "u"),
    )
    return fn


@functools.lru_cache(maxsize=2)
def _spmd_decode_update_q8(interpret: bool):
    """Quantized-cache form of ``_spmd_decode_update`` (int8 panels +
    per-token scale planes ride the same (batch, kv-head) sharding)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(q, kq, vq, ks, vs, nk, nv, pos, valid):
        return _decode_update_impl_q8(q, kq, vq, ks, vs, nk, nv, pos, valid,
                                      interpret=interpret)

    fn = custom_partitioning(_positional)

    def _bh(arg_shapes):
        spec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        return b_ax, h_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        sshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None))
        vshard = NamedSharding(mesh, PartitionSpec(b_ax))
        return (
            mesh,
            _positional,
            (opshard, opshard, opshard, sshard, sshard),
            (opshard, opshard, opshard, sshard, sshard, opshard, opshard,
             vshard, vshard),
        )

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _bh(arg_shapes)
        opshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None, None))
        sshard = NamedSharding(mesh, PartitionSpec(b_ax, h_ax, None))
        return (opshard, opshard, opshard, sshard, sshard)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b h g i, b h s i, b h s j, b h s, b h s, b h u i, b h u j, "
            "b, b -> b h g j, b h s i, b h s j, b h s, b h s"
        ),
        need_replication_factors=("g", "i", "s", "j", "u"),
    )
    return fn


def decode_attention_update(q, cache_k, cache_v, xk, xv, pos, valid,
                            interpret=False):
    """Fused single-token cache write + attention. q [B, 1, Hq, D]; cache
    k/v [B, Hkv, S, D]; xk/xv [B, 1, Hkv, D] (this step's k/v, pre-RoPE'd);
    pos [B] write positions; valid [B] visible lengths (callers pass
    pos + 1 to attend over the new token). Returns
    (out [B, 1, Hq, D], new_cache_k, new_cache_v)."""
    B, Sq, Hq, D = q.shape
    Hkv = cache_k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    nk = xk.transpose(0, 2, 1, 3).astype(cache_k.dtype)
    nv = xv.transpose(0, 2, 1, 3).astype(cache_v.dtype)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    if len(jax.devices()) > 1:
        o, k2, v2 = _spmd_decode_update(bool(interpret))(
            qg, cache_k, cache_v, nk, nv, pos, valid
        )
    else:
        o, k2, v2 = _decode_update_impl(
            qg, cache_k, cache_v, nk, nv, pos, valid, interpret=interpret
        )
    return o.reshape(B, Sq, Hq, D), k2, v2


def decode_attention_update_quant(q, kq: QuantizedKV, vq: QuantizedKV, xk,
                                  xv, pos, valid, interpret=False):
    """Fused write+attend over an int8 cache: the new token is quantized
    IN-KERNEL with ``quantize_kv_tokens``'s exact math. Returns
    (out, new QuantizedKV k, new QuantizedKV v)."""
    B, Sq, Hq, D = q.shape
    Hkv = kq.qv.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    nk = xk.transpose(0, 2, 1, 3)
    nv = xv.transpose(0, 2, 1, 3)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    if len(jax.devices()) > 1:
        o, k2, v2, ks2, vs2 = _spmd_decode_update_q8(bool(interpret))(
            qg, kq.qv, vq.qv, kq.scale, vq.scale, nk, nv, pos, valid
        )
    else:
        o, k2, v2, ks2, vs2 = _decode_update_impl_q8(
            qg, kq.qv, vq.qv, kq.scale, vq.scale, nk, nv, pos, valid,
            interpret=interpret,
        )
    return (o.reshape(B, Sq, Hq, D), QuantizedKV(k2, ks2),
            QuantizedKV(v2, vs2))


# ---------------------------------------------------------------------------
# shared decode-cache helpers (used by models/llama.py and models/falcon.py —
# one implementation of the layout-dependent update + kernel dispatch)
# ---------------------------------------------------------------------------


def update_decode_cache(cache_k, cache_v, xk, xv, write_pos, layout="bshd"):
    """Write this call's [B, S, Hkv, D] k/v into the cache at ``write_pos``.
    ``layout``: "bshd" caches are [B, S, Hkv, D]; "bhsd" (the layered decode
    layout) are [B, Hkv, S, D] — panel-contiguous for the kernel and with
    4x cheaper per-step writes. ``QuantizedKV`` caches (bhsd only)
    quantize the incoming tokens on write.

    ``write_pos`` may be a PER-BATCH vector [B] (continuous-batching ragged
    decode: each slot writes its token at its own position; bhsd only)."""
    if isinstance(write_pos, jnp.ndarray) and write_pos.ndim == 1:
        assert layout == "bhsd", "ragged cache writes are bhsd-layered only"
        return _update_decode_cache_ragged(
            cache_k, cache_v, xk, xv, write_pos
        )
    if isinstance(cache_k, QuantizedKV):
        assert layout == "bhsd", "quantized KV caches are bhsd-layered only"
        kq, kscale = quantize_kv_tokens(xk)
        vq, vscale = quantize_kv_tokens(xv)
        return (
            QuantizedKV(
                jax.lax.dynamic_update_slice(
                    cache_k.qv, kq, (0, 0, write_pos, 0)
                ),
                jax.lax.dynamic_update_slice(
                    cache_k.scale, kscale, (0, 0, write_pos)
                ),
            ),
            QuantizedKV(
                jax.lax.dynamic_update_slice(
                    cache_v.qv, vq, (0, 0, write_pos, 0)
                ),
                jax.lax.dynamic_update_slice(
                    cache_v.scale, vscale, (0, 0, write_pos)
                ),
            ),
        )
    if layout == "bhsd":
        k = xk.transpose(0, 2, 1, 3).astype(cache_k.dtype)
        v = xv.transpose(0, 2, 1, 3).astype(cache_v.dtype)
        idx = (0, 0, write_pos, 0)
    else:
        k = xk.astype(cache_k.dtype)
        v = xv.astype(cache_v.dtype)
        idx = (0, write_pos, 0, 0)
    return (
        jax.lax.dynamic_update_slice(cache_k, k, idx),
        jax.lax.dynamic_update_slice(cache_v, v, idx),
    )


def _update_decode_cache_ragged(cache_k, cache_v, xk, xv, write_pos):
    """Per-slot cache writes: slot b's [S_new] tokens land at
    [write_pos[b], write_pos[b] + S_new). vmap'd dynamic_update_slice over
    the batch dim — XLA lowers this to an in-place scatter on the donated
    buffers, no full-panel copies."""

    def dus4(cache, val, pos):
        # per-element: cache [H, S, D], val [H, S_new, D]
        return jax.vmap(
            lambda c, v, p: jax.lax.dynamic_update_slice(c, v, (0, p, 0))
        )(cache, val, pos)

    def dus3(cache, val, pos):
        return jax.vmap(
            lambda c, v, p: jax.lax.dynamic_update_slice(c, v, (0, p))
        )(cache, val, pos)

    if isinstance(cache_k, QuantizedKV):
        kq, kscale = quantize_kv_tokens(xk)
        vq, vscale = quantize_kv_tokens(xv)
        return (
            QuantizedKV(
                dus4(cache_k.qv, kq, write_pos),
                dus3(cache_k.scale, kscale, write_pos),
            ),
            QuantizedKV(
                dus4(cache_v.qv, vq, write_pos),
                dus3(cache_v.scale, vscale, write_pos),
            ),
        )
    k = xk.transpose(0, 2, 1, 3).astype(cache_k.dtype)
    v = xv.transpose(0, 2, 1, 3).astype(cache_v.dtype)
    return (
        dus4(cache_k, k, write_pos),
        dus4(cache_v, v, write_pos),
    )


# A/B knob (scripts/fused_ab.py): False forces the two-step DUS+attend
# path. Read at TRACE time — flip it only around fresh jit wrappers.
FUSE_UPDATE_ATTEND = True


def update_and_attend_decode_cache(xq, cache_k, cache_v, xk, xv, write_pos,
                                   kv_valid_len, *, mask, impl="auto",
                                   layout="bshd", valid_static=None,
                                   interpret=False):
    """One-call replacement for ``update_decode_cache`` followed by
    ``attend_decode_cache`` on the single-token decode hot path: eligible
    steps run the fused write+attend kernel (decode_attention_update*),
    everything else (prefill, multi-token verify windows, CPU, falcon's
    D=64) falls back to the two-step path unchanged. Returns
    (out [B, S, Hq, D], (new_cache_k, new_cache_v))."""
    B, Sq = xq.shape[0], xq.shape[1]
    D = xq.shape[3]
    quant = isinstance(cache_k, QuantizedKV)
    kshape = cache_k.qv.shape if quant else cache_k.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    fused_ok = (
        FUSE_UPDATE_ATTEND
        and layout == "bhsd"
        and mask is None
        and valid_static is None
        and kv_valid_len is not None
        and Sq == 1
        and xk.shape[1] == 1
        and impl in ("auto", "flash")
        and D % 128 == 0
        and kshape[2] % 8 == 0
        and xq.dtype != jnp.float32
        and (on_tpu or interpret)
    )
    if fused_ok:
        pos = (
            write_pos
            if isinstance(write_pos, jnp.ndarray) and write_pos.ndim == 1
            else jnp.full((B,), write_pos, jnp.int32)
        )
        if quant:
            out, k2, v2 = decode_attention_update_quant(
                xq, cache_k, cache_v, xk, xv, pos, kv_valid_len,
                interpret=interpret,
            )
        else:
            out, k2, v2 = decode_attention_update(
                xq, cache_k, cache_v, xk, xv, pos, kv_valid_len,
                interpret=interpret,
            )
        return out, (k2, v2)
    cache_k, cache_v = update_decode_cache(
        cache_k, cache_v, xk, xv, write_pos, layout=layout
    )
    out = attend_decode_cache(
        xq, cache_k, cache_v, mask=mask, kv_valid_len=kv_valid_len,
        impl=impl, layout=layout, valid_static=valid_static,
    )
    return out, (cache_k, cache_v)


def attend_decode_cache(xq, cache_k, cache_v, *, mask, kv_valid_len,
                        impl="auto", layout="bshd", valid_static=None):
    """Attention over the full (padded) cache: the fused Pallas kernel for
    eligible single-token bhsd decode, the XLA path otherwise. Returns
    [B, S, Hq, D].

    ``valid_static``: for CHUNKED PREFILL — a static int saying the first
    ``valid_static`` cache slots are populated and the chunk's queries are
    right-aligned to that extent. Routes multi-token right-aligned-causal
    attention through the flash kernel (whose skv_actual must be static)
    instead of materializing [B, H, chunk, S_cache] f32 XLA scores.

    The eligibility gate's D % 128 == 0 keeps falcon (head_dim 64) on the
    XLA path deliberately: the kernel at D=64 was MEASURED slower than
    XLA over either layout (179 vs 115 us on v5e, B16 H72 S192 — half-
    empty lanes), and the bhsd transpose costs the same as bshd there."""
    from a3vlm_tpu.ops.attention import attention

    if (
        valid_static is not None
        and mask == "causal"
        and xq.shape[1] > 1
        and impl in ("auto", "flash")
        and jax.devices()[0].platform == "tpu"
    ):
        # NOTE: the flash route masks keys uniformly at the static
        # valid_static; callers must pass kv_valid_len == valid_static for
        # every batch element (the chunked-prefill contract) — ragged
        # per-row valid lengths would silently diverge from the XLA path.
        from a3vlm_tpu.ops.flash_attention import flash_attention_bhsd

        Sq = xq.shape[1]
        if isinstance(cache_k, QuantizedKV):
            # per-chunk dequant into transient bf16 panels: still O(cache)
            # transient instead of the XLA fallback's O(chunk x cache) f32
            # score tensors (2.1 GB at batch 16 / 2k ctx)
            keys = dequantize_kv(cache_k, xq.dtype)
            values = dequantize_kv(cache_v, xq.dtype)
        else:
            keys = (cache_k if layout == "bhsd"
                    else cache_k.transpose(0, 2, 1, 3)).astype(xq.dtype)
            values = (cache_v if layout == "bhsd"
                      else cache_v.transpose(0, 2, 1, 3)).astype(xq.dtype)
        bq = min(512, -(-Sq // 128) * 128)
        bk = 1024 if keys.shape[2] % 1024 == 0 else 512
        pad_q = (-Sq) % bq
        pad_k = (-keys.shape[2]) % bk
        qp = xq.transpose(0, 2, 1, 3)
        if pad_q:
            qp = jnp.pad(qp, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        if pad_k:
            keys = jnp.pad(keys, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
            values = jnp.pad(values, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        out = flash_attention_bhsd(
            qp, keys, values, causal=True, block_q=bq, block_k=bk,
            sq_actual=Sq, skv_actual=valid_static,
        )
        return out.transpose(0, 2, 1, 3)[:, :Sq]
    if (
        mask == "causal"
        and valid_static is None
        and kv_valid_len is not None
        and impl in ("auto", "flash")
        and layout == "bhsd"
        and verify_attention_eligible(
            xq.shape,
            cache_k.qv.shape if isinstance(cache_k, QuantizedKV)
            else cache_k.shape,
            xq.dtype,
        )
    ):
        # multi-token speculative verify window: the Pallas verify kernel
        # (causal-within-window masking per q row) instead of XLA's
        # materialized [B, H, Sq, S] scores — and, like the Sq==1 kernel,
        # a custom call that pins the loop-carried cache layout
        if isinstance(cache_k, QuantizedKV):
            return verify_attention_quant(xq, cache_k, cache_v,
                                          kv_valid_len)
        return verify_attention(
            xq, cache_k.astype(xq.dtype), cache_v.astype(xq.dtype),
            kv_valid_len,
        )
    if isinstance(cache_k, QuantizedKV):
        if (
            impl in ("auto", "flash")
            and mask is None
            and kv_valid_len is not None
            and decode_attention_eligible(
                xq.shape, cache_k.qv.shape, xq.dtype
            )
        ):
            return decode_attention_quant(xq, cache_k, cache_v, kv_valid_len)
        # XLA fallback (CPU tests, prefill shapes): dequantize the panels
        keys = dequantize_kv(cache_k, xq.dtype).transpose(0, 2, 1, 3)
        values = dequantize_kv(cache_v, xq.dtype).transpose(0, 2, 1, 3)
        return attention(xq, keys, values, mask=mask,
                         kv_valid_len=kv_valid_len, impl=impl)
    if layout == "bhsd":
        if (
            impl in ("auto", "flash")
            and mask is None
            and kv_valid_len is not None
            and decode_attention_eligible(xq.shape, cache_k.shape, xq.dtype)
        ):
            # one fused pass per cache panel; being a custom call also pins
            # the loop-carried cache to the default layout (XLA attention
            # costs 229us/layer in-loop vs 69us isolated because layout
            # assignment relays the cache every step)
            return decode_attention(
                xq, cache_k.astype(xq.dtype), cache_v.astype(xq.dtype),
                kv_valid_len,
            )
        keys = cache_k.transpose(0, 2, 1, 3).astype(xq.dtype)
        values = cache_v.transpose(0, 2, 1, 3).astype(xq.dtype)
    else:
        keys = cache_k.astype(xq.dtype)
        values = cache_v.astype(xq.dtype)
    return attention(xq, keys, values, mask=mask, kv_valid_len=kv_valid_len,
                     impl=impl)
