"""Fused int4 dequant-matmul (Pallas, TPU) + the quantized-linear dispatcher.

TPU-native replacement for bitsandbytes' ``Linear4bit``/``Linear8bitLt``
forward (reference util/quant.py:116-144): the weight stays packed in HBM
(two nibbles per byte, split-half layout from ``quant._quantize_leaf_int4``)
and is unpacked + scaled in VMEM, inside the matmul kernel — so a decode
step streams K*N/2 bytes instead of K*N*2 (bf16), which is the whole win in
the HBM-bound regime.

Split-half layout: byte row ``r`` of ``q`` holds weight row ``r`` (low
nibble) and row ``r + K/2`` (high nibble). The kernel therefore computes

    out = x[:, :K/2] @ dequant(lo) + x[:, K/2:] @ dequant(hi)

as two MXU dots per block — no interleave, no transposes. Group scales
(``group`` input rows share one f32 scale per output channel) are expanded
sublane-wise in VMEM.

``qmat(x, w)`` is the dispatcher the decoder layers call: dense arrays take
the plain ``@``; int8 and int4 take their fused Pallas kernels on TPU and
equivalent XLA paths elsewhere (CPU tests, interpret mode). XLA alone does
NOT fuse the dequant into the dot's operand load — it materializes the
dequantized bf16 weight every step, so unfused int8 decode moves the same
HBM traffic as dense bf16 (measured: 544 vs 1114 tok/s full-depth 7B).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3vlm_tpu.quant import LoraWeight, QuantizedWeight, unpack_int4

# process-wide resolution of variant="auto" (see _int4_matmul_2d)
_AUTO_VARIANT = os.environ.get("A3VLM_INT4_VARIANT", "v1")

# Large-M (prefill) dispatch knobs — read at TRACE time (re-jit to flip;
# scripts/prefill_ab.py interleaves fresh jits per arm). Rationale: at
# M ~ 1500 the fused kernel is no longer weight-bandwidth bound — the
# per-weight dequant VPU chain throttles the MXU (~53% MFU on the triad
# prefill leg). Candidate fixes under A/B:
#   PREFILL_DENSE_MIN_M: if set, int4 matmuls with M >= it route to the
#     XLA dequant-then-dense-dot path (2x weight traffic, full-rate MXU).
#   PREFILL_BM: if set to (min_m, bm), kernel calls with M >= min_m use
#     BM=bm instead of 256 (halves dequant work per MXU flop at bm=512).
PREFILL_DENSE_MIN_M = None
PREFILL_BM = None

# W4A8 decode knob (trace-time): int4 matmuls with M <= W4A8_MAX_M
# quantize the ACTIVATIONS to per-row int8 and contract on the MXU in
# int8 (group-factored f32 scale epilogue, _int4_kernel_w4a8). NOT exact
# vs the bf16-dequant kernels — activations round to 8 bits (per-token
# absmax) — so this is opt-in (scripts/w4a8_ab.py; accuracy-gated by
# tests/test_w4a8.py numerics bounds). Motivation: the exact dequant
# chain (i32->f32 convert + expanded-scale mul + bf16 cast per weight)
# is the measured ~11% cap on int4 decode bandwidth; the int-dot path
# replaces it with 2 shifts + an i8 narrowing per weight.
W4A8_DECODE = False
W4A8_MAX_M = 32

# W8A8 prefill knob (trace-time): int4 matmuls with M >= W8A8_PREFILL_MIN_M
# fold the per-GROUP scales into int8 weights IN VMEM (per-column rescale,
# _int4_kernel_w8a8p) and contract on the int8 MXU — 2x the bf16 FLOP rate,
# which is the prefill ceiling (round-4 trace: prefill matmuls within ~17%
# of the DENSE-bf16 ideal; the int8 MXU is the only remaining lever). The
# epilogue is RANK-1 (act row scale x column max scale), so unlike the
# W4A8 group epilogue it does not scale with M. NOT bit-exact (activation
# int8 rounding + the in-kernel weight requant, see _int4_matmul_2d_w8a8p);
# opt-in, numerics-gated like W4A8.
W8A8_PREFILL = False
W8A8_PREFILL_MIN_M = 256


def _int4_kernel(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
                 *, group: int, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = q_ref[:].astype(jnp.int32)  # [BK, BN]
    lo = (packed << 28) >> 28  # sign-extended low nibble
    hi = packed >> 4           # arithmetic shift sign-extends the high nibble
    slo = jnp.repeat(slo_ref[:], group, axis=0)  # [BK, BN] f32
    shi = jnp.repeat(shi_ref[:], group, axis=0)
    wlo = (lo.astype(jnp.float32) * slo).astype(jnp.bfloat16)
    whi = (hi.astype(jnp.float32) * shi).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(
        xlo_ref[:], wlo, preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.dot(
        xhi_ref[:], whi, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int4_kernel_glu(glo_ref, ghi_ref, ulo_ref, uhi_ref, q_ref, slo_ref,
                     shi_ref, res_ref, o_ref, acc_ref, *, group: int,
                     nk: int):
    """SwiGLU-fused int4 matmul: computes ``silu(g) * u`` on the x blocks
    INSIDE the kernel and adds a residual at the final store —
    ``res + (silu(g) * u) @ W2``. Built to cut XLA<->pallas boundary
    launches in the decode loop; MEASURED A WASH on-chip (-0.8% stable
    over 3 interleaved A/B pairs, scripts/ffn_fuse_ab.py, 7B int4 b16
    full-depth) — removing the silu-mul + residual XLA islands does not
    reduce the inter-op glue, so the glue is launch/relayout around the
    custom calls, not island execution. Kept as a documented negative
    result + sweep knob (llama.FUSE_FFN_DOWN)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = q_ref[:].astype(jnp.int32)  # [BK, BN]
    lo = (packed << 28) >> 28
    hi = packed >> 4
    slo = jnp.repeat(slo_ref[:], group, axis=0)
    shi = jnp.repeat(shi_ref[:], group, axis=0)
    wlo = (lo.astype(jnp.float32) * slo).astype(jnp.bfloat16)
    whi = (hi.astype(jnp.float32) * shi).astype(jnp.bfloat16)

    def z(g_ref, u_ref):
        g = g_ref[:].astype(jnp.float32)
        return (jax.nn.sigmoid(g) * g * u_ref[:].astype(jnp.float32)
                ).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(
        z(glo_ref, ulo_ref), wlo, preferred_element_type=jnp.float32
    )
    acc_ref[:] += jnp.dot(
        z(ghi_ref, uhi_ref), whi, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = (acc_ref[:] + res_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _int4_kernel_v3(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref,
                    acc_ref, *, group: int, nk: int):
    """Group-factored variant: the per-weight f32 scale chain (i32->f32
    convert, expanded-scale mul, f32->bf16 cast — a jnp.repeat [BK, BN]
    f32 write plus ~3 VPU ops per weight) is replaced by per-GROUP dots on
    unscaled bf16 nibbles and a [BM, BN]-per-group scale epilogue: VPU
    work per packed byte drops from ~10 ops to ~4 (2 shifts, 2 i32->bf16
    converts) + sg*BM*BN epilogue FMAs (sg = BK/group, ~1/64 of the v1
    mul count at BM=16). The dequant chain is the measured cap on int4
    bandwidth (480 vs int8's 700 GB/s).

    An earlier formulation ("v2") batched the group dots via a 3D
    reshape-transpose of x — Mosaic cannot legalize the lane-splitting
    ``(BM, BK) -> (BM, sg, group)`` shape cast on real TPU ("infer-
    vector-layout: unsupported shape cast"; interpret mode hid it). This
    version keeps every operand 2D: a python-unrolled loop of [BM, group]
    @ [group, BN] dots (static sg, so the unroll is fixed at trace time).
    MXU contraction depth is ``group`` (64): half-depth efficiency,
    irrelevant in the weight-bandwidth-bound decode regime."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    BK, BN = q_ref.shape
    sg = BK // group
    packed = q_ref[:].astype(jnp.int32)  # [BK, BN]
    lo = ((packed << 28) >> 28).astype(jnp.bfloat16)
    hi = (packed >> 4).astype(jnp.bfloat16)

    def half_acc(x_ref, w, s_ref):
        acc = None
        for gi in range(sg):
            xg = x_ref[:, gi * group:(gi + 1) * group]  # [BM, g]
            wg = w[gi * group:(gi + 1) * group, :]      # [g, BN]
            part = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            part = part * s_ref[gi, :][None, :]
            acc = part if acc is None else acc + part
        return acc

    acc_ref[:] += half_acc(xlo_ref, lo, slo_ref)
    acc_ref[:] += half_acc(xhi_ref, hi, shi_ref)

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int4_kernel_w4a8(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, xs_ref,
                      o_ref, acc_ref, *, group: int, nk: int):
    """W4A8 variant: activations arrive PRE-QUANTIZED to per-row int8
    (xs_ref holds the [BM, 1] f32 row scales); weights unpack int4 -> int8
    with NO float dequant (2 shifts + a narrowing per packed byte), and
    the contraction runs on the MXU in int8 -> int32 per GROUP, so the
    per-group weight scale applies to an exact integer partial:

        out[m, n] = xs[m] * sum_g s[g, n] * (xq[m, Kg] . wq[Kg, n])

    The int32 group partial is exact (|x| <= 127, |w| <= 8, group <= 512
    -> |part| <= 520k < 2^31); converting it to f32 is exact below 2^24.
    Numerics vs the bf16-dequant kernels differ ONLY by the activation
    rounding (per-token absmax int8)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    BK, BN = q_ref.shape
    sg = BK // group
    packed = q_ref[:].astype(jnp.int32)
    lo = ((packed << 28) >> 28).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)

    def half_acc(x_ref, w, s_ref):
        acc = None
        for gi in range(sg):
            part = jnp.dot(
                x_ref[:, gi * group:(gi + 1) * group],
                w[gi * group:(gi + 1) * group, :],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            part = part * s_ref[gi, :][None, :]
            acc = part if acc is None else acc + part
        return acc

    acc_ref[:] += half_acc(xlo_ref, lo, slo_ref)
    acc_ref[:] += half_acc(xhi_ref, hi, shi_ref)

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * xs_ref[:]).astype(o_ref.dtype)


def _int4_kernel_w8a8p(xlo_ref, xhi_ref, q_ref, rlo_ref, rhi_ref, xs_ref,
                       cs_ref, o_ref, acc_ref, *, group: int, nk: int):
    """W8A8 PREFILL variant: activations arrive per-row int8 (as in the
    W4A8 kernel), and the int4 weights are requantized IN VMEM to int8
    with a per-COLUMN scale — the group scales fold into the integer
    values instead of the epilogue:

        w8[k, n] = round(q4[k, n] * (s[g(k), n] / smax[n]) * 15.875)
        out[m, n] = xs[m] * (smax[n] / 15.875) * sum_k x8[m, k] * w8[k, n]

    |q4| <= 8 and s/smax <= 1 keep |w8| <= 127 with no clip; the int32
    accumulation is exact (K <= 2^17 * 127^2 < 2^31). The contraction
    runs full-BK on the int8 MXU (2x bf16 rate) and the scale epilogue is
    RANK-1 — one [BM,1] x [1,BN] f32 multiply at the final store, O(M*N)
    total regardless of the group count (the W4A8 group epilogue is
    O(M*N*G), which is why W4A8 lost at prefill M). The requant chain
    (unpack, f32 mul, round, i8 cast) is O(K*N) per weight pass — at
    M ~ 1500 it amortizes to noise, unlike at decode M.

    Numerics vs the exact dequant kernels: activation int8 rounding (as
    W4A8) PLUS the weight requant, whose per-weight error is at most
    smax[n]/31.75 — sub-LSB of the int4 grid whenever the column's group
    scales are within 15.9x of each other. Gated by tests/test_w8a8_prefill
    envelopes + the on-chip accuracy script."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = q_ref[:].astype(jnp.int32)  # [BK, BN]
    lo = (packed << 28) >> 28
    hi = packed >> 4
    # ratios arrive pre-multiplied by 15.875 (one fewer VPU op per weight;
    # the requant chain runs once per M-tile, so it throttles the MXU at
    # prefill M the same way the v1 dequant chain did)
    rlo = jnp.repeat(rlo_ref[:], group, axis=0)  # [BK, BN] f32 in (0, 15.875]
    rhi = jnp.repeat(rhi_ref[:], group, axis=0)
    wlo = jnp.round(lo.astype(jnp.float32) * rlo).astype(jnp.int8)
    whi = jnp.round(hi.astype(jnp.float32) * rhi).astype(jnp.int8)
    acc_ref[:] += jnp.dot(
        xlo_ref[:], wlo, preferred_element_type=jnp.int32
    )
    acc_ref[:] += jnp.dot(
        xhi_ref[:], whi, preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * xs_ref[:] * cs_ref[:]
        ).astype(o_ref.dtype)


# sweep knob for the w8a8p M-tile: the in-kernel requant chain runs once
# per (M-tile, weight block), so larger BM amortizes it (at the cost of a
# BM x BN int32 acc scratch). Trace-time; None = 512 — the on-chip sweep
# winner (triad prefill 180.5 -> 152.9 ms at BM 256, -> 132.0 at 512;
# 1024 OOMs the 16 MB Mosaic VMEM stack at 19.3 MB).
W8A8P_BM = None


@functools.partial(jax.jit, static_argnames=("group", "interpret", "bm"))
def _int4_matmul_2d_w8a8p(x, q, scale, *, group: int,
                          interpret: bool = False, bm=None):
    """x [M, Kpad] float -> per-row int8 acts + in-VMEM int8 weight requant
    -> int8 MXU contraction (see _int4_kernel_w8a8p). Same split-half
    packed operands as _int4_matmul_2d; scale rows [0:half/g] are the lo
    half, [half/g:] the hi half (quant._quantize_leaf_int4 layout)."""
    M, Kpad = x.shape
    half, N = q.shape
    assert Kpad == 2 * half, (x.shape, q.shape)
    xq, xs = quantize_act_int8(x)
    # per-column max group scale + normalized ratios (computed per call —
    # scales are ~1/16 of the packed bytes, a ~1 ms full-model read)
    smax = jnp.maximum(jnp.max(scale, axis=0, keepdims=True), 1e-30)
    r = (scale * (15.875 / smax)).astype(jnp.float32)
    cs = (smax / 15.875).astype(jnp.float32)  # [1, N]

    BK = next(
        b for b in (1024, 512, 256)
        if half % b == 0 and b // group >= 8
    )
    BN = min(1024, -(-N // 128) * 128)
    BM = min(bm or 512, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        xq = jnp.pad(xq, ((0, Mpad - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mpad - M), (0, 0)))

    nm, nn, nk = Mpad // BM, -(-N // BN), half // BK
    sg = BK // group
    out = pl.pallas_call(
        functools.partial(_int4_kernel_w8a8p, group=group, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),           # xq low half
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k + nk),
                         memory_space=pltpu.VMEM),           # xq high half
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # packed weight
            pl.BlockSpec((sg, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # lo ratios
            pl.BlockSpec((sg, BN), lambda i, j, k: (k + nk, j),
                         memory_space=pltpu.VMEM),           # hi ratios
            pl.BlockSpec((BM, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),           # act row scales
            pl.BlockSpec((1, BN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),           # col max scales
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mpad * Kpad * N,
            bytes_accessed=half * N + Mpad * Kpad + Mpad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xq, q, r, r, xs, cs)
    return out[:M] if Mpad != M else out


def _int4_w8a8p_xla(x, qw: QuantizedWeight):
    """XLA emulation of the W8A8-prefill math: integer dots via dot_general
    s8 x s8 -> s32 (exact, matching the kernel bit-for-bit), so the opt-in
    knob is semantically consistent off-TPU and the interpret-mode kernel
    test has an exact reference."""
    half, N = qw.q.shape[-2:]
    g = qw.group
    xq, xs = quantize_act_int8(x.reshape(-1, x.shape[-1]))
    lo, hi = unpack_int4(qw.q)
    smax = jnp.maximum(jnp.max(qw.scale, axis=0, keepdims=True), 1e-30)
    # SAME f32 association as the kernel's pre-multiplied ratio (scale *
    # (15.875/smax)) — computing (q*(s/smax))*15.875 instead rounds
    # half-step values differently (observed: 62/262k w8 entries) and
    # breaks the bit-equality contract the tests and the off-TPU
    # fallback rest on
    r = (qw.scale * (15.875 / smax)).astype(jnp.float32)
    sgh = half // g

    def w8(qh, rh):
        rexp = jnp.repeat(rh, g, axis=0)
        return jnp.round(qh.astype(jnp.float32) * rexp).astype(jnp.int8)

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    acc = idot(xq[:, :half], w8(lo, r[:sgh])) + idot(
        xq[:, half:], w8(hi, r[sgh:])
    )
    out = acc.astype(jnp.float32) * xs * (smax / 15.875)
    return out.reshape(*x.shape[:-1], N).astype(x.dtype)


def quantize_act_int8(x):
    """Per-row (per-token) symmetric int8 activation quantization:
    [M, K] -> (int8 [M, K], f32 [M, 1] scale). round-to-nearest-even
    (jnp.round), absmax/127 scaling — the standard A8 recipe."""
    xf = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(m, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


@functools.partial(jax.jit, static_argnames=("group", "interpret", "bm"))
def _int4_matmul_2d_w4a8(x, q, scale, *, group: int,
                         interpret: bool = False, bm=None):
    """x [M, Kpad] float -> quantize per-row int8 -> W4A8 kernel.
    Same split-half packed operands as _int4_matmul_2d."""
    M, Kpad = x.shape
    half, N = q.shape
    assert Kpad == 2 * half, (x.shape, q.shape)
    xq, xs = quantize_act_int8(x)

    BK = next(
        b for b in (1024, 512, 256)
        if half % b == 0 and b // group >= 8
    )
    BN = min(1024, -(-N // 128) * 128)
    BM = bm if bm is not None else min(256, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        xq = jnp.pad(xq, ((0, Mpad - M), (0, 0)))
        xs = jnp.pad(xs, ((0, Mpad - M), (0, 0)))

    nm, nn, nk = Mpad // BM, -(-N // BN), half // BK
    sg = BK // group
    out = pl.pallas_call(
        functools.partial(_int4_kernel_w4a8, group=group, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),           # xq low half
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k + nk),
                         memory_space=pltpu.VMEM),           # xq high half
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # packed weight
            pl.BlockSpec((sg, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # lo scales
            pl.BlockSpec((sg, BN), lambda i, j, k: (k + nk, j),
                         memory_space=pltpu.VMEM),           # hi scales
            pl.BlockSpec((BM, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),           # act row scales
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mpad * Kpad * N,
            bytes_accessed=half * N + Mpad * Kpad + Mpad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xq, q, scale, scale, xs)
    return out[:M] if Mpad != M else out


def _int4_w4a8_xla(x, qw: QuantizedWeight):
    """XLA emulation of the W4A8 math (f32 — exact for these ranges:
    products <= 127*8, group sums < 2^24). Reference for interpret-mode
    kernel tests and the CPU numerics gate."""
    half, N = qw.q.shape[-2:]
    g = qw.group
    xq, xs = quantize_act_int8(x.reshape(-1, x.shape[-1]))
    xq = xq.astype(jnp.float32)
    lo, hi = unpack_int4(qw.q)
    sg = half // g
    slo, shi = qw.scale[:sg], qw.scale[sg:]

    def half_out(xh, qh, sh):
        # per-group exact integer dots (in f32), scaled per group
        xg = xh.reshape(-1, sg, g)
        wg = qh.astype(jnp.float32).reshape(sg, g, N)
        part = jnp.einsum("msg,sgn->msn", xg, wg)
        return jnp.sum(part * sh[None, :, :], axis=1)

    out = half_out(xq[:, :half], lo, slo) + half_out(xq[:, half:], hi, shi)
    out = out * xs
    return out.reshape(*x.shape[:-1], N).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "interpret", "variant", "block", "bm",
                     "chunks"),
)
def _int4_matmul_2d(x, q, scale, *, group: int, interpret: bool = False,
                    variant: str = "auto", block=None, bm=None,
                    chunks: int = 1):
    """x [M, Kpad] (bf16/f32), q [Kpad/2, N] int8 packed, scale [Kpad/g, N]
    f32 -> [M, N] in x.dtype. ``variant``: "v1" = expanded-scale kernel,
    "v3" = group-factored scales (see _int4_kernel_v3), "auto" = the
    per-shape winner from the on-chip sweep. ``block``: (BK, BN) override
    for sweeps (scripts/int4_sweep.py).

    ``chunks > 1``: q is CHUNK-PACKED (quant._quantize_leaf_int4
    k_chunks) flattened to 2D — byte rows are [chunk0's Kc/2 rows;
    chunk1's; ...] and the split-half pairing is per chunk. Same kernel
    bodies; only the x/scale BlockSpec index maps change (each K block
    addresses its chunk's lo/hi half instead of the global halves), so
    single-device chunked matmul costs exactly the unchunked one."""
    M, Kpad = x.shape
    half, N = q.shape
    assert Kpad == 2 * half, (x.shape, q.shape)
    assert half % chunks == 0, (q.shape, chunks)
    halfc = half // chunks

    # variant/block stay AVAILABLE as sweep knobs (scripts/int4_sweep.py)
    # but "auto" is the round-2 v1 + 1024x1024 configuration: the round-3
    # M=16 sweep found per-shape winners in ISOLATION (v3 891 vs 748 GB/s
    # on the attention shape; BN=1536 +7/+37% on the wide-N shapes), yet
    # a same-session A/B on the REAL decode loop measured the "winners"
    # 3.3% SLOWER end-to-end (1374 vs 1420 tok/s, stable across repeats)
    # and prefill (M ~ 1500) regressed outright (185 -> 229 ms). The
    # round-2 lesson again: XLA layout assignment couples consecutive
    # custom calls — isolated kernel timings do not transfer in-loop.
    # A3VLM_INT4_VARIANT overrides the auto choice process-wide (profiling
    # A/Bs across fresh processes — scripts/profile_decode.py; do NOT flip
    # it mid-process, the jit cache keys on the literal "auto").
    if variant == "auto":
        variant = _AUTO_VARIANT
    if block is not None:
        BK, BN = block
        assert halfc % BK == 0, (halfc, BK)
    else:
        # BK 1024 / BN 1024 (v5e in-loop sweeps); BK x BN capped at ~1M
        # elements — the dequant temporaries (unpacked i32 halves,
        # expanded scales, bf16 weights) live on the Mosaic stack and
        # 2048x1024 blocks OOM vmem. BK 256 only exists for chunked
        # shards (group 32 keeps the scale block at sg >= 8 sublanes).
        BK = next(
            b for b in (1024, 512, 256)
            if halfc % b == 0 and b // group >= 8
        )
        BN = min(1024, -(-N // 128) * 128)
    assert (BK % group == 0) and BK // group >= 8, (halfc, BK, group)
    BM = bm if bm is not None else min(256, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        x = jnp.pad(x, ((0, Mpad - M), (0, 0)))

    nm, nn = Mpad // BM, -(-N // BN)
    hb = halfc // BK       # K blocks per half-chunk
    nk = chunks * hb       # total K blocks
    sg = BK // group       # scale rows per K step

    # grid k walks chunks in order; within chunk ci (= k // hb) the lo
    # half sits at block column ci*2*hb + kb and the hi half hb later —
    # with chunks=1 this is the classic (k, k + nk) split-half addressing.
    # x and the scale rows share the same chunk-major layout, so one
    # formula serves both.
    def _lo(i, j, k):
        return (i, (k // hb) * 2 * hb + k % hb)

    def _hi(i, j, k):
        return (i, (k // hb) * 2 * hb + hb + k % hb)

    kernel = _int4_kernel if variant == "v1" else _int4_kernel_v3
    out = pl.pallas_call(
        functools.partial(kernel, group=group, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), _lo,
                         memory_space=pltpu.VMEM),           # x low half
            pl.BlockSpec((BM, BK), _hi,
                         memory_space=pltpu.VMEM),           # x high half
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # packed weight
            pl.BlockSpec((sg, BN), lambda i, j, k: (_lo(i, j, k)[1], j),
                         memory_space=pltpu.VMEM),           # lo scales
            pl.BlockSpec((sg, BN), lambda i, j, k: (_hi(i, j, k)[1], j),
                         memory_space=pltpu.VMEM),           # hi scales
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mpad * Kpad * N,
            bytes_accessed=half * N + Mpad * Kpad * 2 + Mpad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, q, scale, scale)
    return out[:M] if Mpad != M else out


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _int4_matmul_2d_glu(g, u, q, scale, res, *, group: int,
                        interpret: bool = False):
    """``res + (silu(g) * u) @ W`` with the SwiGLU gate and residual
    fused into the int4 kernel (see _int4_kernel_glu). g/u [M, Kpad],
    q [Kpad/2, N] packed, scale [Kpad/g, N], res [M, N] -> [M, N]."""
    M, Kpad = g.shape
    half, N = q.shape
    assert Kpad == 2 * half and u.shape == g.shape, (g.shape, u.shape,
                                                     q.shape)
    BK = next(b for b in (1024, 512) if half % b == 0)
    BN = min(1024, -(-N // 128) * 128)
    BM = min(256, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        g = jnp.pad(g, ((0, Mpad - M), (0, 0)))
        u = jnp.pad(u, ((0, Mpad - M), (0, 0)))
        res = jnp.pad(res, ((0, Mpad - M), (0, 0)))
    assert (BK % group == 0) and BK // group >= 8, (half, BK, group)

    nm, nn, nk = Mpad // BM, -(-N // BN), half // BK
    sg = BK // group
    xspec_lo = pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                            memory_space=pltpu.VMEM)
    xspec_hi = pl.BlockSpec((BM, BK), lambda i, j, k: (i, k + nk),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int4_kernel_glu, group=group, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            xspec_lo, xspec_hi,                      # g halves
            xspec_lo, xspec_hi,                      # u halves
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),   # packed weight
            pl.BlockSpec((sg, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),   # lo scales
            pl.BlockSpec((sg, BN), lambda i, j, k: (k + nk, j),
                         memory_space=pltpu.VMEM),   # hi scales
            pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),   # residual
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, N), res.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mpad * Kpad * N,
            bytes_accessed=half * N + 2 * Mpad * Kpad * 2 + 2 * Mpad * N * 2,
            transcendentals=Mpad * Kpad,
        ),
        interpret=interpret,
    )(g, g, u, u, q, scale, scale, res)
    return out[:M] if Mpad != M else out


def int4_ffn_down(g, u, qw: QuantizedWeight, res, interpret: bool = False):
    """Fused decode FFN tail: ``res + (silu(g) * u) @ W2`` in ONE custom
    call — removes the silu-mul XLA island and the residual add between
    w1/w3 and the next layer's norm (~2 of the ~9 us XLA<->pallas
    boundary launches per layer; PERFORMANCE.md decode decomposition).
    Shapes as int4_matmul; single-device kernel path only (multi-device
    and ineligible shapes fall back to the unfused ops — exactness with
    the fallback is tolerance-level: the kernel evaluates silu in f32)."""
    Kpad = qw.q.shape[-2] * 2
    K = g.shape[-1]
    assert K == qw.in_dim, (K, qw.in_dim)
    lead = g.shape[:-1]
    eligible = (
        qw.q.ndim == 2
        and len(jax.devices()) == 1
        and (interpret or _kernel_eligible(g, qw))
    )
    if not eligible:
        z = jax.nn.silu(g) * u
        return res + int4_matmul(z, qw, interpret=interpret)
    if Kpad != K:
        pad = [(0, 0)] * (g.ndim - 1) + [(0, Kpad - K)]
        g, u = jnp.pad(g, pad), jnp.pad(u, pad)
    out = _int4_matmul_2d_glu(
        g.reshape(-1, Kpad), u.reshape(-1, Kpad), qw.q, qw.scale,
        res.reshape(-1, res.shape[-1]), group=qw.group, interpret=interpret,
    )
    return out.reshape(*lead, out.shape[-1])


def _int4_matmul_xla(x, qw: QuantizedWeight):
    """Equivalent two-dot XLA path (CPU fallback / reference for tests)."""
    lo, hi = unpack_int4(qw.q)  # [half, N] each
    half, N = qw.q.shape[-2:]
    g = qw.group
    s = qw.scale  # [Kpad/g, N]
    slo = s[..., : half // g, :]
    shi = s[..., half // g:, :]

    def deq(qh, sh):
        qg = qh.reshape(*qh.shape[:-2], half // g, g, N).astype(jnp.float32)
        w = qg * sh[..., :, None, :]
        return w.reshape(*qh.shape[:-2], half, N).astype(x.dtype)

    xlo = x[..., :half]
    xhi = x[..., half:]
    return xlo @ deq(lo, slo) + xhi @ deq(hi, shi)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _int4_shapes_eligible(half: int, N: int, g: int,
                          chunks: int = 1) -> bool:
    if half % chunks:
        return False
    halfc = half // chunks
    ok_k = any(
        halfc % b == 0 and b % g == 0 and b // g >= 8
        for b in (1024, 512, 256)
    )
    return ok_k and N % 128 == 0


def _kernel_eligible(x, qw: QuantizedWeight) -> bool:
    if qw.q.ndim != 2:
        return False
    half, N = qw.q.shape
    return _int4_shapes_eligible(half, N, qw.group) and _on_tpu()


def _int4_xla_2d(x, q, scale, *, group: int):
    """2D-operand XLA two-dot path (the per-shard fallback inside the SPMD
    wrapper when the local shard shapes miss kernel alignment)."""
    half, N = q.shape
    lo, hi = unpack_int4(q)
    sg = half // group
    slo, shi = scale[:sg], scale[sg:]

    def deq(qh, sh):
        qg = qh.reshape(sg, group, N).astype(jnp.float32)
        return (qg * sh[:, None, :]).reshape(half, N).astype(x.dtype)

    return x[:, :half] @ deq(lo, slo) + x[:, half:] @ deq(hi, shi)


def _int4_local(x, q, scale, *, group: int, interpret: bool):
    """Per-shard dispatch: fused kernel when the LOCAL shard shapes are
    lane-aligned (traced with per-shard shapes inside custom_partitioning),
    XLA two-dot otherwise."""
    half, N = q.shape
    if _int4_shapes_eligible(half, N, group) and (_on_tpu() or interpret):
        return _int4_matmul_2d(x, q, scale, group=group, interpret=interpret)
    return _int4_xla_2d(x, q, scale, group=group)


def _int4_local_chunked(x, q3, s3, *, group: int, interpret: bool):
    """Per-shard dispatch for CHUNK-PACKED operands: x [M, cl*Kc],
    q3 [cl, halfc, N], s3 [cl, Kc/group, N]. One kernel launch covers all
    local chunks (the chunk-aware index maps in _int4_matmul_2d); the XLA
    fallback sums per-chunk two-dot matmuls."""
    cl, halfc, N = q3.shape
    q2 = q3.reshape(cl * halfc, N)
    s2 = s3.reshape(-1, N)
    if (
        _int4_shapes_eligible(cl * halfc, N, group, chunks=cl)
        and (_on_tpu() or interpret)
    ):
        return _int4_matmul_2d(
            x, q2, s2, group=group, interpret=interpret, chunks=cl
        )
    Kc = 2 * halfc
    out = None
    for ci in range(cl):
        part = _int4_xla_2d(
            x[:, ci * Kc:(ci + 1) * Kc], q3[ci], s3[ci], group=group
        )
        out = part if out is None else out + part
    return out


@functools.lru_cache(maxsize=8)
def _spmd_int4(group: int, interpret: bool):
    """custom_partitioning wrapper so TP-sharded quantized decode keeps the
    fused kernel (a bare pallas_call does not SPMD-partition — without this
    a multi-device mesh all-gathers every packed weight, or the XLA dequant
    dot moves dense-bf16 traffic; either way the round-2 kernel win dies).

    Sharding contract: the OUTPUT dim N follows the weight's sharding
    (all-column-parallel TP — for weight-bound decode the per-matmul
    activation all-gather XLA inserts downstream is ~KBs vs the GBs of
    weight traffic saved); K cannot shard — the split-half packing pairs
    byte row r with rows (r, r + K/2), so a contiguous K-shard of the
    packed bytes does not correspond to a contiguous K-shard of x.
    Exactness on the mp=2 CPU mesh: tests/test_quant_matmul.py."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(x, q, scale):
        return _int4_local(x, q, scale, group=group, interpret=interpret)

    fn = custom_partitioning(_positional)

    def _axes(arg_shapes):
        qspec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        n_ax = qspec[1] if len(qspec) > 1 else None
        xspec = getattr(arg_shapes[0].sharding, "spec", PartitionSpec())
        m_ax = xspec[0] if len(xspec) > 0 else None
        return m_ax, n_ax

    def partition(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return (
            mesh,
            _positional,
            NamedSharding(mesh, PartitionSpec(m_ax, n_ax)),
            (
                NamedSharding(mesh, PartitionSpec(m_ax, None)),
                NamedSharding(mesh, PartitionSpec(None, n_ax)),
                NamedSharding(mesh, PartitionSpec(None, n_ax)),
            ),
        )

    def infer(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(m_ax, n_ax))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # x [m, k] (k = 2*half), packed q [h, n], scales [g, n] -> [m, n];
        # only m (batch) and n (output channels) may shard
        sharding_rule="m k, h n, g n -> m n",
        need_replication_factors=("k", "h", "g"),
    )
    return fn


@functools.lru_cache(maxsize=8)
def _spmd_int4_rowp(group: int, interpret: bool):
    """custom_partitioning wrapper for CHUNK-PACKED (row-parallel) int4:
    operands are x3 [M, c, Kc], q3 [c, Kc/2, N], s3 [c, Kc/group, N] so
    the chunk axis is a single shardable factor across all three. Each
    shard runs the fused kernel on its own chunks (a chunk shard IS
    standard split-half packing of that K-shard) and the partial [M, N]
    outputs psum over the sharded mesh axis — Megatron RowParallelLinear
    (reference llama_ens5.py:202-210): activation-sized reduce instead of
    all-gathering activations into a column-parallel consumer. Partials
    reduce in f32 and cast once after the psum, so sharded-vs-local
    differences are f32 summation order only."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _local(x3, q3, s3):
        M = x3.shape[0]
        return _int4_local_chunked(
            x3.reshape(M, -1), q3, s3, group=group, interpret=interpret
        )

    def _positional(x3, q3, s3):
        return _local(x3, q3, s3)

    fn = custom_partitioning(_positional)

    def _axes(arg_shapes):
        xspec = getattr(arg_shapes[0].sharding, "spec", PartitionSpec())
        m_ax = xspec[0] if len(xspec) > 0 else None
        qspec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        c_ax = qspec[0] if len(qspec) > 0 else None
        return m_ax, c_ax

    def partition(mesh, arg_shapes, result_shape):
        m_ax, c_ax = _axes(arg_shapes)

        def lower(x3, q3, s3):
            out = _local(x3, q3, s3)
            if c_ax is not None:
                out = jax.lax.psum(out.astype(jnp.float32), c_ax).astype(
                    out.dtype
                )
            return out

        return (
            mesh,
            lower,
            NamedSharding(mesh, PartitionSpec(m_ax, None)),
            (
                NamedSharding(mesh, PartitionSpec(m_ax, c_ax, None)),
                NamedSharding(mesh, PartitionSpec(c_ax, None, None)),
                NamedSharding(mesh, PartitionSpec(c_ax, None, None)),
            ),
        )

    def infer(mesh, arg_shapes, result_shape):
        m_ax, _ = _axes(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(m_ax, None))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # x [m, c, k], q [c, h, n], s [c, g, n] -> [m, n]; c is the
        # contraction factor that MAY shard (the partition fn psums);
        # within-chunk dims stay replicated
        sharding_rule="m c k, c h n, c g n -> m n",
        need_replication_factors=("k", "h", "g"),
    )
    return fn


def int4_matmul_chunked(x, qw: QuantizedWeight, interpret: bool = False):
    """x [..., K] @ chunk-packed int4 weight (k_chunks > 1) -> [..., N].
    3-D q (a single layer) takes the SPMD rowp wrapper under multi-device
    runtimes or the chunked kernel locally; stacked [L, ...] weights use
    the XLA per-chunk fallback (training scans slice to 3-D per layer
    before reaching here)."""
    c = qw.k_chunks
    halfc, N = qw.q.shape[-2:]
    Kpad = c * 2 * halfc
    K = x.shape[-1]
    assert K == qw.in_dim, (K, qw.in_dim)
    if Kpad != K:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kpad - K)])
    lead = x.shape[:-1]
    x2 = x.reshape(-1, Kpad)
    if qw.q.ndim == 3:
        if len(jax.devices()) > 1:
            out = _spmd_int4_rowp(qw.group, bool(interpret))(
                x2.reshape(-1, c, 2 * halfc), qw.q, qw.scale
            )
        else:
            out = _int4_local_chunked(
                x2, qw.q, qw.scale, group=qw.group, interpret=interpret
            )
        return out.reshape(*lead, N)
    # stacked/leading dims: XLA per-chunk two-dot (non-hot path)
    Kc = 2 * halfc
    out = None
    for ci in range(c):
        sub = QuantizedWeight(
            qw.q[..., ci, :, :], qw.scale[..., ci, :, :],
            bits=4, group=qw.group, in_dim=Kc,
        )
        part = _int4_matmul_xla(x[..., ci * Kc:(ci + 1) * Kc], sub)
        out = part if out is None else out + part
    return out


def int4_matmul(x, qw: QuantizedWeight, interpret: bool = False):
    """x [..., K] @ int4-packed weight [Kpad, N] -> [..., N]."""
    if qw.k_chunks > 1:
        return int4_matmul_chunked(x, qw, interpret=interpret)
    Kpad = qw.q.shape[-2] * 2
    K = x.shape[-1]
    assert K == qw.in_dim, (K, qw.in_dim)
    if Kpad != K:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kpad - K)])
    lead = x.shape[:-1]
    if qw.q.ndim == 2 and len(jax.devices()) > 1:
        out = _spmd_int4(qw.group, bool(interpret))(
            x.reshape(-1, Kpad), qw.q, qw.scale
        )
        return out.reshape(*lead, out.shape[-1])
    if not (interpret or _kernel_eligible(x, qw)):
        # the W4A8/W8A8 knobs stay semantically consistent off-TPU / on
        # kernel-ineligible shapes: same math via the XLA emulations
        if W4A8_DECODE and math.prod(x.shape[:-1]) <= W4A8_MAX_M:
            return _int4_w4a8_xla(x, qw)
        if W8A8_PREFILL and math.prod(x.shape[:-1]) >= W8A8_PREFILL_MIN_M:
            return _int4_w8a8p_xla(x, qw)
        return _int4_matmul_xla(x, qw)
    x2 = x.reshape(-1, Kpad)
    M = x2.shape[0]
    if W8A8_PREFILL and M >= W8A8_PREFILL_MIN_M:
        out = _int4_matmul_2d_w8a8p(
            x2, qw.q, qw.scale, group=qw.group, interpret=interpret,
            bm=W8A8P_BM,
        )
        return out.reshape(*lead, out.shape[-1])
    if PREFILL_DENSE_MIN_M is not None and M >= PREFILL_DENSE_MIN_M:
        return _int4_matmul_xla(x, qw)
    bm = None
    if PREFILL_BM is not None and M >= PREFILL_BM[0]:
        bm = PREFILL_BM[1]
    if W4A8_DECODE and M <= W4A8_MAX_M:
        out = _int4_matmul_2d_w4a8(
            x2, qw.q, qw.scale, group=qw.group, interpret=interpret, bm=bm
        )
        return out.reshape(*lead, out.shape[-1])
    out = _int4_matmul_2d(
        x2, qw.q, qw.scale, group=qw.group, interpret=interpret, bm=bm
    )
    return out.reshape(*lead, out.shape[-1])


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 in [-127, 127] casts to bf16 exactly (8 mantissa bits); the
    # per-output-channel scale is k-independent, so it factors out of the
    # accumulation and is applied once at the final store
    acc_ref[:] += jnp.dot(
        x_ref[:], q_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int8_matmul_2d(x, q, scale, *, interpret: bool = False):
    """x [M, K] (bf16/f32), q [K, N] int8, scale [1, N] f32 -> [M, N] in
    x.dtype. Streams K*N bytes of weight instead of the 2*K*N the XLA path
    moves after materializing the dequantized bf16 weight."""
    M, K = x.shape
    K2, N = q.shape
    assert K == K2, (x.shape, q.shape)

    # v5e in-loop sweep (M=16): wide BN wins — BN 1024/2048 runs 680-735
    # GB/s, BN 256 only 300-580. Ceil-grid over N (boundary block's
    # out-of-range columns read padding, dropped on store; exact-ref
    # checked on-chip for N=11008).
    BK = next(b for b in (1024, 512, 256) if K % b == 0)
    BN = min(2048, -(-N // 128) * 128)
    BM = min(256, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        x = jnp.pad(x, ((0, Mpad - M), (0, 0)))

    nm, nn, nk = Mpad // BM, -(-N // BN), K // BK
    out = pl.pallas_call(
        functools.partial(_int8_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mpad * K * N,
            bytes_accessed=K * N + Mpad * K * 2 + Mpad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale)
    return out[:M] if Mpad != M else out


def _int8_kernel_eligible(qw: QuantizedWeight) -> bool:
    if qw.q.ndim != 2:
        return False
    K, N = qw.q.shape
    return K % 256 == 0 and N % 128 == 0 and _on_tpu()


def _int8_local(x, q, scale, *, interpret: bool):
    """Per-shard dispatch for the SPMD wrapper (local shard shapes)."""
    K, N = q.shape
    if K % 256 == 0 and N % 128 == 0 and (_on_tpu() or interpret):
        return _int8_matmul_2d(x, q, scale, interpret=interpret)
    return x @ (q.astype(jnp.float32) * scale).astype(x.dtype)


@functools.lru_cache(maxsize=4)
def _spmd_int8(interpret: bool):
    """custom_partitioning wrapper for the int8 kernel — same
    all-column-parallel contract as ``_spmd_int4`` (N follows the weight's
    sharding; K replicated). int8 has no packing constraint on K, but the
    kernel accumulates over the whole K per output block, so K-sharding
    would need a psum epilogue — the column-parallel layout avoids any
    collective inside the matmul."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _positional(x, q, scale):
        return _int8_local(x, q, scale, interpret=interpret)

    fn = custom_partitioning(_positional)

    def _axes(arg_shapes):
        qspec = getattr(arg_shapes[1].sharding, "spec", PartitionSpec())
        n_ax = qspec[1] if len(qspec) > 1 else None
        xspec = getattr(arg_shapes[0].sharding, "spec", PartitionSpec())
        m_ax = xspec[0] if len(xspec) > 0 else None
        return m_ax, n_ax

    def partition(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return (
            mesh,
            _positional,
            NamedSharding(mesh, PartitionSpec(m_ax, n_ax)),
            (
                NamedSharding(mesh, PartitionSpec(m_ax, None)),
                NamedSharding(mesh, PartitionSpec(None, n_ax)),
                NamedSharding(mesh, PartitionSpec(None, n_ax)),
            ),
        )

    def infer(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(m_ax, n_ax))

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="m k, k n, o n -> m n",
        need_replication_factors=("k", "o"),
    )
    return fn


def int8_matmul(x, qw: QuantizedWeight, interpret: bool = False):
    """x [..., K] @ int8 weight [K, N] (per-output-channel scale)."""
    lead = x.shape[:-1]
    if qw.q.ndim == 2 and len(jax.devices()) > 1:
        out = _spmd_int8(bool(interpret))(
            x.reshape(-1, x.shape[-1]), qw.q,
            qw.scale.reshape(1, -1).astype(jnp.float32),
        )
        return out.reshape(*lead, out.shape[-1])
    if not (interpret or _int8_kernel_eligible(qw)):
        # XLA fallback: materializes the dequantized weight (correct but
        # 2x the weight traffic — the reason the kernel exists; the
        # round-1 "XLA fuses the dequant into the dot" claim was wrong)
        return x @ (qw.q.astype(jnp.float32) * qw.scale).astype(x.dtype)
    out = _int8_matmul_2d(
        x.reshape(-1, x.shape[-1]), qw.q,
        qw.scale.reshape(1, -1).astype(jnp.float32),
        interpret=interpret,
    )
    return out.reshape(*lead, out.shape[-1])


def w8a8_matmul(x, qw: QuantizedWeight):
    """Compute-bound W8A8: per-token int8 activations against the
    per-output-channel int8 weight, contracted on the int8 MXU (2x the
    bf16 FLOP rate on v5e, and half the weight bytes). Built for the
    FROZEN VISION TOWERS (five-crop encode, M ~ 1285 rows), where the
    bf16 towers are MXU-compute bound — the opposite regime from the
    bandwidth-bound decode the fused dequant kernels serve.

    Numerics: the int32 accumulation is exact (|a| <= 127, |w| <= 127,
    K <= 2^17 fits int32); only the activation rounding differs from
    dense — same envelope-gated opt-in contract as the W4A8 decode path.
    The epilogue is RANK-1 (a_scale [M,1] x w_scale [1,N]), one fused
    f32 elementwise per output tile at ANY M — unlike the W4A8 GROUP
    epilogue whose per-group partial scaling made prefill 1.077x slower.

    Plain XLA ops throughout (dot_general s8xs8->s32 maps to the MXU
    natively), so pjit shards it with zero custom-partitioning glue —
    the crop batch shards over the mesh, the weight stays replicated,
    matching ens5's tower sharding."""
    assert qw.bits == 8, "w8a8_matmul wants per-channel int8 weights"
    lead = x.shape[:-1]
    a, a_scale = quantize_act_int8(x.reshape(-1, x.shape[-1]))
    acc = jax.lax.dot_general(
        a, qw.q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = qw.scale.reshape(1, -1).astype(jnp.float32)
    out = (acc.astype(jnp.float32) * a_scale * w_scale).astype(x.dtype)
    return out.reshape(*lead, out.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _qmat_quant(bits, group, in_dim, k_chunks, x, q, scale):
    """Differentiable wrapper over the quantized dispatch: neither the
    Pallas kernels nor the SPMD ``custom_partitioning`` wrappers carry
    autodiff rules, but QLoRA training (reference main_finetune.py:172-210)
    needs d/dx through the frozen base matmul. Forward is the fused path
    unchanged; backward is ``g @ W_deq^T`` (the packed ints and scales get
    no cotangent — they are frozen by construction)."""
    qw = QuantizedWeight(q, scale, bits, group, in_dim, k_chunks)
    if bits == 8:
        return int8_matmul(x, qw)
    return int4_matmul(x, qw)


def _qmat_quant_fwd(bits, group, in_dim, k_chunks, x, q, scale):
    return _qmat_quant(bits, group, in_dim, k_chunks, x, q, scale), (q, scale)


def _qmat_quant_bwd(bits, group, in_dim, k_chunks, res, g):
    from a3vlm_tpu.quant import _dequantize_leaf

    q, scale = res
    w = _dequantize_leaf(
        QuantizedWeight(q, scale, bits, group, in_dim, k_chunks),
        dtype=g.dtype,
    )
    return g @ w.swapaxes(-1, -2), None, None


_qmat_quant.defvjp(_qmat_quant_fwd, _qmat_quant_bwd)


def qmat(x, w):
    """Quantization-aware linear: ``x @ w`` for dense ``w``; fused/fallback
    dequant-matmul for ``QuantizedWeight`` (bits inferred from the node);
    ``LoraWeight`` adds the rank-r side-path ``(x @ a) @ b`` around either
    base (the QLoRA forward — base gradients flow to ``x`` via the custom
    VJP above, never into the packed ints)."""
    if isinstance(w, LoraWeight):
        base = qmat(x, w.w)
        return base + (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
    if not isinstance(w, QuantizedWeight):
        return x @ w
    return _qmat_quant(w.bits, w.group, w.in_dim, w.k_chunks, x, w.q,
                       w.scale)
