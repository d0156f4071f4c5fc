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
the plain ``@``; int8 takes the XLA dequant-into-dot fusion (measured at
parity with bf16); int4 takes this kernel on TPU and an equivalent two-dot
XLA path elsewhere (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3vlm_tpu.quant import QuantizedWeight, unpack_int4


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


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def _int4_matmul_2d(x, q, scale, *, group: int, interpret: bool = False):
    """x [M, Kpad] (bf16/f32), q [Kpad/2, N] int8 packed, scale [Kpad/g, N]
    f32 -> [M, N] in x.dtype."""
    M, Kpad = x.shape
    half, N = q.shape
    assert Kpad == 2 * half, (x.shape, q.shape)

    # biggest K block that divides the packed rows wins (v5e, M=16:
    # BK 512 -> 238 GB/s, 1024 -> 347, 2048 -> 429 on the 11008-deep ffn)
    BK = next(b for b in (2048, 1024, 512) if half % b == 0)
    assert (BK % group == 0) and BK // group >= 8, (half, BK, group)
    BN = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    assert N % BN == 0, (N, BN)
    BM = min(256, -(-M // 16) * 16)
    Mpad = -(-M // BM) * BM
    if Mpad != M:
        x = jnp.pad(x, ((0, Mpad - M), (0, 0)))

    nm, nn, nk = Mpad // BM, N // BN, half // BK
    sg = BK // group  # scale rows per K step

    out = pl.pallas_call(
        functools.partial(_int4_kernel, group=group, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),           # x low half
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k + nk),
                         memory_space=pltpu.VMEM),           # x high half
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # packed weight
            pl.BlockSpec((sg, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),           # lo scales
            pl.BlockSpec((sg, BN), lambda i, j, k: (k + nk, j),
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


def _kernel_eligible(x, qw: QuantizedWeight) -> bool:
    if qw.q.ndim != 2:
        return False
    half, N = qw.q.shape
    g = qw.group
    return (
        half % 512 == 0
        and 512 % g == 0
        and 512 // g >= 8
        and N % 128 == 0
        and jax.devices()[0].platform == "tpu"
    )


def int4_matmul(x, qw: QuantizedWeight, interpret: bool = False):
    """x [..., K] @ int4-packed weight [Kpad, N] -> [..., N]."""
    Kpad = qw.q.shape[-2] * 2
    K = x.shape[-1]
    assert K == qw.in_dim, (K, qw.in_dim)
    if Kpad != K:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kpad - K)])
    if not (interpret or _kernel_eligible(x, qw)):
        return _int4_matmul_xla(x, qw)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, Kpad)
    out = _int4_matmul_2d(
        x2, qw.q, qw.scale, group=qw.group, interpret=interpret
    )
    return out.reshape(*lead, out.shape[-1])


def qmat(x, w):
    """Quantization-aware linear: ``x @ w`` for dense ``w``; fused/fallback
    dequant-matmul for ``QuantizedWeight`` (bits inferred from the node)."""
    if not isinstance(w, QuantizedWeight):
        return x @ w
    if w.bits == 8:
        # XLA fuses the int8 dequant into the dot's operand load; measured
        # at bf16 parity on v5e (CLAUDE.md quantized-decode table)
        return x @ (w.q.astype(jnp.float32) * w.scale).astype(x.dtype)
    return int4_matmul(x, w)
