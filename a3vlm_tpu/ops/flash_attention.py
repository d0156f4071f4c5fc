"""Pallas TPU flash-attention kernel (TPU-native replacement for the CUDA
``flash_attn`` the reference dispatches to at llama_ens5.py:142-149).

Blockwise online-softmax attention:

- grid = (batch, q_heads, q_blocks, kv_blocks); the kv dimension is innermost
  so the f32 running (max, sum, acc) scratch carries across kv steps.
- right-aligned causal masking (query row i of Sq attends key j of Skv iff
  ``i - Sq >= j - Skv``), the semantics of llama_ens5.py:181-185 — this also
  covers prefill-with-cache, which CUDA flash-attn could not (llama_ens5.py
  :131-141 comment).
- GQA: kv heads indexed as ``h // (Hq // Hkv)`` directly in the BlockSpec
  index map — no materialized repeat_kv.
- fully-masked kv blocks are skipped via ``pl.when`` (compute predicated off).

Layout: q [B, Hq, Sq, D], k/v [B, Hkv, Skv, D]. f32 accumulation, inputs may
be bf16. Head dim is padded to a lane multiple by the caller if needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = 1.4426950408889634  # scores are kept in base-2 domain inside the
# kernels: exp(x) = exp2(x * log2 e), and exp2 is materially cheaper on the
# VPU — the kernel is VPU-bound (softmax over [bq, bk] f32), not MXU-bound


def _block_mask(q_start, k_start, *, causal, block_q, block_k, offset,
                skv, skv_actual):
    """Classify one (q, k) block for the fwd/bwd kernels — this subtle
    logic lives exactly once.

    Returns ``(visible, need_mask, apply)``:
    - ``visible``: traced bool — causal blocks strictly beyond the last
      visible column are skipped entirely.
    - ``need_mask``: traced bool, or None when no block ever needs masking.
      The iota/compare/where chain costs ~4 VPU ops per score element, so
      only blocks the causal diagonal or kv-padding edge actually crosses
      take it; interior blocks run bare.
    - ``apply``: masks a [block_q, block_k] score block to the right-aligned
      causal + padded-kv semantics (llama_ens5.py:181-185).
    """
    if causal:
        visible = k_start <= q_start + block_q - 1 + offset
    else:
        visible = k_start >= 0  # always true, but traced
    diag = k_start + block_k - 1 > q_start + offset if causal else False
    edge = k_start + block_k > skv_actual if skv_actual != skv else False
    if causal and skv_actual != skv:
        need = diag | edge
    elif causal:
        need = diag
    elif skv_actual != skv:
        need = edge
    else:
        need = None

    def apply(s):
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        allowed = (
            (q_start + rows + offset) >= (k_start + cols)
            if causal
            else rows >= 0
        )
        if skv_actual != skv:
            allowed &= (k_start + cols) < skv_actual
        return jnp.where(allowed, s, _NEG_INF)

    return visible, need, apply


def _emit_masked(visible, need, apply, compute):
    """Emit the pl.when branches: ``compute(mask_fn_or_None)`` runs under a
    masked branch for diagonal/edge blocks and a bare branch otherwise."""
    if need is None:

        @pl.when(visible)
        def _plain():
            compute(None)

    else:

        @pl.when(visible & need)
        def _masked():
            compute(apply)

        @pl.when(visible & jnp.logical_not(need))
        def _bare():
            compute(None)


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    sq: int,
    skv: int,
    sq_actual: int,
    skv_actual: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # right-aligned causal over the ACTUAL (pre-padding) lengths: q row r
    # attends kv col c iff r - sq_actual >= c - skv_actual; padded kv columns
    # (c >= skv_actual) are masked for every row
    offset = skv_actual - sq_actual
    visible, need, apply = _block_mask(
        qi * block_q, ki * block_k, causal=causal, block_q=block_q,
        block_k=block_k, offset=offset, skv=skv, skv_actual=skv_actual,
    )

    def _update(s):
        # s: [block_q, block_k] f32, base-2 domain (pre-multiplied by log2 e)
        m_prev = m_scr[:, :1]  # [block_q, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)  # [block_q, 1]
        p = jnp.exp2(s - m_new)  # [block_q, block_k]

        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),  # bf16 p for full MXU rate
            v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, D]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    def _scores():
        # keep matmul inputs in their native (bf16) dtype for full MXU rate;
        # accumulate in f32 via preferred_element_type. The softmax scale is
        # folded into q ([bq, D] — 1/8 the elements of scaling the [bq, bk]
        # score matrix; the kernel is VPU-bound)
        q = (
            q_ref[0, 0].astype(jnp.float32) * (sm_scale * _LOG2E)
        ).astype(q_ref.dtype)
        return jax.lax.dot_general(
            q,
            k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k] f32, base-2 domain

    def _compute(mask_fn):
        s = _scores()
        _update(mask_fn(s) if mask_fn is not None else s)

    _emit_masked(visible, need, apply, _compute)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        # guard fully-masked rows (can only happen with pathological inputs)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # natural-log lse (the backward contract): m is base-2
            lse = m_scr[:, :1] * float(1.0 / _LOG2E) + jnp.log(l)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref[0, 0].shape)


def _no_lse_kernel_adapter(kernel, q_ref, k_ref, v_ref, o_ref, *scratch):
    kernel(q_ref, k_ref, v_ref, o_ref, None, *scratch)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "sq_actual",
                     "skv_actual", "return_lse"),
)
def flash_attention_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    block_q: int = 1024,
    block_k: int = 1024,
    sq_actual: int | None = None,
    skv_actual: int | None = None,
    return_lse: bool = False,
):
    """q: [B, Hq, Sq, D]; k, v: [B, Hkv, Skv, D] -> [B, Hq, Sq, D].
    ``sq_actual``/``skv_actual``: real lengths when the inputs are
    right-padded to block multiples."""
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    block_q = min(block_q, Sq)
    block_k = min(block_k, Skv)
    if Sq % block_q or Skv % block_k:
        raise ValueError(
            f"seq lens must divide block sizes: {Sq=} {block_q=} {Skv=} {block_k=}"
        )

    grid = (B, Hq, Sq // block_q, Skv // block_k)

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=D ** -0.5,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        sq=Sq,
        skv=Skv,
        sq_actual=sq_actual or Sq,
        skv_actual=skv_actual or Skv,
    )
    if not return_lse:
        kernel = functools.partial(_no_lse_kernel_adapter, kernel)

    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, D),
            lambda b, h, qi, ki: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if return_lse:
        # trailing tile of 8 so the block shape satisfies the TPU layout
        # rule (last two dims divisible by (8, 128) or equal to the array)
        out_shape.append(jax.ShapeDtypeStruct((B, Hq, Sq, 8), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, 8),
                lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            )
        )

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D),
                lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Skv * D * (0.5 if causal else 1.0)),
            bytes_accessed=int(
                (q.size + k.size + v.size + q.size) * q.dtype.itemsize
            ),
            transcendentals=int(B * Hq * Sq * Skv),
        ),
    )(q, k, v)
    return tuple(result) if return_lse else result[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Convenience wrapper taking model-layout [B, S, H, D] tensors.

    Sequences that do not divide the block sizes are RIGHT-padded; the
    kernel masks with the actual lengths (padded kv columns never attended,
    padded q rows sliced away).

    Differentiable: the backward pass recomputes attention with the XLA
    reference and differentiates that (numerically identical math; the
    fused Pallas backward kernel is a planned upgrade — the XLA backward
    materializes the score matrix, so training memory is bounded by
    remat granularity)."""
    return _flash_attention_fwd_impl(q, k, v, causal, block_q, block_k)


def _flash_attention_fwd_impl(q, k, v, causal, block_q, block_k):
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    bq = min(block_q, max(Sq, 1))
    bk = min(block_k, max(Skv, 1))
    pad_q = (-Sq) % bq
    pad_k = (-Skv) % bk
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    out = flash_attention_bhsd(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=causal,
        block_q=bq,
        block_k=bk,
        sq_actual=Sq,
        skv_actual=Skv,
    )
    out = out.transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :Sq]
    return out




# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *,
    sm_scale, causal, block_q, block_k, sq_actual, skv_actual, skv,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    offset = skv_actual - sq_actual
    visible, need, apply = _block_mask(
        qi * block_q, ki * block_k, causal=causal, block_q=block_q,
        block_k=block_k, offset=offset, skv=skv, skv_actual=skv_actual,
    )

    def _update(p):
        k = k_ref[0, 0]
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, :1]) * sm_scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _scores():
        # base-2 domain; p = exp2(s2 - lse * log2 e)
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (sm_scale * _LOG2E)

    def _lse2():
        return lse_ref[0, 0][:, :1] * _LOG2E

    def _compute(mask_fn):
        s = _scores()
        if mask_fn is not None:
            s = mask_fn(s)
        _update(jnp.exp2(s - _lse2()))

    _emit_masked(visible, need, apply, _compute)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *,
    sm_scale, causal, block_q, block_k, sq_actual, skv_actual, skv,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    offset = skv_actual - sq_actual
    # same classification as the fwd kernel: a kv block gets gradient only
    # from q rows that can see it (the visibility inequality is symmetric)
    visible, need, apply = _block_mask(
        qi * block_q, ki * block_k, causal=causal, block_q=block_q,
        block_k=block_k, offset=offset, skv=skv, skv_actual=skv_actual,
    )

    def _update(p):
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, :1]) * sm_scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _scores():
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (sm_scale * _LOG2E)

    def _lse2():
        return lse_ref[0, 0][:, :1] * _LOG2E

    def _compute(mask_fn):
        s = _scores()
        if mask_fn is not None:
            s = mask_fn(s)
        _update(jnp.exp2(s - _lse2()))

    _emit_masked(visible, need, apply, _compute)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "sq_actual",
                     "skv_actual"),
)
def _flash_backward_bhsd(
    q, k, v, do, lse, delta, causal, block_q, block_k, sq_actual, skv_actual
):
    """All inputs [B, H*, S*, D] (+ lse/delta [B, Hq, Sq, 8]); returns
    (dq [B,Hq,Sq,D], dk_per_qhead [B,Hq,Skv,D], dv_per_qhead) — GQA group
    reduction happens in the caller."""
    B, Hq, Sq, D = q.shape
    Skv = k.shape[2]
    group = Hq // k.shape[1]
    nq, nk = Sq // block_q, Skv // block_k

    common = dict(
        sm_scale=D ** -0.5, causal=causal, block_q=block_q, block_k=block_k,
        sq_actual=sq_actual, skv_actual=skv_actual, skv=Skv,
    )
    q_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec_q = pl.BlockSpec(
        (1, 1, block_k, D),
        lambda b, h, i, j, g=group: (b, h // g, j, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 8), lambda b, h, i, j: (b, h, i, 0),
        memory_space=pltpu.VMEM,
    )

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(B, Hq, nq, nk),
        in_specs=[q_spec, kv_spec_q, kv_spec_q, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, do, lse, delta)

    # dk/dv: grid over kv blocks, q innermost
    q_spec_t = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    kv_spec_t = pl.BlockSpec(
        (1, 1, block_k, D),
        lambda b, h, i, j, g=group: (b, h // g, i, 0),
        memory_space=pltpu.VMEM,
    )
    kv_out_spec = pl.BlockSpec(
        (1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec_t = pl.BlockSpec(
        (1, 1, block_q, 8), lambda b, h, i, j: (b, h, j, 0),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(B, Hq, nk, nq),
        in_specs=[q_spec_t, kv_spec_t, kv_spec_t, q_spec_t, row_spec_t,
                  row_spec_t],
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Skv, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Skv, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _flash_fwd(q, k, v, causal, block_q, block_k):
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    bq = min(block_q, max(Sq, 1))
    bk = min(block_k, max(Skv, 1))
    pad_q = (-Sq) % bq
    pad_k = (-Skv) % bk
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0))) if pad_q else q
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0))) if pad_k else k
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0))) if pad_k else v
    out, lse = flash_attention_bhsd(
        qp.transpose(0, 2, 1, 3), kp.transpose(0, 2, 1, 3),
        vp.transpose(0, 2, 1, 3), causal=causal, block_q=bq, block_k=bk,
        sq_actual=Sq, skv_actual=Skv, return_lse=True,
    )
    out = out.transpose(0, 2, 1, 3)
    if pad_q:
        out = out[:, :Sq]
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, residuals, g):
    """Pallas backward: dq / dk / dv kernels over the saved lse."""
    q, k, v, out, lse_padded = residuals
    B, Sq, Hq, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    bq = min(block_q, max(Sq, 1))
    bk = min(block_k, max(Skv, 1))
    pad_q = (-Sq) % bq
    pad_k = (-Skv) % bk

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, Hq, Sq]
    if pad_q:
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_q)))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))
    # lse from the forward is already padded-length; padded rows carry
    # garbage but their do is zero-padded below, so contributions vanish

    def padT(x, pad, axis1=1):
        if pad:
            cfg = [(0, 0)] * x.ndim
            cfg[axis1] = (0, pad)
            x = jnp.pad(x, cfg)
        return x.transpose(0, 2, 1, 3)

    dq, dk_h, dv_h = _flash_backward_bhsd(
        padT(q, pad_q), padT(k, pad_k), padT(v, pad_k), padT(g, pad_q),
        lse_padded, delta, causal, bq, bk, Sq, Skv,
    )
    dq = dq.transpose(0, 2, 1, 3)[:, :Sq]
    # GQA: sum grads over the q-head group for each kv head
    dk = dk_h.reshape(B, Hkv, group, Skv + pad_k, D).sum(2)
    dv = dv_h.reshape(B, Hkv, group, Skv + pad_k, D).sum(2)
    dk = dk.transpose(0, 2, 1, 3)[:, :Skv].astype(k.dtype)
    dv = dv.transpose(0, 2, 1, 3)[:, :Skv].astype(v.dtype)
    return dq.astype(q.dtype), dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)
