"""Batched non-causal attention kernel for ViT-scale shapes (S=257,
D=64) — the encoder attention of llama_ens5.py:352-375's towers.

Round-2 finding (PERFORMANCE.md): routing the 257-token attention through
the flash kernel was SLOWER than XLA — head_dim 64 half-fills the MXU
contraction and the (B*H)-grid is launch-bound at 4-cell occupancy. This
kernel attacks the two costs that remain with XLA instead:

- the f32 score tensor round-trips HBM in the XLA lowering (measured:
  negative batch scaling on encode); here scores live and die in VMEM.
- one grid step per (image, head-chunk) — heads are BATCHED inside the
  kernel via dot_general batch dims, so a 16-head tower launches 2 steps
  per image instead of 16.

The D=64 half-lane MXU utilization is structural (per-head scores are
independent 64-deep contractions; no packing of two heads into one
128-lane contraction exists that does not mix their scores) — but encode
is not FLOP-bound, so the HBM savings is what matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [HC, S, D] bf16
    k = k_ref[0]
    v = v_ref[0]
    # per-head scores: batch over the head chunk, contract D
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [HC, S, S] f32, VMEM-resident
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [HC, S, D]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vit_attention(q, k, v, interpret: bool = False):
    """q, k, v [B, S, H, D] (the bshd layout _vit_block produces) ->
    [B, S, H, D]. Non-causal, full attention, softmax over all S keys."""
    B, S, H, D = q.shape
    HC = H if H <= 8 else next(c for c in (8, 4, 2, 1) if H % c == 0)
    scale = 1.0 / (D ** 0.5)

    def bhsd(x):
        return x.transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B, H // HC),
        in_specs=[
            pl.BlockSpec((1, HC, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HC, S, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=4 * B * H * S * D * 2,
            transcendentals=B * H * S * S,
        ),
        interpret=interpret,
    )(bhsd(q), bhsd(k), bhsd(v))
    return out.transpose(0, 2, 1, 3)


def vit_attention_eligible(q_shape, dtype) -> bool:
    """bshd [B, S, H, D]: the kernel wants bf16 operands on TPU; S and D
    are unconstrained (Mosaic masks the 257/64 register padding).

    B >= 8: the on-chip A/B won at batch 16 (1.01x) and 64 (1.19x), but
    the ens5 five-crop tower batch is B=5 and routing IT through the
    kernel cost the triad leg's towers 108.6 -> 150.4 ms (the (B*H)-
    program grid is launch-heavy at small B) — small batches stay on
    XLA sdpa."""
    B, S, H, D = q_shape
    return (
        dtype != jnp.float32
        and B >= 8
        and S <= 1024  # scores [HC, S, S] f32 must fit VMEM
        and jax.devices()[0].platform == "tpu"
    )
