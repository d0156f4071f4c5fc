"""Rotary position embeddings (RoPE), LLaMA interleaved-pair convention.

Rebuilds the upstream LLaMA2-Accessory helpers that the reference imports but
does not vendor (used at reference model/accessory/model/LLM/llama_ens5.py:30).

Convention: the head dim is viewed as ``dim//2`` adjacent (even, odd) pairs and
each pair is rotated as a complex number — the original Meta-LLaMA layout, NOT
the HuggingFace half-split layout. Checkpoint importers that ingest HF-format
weights must permute q/k projections accordingly (see checkpoint/torch_import).
"""

from __future__ import annotations

import jax.numpy as jnp


def precompute_freqs_cis(
    dim: int,
    end: int,
    theta: float = 10000.0,
    scaling: float | None = None,
) -> jnp.ndarray:
    """Precompute the rotary table.

    Returns ``[end, dim//2, 2]`` float32 where ``[..., 0]`` is cos and
    ``[..., 1]`` is sin. ``scaling`` applies linear position interpolation
    (position ``t`` becomes ``t / scaling``), matching the upstream
    ``rope_scaling`` float threaded through reference llama_ens5.py:271-274.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32)[: dim // 2] / dim)
    )
    t = jnp.arange(end, dtype=jnp.float32)
    if scaling is not None:
        t = t / float(scaling)
    freqs = jnp.outer(t, inv_freq)  # [end, dim//2]
    return jnp.stack([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def apply_rotary_emb(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    freqs_cis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q/k. ``xq``: [B, S, Hq, D], ``xk``: [B, S, Hk, D],
    ``freqs_cis``: [S, D//2, 2] (already sliced to the right positions), or
    [B, S, D//2, 2] for PER-BATCH positions (ragged continuous-batching
    decode, where each slot sits at its own absolute position).

    Rotation happens in float32 and is cast back to the input dtype, matching
    torch's complex64 math on bf16 inputs.
    """
    if freqs_cis.ndim == 4:  # [B, S, D//2, 2]
        cos = freqs_cis[..., 0][:, :, None, :]  # [B, S, 1, D//2]
        sin = freqs_cis[..., 1][:, :, None, :]
    else:
        cos = freqs_cis[..., 0][None, :, None, :]  # [1, S, 1, D//2]
        sin = freqs_cis[..., 1][None, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x_even = xf[..., 0::2]
        x_odd = xf[..., 1::2]
        out_even = x_even * cos - x_odd * sin
        out_odd = x_even * sin + x_odd * cos
        # re-interleave: [..., D//2, 2] -> [..., D]
        out = jnp.stack([out_even, out_odd], axis=-1)
        return out.reshape(x.shape).astype(x.dtype)

    return rot(xq), rot(xk)


def apply_rotary_emb_single(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """Rotate a single tensor [B, S, H, D] with freqs_cis [S, D//2, 2]."""
    out, _ = apply_rotary_emb(x, x, freqs_cis)
    return out
