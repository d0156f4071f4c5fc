"""Attention ops with the reference's mask semantics.

Mask contract (reference model/accessory/model/LLM/llama_ens5.py:97-185):

- ``"causal"``: each query attends to all keys appearing no later than itself,
  with query and key sequences **aligned on the right** when lengths differ
  (generation with a KV cache): query row ``i`` (of ``q_len``) may attend key
  column ``j`` (of ``kv_len``) iff ``i - q_len >= j - kv_len``.
- ``None``: full attention (used for single-token decode where causality is
  trivial).
- boolean array: True = attend.

Softmax runs in float32 regardless of input dtype. GQA KV-head repeat follows
the upstream ``repeat_kv`` the reference imports (llama_ens5.py:30) — here it
is a broadcast inside the einsum instead of a materialized repeat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def right_aligned_causal_mask(q_len: int, kv_len: int) -> jnp.ndarray:
    """Boolean [q_len, kv_len]; True = may attend. Mirrors
    reference llama_ens5.py:181-185 (``_make_causal_mask``)."""
    q_idx = jnp.arange(q_len)[:, None] - q_len
    kv_idx = jnp.arange(kv_len)[None, :] - kv_len
    return q_idx >= kv_idx


def sdpa_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | str | None = None,
    kv_valid_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """XLA scaled-dot-product attention.

    q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D] with Hq % Hkv == 0.
    ``kv_valid_len``: optional [B] int — keys at index >= valid_len are masked
    (for fixed-size KV caches where only a prefix is populated). When set, the
    "right-aligned" reference point is ``kv_valid_len``, not the padded Skv.
    Returns [B, Sq, Hq, D].
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv

    qf = q.astype(jnp.float32) * (D ** -0.5)
    kf = k.astype(jnp.float32)
    # [B, Hkv, group, Sq, Skv]
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        qf.reshape(B, Sq, Hkv, group, D),
        kf,
    )

    if isinstance(mask, str):
        if mask != "causal":
            raise NotImplementedError(mask)
        if kv_valid_len is None:
            m = right_aligned_causal_mask(Sq, Skv)[None, None, None]
        else:
            # query i's absolute position = valid_len - Sq + i;
            # key j attends iff j <= that position.
            q_pos = kv_valid_len[:, None] - Sq + jnp.arange(Sq)[None, :]  # [B, Sq]
            m = (jnp.arange(Skv)[None, None, :] <= q_pos[:, :, None])[
                :, None, None
            ]  # [B,1,1,Sq,Skv]
    elif mask is None:
        if kv_valid_len is None:
            m = None
        else:
            m = (jnp.arange(Skv)[None, :] < kv_valid_len[:, None])[
                :, None, None, None
            ]  # [B,1,1,1,Skv]
    else:
        m = mask.astype(bool)
        while m.ndim < 5:
            m = m[None]

    if m is not None:
        scores = jnp.where(m, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v.astype(jnp.float32))
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def _mask_5d(mask, kv_valid_len, B, Sq, Skv):
    """Resolve the mask contract to a broadcastable [B,1,1,Sq,Skv]-ish bool
    (or None). Shared by the reference and fast SDPA paths."""
    if isinstance(mask, str):
        if mask != "causal":
            raise NotImplementedError(mask)
        if kv_valid_len is None:
            return right_aligned_causal_mask(Sq, Skv)[None, None, None]
        # query i's absolute position = valid_len - Sq + i;
        # key j attends iff j <= that position.
        q_pos = kv_valid_len[:, None] - Sq + jnp.arange(Sq)[None, :]
        return (jnp.arange(Skv)[None, None, :] <= q_pos[:, :, None])[
            :, None, None
        ]
    if mask is None:
        if kv_valid_len is None:
            return None
        return (jnp.arange(Skv)[None, :] < kv_valid_len[:, None])[
            :, None, None, None
        ]
    m = mask.astype(bool)
    while m.ndim < 5:
        m = m[None]
    return m


def sdpa_fast(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | str | None = None,
    kv_valid_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SDPA tuned for TPU bf16 inputs: matmuls keep the input dtype (full
    MXU rate; the f32 cast of ``sdpa_reference`` runs at 1/8 rate and, on
    the decode path, doubles the KV-cache HBM traffic). Scores/softmax are
    f32 via ``preferred_element_type``; same mask semantics as
    ``sdpa_reference``."""
    B, Sq, Hq, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        q.reshape(B, Sq, Hkv, group, D),
        k,
        preferred_element_type=jnp.float32,
    ) * (D ** -0.5)
    m = _mask_5d(mask, kv_valid_len, B, Sq, Skv)
    if m is not None:
        scores = jnp.where(m, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | str | None = None,
    kv_valid_len: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash kernel on TPU for the causal
    equal/right-aligned cases (the reference's flash_attn dispatch rule,
    llama_ens5.py:142-148, generalized — our kernel also covers the
    right-aligned unequal-length case flash_attn could not), XLA otherwise.
    """
    # measured on v5e: the Pallas kernel wins for causal sequences >= ~512
    # (35 TF/s vs 11 TF/s XLA at S=2048, 1024x1024 blocks with bf16 matmul
    # inputs); XLA's fused attention wins at ViT-scale short non-causal
    # sequences — routing the 257-token towers through the kernel was
    # MEASURED SLOWER (537 vs 659 img/s batch-16 CLIP-L: head_dim 64 fills
    # half the MXU contraction and the (B*H)-program grid is launch-heavy),
    # so only causal dispatches to the kernel.
    is_causal = isinstance(mask, str) and mask == "causal"
    use_flash = impl == "flash" or (
        impl == "auto"
        and _tpu_available()
        and kv_valid_len is None
        and q.shape[1] >= 512
        and is_causal
    )
    if use_flash:
        from a3vlm_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=is_causal)
    if (
        impl == "auto"
        and q.dtype != jnp.float32
        and k.dtype == q.dtype
    ):
        # bf16 inputs take the full-MXU-rate path (decode caches, ViT
        # towers); f32 runs (CPU golden tests) keep the exact-reference
        # f32 math below
        return sdpa_fast(q, k, v, mask=mask, kv_valid_len=kv_valid_len)
    return sdpa_reference(q, k, v, mask=mask, kv_valid_len=kv_valid_len)
