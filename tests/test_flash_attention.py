"""Pallas flash-attention kernel parity vs the XLA reference, run in
interpreter mode on CPU (the kernel itself is exercised on real TPU by
bench.py and the TPU train/prefill paths)."""

from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops import flash_attention as fa
from a3vlm_tpu.ops.attention import sdpa_reference


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Force pallas interpret mode (no TPU in tests)."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_flash_equal_lengths_causal(hq, hkv):
    B, S, D = 2, 256, 32
    q = _rand((B, S, hq, D), 0)
    k = _rand((B, S, hkv, D), 1)
    v = _rand((B, S, hkv, D), 2)
    got = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    want = sdpa_reference(q, k, v, "causal")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_right_aligned_unequal():
    """The case CUDA flash-attn could NOT do (llama_ens5.py:131-141):
    q shorter than kv, aligned right."""
    B, Sq, Skv, H, D = 1, 128, 256, 2, 32
    q = _rand((B, Sq, H, D), 3)
    k = _rand((B, Skv, H, D), 4)
    v = _rand((B, Skv, H, D), 5)
    got = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    want = sdpa_reference(q, k, v, "causal")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_padded_lengths():
    """Non-block-multiple lengths go through the right-pad + actual-length
    masking path."""
    B, Sq, Skv, H, D = 1, 200, 200, 2, 32
    q = _rand((B, Sq, H, D), 6)
    k = _rand((B, Skv, H, D), 7)
    v = _rand((B, Skv, H, D), 8)
    got = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    assert got.shape == (B, Sq, H, D)
    want = sdpa_reference(q, k, v, "causal")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_padded_unequal_lengths():
    B, Sq, Skv, H, D = 1, 100, 300, 2, 32
    q = _rand((B, Sq, H, D), 9)
    k = _rand((B, Skv, H, D), 10)
    v = _rand((B, Skv, H, D), 11)
    got = fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    want = sdpa_reference(q, k, v, "causal")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_noncausal_padded():
    """Non-causal (ViT-style) attention with non-block-multiple lengths —
    padded kv columns must be masked."""
    B, S, H, D = 2, 257, 4, 32
    q = _rand((B, S, H, D), 12)
    k = _rand((B, S, H, D), 13)
    v = _rand((B, S, H, D), 14)
    got = fa.flash_attention(q, k, v, causal=False, block_q=128, block_k=128)
    want = sdpa_reference(q, k, v, mask=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_noncausal_vit_shape_single_block():
    """The ViT dispatch shape: S=257 non-causal through ONE padded 384
    block (the ops.attention auto route on TPU)."""
    B, S, H, D = 2, 257, 4, 32
    q = _rand((B, S, H, D), 15)
    k = _rand((B, S, H, D), 16)
    v = _rand((B, S, H, D), 17)
    got = fa.flash_attention(q, k, v, causal=False, block_q=384, block_k=384)
    want = sdpa_reference(q, k, v, mask=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_gradient_matches_xla():
    """The custom VJP (flash forward, XLA-recompute backward) matches full
    XLA gradients."""
    B, S, H, D = 1, 256, 2, 32
    q = _rand((B, S, H, D), 20)
    k = _rand((B, S, H, D), 21)
    v = _rand((B, S, H, D), 22)

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, True, 128, 128) ** 2).sum()

    def loss_xla(q, k, v):
        return (sdpa_reference(q, k, v, "causal") ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.parametrize("hq,hkv,sq,skv", [
    (4, 2, 256, 256),      # GQA
    (2, 2, 200, 200),      # padded
    (2, 2, 128, 384),      # right-aligned unequal
    (2, 1, 100, 300),      # GQA + padded + unequal
])
def test_flash_gradient_variants(hq, hkv, sq, skv):
    B, D = 1, 32
    q = _rand((B, sq, hq, D), 30)
    k = _rand((B, skv, hkv, D), 31)
    v = _rand((B, skv, hkv, D), 32)

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, True, 128, 128) ** 2).sum()

    def loss_xla(q, k, v):
        return (sdpa_reference(q, k, v, "causal") ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
