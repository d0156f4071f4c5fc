"""W8A8 prefill matmul: in-VMEM scale-folded int8 weights + per-token int8
activations on the int8 MXU (quant_matmul._int4_kernel_w8a8p).

W8A8_PREFILL is OPT-IN (trace-time): outputs are NOT bit-equal to the exact
dequant kernels (activation int8 rounding + the per-column weight requant).
These tests pin (a) kernel == XLA emulation bit-for-bit (both integer
accumulation), (b) the combined error envelope vs the exact int4 path on
gaussian data, (c) the dispatcher routes only large-M (prefill) matmuls and
leaves decode untouched."""

import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.ops import quant_matmul as qm
from a3vlm_tpu.ops.quant_matmul import (
    _int4_matmul_2d_w8a8p,
    _int4_matmul_xla,
    _int4_w8a8p_xla,
    int4_matmul,
)
from a3vlm_tpu.quant import _quantize_leaf_int4


def _rand(m, k, seed=0, scale=1.0):
    return (np.random.default_rng(seed).normal(size=(m, k)) * scale
            ).astype(np.float32)


def _grid_acts(m, k, seed=0):
    """Activations already ON the per-row int8 grid (integer entries, row
    absmax exactly 127): quantize_act_int8 is then bit-stable across
    jit/eager boundaries. With gaussian data a near-half-step element can
    legitimately round differently under XLA's fused division (observed:
    1 LSB flip on 1 element in 300x2048), so bit-exact kernel==emulation
    comparisons use grid activations and gaussian data keeps envelope
    (statistical) assertions only."""
    x = np.random.default_rng(seed).integers(
        -127, 128, size=(m, k)
    ).astype(np.float32)
    x[:, 0] = 127.0
    return x


def test_w8a8p_kernel_interpret_matches_emulation():
    w = _rand(2048, 256, seed=3)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_grid_acts(300, 2048, seed=4))
    ref = np.asarray(_int4_w8a8p_xla(x, qw))
    got = np.asarray(
        _int4_matmul_2d_w8a8p(x, qw.q, qw.scale, group=qw.group,
                              interpret=True)
    )
    # both accumulate in int32 and apply the identical rank-1 epilogue:
    # the integer parts are bit-equal, the f32 epilogue is elementwise
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_w8a8p_requant_stays_in_int8_range():
    """|w8| <= 127 with no clip: q in [-8, 7], s/smax <= 1, factor 15.875.
    Exercise the extreme: a weight matrix with one dominant group so the
    ratio spread is maximal."""
    w = _rand(1024, 128, seed=5)
    w[:64] *= 100.0  # one group dominates its columns
    qw = _quantize_leaf_int4(w)
    from a3vlm_tpu.quant import unpack_int4

    lo, hi = unpack_int4(qw.q)
    smax = np.maximum(
        np.asarray(qw.scale, np.float32).max(0, keepdims=True), 1e-30
    )
    # the production association: scale * (15.875/smax) in f32
    r = (np.asarray(qw.scale, np.float32)
         * (np.float32(15.875) / smax)).astype(np.float32)
    g = qw.group
    half = qw.q.shape[-2]
    w8lo = np.round(
        np.asarray(lo, np.float32) * np.repeat(r[: half // g], g, 0)
    )
    w8hi = np.round(
        np.asarray(hi, np.float32) * np.repeat(r[half // g:], g, 0)
    )
    assert np.abs(w8lo).max() <= 127 and np.abs(w8hi).max() <= 127


def test_w8a8p_error_envelope_vs_exact_path():
    """Combined A8 + weight-requant error: per-element the requant moves a
    weight by at most smax[n]/31.75, so
    |w8a8p - exact| <= (L1col(w_deq) * xs/2) + (K * xmax * smax/31.75)
    — activation rounding through the weight plus weight rounding through
    the activations. In aggregate (zero-mean rounding) relative RMS < 1%."""
    w = _rand(2048, 256, seed=6)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand(300, 2048, seed=7))
    exact = np.asarray(_int4_matmul_xla(x, qw))
    got = np.asarray(_int4_w8a8p_xla(x, qw))
    from a3vlm_tpu.ops.quant_matmul import quantize_act_int8
    from a3vlm_tpu.quant import dequantize_params

    wd = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    _, xs = quantize_act_int8(x)
    xs = np.asarray(xs)
    smax = np.maximum(np.asarray(qw.scale).max(0, keepdims=True), 1e-30)
    xabs = np.abs(np.asarray(x)).sum(-1, keepdims=True)
    bound = (
        np.abs(wd).sum(0)[None, :] * (xs / 2)
        + xabs * (smax / 31.75)
        + (xs / 2) * wd.shape[0] * (smax / 31.75)
        + 1e-4
    )
    assert (np.abs(got - exact) <= bound).all()
    # A8 rounding + weight requant: ~2x the W4A8 (A8-only) variance on
    # gaussian data; the full-model logit gate is scripts/w8a8_prefill
    # accuracy (run on-chip at production scale)
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_w8a8p_dispatcher_routes_large_m_only(monkeypatch):
    w = _rand(2048, 256, seed=8)
    qw = _quantize_leaf_int4(w)
    small = jnp.asarray(_grid_acts(4, 2048, seed=9))
    large = jnp.asarray(_grid_acts(300, 2048, seed=10))
    import jax

    real_devices = jax.devices
    monkeypatch.setattr(jax, "devices", lambda *a: real_devices(*a)[:1])
    exact_small = np.asarray(int4_matmul(small, qw, interpret=True))
    exact_large = np.asarray(int4_matmul(large, qw, interpret=True))
    qm.W8A8_PREFILL = True
    try:
        got_small = np.asarray(int4_matmul(small, qw, interpret=True))
        got_large = np.asarray(int4_matmul(large, qw, interpret=True))
    finally:
        qm.W8A8_PREFILL = False
    # small M (decode) is untouched by the knob
    np.testing.assert_array_equal(got_small, exact_small)
    # large M routed through W8A8: close to, but not equal to, exact
    assert not np.array_equal(got_large, exact_large)
    ref = np.asarray(_int4_w8a8p_xla(large, qw))
    np.testing.assert_allclose(got_large, ref, rtol=1e-6, atol=1e-6)


def test_w8a8p_flag_honored_on_xla_fallback(monkeypatch):
    """Off-TPU the dispatcher's kernel-ineligible route must apply the same
    W8A8 math via the emulation (eval CLI --w8a8_prefill smoke on CPU)."""
    import jax

    w = _rand(2048, 256, seed=11)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_grid_acts(300, 2048, seed=12))
    real_devices = jax.devices
    monkeypatch.setattr(jax, "devices", lambda *a: real_devices(*a)[:1])
    exact = np.asarray(int4_matmul(x, qw))
    qm.W8A8_PREFILL = True
    try:
        got = np.asarray(int4_matmul(x, qw))
    finally:
        qm.W8A8_PREFILL = False
    assert not np.array_equal(got, exact)
    ref = np.asarray(_int4_w8a8p_xla(x, qw))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_w8a8p_bf16_activations_and_odd_m():
    """bf16 inputs + an M that needs padding to the BM grid."""
    w = _rand(1024, 128, seed=13)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_grid_acts(261, 1024, seed=14)).astype(jnp.bfloat16)
    ref = np.asarray(_int4_w8a8p_xla(x, qw)).astype(np.float32)
    got = np.asarray(
        _int4_matmul_2d_w8a8p(x, qw.q, qw.scale, group=qw.group,
                              interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
