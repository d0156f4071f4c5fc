"""W4A8 int-dot decode matmul: the Pallas kernel (interpret mode), the XLA
emulation, and the numerics bound vs the exact bf16-dequant path.

W4A8 is OPT-IN (quant_matmul.W4A8_DECODE, trace-time): activations round
to per-token int8, so outputs are NOT bit-equal to the serving default —
these tests pin (a) kernel == emulation, (b) the quantization error stays
within the per-token-int8 envelope on gaussian data, (c) the dispatcher
routes only small-M (decode) matmuls."""

import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.ops import quant_matmul as qm
from a3vlm_tpu.ops.quant_matmul import (
    _int4_matmul_2d_w4a8,
    _int4_matmul_xla,
    _int4_w4a8_xla,
    int4_matmul,
    quantize_act_int8,
)
from a3vlm_tpu.quant import _quantize_leaf_int4


def _rand(m, k, seed=0, scale=1.0):
    return (np.random.default_rng(seed).normal(size=(m, k)) * scale
            ).astype(np.float32)


def test_quantize_act_int8_roundtrip():
    x = jnp.asarray(_rand(4, 256, seed=1))
    q, s = quantize_act_int8(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 1)
    deq = q.astype(jnp.float32) * s
    # absmax/127 symmetric quantization: error <= scale/2 per element
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()
    # the row absmax is representable exactly
    np.testing.assert_allclose(
        np.abs(np.asarray(deq)).max(-1), np.abs(np.asarray(x)).max(-1),
        rtol=1e-6,
    )


def test_w4a8_kernel_interpret_matches_emulation():
    w = _rand(2048, 256, seed=3)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand(5, 2048, seed=4))
    ref = np.asarray(_int4_w4a8_xla(x, qw))
    got = np.asarray(
        _int4_matmul_2d_w4a8(x, qw.q, qw.scale, group=qw.group,
                             interpret=True)
    )
    # both accumulate exact integer group partials in f32; only the f32
    # group-sum order differs
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_w4a8_error_envelope_vs_exact_path():
    """The A8 rounding must stay within the analytic per-token-int8
    envelope: |w4a8 - exact| <= sum_k |dequant_w[k, n]| * (xs/2), i.e.
    half an activation quantization step through the dequantized weight's
    L1 column norms."""
    w = _rand(2048, 256, seed=5)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand(8, 2048, seed=6))
    exact = np.asarray(_int4_matmul_xla(x, qw))
    got = np.asarray(_int4_w4a8_xla(x, qw))
    from a3vlm_tpu.quant import dequantize_params

    wd = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    _, xs = quantize_act_int8(x)
    bound = np.abs(wd).sum(0)[None, :] * (np.asarray(xs) / 2) + 1e-4
    assert (np.abs(got - exact) <= bound).all()
    # and in aggregate it is much tighter than the worst case (rounding
    # errors are zero-mean): relative RMS under 1%
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.01, rel


def test_w4a8_dispatcher_routes_small_m_only(monkeypatch):
    w = _rand(2048, 256, seed=7)
    qw = _quantize_leaf_int4(w)
    small = jnp.asarray(_rand(4, 2048, seed=8))
    large = jnp.asarray(_rand(64, 2048, seed=9))
    # the W4A8 branch lives on the single-device path (under SPMD the
    # knob is ignored — multichip decode stays exact); tests run on the
    # forced 8-device CPU mesh, so pin the dispatcher's device count
    import jax

    real_devices = jax.devices
    monkeypatch.setattr(jax, "devices",
                        lambda *a: real_devices(*a)[:1])
    exact_small = np.asarray(int4_matmul(small, qw, interpret=True))
    exact_large = np.asarray(int4_matmul(large, qw, interpret=True))
    qm.W4A8_DECODE = True
    try:
        got_small = np.asarray(int4_matmul(small, qw, interpret=True))
        got_large = np.asarray(int4_matmul(large, qw, interpret=True))
    finally:
        qm.W4A8_DECODE = False
    # large M (prefill) is untouched by the knob
    np.testing.assert_array_equal(got_large, exact_large)
    # small M routed through W4A8: close to, but not equal to, exact
    assert not np.array_equal(got_small, exact_small)
    ref = np.asarray(_int4_w4a8_xla(small, qw))
    np.testing.assert_allclose(got_small, ref, rtol=1e-4, atol=1e-4)


def test_w4a8_flag_honored_on_xla_fallback(monkeypatch):
    """Off-TPU (or kernel-ineligible shapes) the dispatcher routes
    kernel-path matmuls through _int4_matmul_xla; with W4A8_DECODE set the
    same route must apply the W4A8 math via the XLA emulation so the flag
    means the same thing on every backend (eval CLI --w4a8 smoke runs on
    CPU)."""
    import jax

    w = _rand(2048, 256, seed=12)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand(4, 2048, seed=13))
    real_devices = jax.devices
    monkeypatch.setattr(jax, "devices", lambda *a: real_devices(*a)[:1])
    # interpret=False on CPU -> _kernel_eligible is False -> XLA fallback
    exact = np.asarray(int4_matmul(x, qw))
    qm.W4A8_DECODE = True
    try:
        got = np.asarray(int4_matmul(x, qw))
    finally:
        qm.W4A8_DECODE = False
    assert not np.array_equal(got, exact)
    ref = np.asarray(_int4_w4a8_xla(x, qw))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_w4a8_bf16_activations():
    w = _rand(1024, 128, seed=10)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand(3, 1024, seed=11)).astype(jnp.bfloat16)
    ref = np.asarray(_int4_w4a8_xla(x, qw)).astype(np.float32)
    got = np.asarray(
        _int4_matmul_2d_w4a8(x, qw.q, qw.scale, group=qw.group,
                             interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
