"""Fused update+attend decode kernels vs the two-step path.

The fused op (ops/decode_attention.py decode_attention_update /
decode_attention_update_quant) must be EXACT against update_decode_cache +
the attention kernels: same bf16 write values, same attention math, and the
returned cache buffers must equal a DUS write (including every untouched
row — the cache outputs alias the inputs, so a wrong alias index or a
missed write-back tile shows up here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops import decode_attention as da


def _mk(S, B=2, Hkv=2, G=2, D=128, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), dtype)
    cache_k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), dtype)
    cache_v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), dtype)
    xk = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), dtype)
    xv = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), dtype)
    # ragged per-slot positions (the continuous-batching regime), one of
    # them in a partial-tile row and one at a block boundary
    pos = jnp.asarray([3, S - 1][:B], jnp.int32)
    return q, cache_k, cache_v, xk, xv, pos


@pytest.mark.parametrize("S", [16, 600])
def test_fused_matches_two_step_bf16(S):
    q, cache_k, cache_v, xk, xv, pos = _mk(S)
    valid = pos + 1

    B, _, Hq, D = q.shape
    Hkv = cache_k.shape[1]
    qg = q.reshape(B, Hkv, Hq // Hkv, D)
    nk = xk.transpose(0, 2, 1, 3).astype(cache_k.dtype)
    nv = xv.transpose(0, 2, 1, 3).astype(cache_v.dtype)
    out, k2, v2 = da._decode_update_impl(
        qg, cache_k, cache_v, nk, nv, pos, valid, interpret=True
    )

    ref_k, ref_v = da._update_decode_cache_ragged(
        cache_k, cache_v, xk, xv, pos
    )
    ref_out = da._decode_impl(
        qg, ref_k.astype(q.dtype), ref_v.astype(q.dtype), valid,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_v))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=1e-6, rtol=1e-6,
    )


@pytest.mark.parametrize("S", [16, 600])
def test_fused_matches_two_step_q8(S):
    q, cache_k, cache_v, xk, xv, pos = _mk(S, seed=1)
    valid = pos + 1
    B, _, Hq, D = q.shape
    Hkv = cache_k.shape[1]
    kq, ks = da.quantize_kv_tokens(
        jnp.zeros((B, S, Hkv, D), jnp.float32)
        .at[:]
        .set(np.random.default_rng(2).normal(size=(B, S, Hkv, D)))
    )
    vq, vs = da.quantize_kv_tokens(
        jnp.asarray(
            np.random.default_rng(3).normal(size=(B, S, Hkv, D)),
            jnp.float32,
        )
    )

    qg = q.reshape(B, Hkv, Hq // Hkv, D)
    nk = xk.transpose(0, 2, 1, 3)
    nv = xv.transpose(0, 2, 1, 3)
    out, k2, v2, ks2, vs2 = da._decode_update_impl_q8(
        qg, kq, vq, ks, vs, nk, nv, pos, valid, interpret=True
    )

    rk, rv = da._update_decode_cache_ragged(
        da.QuantizedKV(kq, ks), da.QuantizedKV(vq, vs), xk, xv, pos
    )
    ref_out = da._decode_impl_q8(
        qg, rk.qv, rv.qv, rk.scale, rv.scale, valid, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(rk.qv))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(rv.qv))
    np.testing.assert_allclose(
        np.asarray(ks2), np.asarray(rk.scale), atol=1e-7, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vs2), np.asarray(rv.scale), atol=1e-7, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_dispatcher_routes_and_matches():
    """update_and_attend_decode_cache(interpret=True) takes the fused path
    (bhsd, single token, mask None) and equals the two-step helpers."""
    S = 24
    q, cache_k, cache_v, xk, xv, pos = _mk(S, seed=4)
    valid = pos + 1
    out, (k2, v2) = da.update_and_attend_decode_cache(
        q, cache_k, cache_v, xk, xv, pos, valid,
        mask=None, impl="auto", layout="bhsd", interpret=True,
    )
    rk, rv = da.update_decode_cache(cache_k, cache_v, xk, xv, pos,
                                    layout="bhsd")
    ref = da.attend_decode_cache(
        q, rk, rv, mask=None, kv_valid_len=valid, impl="sdpa",
        layout="bhsd",
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(rv))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,  # kernel f32 softmax vs XLA sdpa in bf16
    )


def test_vmem_footprint_routes_to_blocked():
    """Whole-panel single-pass kernels materialize two f32 [Hkv, S, D]
    temps; at 7B's Hkv=32 the q8 fused kernel OOMed the 16M scoped-vmem
    stack at S=384 on real hardware (round-4 continuous-batching bench)
    even though S <= 512. The dispatch must be footprint-aware — and the
    blocked path it reroutes to must stay exact at that shape."""
    # the exact on-chip OOM shape class routes blocked...
    assert da._use_blocked(Hkv=32, S=384, D=128)
    # ...while the on-chip-validated Hkv=8 single-pass shapes still don't
    assert not da._use_blocked(Hkv=8, S=512, D=128)
    assert not da._use_blocked(Hkv=2, S=24, D=128)
    assert da._use_blocked(Hkv=2, S=600, D=128)  # S cap still applies

    # exactness of the rerouted (blocked, fused q8) path at Hkv=32, S=384,
    # scaled-down batch; interpret mode = the math, CPU-checkable
    rng = np.random.default_rng(11)
    B, Hkv, G, S, D = 1, 32, 1, 384, 128
    q = jnp.asarray(rng.normal(size=(B, Hkv, G, D)), jnp.bfloat16)
    kf = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    vf = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-6) / 127.0
    vs = np.maximum(np.abs(vf).max(-1), 1e-6) / 127.0
    kq = jnp.asarray(np.round(kf / ks[..., None]), jnp.int8)
    vq = jnp.asarray(np.round(vf / vs[..., None]), jnp.int8)
    nk = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    pos = jnp.asarray([200], jnp.int32)
    valid = pos + 1
    blocked = da._decode_attention_bhgd_blocked_q8_fused(
        q, kq, vq, jnp.asarray(ks), jnp.asarray(vs), nk, nv, pos, valid,
        interpret=True,
    )
    single = da._decode_attention_bhgd_q8_fused(
        q, kq, vq, jnp.asarray(ks), jnp.asarray(vs), nk, nv, pos, valid,
        interpret=True,
    )
    for b, s in zip(blocked, single):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(s, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_dispatcher_fallback_multi_token():
    """Multi-token windows (speculative verify) must NOT take the fused
    path — the dispatcher falls back to two-step and stays correct."""
    rng = np.random.default_rng(5)
    B, Hkv, G, S, T, D = 2, 2, 1, 32, 3, 128
    q = jnp.asarray(rng.normal(size=(B, T, Hkv * G, D)), jnp.bfloat16)
    cache_k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    cache_v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    xk = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.bfloat16)
    xv = jnp.asarray(rng.normal(size=(B, T, Hkv, D)), jnp.bfloat16)
    pos = jnp.asarray([4, 9], jnp.int32)
    valid = pos + T
    out, (k2, v2) = da.update_and_attend_decode_cache(
        q, cache_k, cache_v, xk, xv, pos, valid,
        mask="causal", impl="sdpa", layout="bhsd", interpret=True,
    )
    rk, rv = da.update_decode_cache(cache_k, cache_v, xk, xv, pos,
                                    layout="bhsd")
    ref = da.attend_decode_cache(
        q, rk, rv, mask="causal", kv_valid_len=valid, impl="sdpa",
        layout="bhsd",
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_spmd_sharded_matches_local():
    """The fused op's custom_partitioning wrapper on the 8-device mesh:
    per-shard results (out AND the updated cache) bit-equal local."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    rng = np.random.default_rng(6)
    B, Hkv, G, S, D = 4, 4, 2, 16, 128
    q = jnp.asarray(rng.normal(size=(B, Hkv, G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    pos = jnp.asarray([4, 15, 8, 11], jnp.int32)
    valid = pos + 1

    opsh = NamedSharding(mesh, P("data", "model", None, None))
    bsh = NamedSharding(mesh, P("data"))
    out = jax.jit(da._spmd_decode_update(True))(
        jax.device_put(q, opsh), jax.device_put(k, opsh),
        jax.device_put(v, opsh), jax.device_put(nk, opsh),
        jax.device_put(nv, opsh), jax.device_put(pos, bsh),
        jax.device_put(valid, bsh),
    )
    ref = da._decode_update_impl(q, k, v, nk, nv, pos, valid,
                                 interpret=True)
    for got, want in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
