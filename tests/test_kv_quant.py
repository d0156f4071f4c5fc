"""int8 KV cache (serving extension): quantize/dequantize bounds, the q8
Pallas kernels (interpret) vs the XLA-dequant reference, cache update
writes, and an end-to-end llama decode against the bf16-cache baseline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops import decode_attention as da
from a3vlm_tpu.ops.attention import sdpa_reference


def test_quantize_kv_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 3, 16)), jnp.float32)
    q, scale = da.quantize_kv_tokens(x)
    assert q.shape == (2, 3, 5, 16) and scale.shape == (2, 3, 5)
    deq = np.asarray(
        da.dequantize_kv(da.QuantizedKV(q, scale), jnp.float32)
    ).transpose(0, 2, 1, 3)
    err = np.abs(deq - np.asarray(x))
    # symmetric int8: error <= scale/2 per element
    bound = np.asarray(scale).transpose(0, 2, 1)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


@pytest.mark.parametrize("S", [16, 600])
def test_q8_kernel_matches_dequant_reference(S):
    """Both q8 kernels (single-block S=16, blocked ragged S=600) equal
    attention over the dequantized panels."""
    rng = np.random.default_rng(1)
    B, Hkv, G, D = 2, 2, 2, 128
    x_k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    x_v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = da.quantize_kv_tokens(x_k)
    vq, vs = da.quantize_kv_tokens(x_v)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.float32)
    valid = jnp.asarray([S - 7, S], jnp.int32)

    got = da.decode_attention_quant(
        q, da.QuantizedKV(kq, ks), da.QuantizedKV(vq, vs), valid,
        interpret=True,
    )
    k_deq = da.dequantize_kv(da.QuantizedKV(kq, ks), jnp.float32)
    v_deq = da.dequantize_kv(da.QuantizedKV(vq, vs), jnp.float32)
    want = sdpa_reference(
        q, k_deq.transpose(0, 2, 1, 3), v_deq.transpose(0, 2, 1, 3),
        mask=None, kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5
    )


def test_q8_spmd_sharded_cache_matches_local():
    """The quantized custom_partitioning wrapper on the 8-device mesh:
    per-shard result bit-equal to the local computation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    rng = np.random.default_rng(6)
    B, Hkv, G, S, D = 4, 4, 2, 16, 128
    q = jnp.asarray(rng.normal(size=(B, Hkv, G, D)), jnp.float32)
    x_k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    x_v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = da.quantize_kv_tokens(x_k)
    vq, vs = da.quantize_kv_tokens(x_v)
    valid = jnp.asarray([5, 16, 9, 12], jnp.int32)

    opsh = NamedSharding(mesh, P("data", "model", None, None))
    ssh = NamedSharding(mesh, P("data", "model", None))
    out = jax.jit(da._spmd_decode_q8(True))(
        jax.device_put(q, opsh), jax.device_put(kq, opsh),
        jax.device_put(vq, opsh), jax.device_put(ks, ssh),
        jax.device_put(vs, ssh),
        jax.device_put(valid, NamedSharding(mesh, P("data"))),
    )
    ref = da._decode_impl_q8(q, kq, vq, ks, vs, valid, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_q8_kernel_bf16_inputs():
    """The TPU decode path feeds bf16 queries; exercise the kernels'
    bf16 dtype conversions in interpret mode."""
    rng = np.random.default_rng(9)
    B, Hkv, G, S, D = 2, 2, 1, 16, 128
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, D)), jnp.bfloat16)
    x_k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    x_v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    kq, ks = da.quantize_kv_tokens(x_k)
    vq, vs = da.quantize_kv_tokens(x_v)
    valid = jnp.asarray([9, 16], jnp.int32)
    got = da.decode_attention_quant(
        q, da.QuantizedKV(kq, ks), da.QuantizedKV(vq, vs), valid,
        interpret=True,
    ).astype(jnp.float32)
    k_deq = da.dequantize_kv(da.QuantizedKV(kq, ks), jnp.float32)
    v_deq = da.dequantize_kv(da.QuantizedKV(vq, vs), jnp.float32)
    want = sdpa_reference(
        q.astype(jnp.float32), k_deq.transpose(0, 2, 1, 3),
        v_deq.transpose(0, 2, 1, 3), mask=None, kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.03, rtol=0.03
    )


def test_update_decode_cache_quantized_write():
    rng = np.random.default_rng(2)
    B, Hkv, S, D = 2, 3, 16, 8
    cache_k = da.QuantizedKV(
        jnp.zeros((B, Hkv, S, D), jnp.int8),
        jnp.zeros((B, Hkv, S), jnp.float32),
    )
    cache_v = da.QuantizedKV(
        jnp.zeros((B, Hkv, S, D), jnp.int8),
        jnp.zeros((B, Hkv, S), jnp.float32),
    )
    xk = jnp.asarray(rng.normal(size=(B, 4, Hkv, D)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(B, 4, Hkv, D)), jnp.float32)
    ck, cv = da.update_decode_cache(cache_k, cache_v, xk, xv, 5,
                                    layout="bhsd")
    deq = np.asarray(da.dequantize_kv(ck, jnp.float32))
    # written slots approximate the input; untouched slots stay zero
    want = np.asarray(xk).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(deq[:, :, 5:9], want, atol=0.05, rtol=0.05)
    assert (deq[:, :, :5] == 0).all() and (deq[:, :, 9:] == 0).all()


def _tiny_args():
    return ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_batch_size=2,
                     max_seq_len=32)


def test_llama_decode_with_int8_cache_close_to_bf16():
    """Full prefill + 4 decode steps through the shared helpers with an
    int8 cache: logits stay highly correlated with the f32-cache run."""
    args = _tiny_args()
    params = llama.init_llama_params(jax.random.PRNGKey(0), args)
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, 128, size=(2, 6)), jnp.int32
    )

    def run(dtype):
        cache = llama.KVCache.create(args, 2, max_seq_len=16, dtype=dtype,
                                     layered=True)
        logits, cache, _ = llama.prefill(params, args, cache, tokens)
        outs = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        for i in range(4):
            logits, cache = llama.decode_step(params, args, cache, tok,
                                              6 + i)
            outs.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        return np.stack([np.asarray(o) for o in outs])

    ref = run(jnp.float32)
    got = run(jnp.int8)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr


def test_prefill_chunked_matches_one_shot():
    """Chunked prefill (memory-bounded) == one-shot prefill: same logits,
    same cache contents, including a ragged last chunk."""
    args = _tiny_args()
    params = llama.init_llama_params(jax.random.PRNGKey(1), args)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, 128, size=(2, 11)), jnp.int32
    )

    cache1 = llama.KVCache.create(args, 2, max_seq_len=16,
                                  dtype=jnp.float32, layered=True)
    logits1, cache1, s1 = llama.prefill(params, args, cache1, tokens)
    cache2 = llama.KVCache.create(args, 2, max_seq_len=16,
                                  dtype=jnp.float32, layered=True)
    logits2, cache2, s2 = llama.prefill_chunked(params, args, cache2,
                                                tokens, chunk=4)
    assert s1 == s2 == 11
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(cache1.k, cache2.k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prefill_chunked_with_image_tokens():
    """Chunked prefill splices image tokens after BOS exactly like the
    one-shot prefill (the ens5 image-word layout contract)."""
    args = _tiny_args()
    params = llama.init_llama_params(jax.random.PRNGKey(3), args)
    tokens = jnp.asarray(
        np.random.default_rng(6).integers(0, 128, size=(2, 5)), jnp.int32
    )
    image_tokens = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 6, 64)), jnp.float32
    )

    def run(fn, **kw):
        cache = llama.KVCache.create(args, 2, max_seq_len=16,
                                     dtype=jnp.float32, layered=True)
        return fn(params, args, cache, tokens, image_tokens=image_tokens,
                  **kw)

    logits1, cache1, s1 = run(llama.prefill)
    logits2, cache2, s2 = run(llama.prefill_chunked, chunk=4)
    assert s1 == s2 == 11  # 5 text + 6 image words
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(cache1.v, cache2.v):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prefill_chunked_generation_parity(tmp_path):
    """Generator(prefill_chunk=...) produces the same tokens as the
    default one-shot prefill path."""
    args = _tiny_args()
    params = llama.init_llama_params(jax.random.PRNGKey(2), args)
    params = llama.unstack_layers(params)
    from a3vlm_tpu.generation import LLAMA_GEN_OPS, _generate_loop

    tokens = np.zeros((2, 16), np.int32)
    rng = np.random.default_rng(5)
    tokens[:, :9] = rng.integers(1, 128, size=(2, 9))
    mask = np.zeros((2, 16), bool)
    mask[:, :9] = True

    def run(chunk):
        cache = llama.KVCache.create(args, 2, max_seq_len=16,
                                     dtype=jnp.float32, layered=True)
        out, stop, _ = _generate_loop(
            params, args, cache, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(tokens[:, :8]), None, jax.random.PRNGKey(0),
            total_len=16, temperature=0.0, top_p=1.0,
            stop_tokens=((127,),), ops=LLAMA_GEN_OPS,
            prefill_chunk=chunk,
        )
        return np.asarray(out)

    np.testing.assert_array_equal(run(None), run(4))


def test_falcon_decode_with_int8_cache_close_to_f32():
    """Falcon shares the quantized-cache helpers (its D=64 always takes
    the XLA dequant path)."""
    from a3vlm_tpu.models import falcon

    args = falcon.FalconArgs(
        hidden_size=128, num_layers=2, num_attention_heads=2,
        num_kv_heads=2, vocab_size=64, max_seq_len=32, max_batch_size=2,
    )
    params = falcon.init_falcon_params(jax.random.PRNGKey(0), args)
    tokens = jnp.asarray(
        np.random.default_rng(8).integers(0, 64, size=(2, 5)), jnp.int32
    )

    def run(dtype):
        cache = falcon.FalconKVCache.create(args, 2, max_seq_len=16,
                                            dtype=dtype, layered=True)
        logits, cache, _ = falcon.prefill(params, args, cache, tokens)
        outs = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        for i in range(3):
            logits, cache = falcon.decode_step(params, args, cache, tok,
                                               5 + i)
            outs.append(logits)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        return np.stack([np.asarray(o) for o in outs])

    ref = run(jnp.float32)
    got = run(jnp.int8)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr


def test_decode_cache_specs_quant_structure():
    import jax.tree_util as jtu

    from a3vlm_tpu.parallel.mesh import create_mesh

    args = _tiny_args()
    mesh = create_mesh(2, devices=np.array(jax.devices()[:8]))
    cache = llama.KVCache.create(args, 4, max_seq_len=16, dtype=jnp.int8,
                                 layered=True)
    specs = llama.decode_cache_specs(args, mesh, batch=4, quant=True)
    # same pytree structure -> tree_map for device_put works
    assert (jtu.tree_structure(cache) == jtu.tree_structure(specs))
