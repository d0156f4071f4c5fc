"""Unit tests for core ops: RoPE, RMSNorm, attention mask semantics, top-p."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.ops.attention import (
    attention,
    right_aligned_causal_mask,
    sdpa_reference,
)
from a3vlm_tpu.ops.norms import rms_norm
from a3vlm_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis
from a3vlm_tpu.ops.sampling import sample_top_p


def torch_rope_reference(xq, xk, freqs_cis_complex):
    """The upstream LLaMA complex-number RoPE, reimplemented with numpy for
    cross-checking (semantics of Meta llama's apply_rotary_emb)."""
    def rot(x):
        xc = x.reshape(*x.shape[:-1], -1, 2)
        xc = xc[..., 0] + 1j * xc[..., 1]
        out = xc * freqs_cis_complex[None, :, None, :]
        return np.stack([out.real, out.imag], axis=-1).reshape(x.shape)

    return rot(xq), rot(xk)


def test_rope_matches_complex_reference():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 16, 4, 32
    xq = rng.standard_normal((B, S, H, D)).astype(np.float32)
    xk = rng.standard_normal((B, S, H, D)).astype(np.float32)

    fc = precompute_freqs_cis(D, S)
    fc_complex = np.asarray(fc[..., 0]) + 1j * np.asarray(fc[..., 1])

    got_q, got_k = apply_rotary_emb(jnp.asarray(xq), jnp.asarray(xk), fc)
    want_q, want_k = torch_rope_reference(xq, xk, fc_complex)
    np.testing.assert_allclose(np.asarray(got_q), want_q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_k), want_k, atol=1e-5)


def test_rope_scaling_linear_interpolation():
    D, S = 8, 8
    base = precompute_freqs_cis(D, S, scaling=None)
    scaled = precompute_freqs_cis(D, 2 * S, scaling=2.0)
    # position 2t with scaling 2 == position t unscaled
    np.testing.assert_allclose(
        np.asarray(scaled[::2][:S]), np.asarray(base), atol=1e-6
    )


def test_rms_norm_matches_torch_fallback():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 16)).astype(np.float32)
    w = rng.standard_normal((16,)).astype(np.float32)
    eps = 1e-5
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_right_aligned_causal_mask():
    # equal lengths: standard lower-triangular
    m = np.asarray(right_aligned_causal_mask(4, 4))
    assert (m == np.tril(np.ones((4, 4), bool))).all()
    # unequal: aligned on the RIGHT (llama_ens5.py:131-141 diagram)
    m = np.asarray(right_aligned_causal_mask(3, 7))
    want = np.array(
        [
            [1, 1, 1, 1, 1, 0, 0],
            [1, 1, 1, 1, 1, 1, 0],
            [1, 1, 1, 1, 1, 1, 1],
        ],
        dtype=bool,
    )
    assert (m == want).all()


def _naive_attention(q, k, v, mask_bool):
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    k = np.repeat(k, group, axis=2)
    v = np.repeat(v, group, axis=2)
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    scores = np.where(mask_bool[None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_sdpa_causal_gqa(hq, hkv):
    rng = np.random.default_rng(2)
    B, Sq, Skv, D = 2, 5, 9, 16
    q = rng.standard_normal((B, Sq, hq, D)).astype(np.float32)
    k = rng.standard_normal((B, Skv, hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, Skv, hkv, D)).astype(np.float32)
    got = sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), "causal")
    want = _naive_attention(
        q, k, v, np.asarray(right_aligned_causal_mask(Sq, Skv))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_sdpa_kv_valid_len_matches_sliced():
    """Masked fixed-size cache == physically sliced cache."""
    rng = np.random.default_rng(3)
    B, Sq, Smax, H, D = 2, 1, 12, 2, 8
    valid = np.array([5, 9], dtype=np.int32)
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Smax, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Smax, H, D)).astype(np.float32)
    got = sdpa_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=None, kv_valid_len=jnp.asarray(valid),
    )
    for b in range(B):
        want = _naive_attention(
            q[b : b + 1],
            k[b : b + 1, : valid[b]],
            v[b : b + 1, : valid[b]],
            np.ones((Sq, valid[b]), bool),
        )
        np.testing.assert_allclose(np.asarray(got[b : b + 1]), want, atol=1e-4)


def test_sample_top_p_distribution():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]] * 512)
    # p=0.75: keep tokens while cumsum-minus-self <= 0.75 -> tokens 0,1,2
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    toks = np.asarray(sample_top_p(keys[0], probs, 0.75))
    assert set(toks.tolist()) <= {0, 1, 2}
    # p tiny: only the argmax survives
    toks = np.asarray(sample_top_p(keys[0], probs, 0.01))
    assert (toks == 0).all()


@pytest.mark.parametrize("mask,use_valid", [
    ("causal", False), ("causal", True), (None, True), (None, False),
])
def test_sdpa_fast_matches_reference(mask, use_valid):
    """The bf16 full-MXU-rate path agrees with the exact-f32 reference within
    bf16 tolerance across every mask contract."""
    from a3vlm_tpu.ops.attention import sdpa_fast

    rng = np.random.default_rng(0)
    B, Sq, Skv, Hq, Hkv, D = 2, 4, 8, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Skv, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Skv, Hkv, D)), jnp.float32)
    valid = jnp.asarray([5, 8]) if use_valid else None
    ref = sdpa_reference(q, k, v, mask=mask, kv_valid_len=valid)
    fast = sdpa_fast(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), mask=mask, kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(ref), atol=0.06, rtol=0.05
    )


def test_attention_dispatch_bf16_uses_fast_path():
    """bf16 decode inputs route through sdpa_fast (same numbers)."""
    from a3vlm_tpu.ops.attention import sdpa_fast

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 1, 4, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 8, 4, 16)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 8, 4, 16)), jnp.bfloat16)
    valid = jnp.asarray([5, 8])
    out = attention(q, k, v, mask=None, kv_valid_len=valid)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(sdpa_fast(q, k, v, kv_valid_len=valid))
    )


def test_decode_attention_spmd_sharded_cache_matches_local():
    """The custom_partitioning wrapper: cache sharded P(data, model) over
    the 8-device mesh, kernel runs per-shard (interpret), result exactly
    equals the unsharded local computation and keeps the (b, h) sharding."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from a3vlm_tpu.ops import decode_attention as da

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(7)
    B, Hkv, G, S, D = 4, 4, 2, 16, 128
    q = jnp.asarray(rng.normal(size=(B, Hkv, G, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    valid = jnp.asarray([5, 16, 9, 12], jnp.int32)

    opsh = NamedSharding(mesh, P("data", "model", None, None))
    out = jax.jit(da._spmd_decode(True))(
        jax.device_put(q, opsh), jax.device_put(k, opsh),
        jax.device_put(v, opsh),
        jax.device_put(valid, NamedSharding(mesh, P("data"))),
    )
    ref = da._decode_impl(q, k, v, valid, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.sharding.spec == P("data", "model")


def test_decode_attention_blocked_long_cache_matches_reference():
    """S > 512 dispatches to the online-softmax blocked kernel (ceil-grid
    over 256-slot blocks; S=600 exercises the ragged boundary)."""
    from a3vlm_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(3)
    B, Hkv, S, D = 2, 2, 600, 128
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * 2, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    valid = jnp.asarray([373, 600], jnp.int32)
    got = decode_attention(q, k, v, valid, interpret=True)
    want = sdpa_reference(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        mask=None, kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("group", [1, 2])
def test_decode_attention_kernel_matches_reference(group):
    """Pallas decode-attention (interpret mode) == sdpa_reference over the
    [B, Hkv, S, D] layered-cache layout, including per-element valid
    lengths and GQA groups."""
    from a3vlm_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(2)
    B, Hkv, S, D = 2, 2, 16, 128
    Hq = Hkv * group
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    valid = jnp.asarray([5, 16], jnp.int32)
    got = decode_attention(q, k, v, valid, interpret=True)
    want = sdpa_reference(
        q,
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        mask=None,
        kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_vit_attention_kernel_matches_xla():
    """Batched ViT attention kernel (interpret) == the XLA sdpa path at the
    tower shape class (S=257-like, D=64, heads batched in-kernel)."""
    from a3vlm_tpu.ops.attention import attention
    from a3vlm_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 65, 4, 64  # odd S exercises the register masking
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    ref = np.asarray(attention(q, k, v, mask=None))
    got = np.asarray(vit_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_vit_forward_attn_kernel_flag_interpret(monkeypatch):
    """vit_forward with attn_kernel=True (forced eligible + interpret on
    CPU) matches the default path."""
    import dataclasses

    from a3vlm_tpu.models import vit
    from a3vlm_tpu.ops import vit_attention as va

    cfg = vit.ViTConfig(
        image_size=28, patch_size=7, width=64, layers=2, heads=4,
        mlp_dim=128, ln_pre=True, patch_bias=False,
    )
    params = vit.init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 28, 28, 3)), jnp.float32
    )
    ref = np.asarray(vit.vit_forward(params, cfg, x))
    orig = va.vit_attention
    monkeypatch.setattr(va, "vit_attention_eligible", lambda *a: True)
    monkeypatch.setattr(
        va, "vit_attention", lambda q, k, v: orig(q, k, v, interpret=True)
    )
    cfg_k = dataclasses.replace(cfg, attn_kernel=True)
    got = np.asarray(vit.vit_forward(params, cfg_k, x))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# -- multi-token verify attention kernel (speculative windows) ---------------


@pytest.mark.parametrize("span,group", [(2, 1), (4, 2), (8, 1)])
def test_verify_attention_matches_causal_reference(span, group):
    """verify_attention (interpret) == sdpa_reference with the
    "causal"+kv_valid_len contract over the layered cache layout: query
    row i of batch b attends cols <= valid_b - span + i. S=600 exercises
    the blocked ceil-grid boundary; ragged per-row valids exercise the
    per-row mask threshold."""
    from a3vlm_tpu.ops.decode_attention import verify_attention

    rng = np.random.default_rng(11)
    B, Hkv, S, D = 2, 2, 600, 128
    Hq = Hkv * group
    q = jnp.asarray(rng.normal(size=(B, span, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    valid = jnp.asarray([373, 600], jnp.int32)
    got = verify_attention(q, k, v, valid, interpret=True)
    want = sdpa_reference(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        mask="causal", kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_verify_attention_quant_matches_dequantized_reference():
    """q8 verify kernel == the XLA causal path over the dequantized
    panels (scales fold at score granularity inside the kernel)."""
    from a3vlm_tpu.ops.decode_attention import (
        QuantizedKV,
        dequantize_kv,
        quantize_kv_tokens,
        verify_attention_quant,
    )

    rng = np.random.default_rng(5)
    B, Hkv, S, D, span = 2, 2, 280, 128, 4
    q = jnp.asarray(rng.normal(size=(B, span, Hkv, D)), jnp.float32)
    # quantize_kv_tokens takes [B, S, Hkv, D] and emits bhsd panels
    kq = QuantizedKV(*quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    ))
    vq = QuantizedKV(*quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)
    ))
    valid = jnp.asarray([97, 280], jnp.int32)
    got = verify_attention_quant(q, kq, vq, valid, interpret=True)
    want = sdpa_reference(
        q,
        dequantize_kv(kq, jnp.float32).transpose(0, 2, 1, 3),
        dequantize_kv(vq, jnp.float32).transpose(0, 2, 1, 3),
        mask="causal", kv_valid_len=valid,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_verify_kernel_routing_preserves_lookup_exactness(monkeypatch):
    """attend_decode_cache routed through the verify kernel (forced
    eligible + interpret on CPU) leaves lookup_generate's output exactly
    equal to the greedy oracle — the end-to-end guarantee the routing
    must not break."""
    from a3vlm_tpu.lookup_decode import greedy_reference, lookup_generate
    from a3vlm_tpu.models import llama
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.ops import decode_attention as da

    monkeypatch.setattr(
        da, "verify_attention_eligible",
        lambda q_shape, k_shape, dtype: 1 < q_shape[1] <= 16
        and k_shape[2] % 8 == 0,
    )
    orig = da.verify_attention
    monkeypatch.setattr(
        da, "verify_attention",
        lambda q, k, v, valid: orig(q, k, v, valid, interpret=True),
    )
    args = ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=256,
        multiple_of=16, max_seq_len=160, max_batch_size=1,
    )
    pat = [7, 8, 9, 11, 12]
    prompt = [1] + pat * 6
    params = llama.unstack_layers(
        llama.init_llama_params(jax.random.PRNGKey(0), args)
    )

    def setup():
        cache = llama.KVCache.create(
            args, 1, max_seq_len=160, dtype=jnp.float32, layered=True
        )
        logits, cache, _ = llama.prefill(
            params, args, cache, jnp.asarray([prompt], jnp.int32)
        )
        return cache, int(jnp.argmax(logits[0, :250]))

    cache0, first = setup()
    cache1, _ = setup()
    expected = greedy_reference(
        params, args, cache1, len(prompt), first, 20,
        vocab_limit=250, stop_token=2,
    )
    out, count, _, _ = lookup_generate(
        params, args, cache0, jnp.asarray(prompt, jnp.int32),
        len(prompt), first, gen_len=20, draft_k=4,
        vocab_limit=250, stop_token=2,
    )
    got = np.asarray(out)[: int(count)].tolist()
    assert got == expected
