"""Fused int4 dequant-matmul: packing/unpacking invariants, the XLA
fallback, and the Pallas kernel (interpret mode) must all agree with the
dense dequantized matmul (the bitsandbytes Linear4bit forward contract,
reference util/quant.py:116-144)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3vlm_tpu.ops.quant_matmul import (
    _int4_matmul_2d,
    _int4_matmul_xla,
    _int8_matmul_2d,
    int4_matmul,
    int8_matmul,
    qmat,
)
from a3vlm_tpu.quant import (
    QuantizedWeight,
    _quantize_leaf_int4,
    _quantize_leaf_int8,
    dequantize_params,
    quantize_params,
)


def _rand_w(k, n, seed=0):
    return np.random.default_rng(seed).normal(size=(k, n)).astype(np.float32)


def test_int4_split_half_pack_roundtrip():
    w = _rand_w(128, 64)
    qw = _quantize_leaf_int4(w)
    deq = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    assert deq.shape == w.shape
    # max group-quantization error: scale/2 per element (scale = max/7)
    err = np.abs(deq - w)
    bound = np.abs(w).reshape(128 // qw.group, qw.group, 64).max(1) / 7.0
    assert (err <= np.repeat(bound, qw.group, 0) / 2 + 1e-6).all()


def test_int4_pad_alignment_for_kernel():
    """in_dim >= 1024 pads to a 1024 multiple; below stays exact."""
    qw = _quantize_leaf_int4(_rand_w(1088, 32))
    assert qw.q.shape[0] * 2 == 2048 and qw.in_dim == 1088
    deq = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    assert deq.shape == (1088, 32)
    qw_small = _quantize_leaf_int4(_rand_w(96, 32))
    assert qw_small.q.shape[0] * 2 == 96


def test_int4_matmul_xla_matches_dense():
    w = _rand_w(256, 128)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(4, 256, seed=1))
    dense = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    got = np.asarray(_int4_matmul_xla(x, qw))
    np.testing.assert_allclose(got, np.asarray(x) @ dense, rtol=2e-5,
                               atol=2e-5)


def test_int4_matmul_padded_input_matches_dense():
    """in_dim padding path: x is padded with zeros to the packed width."""
    w = _rand_w(1088, 128)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(3, 1088, seed=2))
    dense = np.asarray(dequantize_params({"w": qw}, dtype=jnp.float32)["w"])
    got = np.asarray(int4_matmul(x, qw))
    np.testing.assert_allclose(got, np.asarray(x) @ dense, rtol=2e-4,
                               atol=2e-4)


def test_int4_pallas_kernel_interpret_matches_xla():
    """The Pallas kernel (interpret mode on CPU) == the XLA two-dot path."""
    w = _rand_w(2048, 256, seed=3)
    qw = _quantize_leaf_int4(w)
    assert qw.group == 64 and qw.q.shape == (1024, 256)
    x = jnp.asarray(_rand_w(5, 2048, seed=4)).astype(jnp.float32)
    # the kernel feeds the MXU bf16 weights; reference = dense matmul with
    # the same bf16-cast dequantized weights
    dense_bf16 = (
        dequantize_params({"w": qw}, dtype=jnp.bfloat16)["w"]
        .astype(jnp.float32)
    )
    ref = np.asarray(x @ dense_bf16)
    got = np.asarray(
        _int4_matmul_2d(x, qw.q, qw.scale, group=qw.group, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int4_pallas_kernel_3d_and_bf16():
    """[B, S, K] activations, bf16, through the kernel wrapper."""
    w = _rand_w(1024, 128, seed=5)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(2 * 3, 1024, seed=6)).reshape(2, 3, 1024)
    x = x.astype(jnp.bfloat16)
    ref = np.asarray(_int4_matmul_xla(x, qw)).astype(np.float32)
    got = np.asarray(int4_matmul(x, qw, interpret=True)).astype(np.float32)
    # both are bf16 outputs; allow one output ulp of divergence
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.75)


def test_int8_pallas_kernel_interpret_matches_dense():
    """The fused int8 kernel (interpret mode on CPU) == x @ dequantized
    weight; the per-output-channel scale factors out of the accumulation."""
    w = _rand_w(512, 256, seed=8)
    q8 = _quantize_leaf_int8(w)
    x = jnp.asarray(_rand_w(5, 512, seed=9)).astype(jnp.float32)
    dense = (q8.q.astype(jnp.float32) * q8.scale)
    ref = np.asarray(x @ dense)
    got = np.asarray(
        _int8_matmul_2d(
            x, q8.q, q8.scale.reshape(1, -1).astype(jnp.float32),
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int8_matmul_3d_and_bf16():
    """[B, S, K] bf16 activations through the int8 kernel wrapper."""
    w = _rand_w(256, 128, seed=10)
    q8 = _quantize_leaf_int8(w)
    x = jnp.asarray(_rand_w(2 * 3, 256, seed=11)).reshape(2, 3, 256)
    x = x.astype(jnp.bfloat16)
    dense = (q8.q.astype(jnp.float32) * q8.scale).astype(jnp.bfloat16)
    ref = np.asarray(x @ dense).astype(np.float32)
    got = np.asarray(int8_matmul(x, q8, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.5)


def test_int8_ceil_grid_nondivisible_n():
    """N=1152 does not divide BN=1024: the boundary block's padded columns
    must not leak into valid output (checked on-chip too, /tmp sweep)."""
    w = _rand_w(1024, 1152, seed=12)
    q8 = _quantize_leaf_int8(w)
    x = jnp.asarray(_rand_w(4, 1024, seed=13)).astype(jnp.float32)
    dense = q8.q.astype(jnp.float32) * q8.scale
    ref = np.asarray(x @ dense)
    got = np.asarray(int8_matmul(x, q8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int4_ceil_grid_nondivisible_n():
    """int4 kernel with N=1152 (ceil-grid over BN=1024)."""
    w = _rand_w(1024, 1152, seed=14)
    q4 = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(4, 1024, seed=15)).astype(jnp.float32)
    ref = np.asarray(_int4_matmul_xla(x, q4)).astype(np.float32)
    got = np.asarray(int4_matmul(x, q4, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.5)


def test_qmat_dispatch():
    w = _rand_w(64, 32)
    x = jnp.asarray(_rand_w(2, 64, seed=7))
    np.testing.assert_allclose(
        np.asarray(qmat(x, jnp.asarray(w))), np.asarray(x) @ w, rtol=1e-6
    )
    q8 = _quantize_leaf_int8(w)
    dense8 = np.asarray(dequantize_params({"w": q8}, dtype=jnp.float32)["w"])
    np.testing.assert_allclose(
        np.asarray(qmat(x, q8)), np.asarray(x) @ dense8, rtol=1e-5, atol=1e-5
    )
    q4 = _quantize_leaf_int4(w)
    dense4 = np.asarray(dequantize_params({"w": q4}, dtype=jnp.float32)["w"])
    np.testing.assert_allclose(
        np.asarray(qmat(x, q4)), np.asarray(x) @ dense4, rtol=1e-5, atol=1e-5
    )


def test_int4_kernel_v3_group_factored_matches():
    """The group-factored-scale variant == the expanded-scale kernel ==
    the XLA path (v3 is if anything MORE precise: unscaled bf16 nibbles
    into f32 dots, scales applied in f32 after)."""
    w = _rand_w(2048, 256, seed=30)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(5, 2048, seed=31)).astype(jnp.float32)
    ref = np.asarray(_int4_matmul_xla(x, qw)).astype(np.float32)
    got = np.asarray(
        _int4_matmul_2d(x, qw.q, qw.scale, group=qw.group, interpret=True,
                        variant="v3")
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.5)
    # ceil-grid N (boundary block) through v3 as well
    w2 = _rand_w(1024, 1152, seed=32)
    q2 = _quantize_leaf_int4(w2)
    x2 = jnp.asarray(_rand_w(4, 1024, seed=33)).astype(jnp.float32)
    ref2 = np.asarray(_int4_matmul_xla(x2, q2)).astype(np.float32)
    got2 = np.asarray(
        _int4_matmul_2d(x2, q2.q, q2.scale, group=q2.group, interpret=True,
                        variant="v3")
    )
    np.testing.assert_allclose(got2, ref2, rtol=2e-2, atol=0.5)


# ---------------------------------------------------------------------------
# SPMD: TP-sharded quantized matmuls (custom_partitioning wrappers)
# ---------------------------------------------------------------------------


def _mesh_dp_mp(dp, mp):
    from a3vlm_tpu.parallel import create_mesh

    return create_mesh(mp, devices=jax.devices()[: dp * mp])


@pytest.mark.parametrize("interpret", [True, False])
def test_int4_spmd_mp2_matches_reference(interpret):
    """int4 matmul with the packed weight N-sharded over model=2: kernel
    (interpret) and local-XLA (interpret=False on CPU) per-shard paths both
    match the unsharded reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    w = _rand_w(2048, 256, seed=20)
    qw = _quantize_leaf_int4(w)
    assert qw.q.shape == (1024, 256)
    mesh = _mesh_dp_mp(2, 2)
    qs = jax.device_put(qw.q, NamedSharding(mesh, P(None, "model")))
    ss = jax.device_put(qw.scale, NamedSharding(mesh, P(None, "model")))
    qw_sh = QuantizedWeight(qs, ss, 4, qw.group, qw.in_dim)
    x = jnp.asarray(_rand_w(8, 2048, seed=21)).astype(jnp.float32)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    ref = np.asarray(_int4_matmul_xla(x, qw)).astype(np.float32)
    with mesh:
        got = jax.jit(
            lambda xx, ww: int4_matmul(xx, ww, interpret=interpret)
        )(x_sh, qw_sh)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), ref, rtol=2e-2, atol=0.5
    )


@pytest.mark.parametrize("interpret", [True, False])
def test_int8_spmd_mp2_matches_reference(interpret):
    from jax.sharding import NamedSharding, PartitionSpec as P

    w = _rand_w(512, 256, seed=22)
    q8 = _quantize_leaf_int8(w)
    mesh = _mesh_dp_mp(2, 2)
    qs = jax.device_put(q8.q, NamedSharding(mesh, P(None, "model")))
    ss = jax.device_put(q8.scale, NamedSharding(mesh, P(None, "model")))
    q8_sh = QuantizedWeight(qs, ss, 8)
    x = jnp.asarray(_rand_w(8, 512, seed=23)).astype(jnp.float32)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    dense = q8.q.astype(jnp.float32) * q8.scale
    ref = np.asarray(x @ dense)
    with mesh:
        got = jax.jit(
            lambda xx, ww: int8_matmul(xx, ww, interpret=interpret)
        )(x_sh, q8_sh)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), ref, rtol=2e-2, atol=0.5
    )


def test_int4_spmd_replicated_weight_ok():
    """A replicated quantized weight under a multi-device runtime still
    goes through the SPMD wrapper (n_ax=None) and matches."""
    w = _rand_w(1024, 128, seed=24)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(_rand_w(4, 1024, seed=25)).astype(jnp.float32)
    ref = np.asarray(_int4_matmul_xla(x, qw)).astype(np.float32)
    got = np.asarray(qmat(x, qw)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.5)


def test_quantized_partition_specs_column_parallel():
    """Quantized leaves get N-sharded specs when N splits lane-aligned;
    dense leaves keep their dense specs; misaligned N stays replicated."""
    from jax.sharding import PartitionSpec as P

    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama
    from a3vlm_tpu.parallel import shard_params
    from a3vlm_tpu.quant import quantized_partition_specs

    args = ModelArgs(dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
                     vocab_size=384, multiple_of=16, max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(2), args)
    qparams = quantize_params(params, bits=8)
    dense_specs = llama.llama_partition_specs(args)
    specs = quantized_partition_specs(dense_specs, qparams, n_model=2)
    wq = specs["layers"]["attention"]["wq"]["weight"]
    assert isinstance(wq, QuantizedWeight)
    # stacked [L, K, N]: shard the last (output) axis
    assert tuple(wq.q) == (None, None, "model")
    # row-parallel w2 converts to column-parallel in the quantized tree
    w2 = specs["layers"]["feed_forward"]["w2"]["weight"]
    assert tuple(w2.q) == (None, None, "model")
    # embeddings stay dense and keep the dense spec
    assert tuple(specs["tok_embeddings"]["weight"]) == (None, "model")
    # norms replicated
    assert tuple(specs["norm"]["weight"]) == (None,)
    # the spec tree must actually place the quantized tree on a mesh
    mesh = _mesh_dp_mp(2, 2)
    placed = shard_params(qparams, mesh, specs)
    q_leaf = placed["layers"]["attention"]["wq"]["weight"].q
    assert q_leaf.sharding.spec == P(None, None, "model")

    # ffn output dim 688 (multiple_of=16) does not split into 2x128-lane
    # shards -> replicated
    F = params["layers"]["feed_forward"]["w1"]["weight"].shape[-1]
    if F % 256 != 0:
        w1 = specs["layers"]["feed_forward"]["w1"]["weight"]
        assert tuple(w1.q) == (None, None, None)


def test_quantize_params_keeps_embeddings_dense():
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama

    args = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                     vocab_size=128, multiple_of=16, max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(0), args)
    q = quantize_params(params, bits=8)
    assert not isinstance(q["tok_embeddings"]["weight"], QuantizedWeight)
    assert isinstance(q["output"]["weight"], QuantizedWeight)
    assert isinstance(
        q["layers"]["attention"]["wq"]["weight"], QuantizedWeight
    )


@pytest.mark.parametrize("bits", [4, 8])
def test_quantized_decoder_forward_native(bits):
    """llama forward_train with packed leaves (no params_transform) stays
    close to the dense forward — the native qmat path."""
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama

    args = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                     vocab_size=128, multiple_of=16, max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(1), args)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, size=(2, 12)), jnp.int32
    )
    dense_logits = llama.forward_train(params, args, tokens)
    qparams = quantize_params(params, bits=bits)
    q_logits = llama.forward_train(qparams, args, tokens)
    # quantization error bounded, correlation high
    d = np.asarray(dense_logits).ravel()
    q = np.asarray(q_logits).ravel()
    corr = np.corrcoef(d, q)[0, 1]
    assert corr > 0.98, corr


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_tp_align_pads_ffn_and_preserves_forward(bits):
    """tp_align pads the ffn hidden dim (gate/up OUT + down IN together)
    to lane-aligned TP shards; the padded tree's forward equals the
    unpadded one (zero gate/up columns -> silu(0)*0=0 into zero down
    rows)."""
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama

    args = ModelArgs(dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
                     vocab_size=384, multiple_of=16, max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(3), args)
    F = params["layers"]["feed_forward"]["w1"]["weight"].shape[-1]
    q0 = quantize_params(params, bits=bits)
    qa = quantize_params(params, bits=bits, tp_align=256)
    Fpad = -(-F // 256) * 256
    assert Fpad != F, "test config must exercise actual padding"
    w1 = qa["layers"]["feed_forward"]["w1"]["weight"]
    w2 = qa["layers"]["feed_forward"]["w2"]["weight"]
    assert w1.q.shape[-1] == Fpad
    in_rows = w2.q.shape[-2] * (2 if bits == 4 else 1)
    assert in_rows >= Fpad  # down-proj input rows padded to match
    # attention weights untouched
    assert (
        qa["layers"]["attention"]["wq"]["weight"].q.shape
        == q0["layers"]["attention"]["wq"]["weight"].q.shape
    )
    # the tp_align tree must equal quantizing MANUALLY pre-padded weights
    # (proves _tp_pad pads the right axes of the right leaves; note the
    # in-pad can change w2's group geometry vs the unpadded tree, so
    # unpadded-vs-padded logits are close but not bit-equal)
    manual = jax.tree_util.tree_map(np.asarray, params)
    ff = manual["layers"]["feed_forward"]
    ff["w1"]["weight"] = np.pad(ff["w1"]["weight"],
                                ((0, 0), (0, 0), (0, Fpad - F)))
    ff["w3"]["weight"] = np.pad(ff["w3"]["weight"],
                                ((0, 0), (0, 0), (0, Fpad - F)))
    ff["w2"]["weight"] = np.pad(ff["w2"]["weight"],
                                ((0, 0), (0, Fpad - F), (0, 0)))
    qm = quantize_params(manual, bits=bits)
    for a, b in zip(
        jax.tree_util.tree_leaves(qa), jax.tree_util.tree_leaves(qm)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, 384, size=(2, 10)), jnp.int32
    )
    dense = np.asarray(llama.forward_train(params, args, tokens))
    la = np.asarray(llama.forward_train(qa, args, tokens))
    corr = np.corrcoef(dense.ravel(), la.ravel())[0, 1]
    assert corr > 0.98, corr


def test_int4_ffn_down_fused_matches_unfused():
    """res + (silu(g)*u) @ W2 through the GLU-fused kernel (interpret)
    == the unfused ops. Exact in f32 (both evaluate silu in f32); the
    bf16 path is tolerance-level (the kernel's silu stays f32 until the
    final store)."""
    rng = np.random.default_rng(11)
    K, N, M = 2048, 512, 16
    qw = _quantize_leaf_int4(
        (rng.normal(size=(K, N)) * 0.05).astype(np.float32)
    )
    g = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)

    from a3vlm_tpu.ops.quant_matmul import int4_ffn_down, int4_matmul

    fused = int4_ffn_down(g, u, qw, res, interpret=True)
    ref = res + int4_matmul(
        jax.nn.silu(g) * u, qw, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=0, atol=1e-5
    )
    # bf16 operands: tolerance-level (f32 silu in-kernel vs bf16 silu)
    fused_b = int4_ffn_down(
        g.astype(jnp.bfloat16), u.astype(jnp.bfloat16), qw,
        res.astype(jnp.bfloat16), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused_b, np.float32), np.asarray(ref),
        rtol=0, atol=0.15,
    )


# ---------------------------------------------------------------------------
# CHUNK-PACKED int4 (k_chunks > 1): the K-shardable row-parallel layout
# ---------------------------------------------------------------------------


def test_int4_chunked_pack_and_dequant():
    """k_chunks=2 packs per chunk ([c, Kc/2, N] bytes, group 32) and the
    dequant reproduces the per-group quantized dense weight exactly."""
    from a3vlm_tpu.quant import _dequantize_leaf

    w = _rand_w(1024, 256, seed=30)
    qw = _quantize_leaf_int4(w, k_chunks=2)
    assert qw.k_chunks == 2 and qw.group == 32
    assert qw.q.shape == (2, 256, 256)
    assert qw.scale.shape == (2, 1024 // 2 // 32, 256)

    # reference per-group quantization at the same (pad, group)
    g = 32
    wg = w.reshape(1024 // g, g, 256)
    s = np.maximum(np.abs(wg).max(axis=1, keepdims=True), 1e-8) / 7.0
    qref = np.clip(np.round(wg / s), -7, 7)
    dense_ref = (qref * s).reshape(1024, 256)
    got = np.asarray(_dequantize_leaf(qw, dtype=jnp.float32))
    np.testing.assert_allclose(got, dense_ref, rtol=1e-6, atol=1e-6)

    # chunk shard ci IS the standard packing of that K-shard
    half_rows = np.asarray(qw.q[0])
    lo = half_rows & 0x0F
    hi = (half_rows >> 4) & 0x0F
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    np.testing.assert_array_equal(
        np.concatenate([lo, hi], axis=0),
        np.asarray(qref.reshape(1024, 256)[:512], np.int8),
    )


def test_int4_chunked_matmul_matches_dense():
    """Single-device chunked matmul (XLA fallback AND interpret kernel)
    equals x @ dequantized dense."""
    from a3vlm_tpu.quant import _dequantize_leaf

    w = _rand_w(1024, 256, seed=31)
    qw = _quantize_leaf_int4(w, k_chunks=2)
    x = jnp.asarray(_rand_w(8, 1024, seed=32))
    dense = _dequantize_leaf(qw, dtype=jnp.float32)
    ref = np.asarray(x @ dense)
    got_xla = np.asarray(int4_matmul(x, qw))
    np.testing.assert_allclose(got_xla, ref, rtol=1e-4, atol=1e-4)
    # kernel path casts dequantized weights to bf16 (same as the
    # established unchunked-kernel tolerance)
    got_kernel = np.asarray(int4_matmul(x, qw, interpret=True))
    np.testing.assert_allclose(got_kernel, ref, rtol=2e-2, atol=0.5)


def test_int4_chunked_kernel_index_maps():
    """The chunk-aware BlockSpec index maps: interpret-mode kernel with
    chunks=4 (several K blocks per half-chunk) equals the per-chunk XLA
    sum."""
    from a3vlm_tpu.ops.quant_matmul import _int4_local_chunked

    w = _rand_w(4096, 128, seed=33)
    qw = _quantize_leaf_int4(w, k_chunks=4)
    assert qw.q.shape == (4, 512, 128)
    x = jnp.asarray(_rand_w(4, 4096, seed=34))
    got = np.asarray(
        _int4_matmul_2d(
            x, qw.q.reshape(-1, 128), qw.scale.reshape(-1, 128),
            group=qw.group, chunks=4, interpret=True,
        )
    )
    ref = np.asarray(
        sum(
            _int4_matmul_xla(
                x[:, ci * 1024:(ci + 1) * 1024],
                QuantizedWeight(
                    qw.q[ci], qw.scale[ci], 4, qw.group, 1024
                ),
            )
            for ci in range(4)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=0.5)


@pytest.mark.parametrize("interpret", [True, False])
def test_int4_rowp_spmd_mp2_matches_reference(interpret):
    """K-sharded (row-parallel) chunked int4 on a (data=2, model=2) mesh:
    each shard computes its chunks and the partials psum — matches the
    unsharded reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from a3vlm_tpu.parallel import create_mesh

    w = _rand_w(2048, 256, seed=35)
    qw = _quantize_leaf_int4(w, k_chunks=2)
    assert qw.q.shape == (2, 512, 256)
    mesh = create_mesh(2, devices=jax.devices()[:4])
    qs = jax.device_put(qw.q, NamedSharding(mesh, P("model", None, None)))
    ss = jax.device_put(
        qw.scale, NamedSharding(mesh, P("model", None, None))
    )
    qw_sh = QuantizedWeight(qs, ss, 4, qw.group, qw.in_dim, qw.k_chunks)
    x = jnp.asarray(_rand_w(8, 2048, seed=36))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    ref = np.asarray(int4_matmul(x, qw))
    with mesh:
        got = jax.jit(
            lambda xx, ww: int4_matmul(xx, ww, interpret=interpret)
        )(x_sh, qw_sh)
    # interpret=True runs the bf16-weight kernel per shard (established
    # kernel tolerance); interpret=False on CPU takes the f32 XLA path
    tol = dict(rtol=2e-2, atol=0.5) if interpret else dict(
        rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, **tol)


def test_quantize_params_row_parallel_and_specs():
    """quantize_params(row_parallel=2): wo/w2 chunk-pack (w2's in_dim and
    w1/w3's out_dim pad to the 512*mp unit together), column weights stay
    split-half; quantized_partition_specs shards the chunk axis over
    "model" for chunked leaves and N for the rest; the sharded decoder
    forward matches single-device."""
    from jax.sharding import PartitionSpec as P

    from a3vlm_tpu.quant import quantized_partition_specs

    D, F = 1024, 1500  # F pads to 2048 at mp=2 (unit 1024)
    tree = {
        "layers": {
            "attention": {"wo": {"weight": _rand_w(D, D, seed=40)}},
            "feed_forward": {
                "w1": {"weight": _rand_w(D, F, seed=41)},
                "w2": {"weight": _rand_w(F, D, seed=42)},
                "w3": {"weight": _rand_w(D, F, seed=43)},
            },
        }
    }
    qp = quantize_params(tree, bits=4, tp_align=256, row_parallel=2)
    wo = qp["layers"]["attention"]["wo"]["weight"]
    w1 = qp["layers"]["feed_forward"]["w1"]["weight"]
    w2 = qp["layers"]["feed_forward"]["w2"]["weight"]
    assert wo.k_chunks == 2 and wo.q.shape == (2, D // 4, D)
    assert w1.k_chunks == 1 and w1.q.shape[-1] == 2048  # padded out
    assert w2.k_chunks == 2 and w2.q.shape == (2, 2048 // 4, D)

    dense_specs = {
        "layers": {
            "attention": {"wo": {"weight": P("model", None)}},
            "feed_forward": {
                "w1": {"weight": P(None, "model")},
                "w2": {"weight": P("model", None)},
                "w3": {"weight": P(None, "model")},
            },
        }
    }
    specs = quantized_partition_specs(dense_specs, qp, 2)
    assert specs["layers"]["attention"]["wo"]["weight"].q == P(
        "model", None, None
    )
    assert specs["layers"]["feed_forward"]["w2"]["weight"].q == P(
        "model", None, None
    )
    assert specs["layers"]["feed_forward"]["w1"]["weight"].q == P(
        None, "model"
    )
