"""On-chip parity validation for kernels that previously only had
interpret-mode/CPU coverage (CLAUDE.md round-2 "pending on-chip
validation"):

1. SINGLE-BLOCK q8 decode-attention (cache <= 512 slots) — Mosaic compile
   + layout behavior on real TPU routinely diverge from interpret mode.
2. Blocked q8 variant (>512 slots) — re-pinned for completeness.
3. Quantized (int4-weight) flash-chunked-prefill route — chunked vs
   one-shot prefill must agree bit-tightly on the same quantized params.
4. int4/int8 SPMD wrapper single-device equivalence (the wrapper is new in
   round 3; on one chip it must match the direct kernel path).

Run on the real chip:  timeout 590 python scripts/onchip_validate.py
Prints PASS/FAIL per leg; exit code 1 if any leg fails.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)))


RESULTS = []


def check(name, err, tol):
    ok = err <= tol
    RESULTS.append((name, ok, err, tol))
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs_err={err:.3e} "
          f"(tol {tol:.1e})", flush=True)


def leg_q8_decode_attention(S, label):
    """q8 decode-attention kernel on-chip vs the same math in interpret
    mode (identical quantized operands -> tight tolerance)."""
    from a3vlm_tpu.ops.decode_attention import (
        QuantizedKV,
        decode_attention_quant,
    )

    rng = np.random.default_rng(0)
    B, Hkv, Hq, D = 4, 8, 8, 128
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.bfloat16)
    kf = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    vf = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-6) / 127.0  # [B,Hkv,S]
    vs = np.maximum(np.abs(vf).max(-1), 1e-6) / 127.0
    kq = QuantizedKV(
        jnp.asarray(np.round(kf / ks[..., None]).astype(np.int8)),
        jnp.asarray(ks.astype(np.float32)),
    )
    vq = QuantizedKV(
        jnp.asarray(np.round(vf / vs[..., None]).astype(np.int8)),
        jnp.asarray(vs.astype(np.float32)),
    )
    valid = jnp.asarray(rng.integers(S // 2, S, size=(B,)), jnp.int32)

    on_chip = jax.jit(
        lambda q, kq, vq, valid: decode_attention_quant(q, kq, vq, valid)
    )(q, kq, vq, valid)
    interp = decode_attention_quant(q, kq, vq, valid, interpret=True)
    check(f"q8_decode_attention_{label}", _err(on_chip, interp), 2e-2)


def leg_quant_chunked_prefill():
    """int4-weight chunked prefill (flash cache-attention route) vs
    one-shot prefill on the SAME quantized params: logits must agree."""
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama
    from a3vlm_tpu.quant import quantize_params

    args = ModelArgs(
        dim=1024, n_layers=2, n_heads=8, n_kv_heads=8, vocab_size=1024,
        multiple_of=256, max_batch_size=2, max_seq_len=640,
    )
    rng = np.random.default_rng(1)
    # bf16 on TPU (the production dtype); CPU smoke-runs use f32 (the CPU
    # dot thunk has no bf16 support)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dt),
        llama.init_llama_params(jax.random.PRNGKey(0), args),
    )
    qp = quantize_params(
        jax.tree_util.tree_map(np.asarray, params), bits=4
    )
    qp = llama.unstack_layers(qp)
    tokens = jnp.asarray(rng.integers(1, 1000, size=(2, 576)), jnp.int32)

    @jax.jit
    def one_shot(p, tokens):
        cache = llama.KVCache.create(args, 2, max_seq_len=640,
                                     dtype=dt, layered=True)
        logits, cache, _ = llama.prefill(p, args, cache, tokens)
        return logits, cache

    @jax.jit
    def chunked(p, tokens):
        cache = llama.KVCache.create(args, 2, max_seq_len=640,
                                     dtype=dt, layered=True)
        logits, cache, _ = llama.prefill_chunked(
            p, args, cache, tokens, chunk=192
        )
        return logits, cache

    l1, c1 = one_shot(qp, tokens)
    l2, c2 = chunked(qp, tokens)
    check("quant_chunked_prefill_logits", _err(l1, l2), 5e-2)
    k1 = np.asarray(c1.k[0], np.float32)
    k2 = np.asarray(c2.k[0], np.float32)
    check("quant_chunked_prefill_cache", float(np.max(np.abs(k1 - k2))),
          5e-2)


def leg_spmd_wrapper_single_device():
    """The round-3 custom_partitioning WRAPPERS invoked directly under jit
    on the chip: on one device the partition fn never fires (the
    CPU-mesh tests own partitioning exactness), but this compiles the
    custom_partitioning -> Mosaic kernel lowering on real TPU, which the
    public int4_matmul/int8_matmul API would otherwise skip at
    len(devices)==1."""
    from a3vlm_tpu.ops.quant_matmul import (
        _int4_matmul_2d,
        _int8_matmul_2d,
        _spmd_int4,
        _spmd_int8,
    )
    from a3vlm_tpu.quant import _quantize_leaf_int4, _quantize_leaf_int8

    rng = np.random.default_rng(2)
    w = rng.normal(size=(2048, 1024)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(16, 2048)), jnp.bfloat16)
    q4 = _quantize_leaf_int4(w)
    direct = _int4_matmul_2d(x, q4.q, q4.scale, group=q4.group)
    via_spmd = jax.jit(_spmd_int4(q4.group, False))(x, q4.q, q4.scale)
    check("int4_spmd_wrapper_vs_kernel", _err(direct, via_spmd), 1e-6)
    q8 = _quantize_leaf_int8(w)
    s8 = q8.scale.reshape(1, -1).astype(jnp.float32)
    direct8 = _int8_matmul_2d(x, q8.q, s8)
    via8 = jax.jit(_spmd_int8(False))(x, q8.q, s8)
    check("int8_spmd_wrapper_vs_kernel", _err(direct8, via8), 1e-6)


def leg_chunked_int4():
    """Round-4 CHUNK-PACKED int4 (the K-shardable row-parallel layout) on
    real TPU: the chunk-aware BlockSpec index maps and the BK=256 block
    (a chunked shard's half-chunk can drop below 512 rows) have only run
    in interpret mode; Mosaic must compile and match the XLA per-chunk
    fallback. Shapes mirror 7B wo under mp=8 (chunks=8, halfc=256 -> BK
    256) and a 2-chunk local weight (halfc=1024 -> BK 1024)."""
    from a3vlm_tpu.ops.quant_matmul import (
        _int4_local_chunked,
        _int4_matmul_2d,
        _spmd_int4_rowp,
    )
    from a3vlm_tpu.quant import _quantize_leaf_int4

    rng = np.random.default_rng(4)
    for chunks, K, N, label in ((8, 4096, 4096, "mp8_shard"),
                                (2, 4096, 1024, "local_c2")):
        w = rng.normal(size=(K, N)).astype(np.float32)
        qw = _quantize_leaf_int4(w, k_chunks=chunks)
        x = jnp.asarray(rng.normal(size=(16, K)), jnp.bfloat16)
        Kc = K // chunks
        # reference: the ESTABLISHED unchunked kernel over the SAME
        # quantized values in classic split-half layout (chunking changes
        # byte layout, not values) — isolates the chunk-aware index maps
        # from bf16-weight accumulation error, which at K=4096 reaches
        # ~1.0 abs vs an f32 dequant reference on |out|~300 (measured; the
        # first cut of this leg compared against XLA-f32 at the K=2048
        # tolerance and flagged exactly that). Remaining delta is f32
        # block-sum ORDER only (chunk-major vs half-major walk).
        g = qw.group
        wg = w.reshape(K // g, g, N)
        s = np.maximum(np.abs(wg).max(axis=1, keepdims=True), 1e-8) / 7.0
        q = np.clip(np.round(wg / s), -7, 7).astype(np.int8).reshape(K, N)
        packed = ((q[: K // 2] & 0x0F)
                  | ((q[K // 2:] & 0x0F) << 4)).astype(np.int8)
        scale = s.reshape(K // g, N).astype(np.float32)
        ref = _int4_matmul_2d(
            x, jnp.asarray(packed), jnp.asarray(scale), group=g
        )
        got = jax.jit(
            lambda xx, qq, ss: _int4_local_chunked(
                xx, qq, ss, group=qw.group, interpret=False
            )
        )(x, qw.q, qw.scale)
        check(f"chunked_int4_{label}", _err(got, ref), 0.1)
        via_rowp = jax.jit(_spmd_int4_rowp(qw.group, False))(
            x.reshape(16, chunks, Kc), qw.q, qw.scale
        )
        check(f"chunked_int4_rowp_wrapper_{label}", _err(got, via_rowp),
              1e-6)


def leg_fused_update_attend(S, label):
    """Round-3 fused write+attend kernels on real TPU vs interpret mode:
    the aliased-output write-back tile (scalar-dependent out index_map,
    in-kernel dynamic sublane slice) is exactly the machinery interpret
    mode cannot vouch for. Cache buffers must match BIT-EXACTLY; the
    attention output to kernel-vs-interpret fp tolerance."""
    from a3vlm_tpu.ops import decode_attention as da

    rng = np.random.default_rng(3)
    B, Hkv, G, D = 4, 8, 1, 128
    q = jnp.asarray(rng.normal(size=(B, Hkv, G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.bfloat16)
    pos = jnp.asarray(rng.integers(S // 2, S, size=(B,)), jnp.int32)
    valid = pos + 1

    on_chip = jax.jit(
        lambda *a: da._decode_update_impl(*a)
    )(q, k, v, nk, nv, pos, valid)
    interp = da._decode_update_impl(q, k, v, nk, nv, pos, valid,
                                    interpret=True)
    check(f"fused_update_attend_{label}_out", _err(on_chip[0], interp[0]),
          2e-2)
    check(f"fused_update_attend_{label}_cache_k",
          _err(on_chip[1], interp[1]), 0.0)
    check(f"fused_update_attend_{label}_cache_v",
          _err(on_chip[2], interp[2]), 0.0)

    # q8 form: in-kernel quantize + full scale-plane rewrite
    kq, ks = da.quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32))
    vq, vs = da.quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32))
    oc = jax.jit(
        lambda *a: da._decode_update_impl_q8(*a)
    )(q, kq, vq, ks, vs, nk, nv, pos, valid)
    it = da._decode_update_impl_q8(q, kq, vq, ks, vs, nk, nv, pos, valid,
                                   interpret=True)
    check(f"fused_update_attend_q8_{label}_out", _err(oc[0], it[0]), 2e-2)
    # int8 rows: allow 1 unit of round-at-half divergence Mosaic vs XLA
    check(f"fused_update_attend_q8_{label}_cache", max(
        _err(oc[1], it[1]), _err(oc[2], it[2])), 1.0)
    check(f"fused_update_attend_q8_{label}_scales", max(
        _err(oc[3], it[3]), _err(oc[4], it[4])), 1e-6)


def leg_verify_attention(S, label):
    """Round-4 multi-token verify kernels on real TPU vs interpret mode:
    the per-ROW mask threshold (causal-within-window) over the blocked
    online softmax, bf16 and q8 forms."""
    from a3vlm_tpu.ops import decode_attention as da

    rng = np.random.default_rng(9)
    B, Hkv, span, D = 4, 8, 8, 128
    G = 2
    q = jnp.asarray(rng.normal(size=(B, span, Hkv * G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    valid = jnp.asarray(rng.integers(span + 1, S + 1, size=(B,)), jnp.int32)

    on_chip = jax.jit(
        lambda *a: da.verify_attention(*a)
    )(q, k, v, valid)
    interp = da.verify_attention(q, k, v, valid, interpret=True)
    check(f"verify_attention_{label}", _err(on_chip, interp), 2e-2)

    kq = da.QuantizedKV(*da.quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)))
    vq = da.QuantizedKV(*da.quantize_kv_tokens(
        jnp.asarray(rng.normal(size=(B, S, Hkv, D)), jnp.float32)))
    oc = jax.jit(
        lambda *a: da.verify_attention_quant(
            a[0], da.QuantizedKV(a[1], a[2]), da.QuantizedKV(a[3], a[4]),
            a[5],
        )
    )(q, kq.qv, kq.scale, vq.qv, vq.scale, valid)
    it = da.verify_attention_quant(q, kq, vq, valid, interpret=True)
    check(f"verify_attention_q8_{label}", _err(oc, it), 2e-2)


def leg_w4a8(K, N, label):
    """Round-4 W4A8 int-dot decode kernel on real TPU vs its XLA
    emulation: the CPU tests pin kernel==emulation in interpret mode
    only; Mosaic's int8-dot legalization + the ceil-grid N boundary need
    a real-chip check. f32 activations so the only tolerance is f32
    group-sum ordering (the production bf16 path shares every code
    path; its extra error is the final bf16 store rounding)."""
    from a3vlm_tpu.ops import quant_matmul as qm
    from a3vlm_tpu.quant import _quantize_leaf_int4

    rng = np.random.default_rng(7)
    w = (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
    qw = _quantize_leaf_int4(w)
    x = jnp.asarray(rng.normal(size=(16, K)), jnp.float32)
    qm.W4A8_DECODE = True
    try:
        got = qm.int4_matmul(x, qw)  # public route -> Mosaic kernel
    finally:
        qm.W4A8_DECODE = False
    Kpad = qw.q.shape[-2] * 2
    xp = jnp.pad(x, ((0, 0), (0, Kpad - K))) if Kpad != K else x
    ref = qm._int4_w4a8_xla(xp, qw)
    check(f"w4a8_kernel_vs_emulation_{label}", _err(got, ref), 1e-3)


def leg_w8a8p(M, K, N, label):
    """Round-5 W8A8-prefill kernel on real TPU vs its XLA integer
    emulation (CPU tests pin bit-equality in interpret mode only;
    Mosaic's f32 round + int8 cast and the int8 MXU dot need a real-chip
    check). Grid-stable activations (integer grid, row absmax 127) so the
    activation quantize cannot flip between the two paths; the integer
    accumulations are then exact on both sides and only the f32 rank-1
    epilogue differs (elementwise — tight tolerance)."""
    from a3vlm_tpu.ops import quant_matmul as qm
    from a3vlm_tpu.quant import _quantize_leaf_int4

    rng = np.random.default_rng(11)
    w = (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
    qw = _quantize_leaf_int4(w)
    x = rng.integers(-127, 128, size=(M, K)).astype(np.float32)
    x[:, 0] = 127.0
    x = jnp.asarray(x)
    qm.W8A8_PREFILL = True
    try:
        got = qm.int4_matmul(x, qw)  # public route -> Mosaic kernel
    finally:
        qm.W8A8_PREFILL = False
    Kpad = qw.q.shape[-2] * 2
    xp = jnp.pad(x, ((0, 0), (0, Kpad - K))) if Kpad != K else x
    ref = qm._int4_w8a8p_xla(xp, qw)
    # scale-aware tolerance: outputs are O(K * 127 * w_std)
    check(f"w8a8p_kernel_vs_emulation_{label}", _err(got, ref), 5e-2)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", flush=True)
    if dev.platform != "tpu":
        print("WARNING: not on TPU — this validates nothing new", flush=True)
    # one-time relay handshake on a trivial op so leg timings are clean
    float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).reshape(-1)[0])
    print("handshake done", flush=True)

    leg_q8_decode_attention(256, "single_block_s256")
    leg_q8_decode_attention(1024, "blocked_s1024")
    leg_quant_chunked_prefill()
    leg_spmd_wrapper_single_device()
    leg_chunked_int4()
    leg_fused_update_attend(256, "single_s256")
    leg_fused_update_attend(1024, "blocked_s1024")
    leg_verify_attention(256, "s256")
    leg_verify_attention(1536, "s1536")
    leg_w4a8(4096, 11008, "k4096_n11008")
    leg_w4a8(11008, 4096, "k11008_n4096")
    leg_w8a8p(1487, 4096, 11008, "m1487_k4096_n11008")
    leg_w8a8p(300, 11008, 4096, "m300_k11008_n4096")

    failed = [r for r in RESULTS if not r[1]]
    print(f"{len(RESULTS) - len(failed)}/{len(RESULTS)} legs passed",
          flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
