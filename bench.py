"""Benchmark driver. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Round-1 headline: decode throughput (tokens/sec/chip) on a 7B-class decoder
config — the BASELINE.json north-star metric. The reference publishes no
numbers (BASELINE.md), so vs_baseline is reported against an estimated
roofline-derived reference point when available, else 1.0.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def bench_decode(n_layers=8, dim=4096, n_heads=32, n_kv_heads=32,
                 vocab=32000, batch=8, prompt=128, steps=64):
    """Decode throughput on a scaled-down 7B-shaped decoder (full 7B weights
    do not fit alongside a build sandbox on one v5e chip in f32; layer count
    is scaled and throughput extrapolated per-layer)."""
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
    cache = llama.KVCache.create(args, batch, dtype=dtype)
    tokens = jnp.ones((batch, prompt), jnp.int32)

    prefill = jax.jit(lambda p, c, t: llama.prefill(p, args, c, t))
    step = jax.jit(
        lambda p, c, t, pos: llama.decode_step(p, args, c, t, pos),
        donate_argnums=1,
    )

    logits, cache, _ = prefill(params, cache, tokens)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    # warm up decode compile
    logits, cache = step(params, cache, tok, jnp.int32(prompt))
    jax.block_until_ready(logits)

    t0 = time.perf_counter()
    for i in range(1, steps):
        logits, cache = step(params, cache, tok, jnp.int32(prompt + i))
    jax.block_until_ready(logits)
    dt = time.perf_counter() - t0

    toks_per_sec = batch * (steps - 1) / dt
    # extrapolate to 32 layers (7B) assuming per-layer linearity
    toks_7b = toks_per_sec * n_layers / 32
    return toks_per_sec, toks_7b


def main():
    platform = jax.devices()[0].platform
    toks, toks_7b = bench_decode()
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_7b_extrapolated",
                "value": round(toks_7b, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": 1.0,
                "detail": {
                    "raw_tokens_per_sec_8layer": round(toks, 2),
                    "platform": platform,
                    "batch": 8,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
