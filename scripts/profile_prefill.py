"""Device trace of the triad-shape PREFILL (batch 1, M ~ 1519, full-depth
int4 7B) — the 186 ms leg of the 540 ms image->triad p50.

Why: prefill runs at ~58% MFU and round-4's knob A/Bs ruled the obvious
suspects OUT (scripts/prefill_ab.py: halving the dequant VPU work via
BM512 is a wash; XLA dense-dot is 1.10x; W4A8 int-dot is 1.077x). This
trace answers where the other ~42% actually goes — flash-attention
softmax? relayouts between the kernel custom calls? norms/rope? — before
any more lever-pulling.

Reuses profile_decode.parse_trace (per-op-family device-time table from
the Chrome-trace export). "steps" = 1: numbers are ms per prefill call.

Usage: python scripts/profile_prefill.py [--prompt 1519] [--bits 4]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_decode import parse_trace  # noqa: E402  (same scripts/ dir)


def run_traced(outdir, bits, prompt):
    import bench
    from a3vlm_tpu.models import llama

    args = bench._7b_args().replace(max_batch_size=1, max_seq_len=prompt + 8)
    params = llama.unstack_layers(bench.fabricate_llama(args, bits=bits))

    @jax.jit
    def prefill_only(p, tokens):
        cache = llama.KVCache.create(
            args, 1, max_seq_len=prompt + 8, dtype=jnp.bfloat16, layered=True
        )
        logits, cache, _ = llama.prefill(p, args, cache, tokens)
        # return only logits: staging the cache out would pollute the
        # copy accounting (see profile_decode.decode_loop note)
        return logits

    tokens = jnp.ones((1, prompt), jnp.int32)
    out = prefill_only(params, tokens)  # compile + warm
    _ = float(out.reshape(-1)[0])
    jax.profiler.start_trace(outdir)
    for _i in range(4):  # 4 calls: averages out per-call jitter
        out = prefill_only(params, tokens)
        _ = float(out.reshape(-1)[0])
    jax.profiler.stop_trace()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=1519)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--outdir", default="/tmp/prefill_trace")
    args = ap.parse_args()
    shutil.rmtree(args.outdir, ignore_errors=True)
    os.makedirs(args.outdir, exist_ok=True)
    run_traced(args.outdir, args.bits, args.prompt)
    parse_trace(args.outdir, steps=4)  # -> per-prefill-call ms


if __name__ == "__main__":
    main()
