"""Same-session on-chip A/B of the int4 PREFILL dequant-chain knobs
(ops/quant_matmul.py PREFILL_DENSE_MIN_M / PREFILL_BM) on the real triad
prefill leg (batch 1, M = image_words + prompt ~= 1519, full-depth 7B).

Why: at M ~ 1500 the fused int4 kernel is compute-bound, not
weight-bandwidth bound — the per-weight dequant VPU chain throttles the
MXU (~58% prefill MFU in BENCH_r03's triad decomposition: 186.6 ms vs a
~108 ms bf16-matmul ideal). Two candidate fixes, both trace-time knobs
that were shipped in round 3 but never A/B'd (this script is that A/B):

  BM512/BM1024 — PREFILL_BM: larger M blocks amortize each unpacked
      weight block over 2-4x the MXU flops (dequant work per flop drops
      proportionally; weight traffic unchanged).
  DENSE — PREFILL_DENSE_MIN_M: route M >= 512 matmuls to the XLA
      dequantize-then-dense-dot path (full-rate MXU, but materializes the
      bf16 weight: +2x weight write + 2x read traffic per matmul).

Arms are interleaved in ONE process (chip rate drifts +-17% across
processes — CLAUDE.md measurement discipline). Each arm builds a FRESH
jit (the knobs are read at trace time). Run:

    python scripts/prefill_ab.py [--prompt 1519] [--reps 2] [--rounds 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from a3vlm_tpu.ops import quant_matmul as qm
from a3vlm_tpu.models import llama


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def build_prefill(params, args, total):
    """Fresh jit per arm: the PREFILL_* knobs are read when this traces."""

    @jax.jit
    def prefill_only(p, tokens):
        cache = llama.KVCache.create(
            args, 1, max_seq_len=total, dtype=jnp.bfloat16, layered=True
        )
        logits, cache, _ = llama.prefill(p, args, cache, tokens)
        return logits

    return prefill_only


ARMS = {
    # name -> (PREFILL_DENSE_MIN_M, PREFILL_BM, W4A8_MAX_M)
    "base": (None, None, None),
    "bm512": (None, (512, 512), None),
    "bm1024": (None, (512, 1024), None),
    "dense": (512, None, None),
    # W4A8 at prefill M (round 4): int8 MXU dots run at 2x bf16 rate on
    # v5e and prefill is MXU-bound (~58% MFU) — the decode win was the
    # deleted dequant chain; at prefill M the faster MXU itself is in
    # play. NOT exact (per-token A8 rounding, same numerics story as
    # decode W4A8; would need its own accuracy gate before shipping).
    "w4a8": (None, None, 4096),
    "w4a8_bm512": (None, (512, 512), 4096),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=1519)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--arms", default="base,bm512,bm1024,dense")
    args = ap.parse_args()

    margs = bench._7b_args().replace(
        max_batch_size=1, max_seq_len=args.prompt + 8
    )
    params = llama.unstack_layers(bench.fabricate_llama(margs, bits=args.bits))
    tokens = jnp.ones((1, args.prompt), jnp.int32)
    total = args.prompt + 8

    arm_names = [a for a in args.arms.split(",") if a in ARMS]
    results = {a: [] for a in arm_names}
    fns = {}
    for rep in range(args.reps):
        order = arm_names if rep % 2 == 0 else arm_names[::-1]
        for name in order:
            qm.PREFILL_DENSE_MIN_M, qm.PREFILL_BM, w4a8_max = ARMS[name]
            qm.W4A8_DECODE = w4a8_max is not None
            qm.W4A8_MAX_M = w4a8_max or 32
            if name not in fns:  # compile once, while its knobs are live
                fns[name] = build_prefill(params, margs, total)
                try:
                    bench._sync(fns[name](params, tokens))
                except Exception as e:
                    print(f"[{name}] COMPILE/RUN FAILED: "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                    fns[name] = None
            if fns[name] is None:
                continue
            times = []
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                bench._sync(fns[name](params, tokens))
                times.append((time.perf_counter() - t0) * 1e3)
            med = _median(times)
            results[name].append(med)
            print(f"[rep {rep}] {name}: {med:.1f} ms "
                  f"(min {min(times):.1f})", flush=True)

    qm.PREFILL_DENSE_MIN_M, qm.PREFILL_BM = None, None
    qm.W4A8_DECODE, qm.W4A8_MAX_M = False, 32
    print()
    base = min(results.get("base") or [float("inf")])
    for name in arm_names:
        if results[name]:
            best = min(results[name])
            print(f"{name:8s} best {best:7.1f} ms   "
                  f"vs base {best / base:.3f}x")


if __name__ == "__main__":
    main()
