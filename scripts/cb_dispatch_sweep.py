"""Same-session sweep of ContinuousBatcher.steps_per_dispatch on the
bench_continuous_batching ragged workload (7B int4 + kv8, prompts 128/256,
gen 16-64, 16 slots).

Round-4 context: the ragged mixed-length CB leg measured 0.85x static.
The per-dispatch host loop costs ~3 relay round trips (~27 ms each); at
T=8 that is still ~10 ms of overhead per ~10 ms compute step. Larger T
amortizes further but wastes slot-steps at request completions (a slot
that finishes mid-chunk idles until the chunk ends — expected waste
~T/2 x completions). This sweep measures where the trade lands on chip.

    python scripts/cb_dispatch_sweep.py [--arms 8,16,24] [--rounds 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402
from a3vlm_tpu.models import llama  # noqa: E402
from a3vlm_tpu.serving_batch import ContinuousBatcher  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default="8,16,24")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--slots", type=int, default=16)
    a = ap.parse_args()
    arms = [int(x) for x in a.arms.split(",")]

    args = bench._7b_args(max_batch_size=a.slots, max_seq_len=384)
    params = llama.unstack_layers(bench.fabricate_llama(args, bits=4))
    rng = np.random.default_rng(0)
    plens = rng.choice([128, 256], size=a.n)
    glens = rng.integers(16, 65, size=a.n).tolist()
    table = {
        f"req:{i}": rng.integers(10, 31000, size=plens[i]).tolist()
        for i in range(a.n)
    }
    tok = bench._SynthTok(table)
    total_gen = sum(glens)
    prompts = [f"req:{i}" for i in range(a.n)]

    # one batcher per arm, kept alive across rounds (pool caches are
    # ~small at S=384 kv8; weights shared). Warmup compiles first so the
    # timed loops are compile-free.
    batchers = {}
    for T in arms:
        cb = ContinuousBatcher(
            params, args, tok, slots=a.slots, kv_cache_bits=8,
            steps_per_dispatch=T,
        )
        cb.warmup(buckets=(128, 256))
        cb.generate(prompts[: a.slots], max_gen_len=glens[: a.slots])
        batchers[T] = cb
        print(f"arm T={T} warmed", flush=True)

    times = {T: [] for T in arms}
    for r in range(a.rounds):
        order = arms if r % 2 == 0 else arms[::-1]
        for T in order:
            cb = batchers[T]
            t0 = time.perf_counter()
            cb.generate(prompts, max_gen_len=glens)
            dt = time.perf_counter() - t0
            times[T].append(dt)
            print(f"round {r} T={T}: {dt:.2f}s "
                  f"({total_gen / dt:.1f} tok/s, {cb.steps} chunked steps)",
                  flush=True)
    print()
    for T in arms:
        best = min(times[T])
        med = bench._median(times[T])
        print(f"T={T}: median {med:.2f}s = {total_gen / med:.1f} tok/s "
              f"(best {total_gen / best:.1f})")


if __name__ == "__main__":
    main()
