"""Same-session interleaved A/B of the W4A8 int-dot decode path
(ops/quant_matmul.py W4A8_DECODE) on the real full-depth decode loop.

Exact-int4 (bf16 dequant + bf16 MXU dots) vs W4A8 (per-token int8
activations, int8 MXU dots, group-scale f32 epilogue). The dequant chain
is the measured ~11% cap on int4 decode matmul bandwidth (bw_probe rawdot
leg); the int-dot path removes the i32->f32->bf16 convert+mul per weight.
Numerics are NOT exact (activation rounding) — if this A/B wins, the
accuracy gate decides whether the mode ships as a flag.

    python scripts/w4a8_ab.py [--bits 4] [--batch 16] [--reps 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from a3vlm_tpu.ops import quant_matmul as qm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="7B", choices=["7B", "13B"])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    margs = bench._7b_args() if args.model == "7B" else bench._13b_args()

    results = {True: [], False: []}
    for rep in range(args.reps):
        for w4a8 in (False, True) if rep % 2 == 0 else (True, False):
            qm.W4A8_DECODE = w4a8
            t0 = time.time()
            try:
                tps = bench.bench_decode_full(
                    margs, bits=args.bits, batch=args.batch,
                    rounds=args.rounds,
                )
            except Exception as e:
                print(f"[rep {rep}] w4a8={w4a8} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            results[w4a8].append(tps)
            print(f"[rep {rep}] w4a8={w4a8}: {tps:.1f} tok/s/chip "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
    qm.W4A8_DECODE = False

    if results[False] and results[True]:
        base, got = max(results[False]), max(results[True])
        print(f"\nEXACT best: {base:.1f} tok/s  W4A8 best: {got:.1f} "
              f"tok/s  delta {(got / base - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
