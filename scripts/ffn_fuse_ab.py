"""Same-session on-chip A/B of the GLU-fused int4 FFN-down kernel
(ops/quant_matmul.py::int4_ffn_down) in the REAL full-depth decode loop.

Methodology (CLAUDE.md lessons): isolated kernel wins have reversed
in-loop before (v3/wide-N int4 variants), so the only number that counts
is bench.bench_decode_full with llama.FUSE_FFN_DOWN flipped, interleaved
A/B/A/B in one process to control for relay drift. Run:

    python scripts/ffn_fuse_ab.py [--bits 4] [--batch 16] [--model 7B]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from a3vlm_tpu.models import llama


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="7B", choices=["7B", "13B"])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2,
                    help="A/B pairs (interleaved)")
    args = ap.parse_args()

    margs = bench._7b_args() if args.model == "7B" else bench._13b_args()

    results = {True: [], False: []}
    for rep in range(args.reps):
        for fuse in (False, True) if rep % 2 == 0 else (True, False):
            llama.FUSE_FFN_DOWN = fuse
            t0 = time.time()
            tps = bench.bench_decode_full(
                margs, bits=args.bits, batch=args.batch, rounds=args.rounds
            )
            results[fuse].append(tps)
            print(f"[rep {rep}] fuse={fuse}: {tps:.1f} tok/s/chip "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)

    base = max(results[False])
    fused = max(results[True])
    print(f"\nUNFUSED best: {base:.1f} tok/s  FUSED best: {fused:.1f} tok/s  "
          f"delta {(fused / base - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
