"""Same-session on-chip A/B of the fused write+attend decode kernel
(ops/decode_attention.py::update_and_attend_decode_cache) in the REAL
full-depth decode loop.

The two-step path costs 2 launch-bound dynamic_update_slice ops per layer
(0.55 ms/step at batch 16 in the round-3 trace) plus the transpose copies
feeding them; the fused kernel absorbs both into the attention custom
call. Interleaved A/B in one process (chip rate drifts up to ±17% across
processes — bw_probe.py measurements; only same-session comparisons are
decision-grade). Run:

    python scripts/fused_ab.py [--bits 4] [--batch 16] [--kv_bits 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from a3vlm_tpu.ops import decode_attention as da


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
            da.FUSE_UPDATE_ATTEND = fuse
            t0 = time.time()
            tps = bench.bench_decode_full(
                margs, bits=args.bits, batch=args.batch, rounds=args.rounds
            )
            results[fuse].append(tps)
            print(f"[rep {rep}] fused={fuse}: {tps:.1f} tok/s/chip "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)

    base = max(results[False])
    fused = max(results[True])
    print(f"\nTWO-STEP best: {base:.1f} tok/s  FUSED best: {fused:.1f} "
          f"tok/s  delta {(fused / base - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
