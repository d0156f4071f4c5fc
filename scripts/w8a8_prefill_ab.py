"""Same-session interleaved A/B: W8A8 prefill (quant_matmul.W8A8_PREFILL)
vs the exact int4 dequant kernels on the FULL triad prefill leg — the
1455-image-word + prompt prefill through the full-depth int4 7B decoder.

Round-4 context: in the best single-chip configuration prefill (~186 ms)
is the largest triad leg, and its matmuls are within ~17% of the DENSE
bf16 ideal (scripts/profile_prefill.py) — the int8 MXU's 2x rate is the
only remaining lever. W4A8 lost here (1.077x) because its per-group
epilogue scales with M; the W8A8 path folds the group scales into int8
weights in VMEM and applies ONE rank-1 epilogue (_int4_kernel_w8a8p).

Measurement discipline (CLAUDE.md): chip rate drifts +-17% across
processes — only interleaved same-session pairs decide.

    python scripts/w8a8_prefill_ab.py [--rounds 6] [--prompt 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from a3vlm_tpu.models import ens5, llama
from a3vlm_tpu.ops import quant_matmul as qm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--gen_len", type=int, default=32)
    ap.add_argument("--bms", type=int, nargs="+", default=[256, 512],
                    help="W8A8P_BM arms to sweep (requant chain amortizes "
                    "over larger M-tiles)")
    a = ap.parse_args()

    largs = bench._7b_args()
    W = ens5.Ens5Config(llama=largs, crop_shard_axes=None).image_words
    total = W + a.prompt + a.gen_len
    largs = largs.replace(max_batch_size=1, max_seq_len=total)
    cfg = ens5.Ens5Config(llama=largs, crop_shard_axes=None)

    print("fabricating int4 7B decoder + image tokens...", flush=True)
    params = llama.unstack_layers(bench.fabricate_llama(largs, bits=4))
    # image tokens fabricated directly — towers are out of scope for this A/B
    it = jnp.full((1, W, largs.dim), 0.01, jnp.bfloat16)
    tokens = jnp.ones((1, a.prompt), jnp.int32)

    def make_prefill():
        # fresh jit per arm: the flag is trace-time
        @jax.jit
        def prefill_only(p, tokens, it):
            cache = llama.KVCache.create(
                cfg.llama, 1, max_seq_len=total, dtype=jnp.bfloat16,
                layered=True,
            )
            logits, cache, _ = llama.prefill(
                p, cfg.llama, cache, tokens, image_tokens=it
            )
            return logits

        return prefill_only

    arm_defs = [("exact", False, None)] + [
        (f"w8a8p_bm{bm}", True, bm) for bm in a.bms
    ]
    arms = {}
    for name, flag, bm in arm_defs:
        qm.W8A8_PREFILL = flag
        qm.W8A8P_BM = bm
        arms[name] = make_prefill()
        print(f"compiling arm {name}...", flush=True)
        bench._sync(arms[name](params, tokens, it))
    qm.W8A8_PREFILL = False
    qm.W8A8P_BM = None

    names = [n for n, _, _ in arm_defs]
    times = {n: [] for n in names}
    for r in range(a.rounds):
        order = names if r % 2 == 0 else names[::-1]
        for name in order:
            t0 = time.perf_counter()
            bench._sync(arms[name](params, tokens, it))
            times[name].append((time.perf_counter() - t0) * 1e3)
    base = bench._median(times["exact"])
    print(f"\nprefill exact-int4: {base:.1f} ms  "
          f"(all {[round(t, 1) for t in sorted(times['exact'])]})")
    for name in names[1:]:
        w8 = bench._median(times[name])
        print(f"prefill {name}: {w8:.1f} ms  ratio {w8 / base:.3f}x  "
              f"(all {[round(t, 1) for t in sorted(times[name])]})")
    print(f"({a.rounds} interleaved rounds, M={W + a.prompt} rows)")


if __name__ == "__main__":
    main()
