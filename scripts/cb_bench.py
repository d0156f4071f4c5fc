"""On-chip continuous-batching benchmark: 64 mixed-length requests
through the slot-pool batcher (serving_batch.ContinuousBatcher) vs static
wave batching (generation.Generator), 7B int4 fabricated weights.

The workload is ragged on BOTH ends (prompt 64-512 tokens, gen 16-128):
static batching pays max-padding plus the convoy effect (each wave runs
until its longest request finishes); the slot pool re-admits as slots
free. Prompt lengths are drawn from 4 buckets so admission prefill
compiles stay bounded.

Run:  timeout 3000 python scripts/cb_bench.py [--slots 16] [--n 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from a3vlm_tpu.generation import Generator  # noqa: E402
from a3vlm_tpu.models import llama  # noqa: E402
from a3vlm_tpu.serving_batch import ContinuousBatcher  # noqa: E402


class SyntheticTok:
    """Token-exact synthetic prompts: prompt string "req:<i>" maps to a
    pre-drawn token list (content-free weights make token values
    irrelevant; LENGTH drives the batching behavior under test)."""

    def __init__(self, table, vocab=32000):
        self.table = table
        self.n_words = vocab
        self.eos_id = 2
        self.bos_id = 1

    def encode(self, s, bos=True, eos=False):
        return list(self.table[s])

    def decode(self, toks):
        return " ".join(map(str, toks))


def make_workload(n, rng, prefix="req"):
    plens = rng.choice([64, 128, 256, 512], size=n)
    glens = rng.integers(16, 129, size=n)
    table = {
        f"{prefix}:{i}": rng.integers(10, 31000, size=plens[i]).tolist()
        for i in range(n)
    }
    return table, [f"{prefix}:{i}" for i in range(n)], glens.tolist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny model + short workload")
    ap.add_argument("--draft_k", type=int, default=0,
                    help="also run a speculative-CB leg (greedy prompt-"
                    "lookup, serving_batch draft_k). Random-token "
                    "prompts accept ~no drafts, so this leg measures the "
                    "WORST-CASE verify overhead of speculation in CB "
                    "(real triad outputs are loopy and accept heavily)")
    ap.add_argument("--w4a8", action="store_true",
                    help="route the int4 decode matmuls through the "
                    "W4A8 int-dot path (ragged CB rows are M <= slots "
                    "<= 32; +11% measured on the plain decode loop). "
                    "NOT bit-exact — see eval_affordance --w4a8")
    a = ap.parse_args()

    if a.w4a8:
        from a3vlm_tpu.ops import quant_matmul as _qm

        _qm.W4A8_DECODE = True
    if a.tiny:
        jax.config.update("jax_platforms", "cpu")

    print(f"device: {jax.devices()[0]}", flush=True)
    float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).reshape(-1)[0])
    print("handshake done", flush=True)

    rng = np.random.default_rng(0)
    table, prompts, glens = make_workload(a.n, rng)
    tok = SyntheticTok(table)
    if a.tiny:
        from a3vlm_tpu.config import ModelArgs

        args = ModelArgs(dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
                         vocab_size=32000, multiple_of=16,
                         max_batch_size=a.slots, max_seq_len=768)
        params = llama.unstack_layers(
            bench.fabricate(jax.eval_shape(
                lambda: llama.init_llama_params(jax.random.PRNGKey(0), args)
            ))
        )
        # CPU-XLA can't lower some BF16xBF16->F32 dots (the multi-token
        # verify einsum); the smoke mode runs f32
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x,
            params,
        )
        glens = [min(g, 24) for g in glens]
    else:
        args = bench._7b_args(max_batch_size=a.slots, max_seq_len=768)
        params = llama.unstack_layers(bench.fabricate_llama(args, bits=4))
    total_gen = sum(glens)

    # --- continuous batching -----------------------------------------------
    cb = ContinuousBatcher(params, args, tok, slots=a.slots,
                           kv_cache_bits=8)
    # compile every (bucket x admission-group) shape + the ragged step
    # BEFORE timing: remote compiles are 20-120 s each, and the first
    # on-chip run of this script spent ~300 of its 342 s compiling
    # mid-loop (TTFT p50 316 s of pure compile stall)
    cb.warmup(buckets=(64, 128, 256, 512))
    warm_table, warm_prompts, _ = make_workload(
        4, np.random.default_rng(1), prefix="warm"
    )
    tok.table.update(warm_table)
    t0 = time.perf_counter()
    cb.generate(prompts, max_gen_len=glens)
    cb_s = time.perf_counter() - t0
    print(
        f"continuous: {a.n} reqs in {cb_s:.2f}s = {a.n / cb_s:.2f} req/s, "
        f"{total_gen / cb_s:.1f} gen tok/s, {cb.steps} batched steps",
        flush=True,
    )
    s = cb.last_stats
    print(
        f"  ttft p50/p95: {s['ttft_p50_s']:.3f}/{s['ttft_p95_s']:.3f} s, "
        f"tpot p50/p95: {s['tpot_p50_ms']:.2f}/{s['tpot_p95_ms']:.2f} ms",
        flush=True,
    )

    # --- speculative continuous batching (optional leg) ----------------------
    if a.draft_k:
        cbs = ContinuousBatcher(params, args, tok, slots=a.slots,
                                kv_cache_bits=8, draft_k=a.draft_k)
        cbs.warmup(buckets=(64, 128, 256, 512))
        t0 = time.perf_counter()
        cbs.generate(prompts, max_gen_len=glens)
        sp_s = time.perf_counter() - t0
        print(
            f"spec(k={a.draft_k}): {a.n} reqs in {sp_s:.2f}s = "
            f"{a.n / sp_s:.2f} req/s, {total_gen / sp_s:.1f} gen tok/s, "
            f"{cbs.steps} verify rounds (vs {cb.steps} vanilla steps)",
            flush=True,
        )

    # --- static wave batching ----------------------------------------------
    # free the CB pool caches first: two live kv8 pools + the static
    # generator's own cache next to the int4 weights OOMed v5e-1
    del cb
    if a.draft_k:
        del cbs
    gen = Generator(params, args, tok, vocab_limit=32000, kv_cache_bits=8)
    waves = [
        list(range(i, min(i + a.slots, a.n)))
        for i in range(0, a.n, a.slots)
    ]
    # warm
    gen.generate([warm_prompts[0]] * a.slots, max_gen_len=2,
                 temperature=0.0)
    t0 = time.perf_counter()
    for wave in waves:
        gmax = max(glens[i] for i in wave)
        gen.generate([prompts[i] for i in wave], max_gen_len=gmax,
                     temperature=0.0)
    st_s = time.perf_counter() - t0
    print(
        f"static:     {a.n} reqs in {st_s:.2f}s = {a.n / st_s:.2f} req/s, "
        f"{total_gen / st_s:.1f} gen tok/s ({len(waves)} waves)",
        flush=True,
    )
    print(f"continuous/static speedup: {st_s / cb_s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
