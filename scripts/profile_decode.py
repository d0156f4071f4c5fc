"""Capture a jax.profiler device trace of the full-depth int4 decode loop
and print a per-op device-time table (from the profiler's Chrome-trace
export; tensorboard_plugin_profile is not installed here).

Built to localize the "~2.8 ms/step of inter-op glue" from the round-3
differenced decomposition; the FIRST trace (7B int4 b16, S=144) showed
that decomposition was WRONG — ground truth per step:
    int4 matmuls      7.40 ms  (70%)  <- 3.35 GB weights at ~453 GB/s
    decode attention  2.07 ms  (19%)  <- full-panel reads, ~583 GB/s
    KV cache writes   0.55 ms  ( 5%)  <- dus partial-tile RMW, 2/layer
    relayout copies   0.31 ms  ( 3%)  <- ~4-6 small activation copies/layer
    elementwise rest  0.31 ms  ( 3%)
so matmul bandwidth is the decode lever, not launch glue (consistent with
the GLU-fusion wash in scripts/ffn_fuse_ab.py: removing two XLA islands
changed nothing because the islands were never the cost).

A3VLM_INT4_VARIANT=v3 (env, read at import by ops/quant_matmul) reruns the
trace with the group-factored int4 kernel for per-callsite comparison.

Usage: python scripts/profile_decode.py [--steps 8] [--bits 4]
"""
import argparse
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_traced(outdir, bits, batch, prompt, steps):
    import bench
    from a3vlm_tpu.models import llama

    args = bench._7b_args().replace(
        max_batch_size=batch, max_seq_len=prompt + steps + 8
    )
    params = llama.unstack_layers(bench.fabricate_llama(args, bits=bits))

    @jax.jit
    def decode_loop(p, tok, cache):
        # returns ONLY the token: returning the cache from the jit makes
        # XLA stage every panel out through a ~57us ConcatBitcast+copy
        # epilogue (64 panels x 57us — measured; it polluted the first
        # trace's per-step copy accounting)
        def body(i, carry):
            tok, cache = carry
            logits, cache = llama.decode_step(p, args, cache, tok, prompt + i)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            return tok, cache

        tok, cache = jax.lax.fori_loop(0, steps, body, (tok, cache))
        return tok

    cache = llama.KVCache.create(args, batch, dtype=jnp.bfloat16, layered=True)
    logits, cache, _ = llama.prefill(
        params, args, cache, jnp.ones((batch, prompt), jnp.int32)
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    # compile + one warm run outside the trace
    out = decode_loop(params, tok, cache)
    _ = float(out.reshape(-1)[0])
    jax.profiler.start_trace(outdir)
    out = decode_loop(params, tok, cache)
    _ = float(out.reshape(-1)[0])
    jax.profiler.stop_trace()


def parse_trace(outdir, steps):
    """Aggregate device-op times from the profiler's Chrome-trace export
    (vm.trace.json.gz — present on the axon relay; far easier than the
    xplane proto). Prints per-op-family ms/step on the device "XLA Ops"
    line, which is the ground-truth decode decomposition."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO trace.json.gz produced — device tracing unsupported?")
        return
    import collections
    import json
    import re as _re

    d = json.load(gzip.open(sorted(paths)[-1]))
    evs = [e for e in d.get("traceEvents", []) if e.get("ph") == "X"]
    # device pid: process named /device:TPU:N ; XLA Ops thread holds the
    # per-op events (XLA Modules holds one whole-program event)
    pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "/device:" in n}
    tnames = {(e["pid"], e["tid"]): e["args"].get("name", "")
              for e in d["traceEvents"]
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg = collections.defaultdict(lambda: [0.0, 0])
    outer = []
    for e in evs:
        if e["pid"] not in dev_pids:
            continue
        tn = tnames.get((e["pid"], e["tid"]), "")
        if tn != "XLA Ops":
            continue
        base = _re.sub(r"\.\d+$", "", e["name"])
        if base in ("while", "jit_decode_loop"):
            outer.append(e["dur"])
            continue
        a = agg[base]
        a[0] += e["dur"]
        a[1] += 1
    if not agg:
        print("no XLA Ops events found; planes:", set(pids.values()))
        return
    tot = sum(a[0] for a in agg.values())
    print(f"\nper-op-family device time ({tot / steps / 1e3:.3f} ms/step"
          f" inner sum; outer while {sum(outer) / steps / 1e3:.3f}):")
    print(f"{'ms/step':>9}  {'count':>6}  op-family")
    for name, (dur, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{dur / steps / 1e3:9.3f}  {c:6d}  {name[:80]}")
    # per-callsite int4 matmul table (distinct .NNN program points)
    cs = collections.defaultdict(lambda: [0.0, 0])
    for e in evs:
        if e["pid"] in dev_pids and e["name"].startswith("_int4_matmul_2d"):
            a = cs[e["name"]]
            a[0] += e["dur"]
            a[1] += 1
    if cs:
        rows = sorted(cs.items(), key=lambda kv: -kv[1][0])
        print(f"\nint4 callsites: {len(rows)}; top 5 + tail sum:")
        for name, (dur, c) in rows[:5]:
            print(f"  {dur / steps:8.1f} us/step x{c:4d}  {name}")
        print(f"  tail: {sum(d for _, (d, c) in rows[5:]) / steps:.1f}"
              " us/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--outdir", default="/tmp/decode_trace")
    args = ap.parse_args()
    import shutil

    shutil.rmtree(args.outdir, ignore_errors=True)  # no stale traces
    os.makedirs(args.outdir, exist_ok=True)
    print("int4 variant:", os.environ.get("A3VLM_INT4_VARIANT", "v1"))
    run_traced(args.outdir, args.bits, args.batch, args.prompt, args.steps)
    parse_trace(args.outdir, args.steps)


if __name__ == "__main__":
    main()
