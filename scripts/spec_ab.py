"""Same-session interleaved A/B/C of the image->triad p50: vanilla greedy
vs prompt-lookup speculation at REALIZED acceptance vs the near-perfect
upper bound.

The realized leg clamps per-round accepted draft length to the acceptance
measured on real triad content by scripts/spec_acceptance.py (1.62
emitted tokens per verify round at K>=6); the upper-bound leg lets the
fabricated constant-token weights accept ~everything. All three variants
share ONE set of full-scale params (towers bf16 + int4 7B decoder) and
are timed interleaved in one process — cross-process chip rate drifts
±15-17%, so only same-session comparisons are decision-grade.

    python scripts/spec_ab.py [--rounds 3] [--reps 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--gen_len", type=int, default=32)
    ap.add_argument("--prompt_len", type=int, default=32)
    ap.add_argument(
        "--ks", default=None,
        help="comma list of draft_k values: sweep realized-acceptance "
        "latency per K (caps from bench.SPEC_ACCEPT_CAPS_BY_K; smaller K "
        "pays a cheaper verify forward at only slightly lower measured "
        "acceptance). Default: the single-K vanilla/realized/upper-bound "
        "A/B at K=8",
    )
    a = ap.parse_args()

    from a3vlm_tpu.models import ens5, llama

    largs = bench._7b_args()
    W_cfg = ens5.Ens5Config(llama=largs, crop_shard_axes=None)
    W = W_cfg.image_words
    total = W + a.prompt_len + a.gen_len + 8 + 1
    largs = largs.replace(max_batch_size=1, max_seq_len=total)
    cfg = ens5.Ens5Config(llama=largs, crop_shard_axes=None)

    tower_shapes = jax.eval_shape(
        lambda: ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    )
    params = {
        k: bench.fabricate(v) for k, v in tower_shapes.items()
        if k != "llama"
    }
    params["llama"] = llama.unstack_layers(
        bench.fabricate_llama(largs, bits=4)
    )

    def make(mode, draft_k=8, caps="default"):
        @jax.jit
        def one_query(p, image, tokens):
            it = ens5.build_image_tokens(p, cfg, image)
            cache = llama.KVCache.create(
                cfg.llama, 1, max_seq_len=total, dtype=jnp.bfloat16,
                layered=True,
            )
            logits, cache, _ = llama.prefill(
                p["llama"], cfg.llama, cache, tokens, image_tokens=it
            )
            if mode == "vanilla":
                tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

                def body(i, carry):
                    tok, cache = carry
                    lg, cache = llama.decode_step(
                        p["llama"], cfg.llama, cache, tok,
                        W + a.prompt_len + i,
                    )
                    return (
                        jnp.argmax(lg, -1).astype(jnp.int32)[:, None],
                        cache,
                    )

                tok, _ = jax.lax.fori_loop(
                    0, a.gen_len, body, (tok, cache)
                )
                return tok
            from a3vlm_tpu.lookup_decode import lookup_generate

            first = jnp.argmax(logits, -1).astype(jnp.int32)[0]
            cp = caps
            if cp == "default":
                cp = (bench.SPEC_ACCEPT_CAPS if mode == "realized"
                      else None)
            out, _, _, _ = lookup_generate(
                p["llama"], cfg.llama, cache, tokens[0],
                W + a.prompt_len, first, gen_len=a.gen_len,
                draft_k=draft_k, accept_cap=cp,
            )
            return out[-1:]

        return one_query

    image = jnp.zeros((1, 448, 448, 3), jnp.bfloat16)
    tokens = jnp.ones((1, a.prompt_len), jnp.int32)
    if a.ks:
        modes = ["vanilla"]
        fns = {"vanilla": make("vanilla")}
        for k in (int(x) for x in a.ks.split(",")):
            name = f"realized_k{k}"
            modes.append(name)
            fns[name] = make(
                "realized", draft_k=k,
                caps=bench.SPEC_ACCEPT_CAPS_BY_K[k],
            )
    else:
        modes = ["vanilla", "realized", "upper_bound"]
        fns = {m: make(m) for m in modes}
    for m in modes:
        t0 = time.time()
        bench._sync(fns[m](params, image, tokens))  # compile
        print(f"compiled {m} in {time.time() - t0:.0f}s", flush=True)

    results = {m: [] for m in modes}
    for rep in range(a.reps):
        order = modes if rep % 2 == 0 else modes[::-1]
        for m in order:
            ts = []
            for _ in range(a.rounds):
                t0 = time.perf_counter()
                bench._sync(fns[m](params, image, tokens))
                ts.append((time.perf_counter() - t0) * 1e3)
            med = bench._median(ts)
            results[m].append(med)
            print(f"[rep {rep}] {m}: {med:.1f} ms", flush=True)

    best = {m: min(results[m]) for m in modes}
    parts = [f"vanilla {best['vanilla']:.1f} ms"] + [
        f"{m} {best[m]:.1f} ms ({best[m] / best['vanilla']:.3f}x)"
        for m in modes if m != "vanilla"
    ]
    print("\np50 best-of-reps: " + " | ".join(parts))


if __name__ == "__main__":
    main()
