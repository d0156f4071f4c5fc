"""On-chip numerics gate for the W4A8 int-dot decode path
(ops/quant_matmul.W4A8_DECODE).

The CPU tests (tests/test_w4a8.py) bound the error of ONE matmul; this
script measures how the per-token int8 activation rounding COMPOUNDS
through the full 32-layer 7B decode stack on the real chip. The bench's
constant-fabricated weights are useless for numerics (every logit equal),
so this builds a full-depth 7B-shaped decoder with RANDOM content —
random int4 codes, realistic group scales (dequant weight std ~0.02),
random embeddings — and teacher-forces the SAME random token stream
through both decode paths (prefill M is large, so it takes the exact
kernel under either flag; only the decode steps differ).

Reports per-step logit relative RMS, worst-step relative error, and
greedy argmax agreement across steps. Decision rule mirrors the quant
blocklist gate: ship W4A8 as an opt-in serving mode if argmax agreement
is ~100% and rel-RMS stays in the int4-quantization noise floor
(weight-int4 itself already perturbs logits far more than A8 rounding).

    python scripts/w4a8_accuracy.py [--steps 64] [--batch 4]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from a3vlm_tpu import quant
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops import quant_matmul as qm


def random_llama_int4(args, seed=0):
    """7B-shaped llama params with random CONTENT (vs bench.fabricate_llama's
    content-free jnp.full): random int4 codes + group scales sized so the
    dequantized weight std is ~0.02 (trained-checkpoint-like), random
    bf16 embeddings/head-adjacent dense leaves, unit norms."""
    L, D, V = args.n_layers, args.dim, args.vocab_size
    H, Hkv, hd, F = args.n_heads, args.kv_heads, args.head_dim, args.ffn_hidden_dim

    # ONE jit for the whole build: eager per-leaf jax.random calls each pay
    # a remote compile on the relay (~15 leaves x 20-120 s)
    @jax.jit
    def build(root):
        counter = [0]

        def key():
            counter[0] += 1
            return jax.random.fold_in(root, counter[0])

        def qw(in_dim, out_dim, lead=()):
            pad_in, g = quant.int4_geometry(in_dim)
            q = jax.random.randint(
                key(), (*lead, pad_in // 2, out_dim), -128, 128, jnp.int8
            )
            # int4 codes ~unif[-8,7] -> std ~4.6; scale ~4.4e-3 -> w std ~0.02
            s = jax.random.uniform(
                key(), (*lead, pad_in // g, out_dim), jnp.float32, 3e-3, 6e-3
            )
            return quant.QuantizedWeight(q, s, bits=4, group=g, in_dim=in_dim)

        return {
            "tok_embeddings": {
                "weight": (
                    jax.random.normal(key(), (V, D), jnp.bfloat16) * 0.02
                )
            },
            "layers": {
                "attention": {
                    "wq": {"weight": qw(D, H * hd, (L,))},
                    "wk": {"weight": qw(D, Hkv * hd, (L,))},
                    "wv": {"weight": qw(D, Hkv * hd, (L,))},
                    "wo": {"weight": qw(H * hd, D, (L,))},
                },
                "feed_forward": {
                    "w1": {"weight": qw(D, F, (L,))},
                    "w2": {"weight": qw(F, D, (L,))},
                    "w3": {"weight": qw(D, F, (L,))},
                },
                "attention_norm": {"weight": jnp.ones((L, D), jnp.bfloat16)},
                "ffn_norm": {"weight": jnp.ones((L, D), jnp.bfloat16)},
            },
            "norm": {"weight": jnp.ones((D,), jnp.bfloat16)},
            "output": {"weight": qw(D, V)},
        }

    return llama.unstack_layers(build(jax.random.PRNGKey(seed)))


def make_run(args, prompt_len, steps):
    V = args.vocab_size

    @jax.jit
    def run(p, prompt, stream):
        cache = llama.KVCache.create(
            args, prompt.shape[0], dtype=jnp.bfloat16, layered=True
        )
        _, cache, _ = llama.prefill(p, args, cache, prompt)
        out = jnp.zeros((steps, prompt.shape[0], V), jnp.float32)

        def body(i, carry):
            cache, out = carry
            tok = jax.lax.dynamic_slice_in_dim(stream, i, 1, axis=1)
            lg, cache = llama.decode_step(p, args, cache, tok, prompt_len + i)
            out = jax.lax.dynamic_update_index_in_dim(out, lg, i, 0)
            return cache, out

        _, out = jax.lax.fori_loop(0, steps, body, (cache, out))
        return out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args_ = ap.parse_args()

    margs = bench._7b_args().replace(
        max_batch_size=args_.batch,
        max_seq_len=args_.prompt + args_.steps + 8,
    )
    print("building random-content 7B int4 params on device...", flush=True)
    params = random_llama_int4(margs, seed=args_.seed)

    rng = np.random.default_rng(args_.seed)
    prompt = jnp.asarray(
        rng.integers(5, 30000, (args_.batch, args_.prompt)), jnp.int32
    )
    stream = jnp.asarray(
        rng.integers(5, 30000, (args_.batch, args_.steps)), jnp.int32
    )

    outs = {}
    for w4a8 in (False, True):
        qm.W4A8_DECODE = w4a8
        run = make_run(margs, args_.prompt, args_.steps)
        outs[w4a8] = np.asarray(run(params, prompt, stream), np.float32)
        print(f"w4a8={w4a8}: logits [{outs[w4a8].shape}] "
              f"mean|.|={np.abs(outs[w4a8]).mean():.4f}", flush=True)
    qm.W4A8_DECODE = False

    exact, got = outs[False], outs[True]
    diff = got - exact
    # per-step relative RMS over the [B, V] logit slab
    norm = np.linalg.norm(exact.reshape(args_.steps, -1), axis=1)
    rel = np.linalg.norm(diff.reshape(args_.steps, -1), axis=1) / norm
    agree = (got.argmax(-1) == exact.argmax(-1)).mean()
    # margin context: how far apart are top1/top2 in the exact logits?
    srt = np.sort(exact, axis=-1)
    margin = (srt[..., -1] - srt[..., -2]).mean()
    print(f"\nlogit rel RMS: mean {rel.mean():.5f}  max {rel.max():.5f} "
          f"(step {rel.argmax()})")
    print(f"max abs logit diff: {np.abs(diff).max():.5f} "
          f"(exact logit std {exact.std():.4f}, top1-top2 margin "
          f"{margin:.4f})")
    print(f"greedy argmax agreement: {agree * 100:.2f}% over "
          f"{args_.steps} steps x {args_.batch} rows")


if __name__ == "__main__":
    main()
