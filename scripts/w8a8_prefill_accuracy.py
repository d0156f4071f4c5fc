"""On-chip numerics gate for the W8A8 prefill path
(ops/quant_matmul.W8A8_PREFILL).

The CPU tests (tests/test_w8a8_prefill.py) bound ONE matmul; this script
measures how the activation-int8 rounding + in-VMEM weight requant
compound through a full 32-layer 7B PREFILL on the real chip, and how the
perturbed KV cache carries into subsequent EXACT decode steps (prefill
writes the cache every downstream token attends to — the error surface is
the whole generation, not just the prefill logits).

Same random-content construction as scripts/w4a8_accuracy.py (fabricated
constant weights are useless for numerics). Both arms teacher-force the
SAME token stream; decode steps run the exact kernels in both arms (the
flag only routes M >= 256), so every difference traces back to prefill.

Decision rule: ship as an opt-in serving mode if greedy argmax agreement
is ~100% and logit rel-RMS stays at the int4-quantization noise scale.

    python scripts/w8a8_prefill_accuracy.py [--prompt 512] [--steps 32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops import quant_matmul as qm
from w4a8_accuracy import random_llama_int4


def make_run(args, prompt_len, steps):
    V = args.vocab_size

    @jax.jit
    def run(p, prompt, stream):
        cache = llama.KVCache.create(
            args, prompt.shape[0], dtype=jnp.bfloat16, layered=True
        )
        pl_logits, cache, _ = llama.prefill(p, args, cache, prompt)
        out = jnp.zeros((steps, prompt.shape[0], V), jnp.float32)

        def body(i, carry):
            cache, out = carry
            tok = jax.lax.dynamic_slice_in_dim(stream, i, 1, axis=1)
            lg, cache = llama.decode_step(p, args, cache, tok, prompt_len + i)
            out = jax.lax.dynamic_update_index_in_dim(out, lg, i, 0)
            return cache, out

        _, out = jax.lax.fori_loop(0, steps, body, (cache, out))
        return pl_logits.astype(jnp.float32), out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=512,
                    help=">= 256 so the W8A8 route engages")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    assert a.prompt >= qm.W8A8_PREFILL_MIN_M

    margs = bench._7b_args().replace(
        max_batch_size=a.batch, max_seq_len=a.prompt + a.steps + 8
    )
    print("building random-content 7B int4 params on device...", flush=True)
    params = random_llama_int4(margs, seed=a.seed)

    rng = np.random.default_rng(a.seed)
    prompt = jnp.asarray(
        rng.integers(5, 30000, (a.batch, a.prompt)), jnp.int32
    )
    stream = jnp.asarray(
        rng.integers(5, 30000, (a.batch, a.steps)), jnp.int32
    )

    outs = {}
    for flag in (False, True):
        qm.W8A8_PREFILL = flag
        run = make_run(margs, a.prompt, a.steps)
        pf, dec = run(params, prompt, stream)
        outs[flag] = (np.asarray(pf, np.float32), np.asarray(dec, np.float32))
        print(f"w8a8_prefill={flag}: prefill logits mean|.| "
              f"{np.abs(outs[flag][0]).mean():.4f}", flush=True)
    qm.W8A8_PREFILL = False

    for name, idx in (("prefill last-pos logits", 0),
                      ("decode-through-cache logits", 1)):
        exact, got = outs[False][idx], outs[True][idx]
        diff = got - exact
        rel = np.linalg.norm(diff) / np.linalg.norm(exact)
        agree = (got.argmax(-1) == exact.argmax(-1)).mean()
        srt = np.sort(exact, axis=-1)
        margin = (srt[..., -1] - srt[..., -2]).mean()
        print(f"\n{name}: rel RMS {rel:.5f}  max|diff| "
              f"{np.abs(diff).max():.5f} (exact std {exact.std():.4f}, "
              f"top1-top2 margin {margin:.4f})")
        print(f"  greedy argmax agreement: {agree * 100:.2f}%")


if __name__ == "__main__":
    main()
