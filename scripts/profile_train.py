"""Explain the multimodal train step's 27.5% decoder-only MFU with device
ground truth (VERDICT r3 item 5): where do the non-decoder-matmul
milliseconds go — towers? remat recompute? optimizer? copies?

Two instruments over the EXACT bench_train_step config (~1B bf16 decoder,
four frozen full towers, five-crop 448px, 1455 image words + 256 text):

1. component timings from separate jits on the same params/batch:
     towers+projector forward   (the frozen feature path, fwd-only)
     full loss forward          (towers + decoder fwd)
     full train step            (fwd + bwd-through-decoder + AdamW)
   The decoder fwd = (loss fwd) - (tower fwd); bwd+opt = step - loss fwd.
   With remat, bwd recomputes the decoder forward, so the expected
   bwd/fwd ratio for the decoder is ~3x (recompute + 2x grad matmuls).

2. a jax.profiler device trace of ONE train step, aggregated per
   op-family (reuses profile_decode.parse_trace) — separates MXU fusions
   / convolutions from copies, reduces, and optimizer elementwise.

The MFU denominator question is also settled here: bench_train_step's
"mfu_decoder_only" counts ONLY 6*N_dec*tokens. The towers' forward flops
(4 towers x 5 crops x 448px, all MXU convs/matmuls) are real device work
excluded from the numerator, so the printed "true_mfu" row re-derives
utilization with tower flops included.

Usage: python scripts/profile_train.py [--rounds 3]
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--text_len", type=int, default=256)
    ap.add_argument("--outdir", default="/tmp/train_trace")
    a = ap.parse_args()

    import bench
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import ens5
    from a3vlm_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
        next_token_loss,
    )

    W = ens5.Ens5Config(crop_shard_axes=None).image_words
    total = W + a.text_len + 1
    dec_dim, dec_layers = 2048, 16
    largs = ModelArgs(
        dim=dec_dim, n_layers=dec_layers, n_heads=dec_dim // 128,
        n_kv_heads=dec_dim // 128, vocab_size=32000, multiple_of=256,
        max_batch_size=a.batch, max_seq_len=-(-total // 8) * 8,
    )
    cfg = ens5.Ens5Config(llama=largs, crop_shard_axes=None)

    tower_shapes = jax.eval_shape(
        lambda: ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    )
    params = {k: bench.fabricate(v) for k, v in tower_shapes.items()}
    n_dec = sum(x.size for x in jax.tree_util.tree_leaves(params["llama"]))

    mask = ens5.trainable_mask(params)
    optimizer = make_optimizer(1e-4, max_grad_norm=8.0)

    def loss_fn(p, b):
        logits = ens5.forward(
            p, cfg, b["examples"], image=b["image"], remat=True
        )
        return next_token_loss(logits, b["labels"])

    train_step = jax.jit(
        make_train_step(loss_fn, optimizer, accum_steps=1,
                        trainable_mask=mask),
        donate_argnums=0,
    )
    batch_ = {
        "examples": jnp.ones((a.batch, a.text_len), jnp.int32),
        "labels": jnp.ones((a.batch, a.text_len), jnp.int32),
        "image": jnp.zeros(
            (a.batch, cfg.image_size, cfg.image_size, 3), jnp.bfloat16
        ),
    }

    # --- component jits (separate, same params) -------------------------
    towers_fwd = jax.jit(
        lambda p, img: ens5.encode_image(p, cfg, img)
    )
    loss_fwd = jax.jit(loss_fn)

    def timed(fn, *xs, rounds=a.rounds):
        out = fn(*xs)
        _sync(jax.tree_util.tree_leaves(out)[0])  # compile + warm
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = fn(*xs)
            _sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    tower_ms = timed(towers_fwd, params, batch_["image"])
    lossfwd_ms = timed(loss_fwd, params, batch_)

    state = jax.jit(
        lambda p: TrainState.create(p, optimizer, mask), donate_argnums=0
    )(params)
    del params, tower_shapes

    state, m = train_step(state, batch_)  # compile
    _sync(m["loss"])
    ts = []
    for _ in range(a.rounds):
        t0 = time.perf_counter()
        state, m = train_step(state, batch_)
        _sync(m["loss"])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    step_ms = ts[len(ts) // 2] * 1e3

    tokens = a.batch * (W + a.text_len)
    dec_fwd_ms = lossfwd_ms - tower_ms
    bwd_opt_ms = step_ms - lossfwd_ms
    # flops: decoder fwd 2*N*T, bwd 4*N*T (+ remat recompute 2*N*T of
    # fwd flops re-executed); towers fwd-only. Tower flop count from
    # param count x tokens-ish is wrong for convs — use analytic below.
    dec_flops = 6.0 * n_dec * tokens
    # tower forward flops: ViT-L/14@448 five-crop x ~3 vit towers + conv
    # tower; approximate as 2 * N_tower * tokens_tower per tower via
    # jax.jit cost analysis (exact, compiler-reported).
    try:
        cost = towers_fwd.lower(
            state.params, batch_["image"]
        ).compile().cost_analysis()
        tower_flops = float(cost.get("flops", 0.0))
    except Exception as e:  # pragma: no cover
        tower_flops = 0.0
        print("cost_analysis failed:", e)
    try:
        step_cost = train_step.lower(state, batch_).compile().cost_analysis()
        step_flops = float(step_cost.get("flops", 0.0))
    except Exception as e:  # pragma: no cover
        step_flops = 0.0
        print("step cost_analysis failed:", e)

    print(f"\ncomponents (median of {a.rounds}):")
    print(f"  towers fwd        {tower_ms:8.1f} ms")
    print(f"  loss fwd          {lossfwd_ms:8.1f} ms  (decoder fwd ~ {dec_fwd_ms:.1f})")
    print(f"  full step         {step_ms:8.1f} ms  (bwd+opt ~ {bwd_opt_ms:.1f})")
    print(f"  tokens/s          {tokens / step_ms * 1e3:8.1f}")
    print(f"  decoder-only MFU  {dec_flops / (step_ms / 1e3) / 197e12:8.4f}")
    if tower_flops:
        print(f"  tower fwd flops   {tower_flops / 1e12:8.2f} TF "
              f"({tower_flops / (tower_ms / 1e3) / 197e12 * 100:.1f}% MXU during towers)")
    if step_flops:
        print(f"  whole-step flops  {step_flops / 1e12:8.2f} TF -> "
              f"true MFU {step_flops / (step_ms / 1e3) / 197e12 * 100:.1f}%")

    # --- device trace of one step ---------------------------------------
    shutil.rmtree(a.outdir, ignore_errors=True)
    os.makedirs(a.outdir, exist_ok=True)
    jax.profiler.start_trace(a.outdir)
    state, m = train_step(state, batch_)
    _sync(m["loss"])
    jax.profiler.stop_trace()
    from profile_decode import parse_trace
    parse_trace(a.outdir, steps=1)


if __name__ == "__main__":
    main()
