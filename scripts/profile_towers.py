"""Localize the ~108 ms tower leg of the image->triad p50 with device
ground truth: which tower (EVA ViT-g / CLIP-L / ConvNeXt-XXL / DINOv2-g /
Q-Former) and which op family (matmul fusions, convs, attention, copies)
carry the time, and how far each sits from the MXU roofline.

Context: the triad decomposition (bench.bench_triad_decomposition) times
the whole five-crop four-tower encode at ~108 ms on one v5e chip. The
sum of tower matmul FLOPs at batch 5 (one image, five crops) is ~1.5
TFLOPs -> ~8 ms at the 197 TFLOP/s bf16 roofline, so the measured leg is
under 10% MXU. This script answers where the other 90% goes:

1. per-tower wall timings from separate jits on the same crops (EVA,
   Q-Former, CLIP, ConvNeXt resize+forward, DINOv2, and the one-jit
   full encode for the fusion delta);
2. a jax.profiler device trace of the one-jit full encode, aggregated
   per op family via profile_decode.parse_trace.

Usage: python scripts/profile_towers.py [--rounds 5] [--batch 1]
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
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0]).reshape(-1)[0])


def tower_flops(cfg, n_crops):
    """Rough forward matmul FLOPs per tower at [n_crops, 224, 224, 3]
    (attention scores/values included; patch embed as a matmul)."""
    import math

    def vit_flops(v):
        grid = 224 // v.patch_size
        T = grid * grid + 1
        d = v.width
        per_layer = (
            2 * T * d * (3 * d)          # qkv
            + 2 * T * d * d              # out proj
            + 2 * 2 * T * T * d          # scores + values
            + 2 * 2 * T * d * v.mlp_dim  # mlp
        )
        return n_crops * v.layers * per_layer

    f = {
        "eva_vit_g": vit_flops(cfg.blip2_vision),
        "clip_l": vit_flops(cfg.clip),
        "dinov2_g": vit_flops(cfg.dinov2),
    }
    # convnext: dominated by the stage blocks; approximate with 7x7 dw +
    # two 1x1 convs per block at each stage resolution
    c = cfg.convnext
    size = cfg.convnext_size // 4
    tot = 0.0
    for di, (depth, dim) in enumerate(zip(c.depths, c.dims)):
        hw = (size // (2 ** di)) ** 2
        per_block = hw * (2 * 49 * dim + 2 * dim * 4 * dim * 2)
        tot += depth * per_block
    f["convnext_xxl"] = n_crops * tot
    q = cfg.qformer
    f["qformer"] = (
        n_crops * q.layers * 2 * q.num_queries * q.hidden * q.hidden * 12
    )
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--outdir", default="/tmp/tower_trace")
    a = ap.parse_args()

    import bench
    from a3vlm_tpu.models import convnext as cnx
    from a3vlm_tpu.models import ens5, qformer, vit
    from profile_decode import parse_trace

    cfg = ens5.Ens5Config(llama=bench._7b_args(), crop_shard_axes=None)
    shapes = jax.eval_shape(
        lambda: ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    )
    params = {
        k: bench.fabricate(v) for k, v in shapes.items() if k != "llama"
    }
    dtype = jnp.bfloat16
    image = jnp.zeros((a.batch, 448, 448, 3), dtype)
    crops = jax.jit(lambda im: ens5.five_crop(im, cfg.crop_size))(image)
    _sync(crops)
    n_crops = 5 * a.batch

    legs = {
        "eva_vit_g": jax.jit(
            lambda p, c: vit.vit_forward(p["blip2_vision"], cfg.blip2_vision, c)
        ),
        "clip_l": jax.jit(
            lambda p, c: vit.vit_forward(p["clip"], cfg.clip, c)
        ),
        "dinov2_g": jax.jit(
            lambda p, c: vit.vit_forward(p["dinov2"], cfg.dinov2, c)
        ),
        "convnext_xxl": jax.jit(
            lambda p, c: cnx.convnext_forward(
                p["convnext"],
                cfg.convnext,
                jax.image.resize(
                    c.astype(jnp.float32),
                    (c.shape[0], cfg.convnext_size, cfg.convnext_size, 3),
                    method="bilinear",
                ).astype(c.dtype),
            )
        ),
    }
    blip_feats = legs["eva_vit_g"](params, crops)
    _sync(blip_feats)
    legs["qformer"] = jax.jit(
        lambda p, bf: qformer.qformer_forward(p["qformer"], cfg.qformer, bf)
    )

    full = jax.jit(lambda p, im: ens5.build_image_tokens(p, cfg, im))

    flops = tower_flops(cfg, n_crops)
    results = {}
    for name, fn in legs.items():
        arg = blip_feats if name == "qformer" else crops
        _sync(fn(params, arg))  # compile
        ts = []
        for _ in range(a.rounds):
            t0 = time.perf_counter()
            _sync(fn(params, arg))
            ts.append((time.perf_counter() - t0) * 1e3)
        results[name] = min(ts)
    _sync(full(params, image))
    ts = []
    for _ in range(a.rounds):
        t0 = time.perf_counter()
        _sync(full(params, image))
        ts.append((time.perf_counter() - t0) * 1e3)
    results["FULL_encode"] = min(ts)

    print(f"\nper-tower wall ms (batch {a.batch}, {n_crops} crops; min of"
          f" {a.rounds}; ~27 ms relay floor in each):")
    print(f"{'ms':>9} {'GF':>8} {'TF/s':>7}  leg")
    for name, ms in results.items():
        gf = flops.get(name, 0.0) / 1e9
        tfs = gf / ms if ms else 0.0
        print(f"{ms:9.1f} {gf:8.0f} {tfs:7.1f}  {name}")
    covered = sum(results[k] for k in legs)
    print(f"  sum of tower legs {covered:.1f} vs full {results['FULL_encode']:.1f}")

    # device trace of the one-jit full encode
    shutil.rmtree(a.outdir, ignore_errors=True)
    with jax.profiler.trace(a.outdir):
        _sync(full(params, image))
    parse_trace(a.outdir, steps=1)


if __name__ == "__main__":
    main()
