"""On-chip A/B sweep: int4 fused dequant-matmul kernel variants.

v1 = expanded-scale (round-2 shipping kernel, ~480 GB/s effective)
v3 = group-factored scales (2D per-group dots, scale epilogue; the
     3D-reshape "v2" formulation failed Mosaic compile on real TPU)

Measures effective HBM bandwidth (packed weight bytes / time) per
production matmul shape at decode batch M=16, plus correctness vs the XLA
path. Run:  timeout 590 python scripts/int4_sweep.py [--m 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from a3vlm_tpu.ops.quant_matmul import _int4_matmul_2d, _int4_matmul_xla
from a3vlm_tpu.quant import _quantize_leaf_int4

# production decode matmul shapes (7B: 4096/11008; 13B: 5120/13824)
SHAPES = [
    (4096, 4096),
    (4096, 11008),
    (11008, 4096),
    (5120, 5120),
    (5120, 13824),
    (13824, 5120),
]


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def bench_shape(K, N, M, variant, rounds=5, iters=256, block=None):
    """Per-call time via an in-jit serialized fori_loop, DIFFERENCED over
    two iteration counts: each host dispatch over the axon relay costs a
    ~27 ms readback floor, so any per-dispatch timing (the original
    8-chained harness) measures the relay, not the kernel — every shape
    'ran' at a flat ~3.8 ms. time(iters) - time(8) removes the constant
    dispatch+readback term.

    The loop carry feeds the matmul OUTPUT back into x scaled by 1e-30:
    numerically zero in bf16 (underflow) so every iteration computes the
    same product, but NOT foldable — a ``out[0, 0] * 0`` carry was
    constant-folded by XLA in some compiles, collapsing the loop and
    printing impossible bandwidths (24 TB/s) with run-to-run flapping."""
    rng = np.random.default_rng(0)
    qw = _quantize_leaf_int4(
        (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
    )
    Kpad = qw.q.shape[0] * 2
    x = jnp.asarray(rng.normal(size=(M, Kpad)), jnp.bfloat16)
    Nq = qw.q.shape[1]

    @jax.jit
    def run(x, q, s, n):
        def dep(out):
            # [M, N] -> [M, Kpad] feedback, values underflow to 0 in bf16
            d = (out * 1e-30).astype(x.dtype)
            if Nq >= Kpad:
                return d[:, :Kpad]
            return jnp.pad(d, ((0, 0), (0, Kpad - Nq)))

        def body(i, xc):
            out = _int4_matmul_2d(xc, q, s, group=qw.group,
                                  variant=variant, block=block)
            return x + dep(out)

        return _int4_matmul_2d(
            jax.lax.fori_loop(0, n, body, x), q, s,
            group=qw.group, variant=variant, block=block,
        )

    out = run(x, qw.q, qw.scale, 0)
    _sync(out)
    # correctness
    ref = np.asarray(_int4_matmul_xla(x.astype(jnp.float32), qw))
    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
    rel = err / (np.abs(ref).max() + 1e-9)

    def timed(n):
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            _sync(run(x, qw.q, qw.scale, n))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    t = (timed(iters + 8) - timed(8)) / iters
    gbs = qw.q.size / t / 1e9
    return gbs, t * 1e6, float(rel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    a = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    _sync(jnp.ones((8, 128)) @ jnp.ones((128, 8)))  # handshake
    print("handshake done", flush=True)
    for K, N in SHAPES:
        row = [f"K={K:6d} N={N:6d}"]
        for variant in ("v1", "v3"):
            gbs, us, rel = bench_shape(K, N, a.m, variant)
            row.append(
                f"{variant}: {gbs:6.1f} GB/s {us:8.1f} us rel_err={rel:.1e}"
            )
        print("  ".join(row), flush=True)
    # block-geometry candidates for the wide-N shapes (defaults are
    # BK 1024 / BN 1024; BK*BN capped at 1M elements by VMEM)
    for K, N in ((4096, 11008), (5120, 13824)):
        for block in ((512, 2048), (512, 1536)):
            gbs, us, rel = bench_shape(K, N, a.m, "v1", block=block)
            print(
                f"K={K:6d} N={N:6d}  v1 block={block}: {gbs:6.1f} GB/s "
                f"{us:8.1f} us rel_err={rel:.1e}", flush=True,
            )


if __name__ == "__main__":
    main()
