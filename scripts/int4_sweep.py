"""On-chip A/B sweep: int4 fused dequant-matmul kernel variants.

v1 = expanded-scale (round-2 shipping kernel, ~480 GB/s effective)
v2 = group-factored scales (per-group batched dots, scale epilogue)

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


def bench_shape(K, N, M, variant, rounds=20):
    rng = np.random.default_rng(0)
    qw = _quantize_leaf_int4(
        (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
    )
    x = jnp.asarray(rng.normal(size=(M, qw.q.shape[0] * 2)), jnp.bfloat16)

    @jax.jit
    def run(x, q, s):
        # 8 chained calls per dispatch to amortize relay overhead
        out = _int4_matmul_2d(x, q, s, group=qw.group, variant=variant)
        for _ in range(7):
            out = _int4_matmul_2d(
                x + (out[0, 0] * 0).astype(x.dtype), q, s,
                group=qw.group, variant=variant,
            )
        return out

    out = run(x, qw.q, qw.scale)
    _sync(out)
    # correctness
    ref = np.asarray(_int4_matmul_xla(x.astype(jnp.float32), qw))
    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
    rel = err / (np.abs(ref).max() + 1e-9)

    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(run(x, qw.q, qw.scale))
        times.append((time.perf_counter() - t0) / 8)
    t = sorted(times)[len(times) // 2]
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
        for variant in ("v1", "v2"):
            gbs, us, rel = bench_shape(K, N, a.m, variant)
            row.append(
                f"{variant}: {gbs:6.1f} GB/s {us:8.1f} us rel_err={rel:.1e}"
            )
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
