"""On-chip A/B: CLIP ViT-L/14 encode with XLA sdpa vs the batched Pallas
attention kernel (ops/vit_attention.py). Settles VERDICT round-2 item 9:
either the kernel beats XLA at D=64/S=257 or the ceiling is structural.

Run:  timeout 590 python scripts/vit_attn_ab.py
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    float((jnp.ones((8, 128)) @ jnp.ones((128, 8))).reshape(-1)[0])
    print("handshake done", flush=True)
    for batch in (16, 64):
        xla = bench.bench_vit_encode(batch=batch, attn_kernel=False)
        jax.clear_caches()
        kern = bench.bench_vit_encode(batch=batch, attn_kernel=True)
        jax.clear_caches()
        print(
            f"batch {batch:3d}: xla {xla:7.1f} img/s | kernel {kern:7.1f} "
            f"img/s | {'KERNEL WINS' if kern > xla else 'xla wins'} "
            f"({kern / xla:.3f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
