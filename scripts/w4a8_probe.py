"""Mosaic legality probe for the W4A8 int-dot spike: does an int8 x int8
-> int32 ``jnp.dot`` legalize inside a Pallas TPU kernel on v5e?

Context (CLAUDE.md "Known gaps"): the exact-numerics int4 dequant chain
costs ~11% of decode matmul time and no exact variant captures it; the
only remaining lever is integer dots (skip the i32->f32->bf16 convert+mul
chain entirely). v5e advertises 2x int8 MXU throughput, but Mosaic
support for i8 operands is unverified — and i8 vector SHIFTS already
failed to legalize in round 2 (arith.shli on i8), so nothing is assumed.

Probes, in order (each its own pallas_call; failures print and continue):
  1. dot(i8, i8) -> i32            — the W4A8 core op
  2. dot(bf16-from-i8-narrowing)   — i32 unpack -> i8 -> bf16 (cast chain)
  3. group-dot i8 with f32 epilogue — the real W4A8 kernel shape in-small

Run: python scripts/w4a8_probe.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"[{name}] OK  out[0,:4]={out[0, :4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[{name}] FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    M, K, N = 16, 256, 256
    rng = np.random.default_rng(0)
    xq = rng.integers(-127, 128, (M, K)).astype(np.int8)
    wq = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = rng.integers(-128, 128, (K, N)).astype(np.int8)

    def k_intdot(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.int32)

    def run_intdot():
        return pl.pallas_call(
            k_intdot,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(xq), jnp.asarray(wq))

    def k_unpack_i8(q_ref, o_ref):
        p = q_ref[:].astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(jnp.int8)
        o_ref[:] = lo.astype(jnp.int32)

    def run_unpack():
        return pl.pallas_call(
            k_unpack_i8,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(packed))

    def k_w4a8(x_ref, q_ref, s_ref, xs_ref, o_ref, *, group):
        p = q_ref[:].astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(jnp.int8)  # [K, N] int8 in [-8, 7]
        Kb = p.shape[0]
        sg = Kb // group
        acc = None
        for g in range(sg):
            part = jnp.dot(
                x_ref[:, g * group:(g + 1) * group],
                lo[g * group:(g + 1) * group, :],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            part = part * s_ref[g, :][None, :]
            acc = part if acc is None else acc + part
        o_ref[:] = acc * xs_ref[:]

    def run_w4a8():
        group = 64
        s = np.abs(rng.normal(size=(K // group, N))).astype(np.float32)
        xs = np.abs(rng.normal(size=(M, 1))).astype(np.float32)
        return pl.pallas_call(
            functools.partial(k_w4a8, group=group),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(xq), jnp.asarray(packed), jnp.asarray(s),
          jnp.asarray(xs))

    print("devices:", jax.devices(), flush=True)
    ok1 = probe("int8xint8->int32 dot", run_intdot)
    probe("i32->i8 narrowing unpack", run_unpack)
    ok3 = probe("group int-dot + f32 epilogue", run_w4a8)
    print("\nW4A8 kernel viable:", ok1 and ok3)


if __name__ == "__main__":
    main()
