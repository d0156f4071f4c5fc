"""Ground-truth HBM bandwidth probes for the int4 decode question.

The round-3 trace (scripts/profile_decode.py) showed the int4 matmul
kernels sustain ~453 GB/s effective (510 actual incl. scales) IN-LOOP
while the isolated sweep (scripts/int4_sweep.py) reads ~750-840 GB/s —
at or above the v5e's 819 GB/s theoretical peak, which is implausible
for real streaming. Hypothesis: the isolated sweep re-reads ONE 8-25 MB
weight array per iteration, and repeated reads of a small resident set
run faster than genuine distinct-array streaming (on-chip buffering /
row-buffer locality), so the sweep measures a regime decode never sees
(decode streams 3.35 GB of distinct weights every step).

Probes (all differenced in-jit fori_loops, 1e-30-feedback loop carries
where outputs exist — the int4_sweep methodology):
  1. xla-sum over 8 DISTINCT 256 MB int8 arrays  -> true sustained read BW
  2. xla-sum re-reading ONE 8 MB array 8x        -> small-resident re-read
  3. xla-sum re-reading ONE 256 MB array 8x      -> large re-read
  4. int4 v1 matmul cycling 7 DISTINCT production-shape weights
     (one 7B layer's worth, no attention/glue between) -> does weight
     diversity alone reproduce the in-loop 450 GB/s?
  5. int4 v1 matmul on ONE 4096x4096 weight (the sweep's regime, for a
     same-session baseline)
  6. "rawdot" kernel: identical blocks/traffic to v1 but the dequant
     chain reduced to nibble-unpack + i32->bf16 (no expanded-scale mul;
     scalar epilogue keeps the scale READ) -> VPU-chain contribution

Run: timeout 590 python scripts/bw_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3vlm_tpu.ops.quant_matmul import _int4_matmul_2d
from a3vlm_tpu.quant import int4_geometry


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def _timed(fn, args, iters, rounds=5):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _sync(fn(*args, iters))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _diff(fn, args, iters=320, base=16):
    """Differenced per-iteration time. iters must be LARGE: the signal is
    (iters-base) * per_iter against the ~27 ms relay readback floor whose
    run-to-run variance is a few ms — at iters=64 the noise flipped A/B
    orderings between processes (observed v1 178 vs 212 us/layer-set)."""
    _sync(fn(*args, base))  # compile both shapes
    _sync(fn(*args, iters))
    return (_timed(fn, args, iters) - _timed(fn, args, base)) / (iters - base)


# --- probe 1-3: XLA streaming sums -----------------------------------------


def sum_probe(n_arrays, mb, reread=1):
    """Read ``n_arrays`` distinct int8 arrays of ``mb`` MB per iteration
    (each ``reread`` times). Loop-invariant-hoisting is defeated by a
    dynamic row offset derived from the running carry."""
    rows = mb * 1024 * 1024 // 1024
    xs = tuple(
        jnp.full((rows + 8, 1024), 1 + i, jnp.int8) for i in range(n_arrays)
    )

    @jax.jit
    def run(xs, n):
        def body(i, carry):
            total = carry
            off = (total % 2).astype(jnp.int32)
            for x in xs:
                for _ in range(reread):
                    piece = jax.lax.dynamic_slice(x, (off, 0), (rows, 1024))
                    total = total + jnp.sum(piece, dtype=jnp.int32) % 7
            return total

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    t = _diff(run, (xs,), iters=32)
    gb = n_arrays * reread * rows * 1024 / 1e9
    return gb / t


# --- probe 6: raw-dot kernel (v1 traffic, minimal dequant chain) ------------


def _rawdot_kernel(xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref,
                   *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = q_ref[:].astype(jnp.int32)
    lo = ((packed << 28) >> 28).astype(jnp.bfloat16)
    hi = (packed >> 4).astype(jnp.bfloat16)
    # scalar (wrong-numerics) scale keeps the scale READ but drops the
    # [BK, BN] expand+mul chain — isolates the VPU dequant contribution
    acc_ref[:] += jnp.dot(
        xlo_ref[:], lo, preferred_element_type=jnp.float32
    ) * slo_ref[0, 0]
    acc_ref[:] += jnp.dot(
        xhi_ref[:], hi, preferred_element_type=jnp.float32
    ) * shi_ref[0, 0]

    @pl.when(pl.program_id(2) == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def _rawdot_matmul(x, q, scale, *, group: int):
    M, Kpad = x.shape
    half, N = q.shape
    BK = next(b for b in (1024, 512) if half % b == 0)
    BN = min(1024, -(-N // 128) * 128)
    BM = min(256, -(-M // 16) * 16)
    nm, nn, nk = M // BM, -(-N // BN), half // BK
    sg = BK // group
    return pl.pallas_call(
        functools.partial(_rawdot_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k + nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, BN), lambda i, j, k: (k + nk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * Kpad * N,
            bytes_accessed=half * N + M * Kpad * 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, x, q, scale, scale)


# --- probe 4-6: matmul loops over fabricated weights ------------------------

_7B_SHAPES = [  # one decoder layer's 7 matmuls (K, N), pre-padding
    (4096, 4096), (4096, 4096), (4096, 4096), (4096, 4096),
    (4096, 11008), (4096, 11008), (11008, 4096),
]


def _fab(K, N, g=None):
    pad_in, g_def = int4_geometry(K)
    if g is None:
        g = g_def
    else:
        # honor the kernel's sg >= 8 sublane-tile constraint per shape
        half = pad_in // 2
        bk = next(b for b in (1024, 512) if half % b == 0)
        g = min(g, bk // 8)
    q = jnp.full((pad_in // 2, N), 5, jnp.int8)
    s = jnp.full((pad_in // g, N), 0.01, jnp.float32)
    return q, s, pad_in, g


def build_matmul_loop(shapes, M=16, mode="v1", g=None):
    """Returns (run_fn, args, bytes_per_iter) for a loop cycling the given
    weight shapes once per iteration with x feedback."""
    ws = [_fab(K, N, g) for K, N in shapes]
    kmax = max(w[2] for w in ws)
    x0 = jnp.full((M, kmax), 0.5, jnp.bfloat16)

    @jax.jit
    def run(x0, qs, ss, n):
        def body(i, xc):
            acc = None
            for (q, s, (_, _, pad_in, gw)) in zip(qs, ss, ws):
                xin = xc[:, :pad_in]
                if mode == "raw":
                    out = _rawdot_matmul(xin, q, s, group=gw)
                else:
                    out = _int4_matmul_2d(xin, q, s, group=gw, variant=mode)
                d = (out * 1e-30).astype(xc.dtype)
                d = (
                    d[:, :kmax] if d.shape[1] >= kmax
                    else jnp.pad(d, ((0, 0), (0, kmax - d.shape[1])))
                )
                acc = d if acc is None else acc + d
            return x0 + acc

        return jax.lax.fori_loop(0, n, body, x0)

    qs = tuple(w[0] for w in ws)
    ss = tuple(w[1] for w in ws)
    byt = sum(q.size + s.size * 4 for q, s, *_ in ws)
    return run, (x0, qs, ss), byt


def matmul_probe(shapes, M=16, mode="v1", g=None):
    run, args, byt = build_matmul_loop(shapes, M=M, mode=mode, g=g)
    t = _diff(run, args)
    return byt / t / 1e9, t * 1e6


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    _sync(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print("handshake done", flush=True)

    # measured once (2026-08-18, v5e-1): distinct-array stream 715.3 GB/s
    # (the true sustained ceiling); re-read probes hit 2.4-3.8 TB/s —
    # partly XLA CSE, partly on-chip re-read locality — which is why
    # single-weight "isolated" sweeps (int4_sweep.py) overstate: they
    # read ~750-840 GB/s for kernels that sustain 550 on distinct data.
    if os.environ.get("BW_PROBE_SUMS"):
        gbs = sum_probe(8, 256)
        print(f"1. distinct-array stream (8 x 256 MB):  {gbs:6.1f} GB/s",
              flush=True)

    # INTERLEAVED A/B: all configs compiled up front, then timed in
    # alternating passes so chip/relay drift hits every config equally.
    configs = [
        ("v1/g64,  M=16", "v1", 64, 16),
        ("v3/g128, M=16", "v3", 128, 16),
        ("rawdot,  M=16", "raw", 64, 16),
        ("v1/g64,  M=1 ", "v1", 64, 1),
        ("v3/g128, M=1 ", "v3", 128, 1),
    ]
    built = []
    for label, mode, g, M in configs:
        run, args, byt = build_matmul_loop(_7B_SHAPES, M=M, mode=mode, g=g)
        _sync(run(*args, 16))
        _sync(run(*args, 320))  # compile both iteration counts
        built.append((label, run, args, byt))
    samples = {label: [] for label, *_ in built}
    for _ in range(3):
        for label, run, args, byt in built:
            t16 = _timed(run, args, 16, rounds=3)
            t320 = _timed(run, args, 320, rounds=3)
            samples[label].append((t320 - t16) / 304)
    for label, run, args, byt in built:
        ts = sorted(samples[label])
        med = ts[len(ts) // 2]
        spread = (ts[-1] - ts[0]) / med * 100
        print(f"4. int4 {label}, 7 distinct:  {byt / med / 1e9:6.1f} GB/s "
              f"({med * 1e6:.1f} us/layer-set, spread {spread:.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
