"""One-shot relay health probe: tiny matmul + host readback with a bounded
wall-clock. Exits 0 (and prints latency) iff the axon TPU relay answers."""
import sys, time

def main(timeout_s: float = 240.0) -> int:
    import jax, jax.numpy as jnp
    t0 = time.time()
    try:
        x = jnp.ones((8, 128), dtype=jnp.bfloat16)
        v = float((x @ x.T).reshape(-1)[0])
    except Exception as e:
        print(f"relay probe FAILED: {type(e).__name__}: {e}")
        return 1
    dt = time.time() - t0
    print(f"relay probe OK: value={v} elapsed={dt:.1f}s devices={jax.devices()}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
