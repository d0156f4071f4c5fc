"""One-shot relay health probe: tiny matmul + host readback with a real
wall-clock bound (a watchdog thread hard-exits — the relay's failure mode
is an indefinite hang, which no try/except can catch). Exits 0 (and
prints latency) iff the axon TPU relay answers within ``timeout_s``."""
import os
import sys
import threading
import time


def main(timeout_s: float = 240.0) -> int:
    def _watchdog():
        time.sleep(timeout_s)
        print(f"relay probe TIMEOUT after {timeout_s:.0f}s (relay down?)",
              flush=True)
        os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    try:
        x = jnp.ones((8, 128), dtype=jnp.bfloat16)
        v = float((x @ x.T).reshape(-1)[0])
    except Exception as e:
        print(f"relay probe FAILED: {type(e).__name__}: {e}")
        return 1
    dt = time.time() - t0
    print(f"relay probe OK: value={v} elapsed={dt:.1f}s "
          f"devices={jax.devices()}")
    return 0


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 240.0))
