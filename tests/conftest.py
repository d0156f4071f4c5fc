"""Test config: run everything on a virtual 8-device CPU mesh so every
parallelism mode (DP/TP shardings, collectives, resharding) gets real
multi-device coverage without hardware — the strategy SURVEY.md §4 calls for.

This environment may boot python with a TPU PJRT plugin (axon sitecustomize)
that sets ``jax_platforms`` via jax.config — which overrides the env var — so
we force the config back to CPU here, before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f32 matmuls in tests should be exact, not TPU-style bf16-reduced
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
