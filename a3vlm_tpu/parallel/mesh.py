"""Device mesh construction — the TPU-native replacement for the reference's
NCCL process groups + fairscale model-parallel state (util/misc.py:95-147,
main_finetune.py:143).

One 2D logical mesh, axes ``("data", "model")``:

- ``data``  — data parallelism (the reference's FSDP/DP group); optimizer
  state is sharded along it (ZeRO-style) by the train step.
- ``model`` — tensor parallelism (the reference's fairscale MP group); the
  Column/Row-parallel weight splits become NamedSharding annotations and XLA
  inserts the all-gather/reduce-scatter collectives over ICI.

Under SPMD there is no per-rank process-group bookkeeping: every helper here
is a pure function of the mesh.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    model_parallel_size: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build the ("data", "model") mesh over all (or given) devices.

    ``model_parallel_size`` mirrors the reference's ``--model_parallel_size``
    (main_finetune.py:130). The model axis is laid out over adjacent devices
    so its collectives ride ICI neighbours.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel_size != 0:
        raise ValueError(
            f"device count {n} not divisible by model_parallel_size "
            f"{model_parallel_size}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return create_mesh(1, devices=jax.devices()[:1])


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def shard_params(params, mesh: Mesh, spec_tree):
    """Place a parameter pytree on ``mesh`` according to a matching pytree of
    PartitionSpecs (replaces the reference's per-rank weight-shard loading,
    util/tensor_parallel.py:425-485 — XLA does the slicing)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        spec_tree,
    )


@dataclass(frozen=True)
class MeshEnv:
    """Convenience bundle threaded through train/eval entry points."""

    mesh: Mesh

    @property
    def dp_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def mp_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh
