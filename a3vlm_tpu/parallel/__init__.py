from a3vlm_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshEnv,
    create_mesh,
    named_sharding,
    shard_params,
    single_device_mesh,
    use_mesh,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshEnv",
    "create_mesh",
    "named_sharding",
    "shard_params",
    "single_device_mesh",
    "use_mesh",
]
