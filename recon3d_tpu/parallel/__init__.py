"""Multi-chip substrate: mesh construction + sharding helpers."""

from recon3d_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
]
