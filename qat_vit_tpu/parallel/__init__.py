"""Parallelism: device mesh, sharding rules, distributed runtime info.

Replaces the reference's ``src/training/ddp_utils.py`` (DDP/NCCL/torchrun)
with JAX SPMD over a device mesh.
"""

from qat_vit_tpu.parallel.mesh import (
    DATA_AXIS,
    LOGICAL_AXIS_RULES,
    MODEL_AXIS,
    DistInfo,
    barrier,
    batch_sharding,
    cleanup_distributed,
    get_dist_info,
    is_main_process,
    logical_sharding,
    make_mesh,
    pick_free_port,
    replicated_sharding,
    setup_distributed,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "LOGICAL_AXIS_RULES",
    "MODEL_AXIS",
    "DistInfo",
    "barrier",
    "batch_sharding",
    "cleanup_distributed",
    "get_dist_info",
    "is_main_process",
    "logical_sharding",
    "make_mesh",
    "pick_free_port",
    "replicated_sharding",
    "setup_distributed",
    "shard_batch",
]
