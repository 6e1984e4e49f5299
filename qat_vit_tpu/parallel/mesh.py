"""Device mesh, sharding rules, and distributed-runtime info.

TPU-native replacement for the reference's DDP stack (torch.distributed +
NCCL/Gloo + torchrun, reference src/training/ddp_utils.py:15-96 and
src/training/qat_trainer.py:144-159): there is no process-group object and no
wrapper module — a `Mesh` over the slice plus sharding annotations on a pure
train step make XLA compile the gradient all-reduce onto ICI.

Axes:
- ``data``  — batch dimension (the reference's only parallelism: DP);
- ``model`` — tensor parallelism over attention heads / MLP hidden dim
  (beyond-parity: the reference has none, but the module tree is annotated so
  the same code runs TP when the mesh has a model axis).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Logical-axis → mesh-axis rules consumed by flax's logical partitioning
# (models/vit.py annotates kernels with these logical names).
LOGICAL_AXIS_RULES = (
    ("embed", None),  # residual stream: always replicated
    ("hidden", MODEL_AXIS),  # qkv out / mlp hidden: TP-shardable
    ("patch", None),
    ("classes", None),
    ("seq", None),
    ("batch", DATA_AXIS),
)


@dataclasses.dataclass(frozen=True)
class DistInfo:
    """Rank info — the surface of the reference's ``DDPInfo`` dataclass
    (ddp_utils.py:15-42), mapped to JAX process/device concepts."""

    world_size: int  # jax.process_count()
    rank: int  # jax.process_index()
    local_device_count: int
    global_device_count: int

    @property
    def is_main_process(self) -> bool:  # ddp_utils.py:45
        return self.rank == 0


def get_dist_info() -> DistInfo:
    return DistInfo(
        world_size=jax.process_count(),
        rank=jax.process_index(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistInfo:
    """Multi-host initialization (the reference's ``setup_ddp``,
    ddp_utils.py:55-82). On a single-host TPU VM this is a no-op; on a
    multi-host slice ``jax.distributed.initialize`` picks coordinates from the
    TPU runtime environment automatically."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return get_dist_info()


def pick_free_port() -> int:
    """Free TCP port for a manually-launched coordinator (the reference's
    ddp_utils.py:90-96 helper, used there for env:// rendezvous; here for
    ``jax.distributed.initialize(coordinator_address=f"host:{port}")``)."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def cleanup_distributed() -> None:
    """``cleanup_ddp`` parity (ddp_utils.py:85-87)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's ``dist.barrier``,
    qat_trainer.py:221-222/366-367). On one host this is free; on many it
    blocks until every process arrives."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    Default: all devices on the data axis (pure DP — the reference's
    strategy). ``model > 1`` carves out a tensor-parallel axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded over data, replicated over model."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host-local batch pytree onto the mesh, sharded over data.

    Single-host: a plain ``device_put`` with a NamedSharding. Multi-host:
    assembles the global array from per-host shards (each host holds its own
    slice of the global batch — the input-pipeline side of the reference's
    ``DistributedSampler``).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, P(DATA_AXIS)
    )


def logical_sharding(mesh: Mesh, logical_tree):
    """Map flax logical-axis metadata (from ``nn.get_partition_spec``) onto
    the mesh via LOGICAL_AXIS_RULES."""
    import flax.linen as nn

    specs = nn.logical_to_mesh(logical_tree, LOGICAL_AXIS_RULES)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
