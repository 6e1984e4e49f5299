"""Utilities: checkpointing, profiling."""

from qat_vit_tpu.utils.checkpoint import (
    BestCheckpointer,
    load_checkpoint,
    load_metadata,
    save_checkpoint,
)

__all__ = [
    "BestCheckpointer",
    "load_checkpoint",
    "load_metadata",
    "save_checkpoint",
]
