"""Data: CIFAR-10 sources, sharded sampling, on-device preprocessing.

Replaces the reference's torchvision + DataLoader + DistributedSampler stack
(reference src/training/qat_trainer.py:210-254, optuna_search.py:58-80).
"""

from qat_vit_tpu.data.cifar10 import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    NUM_CLASSES,
    load_cifar10,
    synthetic_cifar10,
)
from qat_vit_tpu.data.pipeline import (
    ArrayLoader,
    epoch_indices,
    preprocess,
    preprocess_fn,
)

__all__ = [
    "ArrayLoader",
    "CIFAR10_MEAN",
    "CIFAR10_STD",
    "NUM_CLASSES",
    "epoch_indices",
    "load_cifar10",
    "preprocess",
    "preprocess_fn",
    "synthetic_cifar10",
]
