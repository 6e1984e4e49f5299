"""Evaluation: full-test-set evaluator + multi-checkpoint comparator.

A working re-design of the reference's ``src/evaluation`` (whose evaluator.py
is truncated into a SyntaxError as shipped — survey §3.4).
"""

from qat_vit_tpu.evaluation.comparator import (
    CompareItem,
    compare_checkpoints,
    format_table,
)
from qat_vit_tpu.evaluation.evaluator import (
    build_cifar10_loader,
    evaluate_checkpoint,
    evaluate_model,
)

__all__ = [
    "CompareItem",
    "build_cifar10_loader",
    "compare_checkpoints",
    "evaluate_checkpoint",
    "evaluate_model",
    "format_table",
]
