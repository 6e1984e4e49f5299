"""Tracking: MLflow-compatible experiment store (SQLite fallback built in)."""

from qat_vit_tpu.tracking.system_metrics import (
    SystemMetricsLogger,
    enable_system_metrics_logging,
)
from qat_vit_tpu.tracking.tracker import (
    HAS_MLFLOW,
    MlflowTracker,
    NullRun,
    Run,
    SqliteTracker,
    make_tracker,
)

__all__ = [
    "HAS_MLFLOW",
    "MlflowTracker",
    "NullRun",
    "Run",
    "SqliteTracker",
    "SystemMetricsLogger",
    "enable_system_metrics_logging",
    "make_tracker",
]
