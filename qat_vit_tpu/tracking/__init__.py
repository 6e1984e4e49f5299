"""Tracking: MLflow-compatible experiment store (SQLite fallback built in)."""

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
    "make_tracker",
]
