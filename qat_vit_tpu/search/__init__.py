"""Hyperparameter search: TPE sampler + median pruner + Optuna-shaped driver.

Replaces the reference's ``src/training/optuna_search.py`` (optuna itself is
used when importable; the in-repo TPE engine otherwise).
"""

from qat_vit_tpu.search.driver import (
    HAS_OPTUNA,
    SearchConfig,
    run_optuna_search,
    suggest_hparams,
)
from qat_vit_tpu.search.tpe import (
    MedianPruner,
    Study,
    TPESampler,
    Trial,
    TrialPruned,
    create_study,
)

__all__ = [
    "HAS_OPTUNA",
    "MedianPruner",
    "SearchConfig",
    "Study",
    "TPESampler",
    "Trial",
    "TrialPruned",
    "create_study",
    "run_optuna_search",
    "suggest_hparams",
]
