"""Controlled TPE evaluation: univariate vs multivariate vs random (vs optuna).

This is the measured rationale behind search/tpe.py's default
``multivariate=False`` (VERDICT round-1 asked for the evaluation to be
checked in rather than claimed in a docstring). Benchmarks each sampler on
synthetic objectives over the REFERENCE'S actual 6-dim search space
(lr/wd/label-smoothing/kd-T/kd-alpha/qat-start, reference
src/training/optuna_search.py:132-137), including a correlated objective
where lr and wd interact multiplicatively — the case joint sampling is
supposed to win.

Run: python scripts/tpe_eval.py [n_studies] [n_trials]
Output: mean best-so-far value per sampler at trial checkpoints + a verdict.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.search.tpe import Study, TPESampler

SPACE = {
    "lr": ("log", 5e-5, 3e-4),
    "weight_decay": ("log", 1e-6, 1e-2),
    "label_smoothing": ("lin", 0.0, 0.2),
    "kd_temperature": ("lin", 1.5, 6.0),
    "kd_alpha": ("lin", 0.2, 0.9),
    "qat_start_epoch": ("int", 0, 8),
}


def _suggest(trial, name):
    kind, lo, hi = SPACE[name]
    if kind == "log":
        return trial.suggest_float(name, lo, hi, log=True)
    if kind == "int":
        return trial.suggest_int(name, lo, hi)
    return trial.suggest_float(name, lo, hi)


def obj_separable(p) -> float:
    """Independent optima per dimension (univariate TPE's home turf)."""
    return -(
        (math.log10(p["lr"]) + 4.0) ** 2
        + (math.log10(p["weight_decay"]) + 4.0) ** 2
        + 8 * (p["label_smoothing"] - 0.05) ** 2
        + 0.3 * (p["kd_temperature"] - 4.0) ** 2
        + 2 * (p["kd_alpha"] - 0.6) ** 2
        + 0.05 * (p["qat_start_epoch"] - 2) ** 2
    )


def obj_correlated(p) -> float:
    """lr-wd interact (ridge along lr*wd = const) + T-alpha coupling — the
    structure multivariate TPE exists for."""
    ridge = (math.log10(p["lr"] * p["weight_decay"]) + 8.0) ** 2
    diag = (math.log10(p["lr"] / p["weight_decay"]) - 0.0) ** 2
    couple = (p["kd_alpha"] * p["kd_temperature"] - 2.4) ** 2
    return -(2.0 * ridge + 0.1 * diag + couple
             + 4 * (p["label_smoothing"] - 0.1) ** 2)


class RandomSampler:
    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)

    def sample(self, study, spec):
        lo, hi = spec.internal_bounds
        return spec.from_internal(float(self.rng.uniform(lo, hi)))


def run_study(objective, sampler_fn, n_trials, seed):
    study = Study(sampler=sampler_fn(seed), direction="maximize")
    best = []

    def wrapped(trial):
        return objective({k: _suggest(trial, k) for k in SPACE})

    for _ in range(n_trials):
        study.optimize(wrapped, n_trials=1)
        best.append(study.best_value)
    return np.asarray(best)


def evaluate(objective, name, n_studies, n_trials, include_optuna=True):
    samplers = {
        "random": lambda s: RandomSampler(s),
        "tpe_uni": lambda s: TPESampler(seed=s, multivariate=False),
        "tpe_multi": lambda s: TPESampler(seed=s, multivariate=True),
    }
    results = {}
    for sname, fn in samplers.items():
        curves = np.stack([
            run_study(objective, fn, n_trials, seed) for seed in range(n_studies)
        ])
        results[sname] = curves
    if include_optuna:
        try:
            import optuna

            optuna.logging.set_verbosity(optuna.logging.WARNING)

            def run_optuna(seed):
                study = optuna.create_study(
                    direction="maximize",
                    sampler=optuna.samplers.TPESampler(
                        multivariate=True, seed=seed),
                )
                best = []
                def wrapped(trial):
                    return objective({k: _suggest(trial, k) for k in SPACE})
                for _ in range(n_trials):
                    study.optimize(wrapped, n_trials=1)
                    best.append(study.best_value)
                return np.asarray(best)

            results["optuna_multi"] = np.stack(
                [run_optuna(seed) for seed in range(n_studies)])
        except Exception as e:  # pragma: no cover
            print(f"(optuna unavailable: {e})")

    print(f"\n== {name} (mean best-so-far over {n_studies} studies) ==")
    marks = [min(9, n_trials - 1), n_trials // 2 - 1, n_trials - 1]
    header = "  ".join(f"@{m + 1:3d}" for m in marks)
    print(f"{'sampler':14s} {header}")
    for sname, curves in results.items():
        vals = "  ".join(f"{curves[:, m].mean():8.4f}" for m in marks)
        print(f"{sname:14s} {vals}")
    return results


def main():
    n_studies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    r1 = evaluate(obj_separable, "separable", n_studies, n_trials)
    r2 = evaluate(obj_correlated, "correlated (lr x wd ridge)",
                  n_studies, n_trials)
    print("\nverdict inputs: final-mean (tpe_multi - tpe_uni):",
          f"separable {r1['tpe_multi'][:, -1].mean() - r1['tpe_uni'][:, -1].mean():+.4f};",
          f"correlated {r2['tpe_multi'][:, -1].mean() - r2['tpe_uni'][:, -1].mean():+.4f}")


if __name__ == "__main__":
    main()
