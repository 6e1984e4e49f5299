"""Real-trial TPE A/B: joint (multivariate) vs univariate at the recorded
search budgets (VERDICT r3 directive 7).

Runs the ACTUAL in-repo search driver (micro KD+QAT trials, shared compiled
steps and teacher-logit cache) twice per seed — in-repo TPE univariate vs
multivariate — at the reference study's budget SHAPE (30 trials, MedianPruner
5/1, the exact 6-dim space, optuna_search.py:127-137). Trial length is scaled
down (4 epochs x 50 train batches vs the recorded 10 x 200) so six 30-trial
studies fit a CPU session: the sampler comparison needs a real KD+QAT
objective landscape and the recorded trial COUNT, not full-fidelity trials.
Synthetic objectives live in scripts/tpe_eval.py; this script settles the
sampler default with real trial outcomes.

Run: python scripts/tpe_ab.py [seeds=3] [trials=30] [epochs=4] [workdir]
Writes workdir/tpe_ab.json and prints per-seed best values + the verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    # Force CPU BEFORE any backend query: calling jax.default_backend()
    # first would initialize (and claim) the single-client TPU tunnel —
    # micro trials are dispatch-bound and must not contend with TPU jobs.
    jax.config.update("jax_platforms", "cpu")

    import logging

    logging.basicConfig(level=logging.WARNING)

    from qat_vit_tpu.data.cifar10 import synthetic_cifar10_hard
    from qat_vit_tpu.search.driver import SearchConfig, run_optuna_search

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    workdir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/tpe_ab"
    os.makedirs(workdir, exist_ok=True)

    # one dataset for every study — the HARD synthetic stand-in (the easy
    # fallback saturates micro trials at 1.0, flattening the objective the
    # A/B needs); sized to the visited budget
    data = synthetic_cifar10_hard(20_000, 4_000, seed=0)
    source = "synthetic-hard 20k/4k"
    print(f"data source: {source}; seeds={n_seeds} trials={trials} "
          f"epochs={epochs}", flush=True)

    results: dict = {"uni": [], "multi": [], "meta": {
        "seeds": n_seeds, "trials": trials, "epochs": epochs,
        "data": source,
        "budget": "recorded trial count/pruner/space; trial length scaled "
        "to 50 train/25 eval batches @64 for CPU feasibility"}}
    for seed in range(n_seeds):
        for key, multi in (("uni", False), ("multi", True)):
            out_dir = os.path.join(workdir, f"{key}_s{seed}")
            cfg = SearchConfig(
                trials=trials, epochs=epochs, micro=True, seed=seed,
                limit_train_batches=50, limit_eval_batches=25,
                output_dir=out_dir,
                mlflow_uri=f"sqlite:///{out_dir}/mlflow.db",
                experiment=f"tpe-ab-{key}-s{seed}",
                data_dir=os.path.join(workdir, "no_data"),
                tpe_multivariate=multi,
            )
            t0 = time.perf_counter()
            res = run_optuna_search(cfg, data=data, prefer_optuna=False)
            dt = time.perf_counter() - t0
            results[key].append(res["best_value"])
            print(f"seed {seed} {key:5s}: best_value={res['best_value']:.4f} "
                  f"({dt / 60:.1f} min)", flush=True)

    uni = np.asarray(results["uni"])
    multi = np.asarray(results["multi"])
    results["summary"] = {
        "uni_mean": float(uni.mean()), "uni_std": float(uni.std()),
        "multi_mean": float(multi.mean()), "multi_std": float(multi.std()),
        "delta_multi_minus_uni": float(multi.mean() - uni.mean()),
        "per_seed_delta": (multi - uni).tolist(),
    }
    with open(os.path.join(workdir, "tpe_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["summary"], indent=2))


if __name__ == "__main__":
    main()
