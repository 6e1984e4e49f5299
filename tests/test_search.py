"""Search engine tests: TPE sampler quality, median pruner, driver contract."""

import os

import numpy as np
import pytest

from qat_vit_tpu.search.tpe import (
    MedianPruner,
    ParamSpec,
    Study,
    TPESampler,
    TrialPruned,
    create_study,
)


class TestTPESampler:
    def test_respects_bounds_and_types(self):
        study = create_study(seed=0)

        def objective(trial):
            lr = trial.suggest_float("lr", 5e-5, 3e-4, log=True)
            q = trial.suggest_int("q", 0, 8)
            assert 5e-5 <= lr <= 3e-4
            assert isinstance(q, int) and 0 <= q <= 8
            return -((np.log(lr) - np.log(1e-4)) ** 2)

        study.optimize(objective, n_trials=25)
        assert len(study.trials) == 25

    def test_beats_random_on_quadratic(self):
        """TPE must concentrate samples near the optimum vs pure random."""

        def run(sampler_seed, tpe: bool):
            study = Study(
                direction="maximize",
                sampler=TPESampler(seed=sampler_seed,
                                   n_startup_trials=10 if tpe else 10**9),
                pruner=MedianPruner(10**9, 10**9),
            )

            def objective(trial):
                x = trial.suggest_float("x", -10.0, 10.0)
                return -(x - 3.0) ** 2

            study.optimize(objective, n_trials=60)
            return study.best_value

        tpe_scores = [run(s, True) for s in range(5)]
        rnd_scores = [run(s, False) for s in range(5)]
        assert np.mean(tpe_scores) > np.mean(rnd_scores), (tpe_scores, rnd_scores)

    def test_deterministic_given_seed(self):
        def run():
            study = create_study(seed=7)
            study.optimize(lambda t: t.suggest_float("x", 0, 1), n_trials=15)
            return [t.params["x"] for t in study.trials]

        assert run() == run()

    def test_log_domain_sampling(self):
        s = TPESampler(seed=0)
        spec = ParamSpec("lr", 1e-6, 1e-2, log=True)
        study = Study(sampler=s)
        vals = [s.sample(study, spec) for _ in range(200)]
        # log-uniform: ~half the mass below the geometric mean 1e-4
        frac = np.mean([v < 1e-4 for v in vals])
        assert 0.3 < frac < 0.7, frac


class TestMedianPruner:
    def test_prunes_below_median(self):
        study = create_study(seed=0, n_startup_trials=2, n_warmup_steps=1)

        # seed 3 complete trials with known intermediates
        def good(trial):
            for step, v in enumerate([0.5, 0.6, 0.7]):
                trial.report(v, step)
            return 0.7

        study.optimize(good, n_trials=3)

        pruned = {"flag": False}

        def bad(trial):
            trial.report(0.1, 0)
            trial.report(0.1, 1)  # step >= warmup, below median
            if trial.should_prune():
                pruned["flag"] = True
                raise TrialPruned()
            return 0.1

        study.optimize(bad, n_trials=1)
        assert pruned["flag"]
        assert study.trials[-1].state == "PRUNED"
        # pruned trial keeps its last intermediate as value (optuna behavior)
        assert study.trials[-1].value == 0.1

    def test_no_prune_during_startup_or_warmup(self):
        study = create_study(seed=0, n_startup_trials=5, n_warmup_steps=1)

        def obj(trial):
            trial.report(0.01, 0)
            assert not trial.should_prune()  # startup window
            return 0.01

        study.optimize(obj, n_trials=3)


class TestDriverMicro:
    pytestmark = pytest.mark.slow
    def test_search_micro_end_to_end(self, tmp_path):
        """2-trial micro search → best_params.yaml consumable by the trainer."""
        import yaml

        from qat_vit_tpu.data import synthetic_cifar10
        from qat_vit_tpu.search.driver import SearchConfig, run_optuna_search
        from qat_vit_tpu.train.config import load_hparams

        cfg = SearchConfig(
            trials=2, epochs=2, batch_size=16, eval_batch_size=32,
            limit_train_batches=2, limit_eval_batches=1,
            output_dir=str(tmp_path / "search"),
            mlflow_uri=f"sqlite:///{tmp_path}/mlflow.db",
            data_dir=str(tmp_path / "nodata"), micro=True, seed=0,
        )
        data = synthetic_cifar10(n_train=128, n_test=64, seed=0)
        result = run_optuna_search(cfg, data=data, prefer_optuna=False)
        path = result["best_params_path"]
        assert os.path.isfile(path)
        bp = yaml.safe_load(open(path))
        assert {"lr", "weight_decay", "label_smoothing", "kd_temperature",
                "kd_alpha", "qat_start_epoch", "epochs", "batch_size",
                "qat_backend"} <= set(bp)
        # the trainer can consume it (the best_params.yaml contract)
        hp = load_hparams(path)
        assert hp["epochs"] == 2 and isinstance(hp["qat_start_epoch"], int)
        # tracker recorded trial runs + summary
        from qat_vit_tpu.tracking import SqliteTracker

        t = SqliteTracker(cfg.mlflow_uri, cfg.experiment)
        names = {r["name"] for r in t.runs()}
        assert "trial_0000" in names and "optuna_best_summary" in names


class TestDriverDetection:
    pytestmark = pytest.mark.slow
    def test_detection_search_micro_end_to_end(self, tmp_path):
        """2-trial micro DETECTION search (task plumbing, VERDICT r4
        directive 3): TPE over lr/wd/T/box_weight/obj_weight/qat_start with
        the detection-KD objective (teacher agreement), emitting a
        best_params.yaml the detection trainer consumes — completing
        search→train→convert→serve for the second model family."""
        import yaml

        from qat_vit_tpu.data import synthetic_cifar10
        from qat_vit_tpu.search.driver import SearchConfig, run_optuna_search
        from qat_vit_tpu.train.config import load_hparams

        cfg = SearchConfig(
            trials=2, epochs=2, batch_size=8, eval_batch_size=8,
            limit_train_batches=2, limit_eval_batches=1,
            output_dir=str(tmp_path / "search"),
            mlflow_uri=f"sqlite:///{tmp_path}/mlflow.db",
            data_dir=str(tmp_path / "nodata"), micro=True, seed=0,
            task="detection",
        )
        data = synthetic_cifar10(n_train=64, n_test=16, seed=0)
        result = run_optuna_search(cfg, data=data, prefer_optuna=False)
        path = result["best_params_path"]
        assert os.path.isfile(path)
        bp = yaml.safe_load(open(path))
        assert {"lr", "weight_decay", "kd_temperature", "det_box_weight",
                "det_obj_weight", "qat_start_epoch", "epochs", "batch_size",
                "qat_backend"} <= set(bp)
        hp = load_hparams(path)
        assert isinstance(hp["det_box_weight"], float)
        assert 0.0 <= result["best_value"] <= 1.0  # agreement is a fraction
        from qat_vit_tpu.tracking import SqliteTracker

        t = SqliteTracker(cfg.mlflow_uri, cfg.experiment)
        runs = {r["name"]: r["run_id"] for r in t.runs()}
        assert "trial_0000" in runs and "optuna_best_summary" in runs
        keys = {m["key"] for m in t.metrics(runs["trial_0000"])}
        assert "val_agreement_limited" in keys and "train_loss_box" in keys


class TestFailureTolerance:
    def test_failed_trial_recorded_and_study_continues(self):
        """A crashing objective must not end the study (reference behavior:
        25 FAILED runs recorded alongside FINISHED ones, survey §5)."""
        from qat_vit_tpu.search.tpe import create_study

        study = create_study(seed=0)
        calls = {"n": 0}

        def objective(trial):
            calls["n"] += 1
            x = trial.suggest_float("x", 0, 1)
            if calls["n"] % 2 == 0:
                raise RuntimeError("boom")
            return x

        study.optimize(objective, n_trials=6, catch=(RuntimeError,))
        states = [t.state for t in study.trials]
        assert states.count("FAIL") == 3 and states.count("COMPLETE") == 3
        assert study.best_value is not None


class TestMultivariateTPE:
    def test_joint_candidates_generated_from_rows(self):
        """The joint sampler's candidates derive from good-set ROWS: with a
        history whose good trials are paired at (2,2)/(8,8) and bad trials at
        cross-modes, joint samples must respect bounds and mostly stay near
        the paired diagonal (row bases are paired; per-dim noise loosens it)."""
        from qat_vit_tpu.search.tpe import FrozenTrial, ParamSpec

        study = Study(direction="maximize",
                      sampler=TPESampler(seed=0, n_startup_trials=10,
                                         multivariate=True))
        rng = np.random.default_rng(0)
        for i in range(40):
            if i % 2 == 0:
                m = rng.choice([2.0, 8.0])
                x, y, v = m + rng.normal(0, .1), m + rng.normal(0, .1), 0.0
            else:
                a = rng.choice([2.0, 8.0])
                x, y, v = a + rng.normal(0, .1), (10 - a) + rng.normal(0, .1), -50.0
            study.trials.append(FrozenTrial(
                number=i, params={"x": float(x), "y": float(y)},
                value=v, state="COMPLETE"))
        specs = {"x": ParamSpec("x", 0, 10), "y": ParamSpec("y", 0, 10)}
        samples = [study.sampler.sample_joint(study, specs) for _ in range(50)]
        assert all(0 <= s["x"] <= 10 and 0 <= s["y"] <= 10 for s in samples)
        paired = np.mean([abs(s["x"] - s["y"]) < 4.0 for s in samples])
        assert paired > 0.5, paired

    def test_joint_deterministic_and_bounded(self):
        def run():
            study = Study(sampler=TPESampler(seed=3, multivariate=True),
                          pruner=MedianPruner())
            def obj(t):
                a = t.suggest_float("a", 1e-5, 1e-1, log=True)
                b = t.suggest_int("b", 0, 5)
                assert 1e-5 <= a <= 1e-1 and 0 <= b <= 5
                return a * b
            study.optimize(obj, n_trials=25)
            return [(t.params["a"], t.params["b"]) for t in study.trials]
        assert run() == run()
