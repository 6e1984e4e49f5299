"""Tracking store, checkpoint utilities, and evaluation-layer tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.tracking import SqliteTracker
from qat_vit_tpu.utils.checkpoint import (
    BestCheckpointer,
    load_checkpoint,
    load_metadata,
    save_checkpoint,
    tolerant_merge,
)


class TestSqliteTracker:
    def test_run_lifecycle(self, tmp_path):
        t = SqliteTracker(f"sqlite:///{tmp_path}/m.db", "exp1")
        run = t.start_run("trial_0000")
        run.log_params({"lr": 1e-4, "kd_alpha": 0.5})
        run.log_metric("train_loss", 2.5, step=0)
        run.log_metric("train_loss", 1.5, step=1)
        run.set_tag("optuna_state", "COMPLETE")
        run.end("FINISHED")
        runs = t.runs()
        assert runs == [{"run_id": run.run_id, "name": "trial_0000",
                         "status": "FINISHED"}]
        ms = t.metrics(run.run_id, "train_loss")
        assert [m["value"] for m in ms] == [2.5, 1.5]
        assert t.params(run.run_id)["lr"] == "0.0001"

    def test_context_manager_failure_status(self, tmp_path):
        t = SqliteTracker(f"sqlite:///{tmp_path}/m.db", "exp1")
        with pytest.raises(RuntimeError):
            with t.start_run("boom"):
                raise RuntimeError("x")
        assert t.runs()[0]["status"] == "FAILED"

    def test_artifact_logging(self, tmp_path):
        t = SqliteTracker(f"sqlite:///{tmp_path}/m.db", "exp1")
        f = tmp_path / "artifact.yaml"
        f.write_text("a: 1\n")
        run = t.start_run("r")
        run.log_artifact(str(f))
        run.end()
        # artifact copied under the run's artifact dir
        found = []
        for root, _, files in os.walk(tmp_path):
            found += [fn for fn in files if fn == "artifact.yaml" and "m.db" not in root]
        assert any("artifact.yaml" in f for f in found)

    def test_experiments_isolated(self, tmp_path):
        uri = f"sqlite:///{tmp_path}/m.db"
        a = SqliteTracker(uri, "expA")
        b = SqliteTracker(uri, "expB")
        a.start_run("ra").end()
        assert b.runs() == []


class TestCheckpointUtils:
    def test_best_checkpointer_rule(self, tmp_path):
        bc = BestCheckpointer(str(tmp_path))
        saved1, _ = bc.maybe_save(0.5, {"w": np.ones(3)})
        saved2, _ = bc.maybe_save(0.4, {"w": np.zeros(3)})  # worse: skip
        saved3, _ = bc.maybe_save(0.6, {"w": np.full(3, 2.0)})
        assert (saved1, saved2, saved3) == (True, False, True)
        best = load_checkpoint(os.path.join(tmp_path, "best_qat.msgpack"))
        np.testing.assert_array_equal(best["w"], np.full(3, 2.0))
        meta = load_metadata(os.path.join(tmp_path, "best_qat.msgpack"))
        assert meta["metric"] == 0.6

    def test_tolerant_merge_semantics(self):
        template = {"a": np.zeros((2, 2), np.float32),
                    "b": {"c": np.zeros(3, np.float32)}}
        restored = {"a": np.ones((2, 2)),
                    "b": {"c": np.arange(3), "extra": np.ones(1)},
                    "junk": np.ones(1)}
        merged, missing, unexpected = tolerant_merge(template, restored)
        np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
        np.testing.assert_array_equal(merged["b"]["c"], [0, 1, 2])
        assert merged["b"]["c"].dtype == np.float32  # cast to template dtype
        assert not missing
        assert len(unexpected) == 2

    def test_tolerant_merge_shape_mismatch_keeps_template(self):
        template = {"a": np.zeros((2, 2), np.float32)}
        merged, missing, _ = tolerant_merge(template, {"a": np.ones((3, 3))})
        np.testing.assert_array_equal(merged["a"], np.zeros((2, 2)))
        assert missing

    def test_int8_export_roundtrip(self, tmp_path):
        """int8 dtypes must survive save/load (the deployment format)."""
        tree = {
            "w_int8": np.arange(-8, 8, dtype=np.int8).reshape(4, 4),
            "w_scale": np.float32(0.02),
            "nested": {"colsum": np.arange(4, dtype=np.int32)},
        }
        p = str(tmp_path / "int8.msgpack")
        save_checkpoint(p, tree, {"format": "int8-weights+qparams"})
        back = load_checkpoint(p)
        assert back["w_int8"].dtype == np.int8
        assert back["nested"]["colsum"].dtype == np.int32
        np.testing.assert_array_equal(back["w_int8"], tree["w_int8"])


class TestEvaluation:
    def test_evaluator_and_comparator_micro(self, tmp_path):
        """Train-free micro check of evaluator + comparator over all three
        checkpoint kinds (float / best_qat / best_converted)."""
        import flax.linen as nn

        from qat_vit_tpu.data import synthetic_cifar10
        from qat_vit_tpu.evaluation import (
            CompareItem, compare_checkpoints, evaluate_checkpoint, format_table,
        )
        from qat_vit_tpu.models import create_model
        from qat_vit_tpu.serve.int8_vit import convert_vit

        # point the evaluator at synthetic data via empty data_dir
        data_dir = str(tmp_path / "nodata")

        bundle = create_model("vit_micro_test", qat_wrapper=True)
        variables = nn.meta.unbox(bundle.init(jax.random.key(0)))
        # observe once so convert has stats
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 3)).astype(np.float32))
        _, mut = bundle.module.apply(
            {"params": variables["params"], "quant_stats": variables["quant_stats"]},
            x, observe=True, mutable=["quant_stats"])
        qs = mut["quant_stats"]

        qat_ckpt = str(tmp_path / "best_qat.msgpack")
        save_checkpoint(qat_ckpt, {"params": variables["params"], "quant_stats": qs})
        qp = convert_vit(variables["params"], qs, bundle.cfg)
        conv_ckpt = str(tmp_path / "best_converted.msgpack")
        save_checkpoint(conv_ckpt, qp)

        acc_qat = evaluate_checkpoint(
            "vit_micro_test", qat_ckpt, qat_wrapper=True,
            data_dir=data_dir, batch_size=64, limit_batches=1)
        assert 0.0 <= acc_qat <= 1.0

        acc_int8 = evaluate_checkpoint(
            "vit_micro_test", conv_ckpt, int8=True,
            data_dir=data_dir, batch_size=64, limit_batches=1)
        assert 0.0 <= acc_int8 <= 1.0

        rows = compare_checkpoints(
            [
                CompareItem("student_qat", "vit_micro_test", qat_ckpt,
                            qat_wrapper=True),
                CompareItem("student_quant", "vit_micro_test", conv_ckpt,
                            int8=True),
                CompareItem("broken", "vit_micro_test", "/nonexistent.msgpack"),
            ],
            data_dir=data_dir, batch_size=64, limit_batches=1,
        )
        assert rows[0]["acc"] is not None and rows[1]["acc"] is not None
        assert rows[2]["error"] is not None  # per-row failure tolerance
        table = format_table(rows)
        assert "student_qat" in table and "ERROR" in table


class TestSystemMetrics:
    def test_sampler_logs_system_metrics(self, tmp_path):
        import time as _time

        from qat_vit_tpu.tracking import (
            SqliteTracker, enable_system_metrics_logging)

        t = SqliteTracker(f"sqlite:///{tmp_path}/m.db", "exp1")
        run = t.start_run("r")
        logger = enable_system_metrics_logging(run, interval=0.2)
        _time.sleep(0.9)
        logger.stop()
        run.end()
        keys = {m["key"] for m in t.metrics(run.run_id)}
        assert "system/cpu_utilization_percentage" in keys
        assert "system/system_memory_usage_megabytes" in keys


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from qat_vit_tpu.utils.checkpoint import (
            load_checkpoint_orbax, save_checkpoint_orbax)

        tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                "w_int8": np.arange(-3, 3, dtype=np.int8)}
        p = str(tmp_path / "orbax_ckpt")
        save_checkpoint_orbax(p, tree)
        back = load_checkpoint_orbax(p, tree)
        np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
        assert back["w_int8"].dtype == np.int8


class TestProfilingUtils:
    def test_step_timer(self):
        import time as _t

        from qat_vit_tpu.utils.profiling import StepTimer

        timer = StepTimer(warmup=1)
        for _ in range(4):
            with timer:
                _t.sleep(0.01)
        assert len(timer.times) == 3
        assert 0.005 < timer.mean < 0.1
        assert timer.imgs_per_sec(32) > 0

    def test_trace_capture(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from qat_vit_tpu.utils.profiling import trace

        with trace(str(tmp_path)):
            jnp.ones((8, 8)).sum().block_until_ready()
        # a profile directory must have been produced
        produced = list(tmp_path.rglob("*.xplane.pb"))
        assert produced, list(tmp_path.rglob("*"))


class TestStudyReport:
    def test_summarize_and_format(self, tmp_path):
        from qat_vit_tpu.tracking.report import format_report, summarize

        t = SqliteTracker(f"sqlite:///{tmp_path}/m.db", "exp")
        for i, acc in enumerate([0.3, 0.6]):
            run = t.start_run(f"trial_{i:04d}")
            run.log_params({"lr": 1e-4 * (i + 1)})
            run.log_metric("val_acc_limited", acc, step=0)
            run.log_metric("val_acc_limited", acc + 0.1, step=1)
            run.log_metric("train_loss", 2.0 - i, step=1)
            run.end()
        s = summarize(f"sqlite:///{tmp_path}/m.db", "exp")
        assert s["n_runs"] == 2
        assert abs(s["best_val_acc_limited_overall"] - 0.7) < 1e-9
        text = format_report(s)
        assert "trial_0001" in text and "0.7000" in text
