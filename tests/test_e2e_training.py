"""End-to-end convergence smoke: the full KD+QAT pipeline on a micro ViT.

The TPU-idiomatic replacement for the reference's lack of tests (survey §4):
train a 2-block student against a 2-block teacher on synthetic CIFAR-10
through both phases (float → QAT → convert → int8 eval) and assert learning
actually happens and every artifact is produced.
"""

import os

import numpy as np
import pytest

import jax

from qat_vit_tpu.data import synthetic_cifar10
from qat_vit_tpu.models import create_model
from qat_vit_tpu.train.config import DEFAULT_HPARAMS
from qat_vit_tpu.train.trainer import KDQATTrainer, train_main
from qat_vit_tpu.utils.checkpoint import load_checkpoint, load_metadata


def _micro_hparams(tmp_path, **overrides):
    hp = dict(DEFAULT_HPARAMS)
    hp.update(
        lr=3e-3,
        weight_decay=1e-4,
        epochs=3,
        qat_start_epoch=1,
        batch_size=64,
        eval_batch_size=128,
        image_size=32,
        output_dir=str(tmp_path / "out"),
        mlflow_uri=f"sqlite:///{tmp_path}/mlflow.db",
        data_dir=str(tmp_path / "nodata"),
        limit_train_batches=6,
        limit_eval_batches=2,
    )
    hp.update(overrides)
    return hp


@pytest.fixture(scope="module")
def micro_models():
    student = create_model("vit_micro_test")
    teacher = create_model("vit_micro_test")
    return student, teacher


class TestEndToEnd:
    pytestmark = pytest.mark.slow
    def test_full_pipeline(self, tmp_path, micro_models):
        student, teacher = micro_models
        hp = _micro_hparams(tmp_path)
        data = synthetic_cifar10(n_train=512, n_test=256, seed=0)

        trainer = KDQATTrainer(hp, data=data, student=student, teacher=teacher)

        # ---- float phase ----
        m0 = trainer.train_epoch(0, limit_batches=6)
        assert np.isfinite(m0["train_loss"])
        acc_float = trainer.evaluate(limit_batches=2)

        # ---- QAT phase ----
        trainer.enable_qat()
        assert trainer.qat_enabled
        m1 = trainer.train_epoch(1, limit_batches=6)
        m2 = trainer.train_epoch(2, limit_batches=6)
        assert np.isfinite(m2["train_loss"])
        acc_qat = trainer.evaluate(limit_batches=2)
        assert 0.0 <= acc_qat <= 1.0

        # loss must actually decrease across the run (m0 is the first float
        # epoch, m2 the second QAT epoch — three epochs of optimization)
        assert m2["train_loss"] < m0["train_loss"], (m2["train_loss"], m0["train_loss"])

        # ---- convert + int8 eval ----
        qparams = trainer.convert_int8()
        acc_int8 = trainer.evaluate_int8(qparams, limit_batches=2)
        # int8 must be in the same ballpark as the fake-quant model
        assert acc_int8 >= acc_qat - 0.2, (acc_int8, acc_qat)

    def test_train_main_artifacts(self, tmp_path):
        """The CLI-level entry produces the reference's artifact set."""
        hp = _micro_hparams(
            tmp_path,
            student_family="vit",  # exercised via micro override below
        )
        # micro-size the models through the registry by monkeypatching the
        # families would be heavy; instead call train_main with micro configs
        # by shrinking image size and reusing vit families is too slow on CPU.
        # Use the micro model through a trainer-level run instead:
        data = synthetic_cifar10(n_train=256, n_test=128, seed=1)
        student = create_model("vit_micro_test")
        teacher = create_model("vit_micro_test")

        import qat_vit_tpu.train.trainer as trainer_mod

        orig_student, orig_teacher = trainer_mod.create_student, trainer_mod.create_teacher
        orig_load = trainer_mod.load_cifar10
        trainer_mod.create_student = lambda *a, **k: student
        trainer_mod.create_teacher = lambda *a, **k: teacher
        trainer_mod.load_cifar10 = lambda *a, **k: (data, "synthetic")
        try:
            result = train_main(hp)
        finally:
            trainer_mod.create_student = orig_student
            trainer_mod.create_teacher = orig_teacher
            trainer_mod.load_cifar10 = orig_load

        out = hp["output_dir"]
        assert os.path.isfile(os.path.join(out, "effective_hparams.yaml"))
        assert os.path.isfile(os.path.join(out, "best_qat.msgpack"))
        assert os.path.isfile(os.path.join(out, "best_converted.msgpack"))
        meta = load_metadata(os.path.join(out, "best_converted.msgpack"))
        assert meta["format"] == "int8-weights+qparams"
        # int8 export loads back
        qp = load_checkpoint(os.path.join(out, "best_converted.msgpack"))
        assert "blocks" in qp or "0" in qp.get("blocks", {"0": 1})
        # metrics landed in the tracker
        from qat_vit_tpu.tracking import SqliteTracker

        t = SqliteTracker(hp["mlflow_uri"], hp["experiment"])
        runs = t.runs()
        assert len(runs) == 1 and runs[0]["status"] == "FINISHED"
        keys = {m["key"] for m in t.metrics(runs[0]["run_id"])}
        assert {"train_loss", "qat_acc", "quant_acc", "final_quant_acc"} <= keys
        assert len(result["results"]) == hp["epochs"]

    def test_resume_state_roundtrip(self, tmp_path, micro_models):
        """Full-state resume (beyond-reference capability): params, optimizer
        moments, observers, and phase survive a save/load and training
        continues bit-compatibly."""
        student, teacher = micro_models
        hp = _micro_hparams(tmp_path, epochs=2, qat_start_epoch=0)
        data = synthetic_cifar10(n_train=128, n_test=64, seed=2)
        t1 = KDQATTrainer(hp, data=data, student=student, teacher=teacher)
        t1.enable_qat()
        t1.train_epoch(0, limit_batches=3)
        path = t1.save_resume_state(str(tmp_path / "resume.msgpack"), epoch=0)

        t2 = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                          teacher_params=t1.teacher_params,
                          steps=t1.shared_steps())
        next_epoch = t2.load_resume_state(path)
        assert next_epoch == 1 and t2.qat_enabled
        for a, b in zip(jax.tree.leaves(jax.device_get(t1.state.params)),
                        jax.tree.leaves(jax.device_get(t2.state.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(jax.device_get(t1.state.quant_stats)),
                        jax.tree.leaves(jax.device_get(t2.state.quant_stats))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # one more epoch from the restored state must match continuing t1
        m1 = t1.train_epoch(1, limit_batches=2)
        m2 = t2.train_epoch(1, limit_batches=2)
        np.testing.assert_allclose(m1["train_loss"], m2["train_loss"], rtol=1e-5)

        # resume info must come from leaves embedded in the msgpack, not the
        # JSON sidecar — a crash between the two publishes can leave a stale
        # sidecar beside a newer msgpack (regression: sidecar-driven resume
        # skipped an epoch / missed the QAT re-enable)
        import json

        with open(path + ".json", "w") as f:
            json.dump({"epoch": 7, "qat_enabled": False}, f)
        t3 = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                          teacher_params=t1.teacher_params,
                          steps=t1.shared_steps())
        assert t3.load_resume_state(path) == 1 and t3.qat_enabled

    def test_observer_interval_freezes_stats_between_updates(
        self, tmp_path, micro_models
    ):
        """observer_interval=k (opt-in throughput lever): the observer EMA
        advances only on every k-th QAT step — after 2 steps at k=2 the
        stats must equal a 1-step every-step run (step 1 ran frozen), while
        the optimizer still took both steps."""
        student, teacher = micro_models
        data = synthetic_cifar10(n_train=256, n_test=64, seed=4)
        t_a = KDQATTrainer(
            _micro_hparams(tmp_path, observer_interval=2),
            data=data, student=student, teacher=teacher,
        )
        t_a.enable_qat()
        t_a.train_epoch(0, limit_batches=2)
        assert int(t_a.state.step) == 2  # both optimizer steps happened

        t_b = KDQATTrainer(
            _micro_hparams(tmp_path), data=data, student=student,
            teacher=teacher, teacher_params=t_a.teacher_params,
        )
        t_b.enable_qat()
        t_b.train_epoch(0, limit_batches=1)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(t_a.state.quant_stats)),
            jax.tree.leaves(jax.device_get(t_b.state.quant_stats)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_attn_kernel_mesh_gating(self, tmp_path, micro_models):
        """Pure-DP multi-device meshes train under shard_map (each device
        runs the unmodified per-device program), so the Pallas attention
        kernel STAYS enabled there — with observers set to reduce over the
        data axis. Only tensor-parallel meshes (GSPMD must partition the
        graph, and cannot split the opaque custom call) disable it."""
        from qat_vit_tpu.parallel import make_mesh
        from qat_vit_tpu.parallel.mesh import DATA_AXIS

        student, teacher = micro_models
        hp = _micro_hparams(tmp_path)
        data = synthetic_cifar10(n_train=64, n_test=64, seed=3)
        t8 = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                          mesh=make_mesh())  # 8-device pure DP
        assert t8.use_shard_map
        assert t8.student_qat_cfg.attn_kernel
        assert t8.student_float_cfg.attn_kernel
        assert t8.student_qat_cfg.quant.activation.axis_name == DATA_AXIS
        assert t8.student_qat_cfg.quant.weight.axis_name is None
        ttp = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                           teacher_params=t8.teacher_params,
                           mesh=make_mesh(data=4, model=2))
        assert not ttp.use_shard_map
        assert not ttp.student_qat_cfg.attn_kernel
        assert ttp.student_qat_cfg.quant.activation.axis_name is None
        t1 = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                          teacher_params=t8.teacher_params,
                          mesh=make_mesh(data=1, model=1,
                                         devices=jax.devices()[:1]))
        assert not t1.use_shard_map
        assert t1.student_qat_cfg.attn_kernel
        assert t1.student_float_cfg.attn_kernel
        assert t1.student_qat_cfg.quant.activation.axis_name is None

    def test_checkpoint_roundtrip(self, tmp_path, micro_models):
        """best_qat checkpoint restores into a working model (replaces the
        reference's untested strict=False loaders)."""
        from qat_vit_tpu.utils.checkpoint import save_checkpoint

        student, _ = micro_models
        variables = student.init(jax.random.key(0), batch_size=1)
        import flax.linen as nn

        params = nn.meta.unbox(variables["params"])
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, {"params": params}, {"note": "test"})
        restored = load_checkpoint(path, {"params": params})
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLazyTeacherCache:
    pytestmark = pytest.mark.slow
    """Limited-batch runs fill the teacher-logit cache per visited batch
    (an eager 50k-image pass costs ~14 min at OWLv2 teacher scale while a
    micro run touches a few dozen rows); lazy and eager fills must train
    identically."""

    def test_lazy_fill_matches_eager(self, tmp_path, micro_models):
        student, teacher = micro_models
        data = synthetic_cifar10(n_train=512, n_test=128, seed=1)
        hp = _micro_hparams(tmp_path, epochs=1, qat_start_epoch=5)

        lazy = KDQATTrainer(hp, data=data, student=student, teacher=teacher)
        m_lazy = lazy.train_epoch(0, limit_batches=2)
        # only the visited rows were computed
        assert lazy._teacher_mask.sum() == 2 * hp["batch_size"]
        # revisiting the same epoch recomputes nothing (mask unchanged)
        filled = lazy._teacher_mask.copy()
        lazy.train_epoch(0, limit_batches=2)
        np.testing.assert_array_equal(lazy._teacher_mask, filled)

        eager = KDQATTrainer(hp, data=data, student=student, teacher=teacher)
        eager._ensure_teacher_logits()  # full precompute (lazy=False)
        assert eager._teacher_mask.all()
        m_eager = eager.train_epoch(0, limit_batches=2)

        # same seed -> same batches; same logits -> same training metrics
        np.testing.assert_allclose(
            m_lazy["train_loss"], m_eager["train_loss"], rtol=1e-5)
        idx = np.flatnonzero(filled)
        np.testing.assert_allclose(
            lazy._teacher_logits[idx], eager._teacher_logits[idx],
            rtol=1e-4, atol=1e-5)

    def test_shared_pair_reused_across_trainers(self, tmp_path, micro_models):
        """The (logits, mask) pair shares by reference across trainers (the
        search driver's cross-trial reuse contract)."""
        student, teacher = micro_models
        data = synthetic_cifar10(n_train=512, n_test=128, seed=1)
        hp = _micro_hparams(tmp_path, epochs=1, qat_start_epoch=5)

        t0 = KDQATTrainer(hp, data=data, student=student, teacher=teacher)
        t0.train_epoch(0, limit_batches=2)
        pair = (t0._teacher_logits, t0._teacher_mask)

        t1 = KDQATTrainer(hp, data=data, student=student, teacher=teacher,
                          teacher_params=t0.teacher_params,
                          teacher_logits=pair)
        assert t1._teacher_logits is pair[0]
        t1.train_epoch(0, limit_batches=2)  # same epoch/seed: all cache hits
        np.testing.assert_array_equal(t1._teacher_mask, t0._teacher_mask)

    def test_search_regime_stays_eager(self, tmp_path, micro_models):
        """When the planned visits cover a large fraction of the dataset
        (the search regime: limited batches x many reshuffled epochs), the
        one-shot eager precompute is kept — lazy would re-run the teacher on
        nearly every batch of every epoch (any one uncached row in a
        reshuffled batch is a miss)."""
        student, teacher = micro_models
        data = synthetic_cifar10(n_train=256, n_test=128, seed=1)
        hp = _micro_hparams(tmp_path, epochs=3, qat_start_epoch=5)
        t = KDQATTrainer(hp, data=data, student=student, teacher=teacher)
        t.train_epoch(0, limit_batches=2)  # 2*64*3 planned >= 256//2
        assert t._teacher_mask.all()
