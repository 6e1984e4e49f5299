"""Detection KD+QAT training (train/detect_steps.py, train/detect_trainer.py).

Capability beyond the reference: its registry constructs OWLv2 detection
models but its trainer consumes only classifiers and crashes on them
(ref src/models/model_registry.py:370-426) — so the contract here is the
framework's own: losses drop, observers populate, the QAT phase switch works,
convert produces a runnable int8 detector, and the shard_map DP step keeps
global-batch semantics (runs on the 8-virtual-device CPU mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.models import create_model
from qat_vit_tpu.train.config import DEFAULT_HPARAMS
from qat_vit_tpu.train.detect_trainer import DetectKDTrainer

MICRO_GEO = dict(image_size=32, patch_size=8, embed_dim=64, depth=2,
                 num_heads=2, mlp_ratio=2.0)


def _micro_hp(**over):
    hp = dict(DEFAULT_HPARAMS)
    hp.update(
        task="detection", image_size=32, batch_size=8, eval_batch_size=8,
        epochs=3, qat_start_epoch=1, lr=1e-3, weight_decay=1e-4,
        num_queries=3, text_dim=64, limit_train_batches=6,
        limit_eval_batches=2, amp=False, qat_amp=False, amp_fast_math=False,
        mlflow_uri="", output_dir="/tmp/unused",
    )
    hp.update(over)
    return hp


def _micro_data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "train_images": rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
        "train_labels": rng.integers(0, 10, n).astype(np.int32),
        "test_images": rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8),
        "test_labels": rng.integers(0, 10, 16).astype(np.int32),
    }


def _micro_bundles():
    teacher = create_model("owlv2_base_detector", text_dim=64,
                           dtype=jnp.bfloat16, **MICRO_GEO)
    student = create_model("owlv2_pruned_detector", text_dim=64, **MICRO_GEO)
    return teacher, student


class TestDetectKDTrainer:
    pytestmark = pytest.mark.slow
    def test_convergence_and_int8_export(self):
        """Losses drop across the float phase and again under QAT; observers
        populate; convert produces an int8 detector that agrees with its
        fake-quant self — the full detection phase machine in one smoke."""
        teacher, student = _micro_bundles()
        hp = _micro_hp()
        trainer = DetectKDTrainer(
            hp, data=_micro_data(), teacher=teacher, student=student,
        )
        epoch_losses = []
        for epoch in range(int(hp["epochs"])):
            if epoch >= int(hp["qat_start_epoch"]):
                trainer.enable_qat()
            tm = trainer.train_epoch(
                epoch, limit_batches=int(hp["limit_train_batches"]))
            epoch_losses.append(tm["train_loss"])
            assert np.isfinite(tm["train_loss"])
        # float phase converges toward the teacher; QAT keeps training
        assert epoch_losses[-1] < epoch_losses[0], epoch_losses

        # observers populated: every min/max leaf finite after QAT epochs
        qs_leaves = jax.tree.leaves(jax.device_get(trainer.state.quant_stats))
        assert qs_leaves and all(np.isfinite(x).all() for x in qs_leaves)

        ev = trainer.evaluate(limit_batches=2)
        assert 0.0 <= ev["teacher_agreement"] <= 1.0
        assert np.isfinite(ev["box_err"])

        export = trainer.convert_int8()
        assert export["tower"]["blocks"]["0"]["qkv"]["w_int8"].dtype == jnp.int8
        i8 = trainer.evaluate_int8(export, limit_batches=2)
        assert i8["int8_top_box_agreement"] >= 0.7, i8
        assert i8["int8_box_err"] < 0.05, i8

    def test_shard_map_dp_matches_single_device(self):
        """One detection train step on the full mesh equals the same step on
        one device (global-batch pmean semantics), and the observer stats
        agree — the 2-process-safe contract, exercised on the virtual mesh."""
        if jax.device_count() < 2:
            pytest.skip("needs a multi-device mesh")
        from qat_vit_tpu.parallel import make_mesh

        hp = _micro_hp(qat_start_epoch=0, epochs=1, limit_train_batches=2,
                       batch_size=8)
        data = _micro_data(seed=3)

        def run(mesh):
            teacher, student = _micro_bundles()
            tr = DetectKDTrainer(hp, data=data, teacher=teacher,
                                 student=student, mesh=mesh, seed=11)
            tr.enable_qat()
            tm = tr.train_epoch(0, limit_batches=2)
            return tm, tr

        tm_multi, tr_multi = run(make_mesh())
        tm_single, tr_single = run(
            make_mesh(data=1, model=1, devices=jax.devices()[:1]))
        assert np.isclose(tm_multi["train_loss"], tm_single["train_loss"],
                          rtol=2e-4, atol=2e-5), (tm_multi, tm_single)
        qs_m = jax.device_get(tr_multi.state.quant_stats)
        qs_s = jax.device_get(tr_single.state.quant_stats)
        flat_m = jax.tree.leaves(qs_m)
        flat_s = jax.tree.leaves(qs_s)
        for a, b in zip(flat_m, flat_s):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_eval_tail_batch_masked(self):
        """Eval keeps the tail batch (drop_last=False): the trailing short
        batch is padded to the compiled size and masked via "valid", so the
        metrics are IDENTICAL whichever batch size tiles the eval set."""
        from qat_vit_tpu.data import ArrayLoader

        teacher, student = _micro_bundles()
        data = _micro_data()  # 16 eval images
        tr = DetectKDTrainer(_micro_hp(eval_batch_size=16), data=data,
                             teacher=teacher, student=student)
        ev_exact = tr.evaluate()  # one exact batch of 16
        # non-dividing batch size: one batch of 16 padded to 24 (8 masked)
        tr.hp["eval_batch_size"] = 24
        tr.eval_loader = ArrayLoader(
            data["test_images"], data["test_labels"], batch_size=24,
            shuffle=False, drop_last=False, prefetch=2,
        )
        ev_padded = tr.evaluate()
        assert np.isclose(ev_padded["box_err"], ev_exact["box_err"],
                          rtol=1e-5), (ev_padded, ev_exact)
        assert np.isclose(ev_padded["teacher_agreement"],
                          ev_exact["teacher_agreement"], rtol=1e-5), (
            ev_padded, ev_exact)

        # evaluate_int8 rides the same padded static batch shape (a short
        # tail would otherwise jit-compile fq/i8 forwards at a fresh shape —
        # minutes over the TPU tunnel) and masks the padded rows
        tr.enable_qat()
        tr.train_epoch(0, limit_batches=2)
        export = tr.convert_int8()
        i8_padded = tr.evaluate_int8(export)  # 16 images in a 24-batch
        tr.hp["eval_batch_size"] = 16
        tr.eval_loader = ArrayLoader(
            data["test_images"], data["test_labels"], batch_size=16,
            shuffle=False, drop_last=False, prefetch=2,
        )
        i8_exact = tr.evaluate_int8(export)
        assert np.isclose(i8_padded["int8_box_err"],
                          i8_exact["int8_box_err"], rtol=1e-5, atol=1e-8), (
            i8_padded, i8_exact)
        assert np.isclose(i8_padded["int8_top_box_agreement"],
                          i8_exact["int8_top_box_agreement"], rtol=1e-5), (
            i8_padded, i8_exact)

    def test_cli_task_routing(self, tmp_path):
        """--task detection routes the trainer CLI into detect_train_main and
        produces the detection artifacts (int8 export + fake-quant ckpt)."""
        import qat_vit_tpu.train.detect_trainer as dt

        hp = _micro_hp(
            epochs=2, qat_start_epoch=1, limit_train_batches=2,
            limit_eval_batches=1,
            output_dir=str(tmp_path),
            mlflow_uri=f"sqlite:///{tmp_path}/mlflow.db",
            experiment="det-test", data_dir=str(tmp_path / "no_data"),
        )
        # micro geometry through the hp dict (the trainer forwards these
        # registry overrides when no bundles are injected)
        hp.update({k: v for k, v in MICRO_GEO.items() if k != "image_size"})
        out = dt.detect_train_main(hp)
        assert (tmp_path / "best_converted_detector.msgpack").exists()
        assert (tmp_path / "best_qat_detector.msgpack").exists()
        assert out["int8"]["int8_top_box_agreement"] >= 0.5
        assert len(out["results"]) == 2


class TestDetectTrainerParity:
    pytestmark = pytest.mark.slow
    """Round-5 feature parity with the classification trainer (VERDICT r4
    directive 2): teacher-output cache, observer_interval, mid-run resume."""

    def test_teacher_cache_equivalence(self):
        """Cached teacher outputs train identically to per-step teacher
        forwards (teacher frozen, fixed query set, no augmentation — the
        outputs per image are constants)."""
        data = _micro_data(seed=5)
        hp_off = _micro_hp(cache_teacher_logits=False, epochs=1,
                           qat_start_epoch=5)
        hp_on = _micro_hp(cache_teacher_logits=True, epochs=1,
                          qat_start_epoch=5)

        teacher, student = _micro_bundles()
        t_off = DetectKDTrainer(hp_off, data=data, teacher=teacher,
                                student=student)
        m_off = t_off.train_epoch(0, limit_batches=2)

        teacher2, student2 = _micro_bundles()
        t_on = DetectKDTrainer(hp_on, data=data, teacher=teacher2,
                               student=student2,
                               teacher_params=t_off.teacher_params)
        m_on = t_on.train_epoch(0, limit_batches=2)

        np.testing.assert_allclose(
            m_on["train_loss"], m_off["train_loss"], rtol=2e-4)
        for a, b in zip(jax.tree.leaves(jax.device_get(t_on.state.params)),
                        jax.tree.leaves(jax.device_get(t_off.state.params))):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)

    def test_lazy_fill_only_visited(self):
        """Limited-batch runs fill the cache lazily: only visited rows are
        computed, revisits recompute nothing."""
        data = _micro_data(n=64, seed=6)
        teacher, student = _micro_bundles()
        # planned visits (2*8*1 epoch) < half the 64 train images -> lazy
        hp = _micro_hp(epochs=1, qat_start_epoch=5)
        tr = DetectKDTrainer(hp, data=data, teacher=teacher, student=student)
        tr.train_epoch(0, limit_batches=2)
        assert tr._teacher_mask.sum() == 2 * int(hp["batch_size"])
        filled = tr._teacher_mask.copy()
        tr.train_epoch(0, limit_batches=2)  # same epoch/seed: all hits
        np.testing.assert_array_equal(tr._teacher_mask, filled)

    def test_observer_interval_freezes_stats_between_updates(self):
        """observer_interval=2: after 2 QAT steps the observer stats equal a
        1-step every-step run (step 1 ran frozen) while the optimizer took
        both steps — the classification trainer's exact contract."""
        data = _micro_data(seed=7)
        teacher, student = _micro_bundles()
        t_a = DetectKDTrainer(
            _micro_hp(observer_interval=2), data=data, teacher=teacher,
            student=student)
        t_a.enable_qat()
        t_a.train_epoch(0, limit_batches=2)
        assert int(t_a.state.step) == 2

        teacher2, student2 = _micro_bundles()
        t_b = DetectKDTrainer(
            _micro_hp(), data=data, teacher=teacher2, student=student2,
            teacher_params=t_a.teacher_params)
        t_b.enable_qat()
        t_b.train_epoch(0, limit_batches=1)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(t_a.state.quant_stats)),
            jax.tree.leaves(jax.device_get(t_b.state.quant_stats)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_roundtrip(self, tmp_path):
        """Full-state detection resume: params, optimizer moments, observer
        stats, step counter, epoch and QAT phase all round-trip."""
        data = _micro_data(seed=8)
        teacher, student = _micro_bundles()
        hp = _micro_hp(qat_start_epoch=0)
        t1 = DetectKDTrainer(hp, data=data, teacher=teacher, student=student)
        t1.enable_qat()
        t1.train_epoch(0, limit_batches=2)
        path = t1.save_resume_state(str(tmp_path / "resume.msgpack"), epoch=0)

        teacher2, student2 = _micro_bundles()
        t2 = DetectKDTrainer(hp, data=data, teacher=teacher2,
                             student=student2,
                             teacher_params=t1.teacher_params)
        assert t2.load_resume_state(path) == 1
        assert t2.qat_enabled
        assert int(t2.state.step) == int(t1.state.step)
        for a, b in zip(jax.tree.leaves(jax.device_get(t2.state.params)),
                        jax.tree.leaves(jax.device_get(t1.state.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(jax.device_get(t2.state.quant_stats)),
            jax.tree.leaves(jax.device_get(t1.state.quant_stats)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and training continues from the restored state
        tm = t2.train_epoch(1, limit_batches=1)
        assert np.isfinite(tm["train_loss"])


class TestDetectionLoss:
    def test_loss_zero_at_teacher_outputs(self):
        """Distillation loss vanishes when the student reproduces the
        teacher exactly (up to objectness BCE's entropy floor)."""
        from qat_vit_tpu.train.detect_steps import detection_kd_loss

        rng = np.random.default_rng(0)
        out = {
            "logits": jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32),
            "pred_boxes": jnp.asarray(
                jax.nn.sigmoid(jnp.asarray(rng.normal(size=(2, 16, 4)))),
                jnp.float32),
            "objectness_logits": jnp.asarray(
                rng.normal(size=(2, 16)), jnp.float32),
        }
        loss, m = detection_kd_loss(
            out, out, temperature=2.0, box_weight=1.0, obj_weight=0.25)
        assert float(m["train_loss_kd"]) < 1e-6
        assert float(m["train_loss_box"]) == 0.0
        # BCE against soft targets has an entropy floor > 0
        assert float(m["train_loss_obj"]) > 0.0

    def test_loss_decreases_toward_teacher(self):
        from qat_vit_tpu.train.detect_steps import detection_kd_loss

        rng = np.random.default_rng(1)
        teacher = {
            "logits": jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32),
            "pred_boxes": jnp.asarray(
                jax.nn.sigmoid(jnp.asarray(rng.normal(size=(2, 16, 4)))),
                jnp.float32),
            "objectness_logits": jnp.asarray(
                rng.normal(size=(2, 16)), jnp.float32),
        }
        far = jax.tree.map(lambda a: a + 1.0, teacher)
        near = jax.tree.map(lambda a: a + 0.1, teacher)
        lf, _ = detection_kd_loss(far, teacher, temperature=2.0,
                                  box_weight=1.0, obj_weight=0.25)
        ln, _ = detection_kd_loss(near, teacher, temperature=2.0,
                                  box_weight=1.0, obj_weight=0.25)
        assert float(ln) < float(lf)
