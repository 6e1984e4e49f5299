"""Full-scale accuracy loop: dataset -> teacher -> search -> train -> int8.

Runs the reference's complete pipeline shape (teacher acquisition ->
hyperparameter search -> final KD+QAT training -> convert -> int8 eval,
reference scripts/search_qat.sh + train_final.sh + evaluate.sh) at FULL
scale (ViT-S/16 @224, 50k train / 10k test) and reports fp32 / fake-quant /
int8 top-1 — the accuracy evidence the reference never produced (its mlflow
DB has no final-training runs and its converted model cannot run;
SURVEY.md §6). The environment has no network, so the dataset is the hard
synthetic CIFAR-10 stand-in (data/cifar10.synthetic_cifar10_hard) and the
teacher is pretrained locally (scripts/pretrain_teacher.py).

Phases are idempotent (skipped when their artifact exists):
  data     workdir/data/cifar10.npz
  teacher  workdir/teacher/teacher.msgpack
  search   workdir/search/best_params.yaml  (optional, --trials 0 skips)
  final    workdir/final_f32/  and  workdir/final_amp/   (qat_amp variant)
  report   workdir/REPORT.md + REPORT.json

Run: python scripts/accuracy_loop.py --workdir /tmp/acc [--phase all]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

logger = logging.getLogger("accuracy_loop")


def phase_data(workdir: str, seed: int) -> str:
    import numpy as np

    from qat_vit_tpu.data.cifar10 import synthetic_cifar10_hard

    data_dir = os.path.join(workdir, "data")
    npz = os.path.join(data_dir, "cifar10.npz")
    if os.path.isfile(npz):
        return data_dir
    os.makedirs(data_dir, exist_ok=True)
    logger.info("generating hard synthetic CIFAR-10 (50k/10k) ...")
    splits = synthetic_cifar10_hard(50_000, 10_000, seed=seed)
    np.savez_compressed(npz + ".tmp.npz", **splits)
    os.replace(npz + ".tmp.npz", npz)
    return data_dir


def phase_teacher(workdir: str, data_dir: str, epochs: int) -> str:
    out = os.path.join(workdir, "teacher")
    ckpt = os.path.join(out, "teacher.msgpack")
    if os.path.isfile(ckpt):
        return ckpt
    import scripts.pretrain_teacher as pt

    pt.main([
        "--data-dir", data_dir, "--output-dir", out,
        "--epochs", str(epochs), "--batch-size", "256", "--lr", "3e-4",
    ])
    assert os.path.isfile(ckpt), "teacher pretrain produced no checkpoint"
    return ckpt


def phase_search(workdir: str, data_dir: str, teacher_ckpt: str,
                 trials: int, epochs: int) -> str:
    out = os.path.join(workdir, "search")
    best = os.path.join(out, "best_params.yaml")
    if trials <= 0 or os.path.isfile(best):
        return best if os.path.isfile(best) else ""
    from qat_vit_tpu.search.driver import SearchConfig, run_optuna_search

    run_optuna_search(SearchConfig(
        trials=trials, epochs=epochs, output_dir=out,
        mlflow_uri=f"sqlite:///{out}/mlflow.db", data_dir=data_dir,
        teacher_ckpt=teacher_ckpt,
    ))
    return best


def phase_final(workdir: str, data_dir: str, teacher_ckpt: str,
                best_params: str, epochs: int, qat_amp: bool,
                extra: dict = None, tag: str = None) -> dict:
    from qat_vit_tpu.train.config import load_hparams
    from qat_vit_tpu.train.trainer import train_main

    tag = tag or ("amp" if qat_amp else "f32")
    out = os.path.join(workdir, f"final_{tag}")
    done = os.path.join(out, "RESULT.json")
    if os.path.isfile(done):
        with open(done) as f:
            return json.load(f)
    hp = load_hparams(best_params if best_params else None)
    hp.update(
        epochs=epochs, data_dir=data_dir, output_dir=out,
        teacher_ckpt=teacher_ckpt, qat_amp=qat_amp,
        mlflow_uri=f"sqlite:///{out}/mlflow.db",
        eval_batch_size=512,
    )
    hp.update(extra or {})
    # the search space allows qat_start_epoch up to its epochs-2; clamp to
    # this run's horizon (reference uses the yaml value as-is at matching
    # epoch budgets)
    hp["qat_start_epoch"] = min(int(hp["qat_start_epoch"]), epochs - 2)
    res = train_main(hp)
    summary = {
        "output_dir": out,
        "qat_amp": qat_amp,
        "best_acc": res["best_acc"],
        "final_quant_acc": res["final_quant_acc"],
        "epochs": [
            {"epoch": r.epoch, "train_loss": r.train_loss,
             "qat_acc": r.qat_acc, "quant_acc": r.quant_acc,
             "qat_enabled": r.qat_enabled, "imgs_per_sec": r.imgs_per_sec}
            for r in res["results"]
        ],
    }
    with open(done, "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def phase_report(workdir: str, data_dir: str, teacher_ckpt: str,
                 finals: dict) -> None:
    """Cross-check with the evaluation CLI surface + write the table."""
    from qat_vit_tpu.evaluation.evaluator import evaluate_checkpoint

    report = {"teacher": None, "variants": {}}
    report["teacher"] = evaluate_checkpoint(
        "vit_base_patch16_224_teacher", teacher_ckpt, data_dir=data_dir,
    )
    for tag, summary in finals.items():
        out = summary["output_dir"]
        qat_ckpt = os.path.join(out, "best_qat.msgpack")
        quant_ckpt = os.path.join(out, "best_converted.msgpack")
        # fp32 view: the fake-quant-trained weights evaluated WITHOUT
        # fake-quant (the reference comparator's bare-model strict=False
        # load of best_qat.pth, comparator.py:54-64)
        fp32 = evaluate_checkpoint(
            "vit_small_patch16_224_student", qat_ckpt, data_dir=data_dir,
            qat_wrapper=False,
        )
        fq = evaluate_checkpoint(
            "vit_small_patch16_224_student", qat_ckpt, data_dir=data_dir,
            qat_wrapper=True,
        )
        int8 = evaluate_checkpoint(
            "vit_small_patch16_224_student", quant_ckpt, data_dir=data_dir,
            int8=True,
        )
        # production-kernel cross-check: the same export served through
        # serving_preset (megablock path on TPU) must match the exact f32
        # serving path — accuracy-neutrality evidence per trained checkpoint
        # (docs/BENCHMARKS.md "Accuracy of the fast path")
        int8_preset = evaluate_checkpoint(
            "vit_small_patch16_224_student", quant_ckpt, data_dir=data_dir,
            int8=True, serving="preset",
        )
        last = summary["epochs"][-1]
        report["variants"][tag] = {
            "fp32_top1": fp32, "fakequant_top1": fq, "int8_top1": int8,
            "int8_preset_top1": int8_preset,
            "trainer_last_epoch": last,
            "int8_minus_fakequant": int8 - fq,
            "preset_minus_exact": int8_preset - int8,
        }
    with open(os.path.join(workdir, "REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)

    lines = [
        "# Full-scale accuracy loop (ViT-S/16 @224, 50k/10k hard-synthetic)",
        "",
        f"teacher (ViT-B/16) top-1: **{report['teacher']:.4f}**",
        "",
        "## Last-epoch fake-quant vs int8 (the reference's convert-time "
        "comparison)",
        "",
        "The int8 export is converted from the LAST epoch's weights"
        " (reference qat_trainer.py:376-388), so the apples-to-apples"
        " int8-vs-QAT delta is that epoch's `qat_acc` (live fake-quant eval)"
        " vs `quant_acc` (true-int8 eval of the converted model):",
        "",
        "| variant | last-epoch QAT (fake-quant) | last-epoch int8 | delta |"
        " QAT imgs/s |",
        "|---|---|---|---|---|",
    ]
    for tag, v in report["variants"].items():
        le = v["trainer_last_epoch"]
        lines.append(
            f"| {tag} | {le['qat_acc']:.4f} | {le['quant_acc']:.4f} "
            f"| {le['quant_acc'] - le['qat_acc']:+.4f} "
            f"| {le['imgs_per_sec']:.0f} |"
        )
    lines += [
        "",
        "## Checkpoint evaluations (reference comparator semantics)",
        "",
        "`best_qat.msgpack` follows the reference's best-model rule and may"
        " land on a PRE-QAT epoch (it did here) — its fake-quant eval then"
        " legitimately equals fp32 (uncalibrated observers are identity).",
        "",
        "| variant | fp32 (bare) | fake-quant (best ckpt) | int8 (converted)"
        " | int8 − best-ckpt | int8 preset-kernel | preset − exact |",
        "|---|---|---|---|---|---|---|",
    ]
    for tag, v in report["variants"].items():
        lines.append(
            f"| {tag} | {v['fp32_top1']:.4f} | {v['fakequant_top1']:.4f} "
            f"| {v['int8_top1']:.4f} | {v['int8_minus_fakequant']:+.4f} "
            f"| {v['int8_preset_top1']:.4f} | {v['preset_minus_exact']:+.4f} |"
        )
    md = "\n".join(lines) + "\n"
    with open(os.path.join(workdir, "REPORT.md"), "w") as f:
        f.write(md)
    print(md)


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="./accuracy_run")
    p.add_argument("--phase", default="all",
                   choices=["all", "data", "teacher", "search", "final",
                            "report"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--teacher-epochs", type=int, default=8)
    p.add_argument("--trials", type=int, default=30)
    p.add_argument("--search-epochs", type=int, default=10)
    p.add_argument("--final-epochs", type=int, default=10)
    p.add_argument("--skip-amp-variant", action="store_true")
    p.add_argument("--skip-f32-variant", action="store_true")
    p.add_argument("--observer-interval", type=int, default=1,
                   help="also run a final variant with this "
                        "observer_interval (accuracy evidence for the "
                        "opt-in throughput lever)")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    data_dir = phase_data(args.workdir, args.seed)
    if args.phase == "data":
        return
    teacher_ckpt = phase_teacher(args.workdir, data_dir, args.teacher_epochs)
    if args.phase == "teacher":
        return
    best = phase_search(args.workdir, data_dir, teacher_ckpt, args.trials,
                        args.search_epochs)
    if args.phase == "search":
        return
    finals = {}
    if not args.skip_f32_variant:
        finals["f32"] = phase_final(args.workdir, data_dir, teacher_ckpt,
                                    best, args.final_epochs, qat_amp=False)
    if not args.skip_amp_variant:
        finals["qat_amp(bf16)"] = phase_final(
            args.workdir, data_dir, teacher_ckpt, best,
            args.final_epochs, qat_amp=True)
    if args.observer_interval > 1:
        k = args.observer_interval
        finals[f"qat_amp+obs/{k}"] = phase_final(
            args.workdir, data_dir, teacher_ckpt, best, args.final_epochs,
            qat_amp=True, extra={"observer_interval": k}, tag=f"obs{k}")
    if args.phase == "final":
        return
    phase_report(args.workdir, data_dir, teacher_ckpt, finals)


if __name__ == "__main__":
    main()
