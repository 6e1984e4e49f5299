"""Three-tier hyperparameter config: defaults → YAML overlay → CLI overrides.

Exactly the reference's precedence scheme (src/training/qat_trainer.py:36-46
``DEFAULT_HPARAMS``, :84-109 ``_load_hparams`` with type normalization and a
missing-file warning, :163-182 per-flag CLI overrides, :188-191 effective
config persisted for traceability). The YAML it reads is the flat
``best_params.yaml`` the search emits — the same contract.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Any, Dict, Optional

import yaml

logger = logging.getLogger(__name__)

# Reference DEFAULT_HPARAMS (qat_trainer.py:36-46) + TPU-build additions.
DEFAULT_HPARAMS: Dict[str, Any] = {
    "lr": 1.5e-4,
    "weight_decay": 1e-3,
    "label_smoothing": 0.1,
    "kd_temperature": 4.0,
    "kd_alpha": 0.5,
    "qat_start_epoch": 2,
    "epochs": 10,
    "batch_size": 256,
    "qat_backend": "qnnpack",
    # TPU-build additions (defaults preserve reference behavior):
    "qat_lr_scale": 0.5,  # LR×0.5 at QAT enable (qat_trainer.py:315)
    "amp": True,  # bf16 pre-QAT ≙ AMP phase gating (qat_trainer.py:320)
    "grad_clip_norm": 1.0,  # clip_grad_norm_(1.0) (qat_trainer.py:355)
    "seed": 0,
    "image_size": 224,
    "num_classes": 10,
    "eval_batch_size": 512,
    "model_parallel": 1,  # TP degree (1 = pure DP, the reference's strategy)
    "data_dir": "./data",
    "output_dir": "./qat_output",
    "mlflow_uri": "sqlite:///mlflow.db",
    "experiment": "clue-vit-qat-final",  # reference experiment name
    "student_family": "vit",
    "limit_train_batches": 0,  # 0 = full epoch
    "limit_eval_batches": 0,
    "resume": "",  # path to a resume-state checkpoint (capability beyond ref)
    "save_resume_state": True,  # write resume_state.msgpack each epoch
    # teacher weights: .msgpack (ours) or torch .pth/.bin (timm/HF layout,
    # converted on load) — the reference's HF-download path needs network
    # (model_registry.py:186-189); zero-egress environments use local files
    "teacher_ckpt": "",
    "student_ckpt": "",  # optional student warm start (ref :243-257)
    # Precompute the frozen teacher's logits once per dataset instead of
    # rerunning the ViT-B forward every step. Mathematically identical (no
    # augmentation in the pipeline, teacher frozen); measured ~40% step-time
    # saving on v5e. Set False to force per-step teacher forwards (reference
    # behavior, same numbers, slower).
    "cache_teacher_logits": True,
    # bf16 matmuls under fake-quant. The reference runs QAT in f32 — torch
    # disables AMP once fake-quant starts (qat_trainer.py:320) because
    # torch.ao kernels reject fp16 mixes; on TPU bf16 composes fine with the
    # f32 fake-quant math. ON by default since round 2's full-scale evidence:
    # 2.1x QAT-epoch throughput (2288 vs 1080 img/s) at equal-or-better
    # accuracy (last-epoch qat 0.9002/int8 0.9001 vs f32's 0.8980/0.8973;
    # runs/acc_r2 REPORT, docs/BENCHMARKS.md), and the bf16 step tracks the
    # torch.ao f32 trajectory within tolerance (test_torch_trajectory.py).
    # Set False for strict f32 numerics parity with the reference.
    "qat_amp": True,
    # bf16 softmax + tanh-approx GELU inside the bf16 phases (float/AMP and
    # qat_amp steps). The two measured-dominant non-GEMM step costs
    # (op_grad_bench: attention 74.8->49.8 ms, GELU 25.1->3.9 ms); f32 QAT
    # parity mode is unaffected. Full-scale accuracy evidence in
    # docs/BENCHMARKS.md.
    "amp_fast_math": True,
    # Update the fake-quant observers every k-th QAT step (EMA decay
    # unchanged), fake-quanting from frozen stats in between. 1 = the
    # reference's every-step torch.ao EMA (default, exact parity). Measured
    # on v5e at batch 256 (train_step_bench *_dispatch variants): k=4 →
    # +9%% step throughput, k=8 → +10%%; accuracy-neutral at k=4 in the
    # full-scale ViT-S loop (docs/BENCHMARKS.md). The EMA adapts k× slower
    # — validate accuracy for your model before production.
    "observer_interval": 1,
    # opt-in approximation: activation observers see only the first
    # 1/observer_stride of each batch (contiguous prefix — strided gathers
    # save nothing on TPU's 8-sublane tiles; quant/observers.py). 1 = exact
    # reference semantics. Orthogonal to observer_interval.
    "observer_stride": 1,
    "progress_bar": False,  # tqdm batch progress (ref qat_trainer.py:323-328)
    # per-block rematerialization: "none" | "dots" (save matmul/attention-
    # kernel outputs, recompute elementwise chains) | "full". Bit-identical
    # grads/observer stats (tests); a bandwidth-for-FLOPs trade measured in
    # scripts/train_step_bench.py (docs/BENCHMARKS.md round 4).
    "remat": "none",
    # Fuse the qkv activation fake-quant into the Pallas attention training
    # kernel (models/vit.py ViTConfig.fq_in_kernel): removes the standalone
    # fq pass, its STE mask residual, and the post-kernel mask pass over the
    # step's largest activation tensor. Bit-identical loss/grads/observer
    # stats (tests/test_attention_fq.py, incl. under shard_map DP), so it is
    # on by default; measured 104.1 -> 100.8 ms/step (+3.3%) across three
    # interleaved sessions (scripts/train_step_bench.py qat_step
    # qat_step_fqk; docs/BENCHMARKS.md round 4). No effect where the slab
    # kernel doesn't run (eval, GSPMD multi-device, long-sequence models).
    "fq_in_kernel": True,
    # int8 export with per-output-channel weight scales (accuracy upgrade
    # over the reference's per-tensor qnnpack scheme; serving cost unchanged)
    "per_channel_weights": False,
    # capture a jax.profiler trace of the first QAT epoch into this dir
    "profile_dir": "",
    # ---- detection KD (beyond-reference: the reference constructs OWLv2
    # detection models but its trainer cannot consume them, ref
    # model_registry.py:370-426) ----
    "task": "classification",  # "detection" = detector KD (train/detect_trainer.py)
    "det_box_weight": 1.0,  # L1 box-distillation weight
    "det_obj_weight": 0.25,  # objectness-BCE distillation weight
    "num_queries": 4,  # fixed query embeddings per run
    "text_dim": 512,  # query-embedding width (OWLv2 text projection dim)
}

_TYPES = {k: type(v) for k, v in DEFAULT_HPARAMS.items()}

# Reference key spellings accepted on YAML load (the reference's optuna search
# and DEFAULT_HPARAMS call the distillation temperature ``kd_temp``,
# optuna_search.py:135 / qat_trainer.py:40) — a reference-produced
# best_params.yaml must feed this trainer without silent fallback to defaults.
_ALIASES = {"kd_temp": "kd_temperature"}


def _cast(key: str, value: Any) -> Any:
    """Type-normalize a YAML/CLI value to the default's type (ref :87-96)."""
    t = _TYPES.get(key)
    if t is None or value is None:
        return value
    if t is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    try:
        return t(value)
    except (TypeError, ValueError):
        logger.warning("could not cast hparam %s=%r to %s; keeping raw", key, value, t)
        return value


def load_hparams(config_path: Optional[str] = None) -> Dict[str, Any]:
    """defaults → optional flat-YAML overlay with casting (ref :84-109)."""
    hp = dict(DEFAULT_HPARAMS)
    if config_path:
        if os.path.isfile(config_path):
            with open(config_path) as f:
                overlay = yaml.safe_load(f) or {}
            if not isinstance(overlay, dict):
                raise ValueError(f"config {config_path!r} must be a flat mapping")
            for k, v in overlay.items():
                k = _ALIASES.get(k, k)
                hp[k] = _cast(k, v)
        else:
            logger.warning("config %s not found; using defaults", config_path)
    return hp


def add_hparam_flags(parser: argparse.ArgumentParser) -> None:
    """One CLI flag per hyperparameter (ref :163-182)."""
    parser.add_argument("--config", type=str, default=None,
                        help="flat YAML overlay (e.g. best_params.yaml)")
    for key, default in DEFAULT_HPARAMS.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(default, bool):
            parser.add_argument(flag, type=str, default=None,
                                help=f"bool, default {default}")
        else:
            parser.add_argument(flag, type=type(default), default=None,
                                help=f"default {default}")


def resolve_hparams(args: argparse.Namespace) -> Dict[str, Any]:
    """defaults → YAML → non-None CLI flags (highest precedence)."""
    hp = load_hparams(getattr(args, "config", None))
    for key in DEFAULT_HPARAMS:
        val = getattr(args, key, None)
        if val is not None:
            hp[key] = _cast(key, val)
    return hp


def save_effective_hparams(hp: Dict[str, Any], output_dir: str) -> str:
    """Persist the resolved config (ref :188-191, effective_hparams.yaml)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "effective_hparams.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(hp, f, sort_keys=True)
    return path
