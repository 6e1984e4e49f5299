"""Post-training quantization: calibrate observers on data, then convert.

The QAT machinery generalizes for free: running the fake-quant model with
``observe=True`` and frozen weights IS torch's PTQ ``prepare`` → calibrate →
``convert`` flow (the static-quantization path the reference's torch.ao stack
also offers but the reference never used). This gives users an int8 export
from any float checkpoint without a QAT fine-tune — the standard cheap
baseline to compare a QAT run against.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer
from qat_vit_tpu.quant.qconfig import QConfig, default_qat_qconfig
from qat_vit_tpu.serve.int8_vit import convert_vit
from qat_vit_tpu.train.steps import init_quant_stats

logger = logging.getLogger(__name__)


def calibrate(
    params: Dict[str, Any],
    batches: Iterable[jnp.ndarray],  # preprocessed [B, H, W, 3] f32 batches
    cfg: ViTConfig,
    qconfig: Optional[QConfig] = None,
) -> Dict[str, Any]:
    """Run observer-only forwards over calibration batches → quant_stats.

    Weights are untouched; observers EMA over the calibration stream exactly
    as they would during QAT (same torch-parity formulas).
    """
    qcfg = qconfig or cfg.quant or default_qat_qconfig()
    qat_cfg = dataclasses.replace(cfg, quant=qcfg, qat_wrapper=True)
    model = VisionTransformer(qat_cfg)
    qs = init_quant_stats(model, qat_cfg)

    @jax.jit
    def observe_step(params, qs, x):
        _, mut = model.apply(
            {"params": params, "quant_stats": qs}, x, observe=True,
            mutable=["quant_stats"],
        )
        return mut["quant_stats"]

    n = 0
    for x in batches:
        qs = observe_step(params, qs, jnp.asarray(x))
        n += 1
    if n == 0:
        raise ValueError("calibration requires at least one batch")
    logger.info("calibrated observers over %d batches", n)
    return qs


def ptq_convert(
    params: Dict[str, Any],
    batches: Iterable[jnp.ndarray],
    cfg: ViTConfig,
    qconfig: Optional[QConfig] = None,
    per_channel_weights: bool = False,
) -> Dict[str, Any]:
    """Float params + calibration data → runnable int8 export (one call)."""
    qcfg = qconfig or cfg.quant or default_qat_qconfig()
    qs = calibrate(params, batches, cfg, qcfg)
    qat_cfg = dataclasses.replace(cfg, quant=qcfg, qat_wrapper=True)
    return convert_vit(params, qs, qat_cfg,
                       per_channel_weights=per_channel_weights)
