"""True-int8 OWLv2 detection serving: int8 tower + float detection heads.

The int8 counterpart of the reference's detection QATWrapper semantics —
quantize the backbone, keep the heads/outputs float (reference
src/models/model_registry.py:99-124, detection entries :269-327; the
reference never got this running: its trainer cannot consume detection
models and its eager ``convert`` crashes on any ViT). Here:

- the vision tower converts exactly like a classifier (convert_vit in
  feature mode: no head bundle, final-LN qparams kept) and serves through
  the same int8 machinery — on TPU the serving preset auto-selects the
  long-sequence whole-model Pallas kernel for OWLv2 geometry
  (ops/long_block_kernel.py), whose full token stream now exits the kernel
  as the dequantized final-LN output;
- the detection heads (merged-feature LN, box/class/objectness MLPs —
  models/owlv2_detect.py, HF-forward-parity tested) run in float on those
  tokens, exactly as they do on the fake-quant tower.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from qat_vit_tpu.models.owlv2_detect import Owlv2Detector
from qat_vit_tpu.models.vit import ViTConfig
from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply, serving_preset


def convert_detector(
    params: Dict[str, Any],
    quant_stats: Dict[str, Any],
    cfg: ViTConfig,
    per_channel_weights: bool = False,
) -> Dict[str, Any]:
    """Fold a QAT-trained detector into a deployable export pytree.

    ``params``/``quant_stats`` are the :class:`Owlv2Detector` trees (tower
    under ``"vision"``). Returns ``{"tower": <int8 export>, "heads": <float
    head params>}`` — checkpointable with utils.checkpoint and consumable by
    :func:`int8_detect_apply`.
    """
    if cfg.num_classes != 0:
        raise ValueError("detector towers are feature extractors (num_classes=0)")
    tower = convert_vit(
        params["vision"], quant_stats["vision"], cfg,
        per_channel_weights=per_channel_weights,
    )
    heads = {k: v for k, v in params.items() if k != "vision"}
    return {"tower": tower, "heads": heads}


def int8_detect_apply(
    export: Dict[str, Any],
    pixels: jnp.ndarray,  # [B, H, W, 3] preprocessed images
    cfg: ViTConfig,
    query_embeds: Optional[jnp.ndarray] = None,
    query_mask: Optional[jnp.ndarray] = None,
    text_dim: int = 512,
    **serve_opts: Any,
) -> Dict[str, jnp.ndarray]:
    """Int8 detection forward → HF-shaped output dict. Jittable.

    ``serve_opts`` are :func:`qat_vit_tpu.serve.int8_vit.int8_apply` options
    (fused mode, dtypes, attention impl); the tower runs int8 in feature
    mode and the float heads consume its dequantized token stream.
    """
    tokens = int8_apply(export["tower"], pixels, cfg, **serve_opts)
    # heads are float: strip the tower's quant config so the module's static
    # identity doesn't depend on it (tokens bypass the tower entirely)
    head_cfg = dataclasses.replace(cfg, quant=None, qat_wrapper=False)
    detector = Owlv2Detector(head_cfg, text_dim=text_dim)
    return detector.apply(
        {"params": export["heads"]}, None, query_embeds, query_mask,
        tokens=tokens.astype(jnp.float32),
    )


def make_int8_detect_forward(
    cfg: ViTConfig,
    *,
    text_dim: int = 512,
    preset: bool = True,
    **overrides: Any,
):
    """Jitted serving closure: (export, pixels, query_embeds, query_mask) →
    detection dict. ``preset=True`` applies the measured-best kernel options
    for this geometry (on OWLv2 towers: the long-sequence whole-model Pallas
    kernel); ``overrides`` win over the preset."""
    opts: Dict[str, Any] = dict(serving_preset(cfg)) if preset else {}
    opts.update(overrides)

    @jax.jit
    def fwd(export, pixels, query_embeds=None, query_mask=None):
        return int8_detect_apply(
            export, pixels, cfg, query_embeds, query_mask,
            text_dim=text_dim, **opts,
        )

    return fwd
