"""OWLv2 open-vocabulary detection heads in Flax, on our vision tower.

Closes the one reference behavior that previously had no runnable counterpart
in this framework's own stack: the reference's OWLv2 entries construct
``Owlv2ForObjectDetection`` (torch/HF) and its QATWrapper dequantizes
``outputs.logits`` (reference src/models/model_registry.py:99-124, 269-327) —
but the reference never trains or evaluates detection, so the contract to
match is the detection *forward*. This module reproduces HF's
OWLv2/OWL-ViT detection math exactly (verified against the real
``transformers`` implementation in tests/test_owlv2_detect.py):

- ``image_embedder``: vision tower -> post-LN tokens; patch tokens are
  gated by the broadcast class token and re-normalized with a learned
  ``layer_norm`` (merged feature map);
- ``box_predictor``: 3-layer GELU MLP -> per-patch (cx, cy, w, h) logits,
  plus the grid-position/patch-size box bias, sigmoid-squashed;
- ``class_predictor``: per-patch class embeddings projected to the text
  width, cosine logits against (text or image-derived) query embeddings,
  scaled by ``elu(scale)+1`` and shifted, both predicted per patch;
- ``objectness_predictor``: 3-layer MLP -> per-patch objectness logit
  (OWLv2's ensemble addition; gradients stopped on its input, as HF does).

The tower is this framework's quantizable ``VisionTransformer``
(``num_classes=0`` feature mode) — so the detection forward runs on the same
KD/QAT/int8 machinery as classification; the heads are float, matching the
reference QATWrapper's detection semantics (quantize input, model computes,
logits come back dequantized). Text-query embeddings are taken as an input
(open-vocabulary queries are precomputed embeddings in deployment; the text
tower is out of scope, as in the reference, whose trainer cannot consume
detection models at all).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer


def box_bias(num_patches_h: int, num_patches_w: int) -> jnp.ndarray:
    """HF ``compute_box_bias``: logit-space bias anchoring each patch's box
    center at its grid position and its size at one patch."""
    xs = (jnp.arange(1, num_patches_w + 1, dtype=jnp.float32)) / num_patches_w
    ys = (jnp.arange(1, num_patches_h + 1, dtype=jnp.float32)) / num_patches_h
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    coords = jnp.clip(jnp.stack([xx, yy], axis=-1).reshape(-1, 2), 0.0, 1.0)
    coord_bias = jnp.log(coords + 1e-4) - jnp.log1p(-coords + 1e-4)
    size = jnp.stack(
        [
            jnp.full((num_patches_h * num_patches_w,), 1.0 / num_patches_w),
            jnp.full((num_patches_h * num_patches_w,), 1.0 / num_patches_h),
        ],
        axis=-1,
    )
    size_bias = jnp.log(size + 1e-4) - jnp.log1p(-size + 1e-4)
    return jnp.concatenate([coord_bias, size_bias], axis=-1)  # [P, 4]


class _MlpHead(nn.Module):
    """HF ``Owlv2BoxPredictionHead``: dense0 -> GELU -> dense1 -> GELU ->
    dense2 (exact erf GELU, f32 — detection heads are float)."""

    width: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.width, name="dense0")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.width, name="dense1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, name="dense2")(x)


class Owlv2Detector(nn.Module):
    """OWLv2 detection forward on a quantizable vision tower.

    ``cfg`` must have ``num_classes=0`` (feature mode). Output dict matches
    HF ``Owlv2ObjectDetectionOutput`` fields: ``pred_boxes`` [B, P, 4]
    (cxcywh in [0,1]), ``logits`` [B, P, Q], ``objectness_logits`` [B, P],
    ``class_embeds`` [B, P, text_dim], ``image_embeds`` [B, P, D].
    """

    cfg: ViTConfig
    text_dim: int = 512

    @nn.compact
    def __call__(
        self,
        pixels: Optional[jnp.ndarray],  # [B, H, W, 3] preprocessed images
        query_embeds: Optional[jnp.ndarray] = None,  # [B, Q, text_dim]
        query_mask: Optional[jnp.ndarray] = None,  # [B, Q] 1=valid
        *,
        observe: bool = False,
        tokens: Optional[jnp.ndarray] = None,  # [B, N, D] precomputed tower out
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        assert cfg.num_classes == 0, "detector tower must be a feature extractor"
        d = cfg.embed_dim
        grid = cfg.image_size // cfg.patch_size

        if tokens is None:
            tokens = VisionTransformer(cfg, name="vision")(
                pixels, observe=observe
            )
        # else: heads-only forward on a precomputed token stream — the int8
        # serving path (serve/int8_detect.py) runs the tower as the converted
        # Pallas/XLA int8 forward and feeds its dequantized tokens here; the
        # "vision" params are never touched in this branch.
        cls_tok = tokens[:, :1, :]
        feats = tokens[:, 1:, :] * cls_tok  # class-token gating
        feats = nn.LayerNorm(epsilon=1e-5, name="merged_ln")(feats)

        # objectness (OWLv2 addition): trained detached from the backbone
        obj = _MlpHead(d, 1, name="objectness_head")(
            jax.lax.stop_gradient(feats)
        )[..., 0]

        boxes = _MlpHead(d, 4, name="box_head")(feats)
        boxes = jax.nn.sigmoid(boxes + box_bias(grid, grid))

        class_embeds = nn.Dense(self.text_dim, name="class_proj")(feats)
        # shift/scale params exist regardless of the query path so that
        # query-free init creates the full parameter tree
        shift = nn.Dense(1, name="logit_shift")(feats)
        scale = jax.nn.elu(nn.Dense(1, name="logit_scale")(feats)) + 1.0
        out = {
            "image_embeds": feats,
            "class_embeds": class_embeds,
            "pred_boxes": boxes,
            "objectness_logits": obj,
        }
        if query_embeds is not None:
            # HF normalizes image_class_embeds in place and returns the
            # normalized tensor as `class_embeds` on the query path
            img_n = class_embeds / (
                jnp.linalg.norm(class_embeds, axis=-1, keepdims=True) + 1e-6
            )
            out["class_embeds"] = img_n
            qry_n = query_embeds / (
                jnp.linalg.norm(query_embeds, axis=-1, keepdims=True) + 1e-6
            )
            logits = jnp.einsum("bpd,bqd->bpq", img_n, qry_n)
            logits = (logits + shift) * scale
            if query_mask is not None:
                logits = jnp.where(
                    query_mask[:, None, :] == 0,
                    jnp.finfo(logits.dtype).min,
                    logits,
                )
            out["logits"] = logits
        return out


def detector_config(pruned: bool = False, **overrides) -> ViTConfig:
    """Vision-tower config for the detector (feature mode)."""
    from qat_vit_tpu.models.owlv2 import owlv2_vision_vit_kwargs

    kw = owlv2_vision_vit_kwargs(pruned=pruned)
    kw.update(overrides)
    return ViTConfig(num_classes=0, **kw)


# ---------------------------------------------------------------------------
# HF checkpoint conversion: Owlv2ForObjectDetection state dict -> Owlv2Detector
# parameter pytree (vision tower via torch_convert.owlv2_vision_to_params).
# ---------------------------------------------------------------------------


def owlv2_detection_to_params(
    state: Mapping[str, np.ndarray], cfg: ViTConfig, text_dim: int = 512
) -> Dict[str, Any]:
    """Map a full HF ``Owlv2ForObjectDetection`` state dict onto an
    :class:`Owlv2Detector` pytree (ref model_registry.py:269-327 constructs
    exactly this torch model). Text-tower keys are dropped (queries enter as
    precomputed embeddings)."""
    from qat_vit_tpu.models.torch_convert import (
        normalize_state_dict_keys,
        owlv2_vision_to_params,
    )

    vision = owlv2_vision_to_params(state, cfg, strict=False)
    norm = {
        (k[len("owlv2.") :] if k.startswith("owlv2.") else k): np.asarray(v)
        for k, v in normalize_state_dict_keys(state).items()
    }

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": norm[f"{prefix}.weight"].T.astype(np.float32),
            "bias": norm[f"{prefix}.bias"].astype(np.float32),
        }

    def mlp(prefix: str) -> Dict[str, Any]:
        return {name: dense(f"{prefix}.{name}")
                for name in ("dense0", "dense1", "dense2")}

    params: Dict[str, Any] = {
        "vision": vision,
        "merged_ln": {
            "scale": norm["layer_norm.weight"].astype(np.float32),
            "bias": norm["layer_norm.bias"].astype(np.float32),
        },
        "box_head": mlp("box_head"),
        "class_proj": dense("class_head.dense0"),
        "logit_shift": dense("class_head.logit_shift"),
        "logit_scale": dense("class_head.logit_scale"),
    }
    if "objectness_head.dense0.weight" in norm:
        params["objectness_head"] = mlp("objectness_head")
    assert params["class_proj"]["kernel"].shape == (cfg.embed_dim, text_dim)
    return params


def create_detector(
    pruned: bool = False,
    qat_wrapper: bool = False,
    quant=None,
    text_dim: int = 512,
    **overrides,
):
    """Build (module, cfg) for the Flax OWLv2 detector.

    ``qat_wrapper=True`` arms the tower's fake-quant sites — the detection
    counterpart of the reference's ``QATWrapper(model, task='detection')``
    (quantized backbone, float heads, float logits out)."""
    from qat_vit_tpu.quant.qconfig import default_qat_qconfig

    if qat_wrapper and quant is None:
        quant = default_qat_qconfig("qnnpack")
    cfg = detector_config(pruned=pruned, **overrides)
    cfg = dataclasses.replace(cfg, quant=quant, qat_wrapper=qat_wrapper)
    return Owlv2Detector(cfg, text_dim=text_dim), cfg
