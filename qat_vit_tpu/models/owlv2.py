"""OWLv2 detection family: pruned-student config surgery (optional, gated).

Parity for the reference's optional OWLv2 path (reference
src/models/model_registry.py:265-327): a detection teacher
(``google/owlv2-base-patch16-ensemble``) and a pruned student produced by
config surgery — depth/width/head ratios (default 0.75) with floors 6/384/6,
vision_config kept aligned, student image size 768.

Differences forced by the environment and documented:
- the teacher's *pretrained weights* need either network access or a local
  checkpoint; in a zero-egress build the teacher constructs from config
  (random init) unless a local path is given — the reference has the same
  random-init fallback for ``pretrained=False``;
- the base config is constructed programmatically (the reference calls
  ``AutoConfig.from_pretrained``, a hub download) with the published
  owlv2-base-patch16-ensemble geometry, so surgery and construction are
  fully offline.

The surgery itself is a pure function (:func:`prune_owlv2_geometry`) so its
semantics are unit-testable without transformers installed.
"""

from __future__ import annotations

from typing import Dict, Optional

# Published geometry of google/owlv2-base-patch16-ensemble (vision tower).
OWLV2_BASE_VISION = dict(
    hidden_size=768,
    num_hidden_layers=12,
    num_attention_heads=12,
    intermediate_size=3072,
    image_size=960,
    patch_size=16,
)
OWLV2_BASE_TEXT = dict(
    hidden_size=512,
    num_hidden_layers=12,
    num_attention_heads=8,
    intermediate_size=2048,
)


def prune_owlv2_geometry(
    base: Dict[str, int],
    depth_ratio: float = 0.75,
    width_ratio: float = 0.75,
    head_ratio: float = 0.75,
    student_image_size: int = 768,
) -> Dict[str, int]:
    """Reference surgery rule (model_registry.py:292-301): scale then floor.

    depth >= 6, width >= 384, heads >= 6; image size forced to 768.
    """
    out = dict(base)
    out["num_hidden_layers"] = max(6, int(base["num_hidden_layers"] * depth_ratio))
    out["hidden_size"] = max(384, int(base["hidden_size"] * width_ratio))
    out["num_attention_heads"] = max(6, int(base["num_attention_heads"] * head_ratio))
    out["image_size"] = student_image_size
    return out


def owlv2_vision_vit_kwargs(
    pruned: bool = False,
    depth_ratio: float = 0.75,
    width_ratio: float = 0.75,
    head_ratio: float = 0.75,
) -> Dict[str, object]:
    """ViTConfig kwargs for the OWLv2 *vision tower* as a Flax model.

    The OWLv2 vision encoder is a CLIP-style ViT (HF Owlv2VisionModel:
    patch-conv without bias, class+position embeddings, pre-encoder LayerNorm,
    pre-norm blocks with quick-GELU MLP) — exactly our VisionTransformer with
    ``pre_norm=True, act="quick_gelu", patch_bias=False``. ``pruned=True``
    applies the reference's student surgery (model_registry.py:282-327:
    depth/width/head ratios with floors 6/384/6, image forced to 768; the
    intermediate size is NOT scaled, so the MLP ratio widens accordingly).
    """
    geo = (
        prune_owlv2_geometry(
            OWLV2_BASE_VISION, depth_ratio, width_ratio, head_ratio
        )
        if pruned
        else dict(OWLV2_BASE_VISION)
    )
    return dict(
        image_size=geo["image_size"],
        patch_size=geo["patch_size"],
        embed_dim=geo["hidden_size"],
        depth=geo["num_hidden_layers"],
        num_heads=geo["num_attention_heads"],
        mlp_ratio=geo["intermediate_size"] / geo["hidden_size"],
        pre_norm=True,
        act="quick_gelu",
        patch_bias=False,
        layer_norm_eps=1e-5,  # CLIP/OWLv2 LN epsilon
    )


def build_owlv2_student_torch(
    depth_ratio: float = 0.75,
    width_ratio: float = 0.75,
    head_ratio: float = 0.75,
    checkpoint_path: Optional[str] = None,
):
    """Construct the pruned torch OWLv2 student from an offline config
    (reference :282-327). Requires transformers; weights random-init unless a
    local checkpoint is provided (loaded with the reference's tolerant
    unwrapping, via models.torch_convert.normalize_state_dict_keys)."""
    try:
        from transformers import Owlv2Config, Owlv2ForObjectDetection
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError("owlv2 models require the `transformers` package") from e

    # prune_owlv2_geometry returns a full copy of the base dict with the
    # pruned fields overwritten — no re-merge needed
    vision = prune_owlv2_geometry(
        OWLV2_BASE_VISION, depth_ratio, width_ratio, head_ratio
    )
    config = Owlv2Config(
        text_config=dict(OWLV2_BASE_TEXT),
        vision_config=vision,
    )
    # top-level mirrors (the reference also sets top-level fields, :292-295)
    config.num_hidden_layers = vision["num_hidden_layers"]
    config.hidden_size = vision["hidden_size"]
    config.num_attention_heads = vision["num_attention_heads"]
    model = Owlv2ForObjectDetection(config)

    if checkpoint_path:
        import os

        if not os.path.isfile(checkpoint_path):
            import warnings

            warnings.warn(
                f"Checkpoint not found: {checkpoint_path} - using random init",
                RuntimeWarning,
            )
            return model
        import torch

        from qat_vit_tpu.models.torch_convert import normalize_state_dict_keys

        state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        state = normalize_state_dict_keys(state)
        model.load_state_dict(state, strict=False)
    return model
