"""Model registry, factories, and platform detection.

API-compatible re-design of the reference's ``src/models/model_registry.py``:
``register_model`` decorator (ref :134-146), ``create_model`` (ref :333-367),
``create_teacher``/``create_student`` (ref :370-426), ``list_available_models``
(ref :429-440), ``get_model_complexity`` (ref :443-457). The reference's
Jetson platform gate (ref :24-55) becomes a TPU/CPU/GPU backend gate — the
concept ("some registry entries only run on some platforms") is preserved,
the detection is JAX-native.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from qat_vit_tpu.models.vit import (
    VIT_BASE,
    VIT_MICRO,
    VIT_SMALL,
    VIT_TINY,
    VisionTransformer,
    ViTConfig,
)
from qat_vit_tpu.quant.qconfig import QConfig, default_qat_qconfig

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# Platform detection (TPU-native analog of the reference's Jetson detection)
# --------------------------------------------------------------------------

def get_platform() -> str:
    """Returns "tpu", "gpu", or "cpu" for the default JAX backend."""
    try:
        return jax.default_backend() if jax.default_backend() in ("cpu", "gpu") else "tpu"
    except Exception:  # pragma: no cover - defensive, like the reference's
        return "cpu"


def is_tpu() -> bool:
    return get_platform() == "tpu"


def __getattr__(name: str):
    # PLATFORM is computed lazily (PEP 562): jax.default_backend()
    # INSTANTIATES the backend client, and on the single-client TPU tunnel a
    # module-level constant would claim the TPU at import time from processes
    # that only need host-side code (checkpoint conversion, SearchConfig, …).
    if name == "PLATFORM":
        return get_platform()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# Optional-dependency gating (ref model_registry.py:77-84 gates transformers).
try:  # pragma: no cover - environment-dependent
    import transformers  # noqa: F401

    _HAS_TRANSFORMERS = True
except Exception:  # pragma: no cover
    _HAS_TRANSFORMERS = False


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

_MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}
_MODEL_INFO: Dict[str, Dict[str, Any]] = {}


def register_model(
    name: str,
    *,
    task: str = "classification",
    input_size: tuple = (3, 224, 224),
    tpu_compatible: bool = True,
    description: str = "",
):
    """Decorator registering a model constructor with metadata (ref :134-146)."""

    def deco(fn):
        _MODEL_REGISTRY[name] = fn
        _MODEL_INFO[name] = {
            "task": task,
            "input_size": input_size,
            "tpu_compatible": tpu_compatible,
            "description": description,
        }
        return fn

    return deco


@dataclasses.dataclass
class ModelBundle:
    """What a factory returns: the module, its config, and init helpers.

    The JAX analog of a constructed ``nn.Module``: modules are stateless
    descriptions; parameters live in explicit pytrees the caller initializes
    (or loads from a converted torch checkpoint).
    """

    name: str
    module: VisionTransformer
    cfg: ViTConfig
    task: str = "classification"

    def init(self, rng: jax.Array, batch_size: int = 1):
        x = jnp.zeros(
            (batch_size, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32
        )
        return self.module.init(rng, x, observe=False)

    def example_input(self, batch_size: int = 2) -> jnp.ndarray:
        return jnp.zeros(
            (batch_size, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32
        )


def _vit_factory(arch: dict, name: str):
    def build(
        num_classes: int = 10,
        qat_wrapper: bool = False,
        quant: Optional[QConfig] = None,
        dtype=jnp.float32,
        **kwargs,
    ) -> ModelBundle:
        if qat_wrapper and quant is None:
            quant = default_qat_qconfig("qnnpack")
        cfg = ViTConfig(
            num_classes=num_classes,
            quant=quant,
            qat_wrapper=qat_wrapper,
            dtype=dtype,
            **{**arch, **kwargs},
        )
        return ModelBundle(name=name, module=VisionTransformer(cfg), cfg=cfg)

    return build


@register_model(
    "vit_base_patch16_224_teacher",
    description="ViT-Base/16 teacher (frozen during distillation), timm geometry",
)
def _create_vit_base_teacher(**kw) -> ModelBundle:
    """Teacher factory (ref model_registry.py:152-207). Weight loading from a
    converted torch checkpoint is handled by models.torch_convert +
    utils.checkpoint (the HF download the reference does is unavailable in a
    zero-egress environment; local checkpoints are supported)."""
    return _vit_factory(VIT_BASE, "vit_base_patch16_224_teacher")(**kw)


@register_model(
    "vit_small_patch16_224_student",
    description="ViT-Small/16 student for KD + int8 QAT, timm geometry",
)
def _create_vit_small_student(**kw) -> ModelBundle:
    """Student factory (ref model_registry.py:213-261)."""
    return _vit_factory(VIT_SMALL, "vit_small_patch16_224_student")(**kw)


@register_model(
    "vit_tiny_patch16_224",
    description="ViT-Tiny/16 (complexity-table entry; fast experiments)",
)
def _create_vit_tiny(**kw) -> ModelBundle:
    return _vit_factory(VIT_TINY, "vit_tiny_patch16_224")(**kw)


@register_model(
    "vit_micro_test",
    input_size=(3, 32, 32),
    description="2-block micro ViT for tests, dryruns, and CI smoke paths",
)
def _create_vit_micro(**kw) -> ModelBundle:
    return _vit_factory(VIT_MICRO, "vit_micro_test")(**kw)


@register_model(
    "owlv2_base_teacher",
    task="classification",
    input_size=(3, 960, 960),
    description="OWLv2-base vision tower (CLIP-style ViT-B/16 @960) as a Flax "
    "ModelBundle — first-class KD teacher for the trainer/QAT path",
)
def _create_owlv2_teacher(**kw) -> ModelBundle:
    """First-class OWLv2 teacher: the vision tower as a trainable/QAT-able
    Flax bundle (ref model_registry.py:269-279 builds the torch detection
    model; the KD+QAT pipeline only ever consumes image→logits, which is the
    vision tower + head). The full torch detection construction is retained
    under ``owlv2_base_teacher_torch``."""
    from qat_vit_tpu.models.owlv2 import owlv2_vision_vit_kwargs

    return _vit_factory(owlv2_vision_vit_kwargs(pruned=False), "owlv2_base_teacher")(**kw)


@register_model(
    "owlv2_student_pruned",
    task="classification",
    input_size=(3, 768, 768),
    description="Pruned OWLv2 vision tower via config surgery (depth/width/"
    "head ratios, floors 6/384/6) as a Flax ModelBundle — KD+QAT student",
)
def _create_owlv2_student(
    depth_ratio: float = 0.75,
    width_ratio: float = 0.75,
    head_ratio: float = 0.75,
    **kw,
) -> ModelBundle:
    """First-class pruned OWLv2 student (surgery semantics of ref :282-327,
    see models/owlv2.prune_owlv2_geometry); consumable by KDQATTrainer and
    the int8 convert/serve path."""
    from qat_vit_tpu.models.owlv2 import owlv2_vision_vit_kwargs

    arch = owlv2_vision_vit_kwargs(
        pruned=True, depth_ratio=depth_ratio, width_ratio=width_ratio,
        head_ratio=head_ratio,
    )
    return _vit_factory(arch, "owlv2_student_pruned")(**kw)


def _detector_factory(pruned: bool, name: str):
    def build(
        qat_wrapper: bool = False,
        quant: Optional[QConfig] = None,
        text_dim: int = 512,
        **kwargs,
    ) -> ModelBundle:
        from qat_vit_tpu.models.owlv2_detect import create_detector

        module, cfg = create_detector(
            pruned=pruned, qat_wrapper=qat_wrapper, quant=quant,
            text_dim=text_dim, **kwargs,
        )
        return ModelBundle(name=name, module=module, cfg=cfg, task="detection")

    return build


@register_model(
    "owlv2_base_detector",
    task="detection",
    input_size=(3, 960, 960),
    description="Flax OWLv2 open-vocabulary detector: quantizable vision "
    "tower + float box/class/objectness heads (models/owlv2_detect.py); "
    "HF-parity forward, loadable from an Owlv2ForObjectDetection checkpoint",
)
def _create_owlv2_detector(**kw) -> ModelBundle:
    """Runnable Flax counterpart of the reference's torch detection entry
    (ref model_registry.py:99-124, 269-279)."""
    return _detector_factory(False, "owlv2_base_detector")(**kw)


@register_model(
    "owlv2_pruned_detector",
    task="detection",
    input_size=(3, 768, 768),
    description="Flax pruned-OWLv2 detector (surgery geometry, see "
    "models/owlv2.prune_owlv2_geometry); quantizable tower, float heads",
)
def _create_owlv2_pruned_detector(**kw) -> ModelBundle:
    """Detection counterpart of owlv2_student_pruned (ref :282-327)."""
    return _detector_factory(True, "owlv2_pruned_detector")(**kw)


@register_model(
    "owlv2_base_teacher_torch",
    task="detection",
    input_size=(3, 960, 960),
    tpu_compatible=False,
    description="Reference-parity torch OWLv2 detection teacher (requires "
    "transformers; pretrained weights need network or a local HF snapshot)",
)
def _create_owlv2_teacher_torch(pretrained: bool = True, local_path: str = None, **kw):
    """Parity entry for the reference's optional OWLv2 teacher (ref
    model_registry.py:269-279). Pretrained weights need network or a local
    HF snapshot; ``pretrained=False`` constructs from config (random init),
    exactly the reference's fallback."""
    if not _HAS_TRANSFORMERS:
        raise RuntimeError("owlv2 models require the `transformers` package")
    kw.pop("qat_wrapper", None)
    from transformers import Owlv2Config, Owlv2ForObjectDetection

    from qat_vit_tpu.models.owlv2 import OWLV2_BASE_TEXT, OWLV2_BASE_VISION

    if pretrained:
        src = local_path or "google/owlv2-base-patch16-ensemble"
        return Owlv2ForObjectDetection.from_pretrained(src)
    config = Owlv2Config(
        text_config=dict(OWLV2_BASE_TEXT), vision_config=dict(OWLV2_BASE_VISION)
    )
    return Owlv2ForObjectDetection(config)


@register_model(
    "owlv2_student_pruned_torch",
    task="detection",
    input_size=(3, 768, 768),
    tpu_compatible=False,
    description="Reference-parity torch pruned OWLv2 student via config "
    "surgery (gated, see teacher)",
)
def _create_owlv2_student_torch(**kw):
    """Pruned torch OWLv2 student via config surgery (ref :282-327); fully
    offline construction — see models/owlv2.py."""
    if not _HAS_TRANSFORMERS:
        raise RuntimeError("owlv2 models require the `transformers` package")
    from qat_vit_tpu.models.owlv2 import build_owlv2_student_torch

    kw.pop("qat_wrapper", None)
    kw.pop("num_classes", None)
    return build_owlv2_student_torch(**kw)


# --------------------------------------------------------------------------
# Factory API (ref :333-426)
# --------------------------------------------------------------------------

def create_model(
    name: str,
    num_classes: int = 10,
    qat_wrapper: bool = False,
    **kwargs,
) -> ModelBundle:
    """Registry lookup + platform gate + construction (ref :333-367)."""
    if name not in _MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_MODEL_REGISTRY)}"
        )
    info = _MODEL_INFO[name]
    if is_tpu() and not info["tpu_compatible"]:
        raise ValueError(f"model {name!r} is not TPU-compatible")
    if info["task"] == "classification":
        kwargs["num_classes"] = num_classes
    return _MODEL_REGISTRY[name](qat_wrapper=qat_wrapper, **kwargs)


def create_teacher(family: str = "vit", **kwargs) -> ModelBundle:
    """Teacher dispatch by family (ref :370-396)."""
    if family == "vit":
        return create_model("vit_base_patch16_224_teacher", **kwargs)
    if family == "owlv2":
        return create_model("owlv2_base_teacher", **kwargs)
    raise ValueError(f"unknown model family: {family!r}")


def create_student(family: str = "vit", qat_wrapper: bool = True, **kwargs) -> ModelBundle:
    """Student dispatch by family (ref :398-426)."""
    if family == "vit":
        return create_model(
            "vit_small_patch16_224_student", qat_wrapper=qat_wrapper, **kwargs
        )
    if family == "owlv2":
        return create_model("owlv2_student_pruned", qat_wrapper=qat_wrapper, **kwargs)
    raise ValueError(f"unknown model family: {family!r}")


def list_available_models() -> Dict[str, Dict[str, Any]]:
    """Name → metadata map (ref :429-440)."""
    return {k: dict(v) for k, v in _MODEL_INFO.items()}


# GFLOPs at 224px, one forward (matching the reference's hardcoded table,
# ref :450-456, which the survey records as ViT-B 17.6 / ViT-S 4.7 / tiny 1.2).
_GFLOPS = {
    "vit_base_patch16_224_teacher": 17.6,
    "vit_small_patch16_224_student": 4.7,
    "vit_tiny_patch16_224": 1.2,
}


def get_model_complexity(name: str) -> Dict[str, Any]:
    """Parameter count + GFLOPs estimate (ref :443-457)."""
    if name not in _MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}")
    if not _MODEL_INFO[name]["tpu_compatible"]:
        # reject from metadata BEFORE construction: building a torch entry
        # runs a multi-GB pretrained download just to throw it away (and on
        # TPU hosts create_model would raise a misleading platform error)
        raise ValueError(
            f"model {name!r} constructs an external (torch) module; "
            "complexity accounting is defined for Flax ModelBundles only — "
            "use the non-_torch registry entry"
        )
    bundle = create_model(name)
    if not isinstance(bundle, ModelBundle):
        raise ValueError(
            f"model {name!r} did not construct a Flax ModelBundle; "
            "complexity accounting is defined for ModelBundles only"
        )
    cfg = bundle.cfg
    import numpy as np

    # Shape-only init (no FLOPs executed) to count parameters exactly.
    shapes = jax.eval_shape(
        lambda: bundle.module.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32),
            observe=False,
        )
    )
    n_params = int(
        sum(np.prod(x.shape) for x in jax.tree.leaves(shapes.get("params", {})))
    )
    d, l, s, p = cfg.embed_dim, cfg.depth, cfg.seq_len, cfg.num_patches
    gflops = _GFLOPS.get(name)
    if gflops is None:
        # 2*flops per MAC over the dominant GEMMs.
        gemm = l * (2 * s * d * 3 * d + 2 * s * d * d + 4 * s * d * cfg.mlp_dim)
        attn = l * (2 * s * s * d * 2)
        patch = 2 * p * (cfg.patch_size**2 * 3) * d
        gflops = round((gemm + attn + patch) / 1e9, 2)
    return {"name": name, "params": n_params, "gflops": gflops}


def self_test() -> bool:  # pragma: no cover - exercised via __main__
    """Registry smoke test (ref model_registry.py:463-505)."""
    import jax

    print("available models:")
    for name, info in list_available_models().items():
        print(f"  {name}: {info}")
    teacher = create_model("vit_micro_test")
    student = create_model("vit_micro_test", qat_wrapper=True)
    x = jnp.zeros((2, teacher.cfg.image_size, teacher.cfg.image_size, 3))
    tv = teacher.init(jax.random.key(0), batch_size=2)
    out = teacher.module.apply(tv, x, observe=False)
    print("teacher fwd:", out.shape)
    sv = student.init(jax.random.key(1), batch_size=2)
    out, _ = student.module.apply(sv, x, observe=True, mutable=["quant_stats"])
    print("student QAT fwd:", out.shape)
    print("complexity:", get_model_complexity("vit_small_patch16_224_student"))
    return True


if __name__ == "__main__":  # pragma: no cover
    self_test()
