"""Models: quantizable Flax ViT, registry/factories, torch checkpoint converter.

Mirrors the public surface of the reference's ``src/models`` package
(reference src/models/__init__.py:4-12).
"""

from qat_vit_tpu.models.registry import (
    ModelBundle,
    create_model,
    create_student,
    create_teacher,
    get_model_complexity,
    get_platform,
    is_tpu,
    list_available_models,
    register_model,
)
from qat_vit_tpu.models.torch_convert import (
    load_torch_state_dict,
    normalize_state_dict_keys,
    params_to_timm_vit,
    timm_vit_to_params,
)
from qat_vit_tpu.models.vit import (
    VIT_BASE,
    VIT_MICRO,
    VIT_SMALL,
    VIT_TINY,
    VisionTransformer,
    ViTConfig,
    count_fake_quant_sites,
)

__all__ = [
    "PLATFORM",
    "ModelBundle",
    "VIT_BASE",
    "VIT_MICRO",
    "VIT_SMALL",
    "VIT_TINY",
    "VisionTransformer",
    "ViTConfig",
    "count_fake_quant_sites",
    "create_model",
    "create_student",
    "create_teacher",
    "get_model_complexity",
    "get_platform",
    "is_tpu",
    "list_available_models",
    "load_torch_state_dict",
    "normalize_state_dict_keys",
    "params_to_timm_vit",
    "register_model",
    "timm_vit_to_params",
]


def __getattr__(name: str):
    # lazy PLATFORM passthrough (see registry.__getattr__): resolving it
    # instantiates the JAX backend, which must not happen at import time on
    # the single-client TPU tunnel
    if name == "PLATFORM":
        from qat_vit_tpu.models import registry

        return registry.PLATFORM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
