"""Quantization core: fake-quant ops, observers, qconfig, observer modules.

TPU-native replacement for the torch.ao machinery the reference leans on
(``get_default_qat_qconfig``/``prepare_qat``/``convert``, reference
src/training/qat_trainer.py:300-316, 376-388).
"""

from qat_vit_tpu.quant.fake_quant import (
    dequantize,
    fake_quantize,
    fused_moving_avg_obs_fake_quant,
    quantize_to_int,
)
from qat_vit_tpu.quant.modules import FakeQuantizer
from qat_vit_tpu.quant.observers import (
    DEFAULT_AVERAGING_CONSTANT,
    FLOAT32_EPS,
    MinMaxState,
    qparams_affine,
    qparams_fused_affine,
    qparams_fused_symmetric,
    qparams_symmetric,
    qparams_symmetric_per_channel,
    update_moving_avg_minmax,
)
from qat_vit_tpu.quant.qconfig import (
    FakeQuantConfig,
    OptionalQConfig,
    QConfig,
    default_qat_qconfig,
)

__all__ = [
    "DEFAULT_AVERAGING_CONSTANT",
    "FLOAT32_EPS",
    "FakeQuantConfig",
    "FakeQuantizer",
    "MinMaxState",
    "OptionalQConfig",
    "QConfig",
    "default_qat_qconfig",
    "dequantize",
    "fake_quantize",
    "fused_moving_avg_obs_fake_quant",
    "qparams_affine",
    "qparams_fused_affine",
    "qparams_fused_symmetric",
    "qparams_symmetric",
    "qparams_symmetric_per_channel",
    "quantize_to_int",
    "update_moving_avg_minmax",
]
