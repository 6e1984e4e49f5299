"""Ops: quantized GEMM kernels (Pallas + XLA) and serving primitives.

The TPU-native analog of the reference's external native kernels
(QNNPACK int8 GEMMs, torch.ao fake-quant CUDA kernels).
"""

from qat_vit_tpu.ops.quantized_matmul import (
    int8_matmul_xla,
    quantize_act_shifted,
    quantized_dense,
)

__all__ = [
    "int8_matmul_xla",
    "quantize_act_shifted",
    "quantized_dense",
]
