"""Serving: runnable int8 inference (the working best_converted path)."""

from qat_vit_tpu.serve.calibrate import calibrate, ptq_convert
from qat_vit_tpu.serve.int8_detect import (
    convert_detector,
    int8_detect_apply,
    make_int8_detect_forward,
)
from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply, make_int8_forward
from qat_vit_tpu.serve.predictor import Int8Predictor

__all__ = [
    "Int8Predictor",
    "calibrate",
    "convert_detector",
    "convert_vit",
    "int8_apply",
    "int8_detect_apply",
    "make_int8_detect_forward",
    "make_int8_forward",
    "ptq_convert",
]
