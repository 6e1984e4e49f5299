"""Fake-quantize (quantize→dequantize) with a straight-through-estimator VJP.

TPU-native replacement for torch.ao's C++/CUDA
``fake_quantize_per_tensor_affine`` + ``FusedMovingAvgObsFakeQuantize``
(used by the reference via ``prepare_qat``, reference
src/training/qat_trainer.py:306-307). Forward:

    q   = round(x / scale + zero_point)          # round-half-to-even
    out = (clip(q, qmin, qmax) - zero_point) * scale

Backward (STE): gradient flows where ``qmin <= q <= qmax``, zero elsewhere —
exactly torch's ``fake_quantize_per_tensor_affine_cachemask`` mask rule.
``scale``/``zero_point`` receive zero cotangents (they come from observers,
not learned — the reference uses non-learnable fake-quant).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from qat_vit_tpu.quant.observers import (
    DEFAULT_AVERAGING_CONSTANT,
    qparams_fused_affine,
    qparams_fused_symmetric,
    update_moving_avg_minmax,
)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fake_quantize(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    quant_min: int,
    quant_max: int,
) -> jnp.ndarray:
    """Quantize-dequantize ``x`` with per-tensor affine params, STE backward."""
    compute = x.astype(jnp.float32)
    q = jnp.round(compute / scale + zero_point)
    out = (jnp.clip(q, quant_min, quant_max) - zero_point) * scale
    return out.astype(x.dtype)


def _fq_fwd(x, scale, zero_point, quant_min, quant_max):
    compute = x.astype(jnp.float32)
    q = jnp.round(compute / scale + zero_point)
    out = ((jnp.clip(q, quant_min, quant_max) - zero_point) * scale).astype(x.dtype)
    mask = (q >= quant_min) & (q <= quant_max)
    return out, (mask, scale, zero_point)


def _fq_bwd(quant_min, quant_max, res, g):
    mask, scale, zero_point = res
    dx = jnp.where(mask, g, jnp.zeros_like(g))
    return dx, jnp.zeros_like(scale), jnp.zeros_like(zero_point)


fake_quantize.defvjp(_fq_fwd, _fq_bwd)


def fused_moving_avg_obs_fake_quant(
    x: jnp.ndarray,
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    *,
    symmetric: bool,
    quant_min: int,
    quant_max: int,
    observe: bool,
    fake_quant: bool = True,
    averaging_constant: float = DEFAULT_AVERAGING_CONSTANT,
    axis_name=None,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Functional equivalent of one ``FusedMovingAvgObsFakeQuantize`` step.

    Observe (EMA min/max update, skipped when ``observe=False`` — eval mode),
    derive qparams from the *updated* state, fake-quantize. Returns
    ``(y, new_min, new_max)`` so callers thread observer state explicitly
    (Flax variables in the module layer, plain pytrees elsewhere).

    ``axis_name`` (shard_map data axis): global-batch min/max via pmin/pmax
    before the EMA — see :func:`update_moving_avg_minmax`. Only traced when
    ``observe=True``, so the same config evaluates fine outside shard_map.
    """
    if observe:
        # Observation must not differentiate through x.
        new_min, new_max = update_moving_avg_minmax(
            min_val, max_val, jax.lax.stop_gradient(x), averaging_constant,
            axis_name=axis_name, stride=stride,
        )
    else:
        new_min, new_max = min_val, max_val
    # Train-time qparams use the fused kernel's ChooseQuantizationParams rules
    # (see observers.qparams_fused_symmetric docstring for why these differ
    # from the convert-time observer formulas).
    if symmetric:
        scale, zero_point = qparams_fused_symmetric(
            new_min, new_max, quant_min, quant_max
        )
    else:
        scale, zero_point = qparams_fused_affine(new_min, new_max, quant_min, quant_max)
    if fake_quant:
        y = fake_quantize(x, scale, zero_point, quant_min, quant_max)
        if not observe:
            # Identity-until-observed: with no recorded statistics there is
            # no meaningful quantization grid (the eps-floored scale would
            # shred the tensor; torch's uncalibrated scale=1 default equally
            # garbles it). A never-calibrated site passes through — e.g.
            # evaluating a float-phase checkpoint through the QAT graph.
            # Statically skipped when observing: the EMA update above
            # guarantees finite stats, and the select is measured ~12% of
            # QAT step time when left in the training graph.
            y = jnp.where(jnp.isinf(new_min), x, y)
    else:
        y = x
    return y, new_min, new_max


def observe_and_qparams(
    x: jnp.ndarray,
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    *,
    symmetric: bool,
    quant_min: int,
    quant_max: int,
    observe: bool,
    averaging_constant: float = DEFAULT_AVERAGING_CONSTANT,
    axis_name=None,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Observer update + qparams WITHOUT applying the fake-quant.

    The fused-kernel path (``ops/flash_attention_train.attention_train_fq``)
    applies the quantize-dequantize elementwise math inside a Pallas kernel
    on tiles already resident in VMEM; this computes exactly the
    ``(scale, zero_point)`` that :func:`fused_moving_avg_obs_fake_quant`
    would have used, so the in-kernel fq is bit-identical to the standalone
    op. Returns ``(new_min, new_max, scale, zero_point)``.
    """
    if observe:
        new_min, new_max = update_moving_avg_minmax(
            min_val, max_val, jax.lax.stop_gradient(x), averaging_constant,
            axis_name=axis_name, stride=stride,
        )
    else:
        new_min, new_max = min_val, max_val
    if symmetric:
        scale, zero_point = qparams_fused_symmetric(
            new_min, new_max, quant_min, quant_max
        )
    else:
        scale, zero_point = qparams_fused_affine(
            new_min, new_max, quant_min, quant_max
        )
    return new_min, new_max, scale, zero_point


def quantize_to_int(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    quant_min: int,
    quant_max: int,
    dtype=jnp.int8,
) -> jnp.ndarray:
    """Real quantization (no dequant): used by ``convert`` and the int8 path."""
    q = jnp.round(x.astype(jnp.float32) / scale + zero_point)
    return jnp.clip(q, quant_min, quant_max).astype(dtype)


def dequantize(
    q: jnp.ndarray, scale: jnp.ndarray, zero_point: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    return ((q.astype(jnp.float32) - zero_point) * scale).astype(dtype)
