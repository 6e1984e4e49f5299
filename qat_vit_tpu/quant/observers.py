"""Quantization-parameter observers as pure JAX functions.

The reference delegates observation to torch.ao's C++
``MovingAverageMinMaxObserver`` inside ``FusedMovingAvgObsFakeQuantize``
(see reference src/training/qat_trainer.py:306-307 — ``get_default_qat_qconfig
("qnnpack")``). Here the same numerics are pure functions over explicit state,
so they can live inside a jitted, sharded train step.

Exact torch semantics reproduced (verified empirically against torch 2.13 CPU,
see tests/test_fake_quant.py and tests/test_torch_trajectory.py):

- first call initializes ``min_val/max_val`` directly from the batch;
  subsequent calls apply an EMA with ``averaging_constant = 0.01``;
- affine (activations, quint8 [0, 255]):
    ``scale = (max(max_val, 0) - min(min_val, 0)) / (qmax - qmin)`` floored at
    float32 eps; ``zero_point = clip(qmin - round(min_neg / scale), qmin, qmax)``;
- symmetric (weights, qint8 [-128, 127]):
    ``scale = max(-min(min_val, 0), max(max_val, 0)) / ((qmax - qmin) / 2)``
    floored at eps; ``zero_point = 0``.

Rounding is IEEE round-half-to-even in both torch and ``jnp.round``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# torch.finfo(torch.float32).eps — the scale floor torch applies.
FLOAT32_EPS = 1.1920928955078125e-07
# FBGEMM's ChooseQuantizationParams scale floor (quant_utils.h
# SMALL_SCALE_THRESHOLD), applied by torch's FUSED QAT kernel — the
# convert-time observers floor at FLOAT32_EPS instead. Exact f32 value
# of the 6.1e-5 literal.
SMALL_SCALE_THRESHOLD = 6.0999998822808266e-05

# torch MovingAverageMinMaxObserver default averaging constant.
DEFAULT_AVERAGING_CONSTANT = 0.01


class MinMaxState(NamedTuple):
    """Running min/max carried through training (a leaf-pair pytree).

    ``min_val`` starts at ``+inf`` and ``max_val`` at ``-inf``; infinity marks
    "never observed", matching torch's uninitialized-buffer convention.
    """

    min_val: jnp.ndarray  # scalar f32
    max_val: jnp.ndarray  # scalar f32

    @staticmethod
    def init() -> "MinMaxState":
        return MinMaxState(
            min_val=jnp.array(jnp.inf, jnp.float32),
            max_val=jnp.array(-jnp.inf, jnp.float32),
        )


def update_moving_avg_minmax(
    state_min: jnp.ndarray,
    state_max: jnp.ndarray,
    x: jnp.ndarray,
    averaging_constant: float = DEFAULT_AVERAGING_CONSTANT,
    axis_name=None,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One observer step: EMA of per-batch min/max, direct init on first call.

    Branch-free (selects on ``isinf``) so it traces to a single compiled step.

    min and max are order statistics, so reducing in the INPUT dtype and
    widening only the scalar is bit-exact — and one variadic ``lax.reduce``
    computes both in a single pass over the tensor (isolated A/B on the
    [256,197,384] bf16 site shape: 0.169 ms vs 0.250 ms for the round-1
    cast-to-f32 + two-reduction form; docs/BENCHMARKS.md round 2).
    Integer inputs (no ``inf`` representation) take the f32 path.

    ``axis_name``: under ``shard_map`` each device sees only its batch shard;
    reducing the shard min/max over the named mesh axis before the EMA keeps
    the global-batch observer semantics (bit-identical to the unsharded
    reduce — min/max are exact order statistics).

    ``stride`` (opt-in APPROXIMATION, default exact): observe only the first
    ``1/stride`` of the leading axis. The slice is a contiguous prefix, not
    a strided gather — TPU reads whole 8-sublane tiles, so a sublane-strided
    gather saves no HBM traffic while a prefix slice cuts it
    ``stride``-fold. With shuffled batches the prefix is an unbiased sample
    of the batch; the EMA's 0.01 averaging constant smooths the extra
    variance. Like ``observer_interval``, a documented throughput/fidelity
    trade (hparam ``observer_stride``).
    """
    if stride > 1 and x.shape[0] > 1:
        x = x[: max(1, x.shape[0] // stride)]
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    batch_min, batch_max = jax.lax.reduce(
        (x, x),
        (jnp.asarray(jnp.inf, x.dtype), jnp.asarray(-jnp.inf, x.dtype)),
        lambda a, b: (jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])),
        tuple(range(x.ndim)),
    )
    batch_min = batch_min.astype(jnp.float32)
    batch_max = batch_max.astype(jnp.float32)
    if axis_name is not None:
        batch_min = jax.lax.pmin(batch_min, axis_name)
        batch_max = jax.lax.pmax(batch_max, axis_name)
    uninit = jnp.isinf(state_min)
    new_min = jnp.where(
        uninit, batch_min, state_min + averaging_constant * (batch_min - state_min)
    )
    new_max = jnp.where(
        uninit, batch_max, state_max + averaging_constant * (batch_max - state_max)
    )
    return new_min, new_max


def qparams_affine(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    quant_min: int = 0,
    quant_max: int = 255,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor affine scale/zero-point (torch quint8 activation rule)."""
    # Uninitialized observers (±inf) degrade to scale=1, zp=0 like torch's
    # identity-before-first-observation behavior.
    min_val = jnp.where(jnp.isinf(min_val), 0.0, min_val)
    max_val = jnp.where(jnp.isinf(max_val), 0.0, max_val)
    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    scale = (max_pos - min_neg) / float(quant_max - quant_min)
    scale = jnp.maximum(scale, FLOAT32_EPS)
    zero_point = quant_min - jnp.round(min_neg / scale)
    zero_point = jnp.clip(zero_point, quant_min, quant_max)
    return scale.astype(jnp.float32), zero_point.astype(jnp.float32)


def qparams_symmetric(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    quant_min: int = -128,
    quant_max: int = 127,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric scale/zero-point (torch qint8 weight rule)."""
    min_val = jnp.where(jnp.isinf(min_val), 0.0, min_val)
    max_val = jnp.where(jnp.isinf(max_val), 0.0, max_val)
    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    amax = jnp.maximum(-min_neg, max_pos)
    scale = amax / (float(quant_max - quant_min) / 2.0)
    scale = jnp.maximum(scale, FLOAT32_EPS)
    zero_point = jnp.zeros_like(scale)
    return scale.astype(jnp.float32), zero_point.astype(jnp.float32)


def qparams_fused_affine(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    quant_min: int = 0,
    quant_max: int = 255,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Affine qparams exactly as torch's fused QAT kernel computes them.

    torch's ``fused_moving_avg_obs_fake_quant`` C++ kernel derives qparams via
    ``quant_utils::ChooseQuantizationParams``, which picks the zero-point from
    whichever end (min or max) has the smaller nudging error, and floors the
    scale at FBGEMM's ``SMALL_SCALE_THRESHOLD`` (zero-point from the
    un-floored proportions). For uint8 activations with ``quant_min=0`` and
    range > ~0.0156 this coincides with :func:`qparams_affine`; narrower
    ranges diverge (the observer floors at eps, the fused kernel at 6.1e-5 —
    fuzz-verified vs torch 2.13 incl. the floor, tests/test_fake_quant.py).
    """
    min_val = jnp.where(jnp.isinf(min_val), 0.0, min_val)
    max_val = jnp.where(jnp.isinf(max_val), 0.0, max_val)
    min_neg = jnp.minimum(min_val, 0.0)
    max_pos = jnp.maximum(max_val, 0.0)
    org_scale = (max_pos - min_neg) / float(quant_max - quant_min)
    # FBGEMM floors: 0.1 for a zero range, SMALL_SCALE_THRESHOLD (6.1e-5)
    # otherwise — but the zero-point is chosen from the UN-floored
    # proportions (ChooseQuantizationParams rescales min/max by
    # threshold/org_scale when flooring, which preserves min/scale exactly;
    # verified vs torch 2.13: range [-0.004, 0.004] -> scale 6.1e-5, zp 128,
    # not the zp 65 the floored ratio would give).
    zero_range = org_scale == 0.0
    safe = jnp.where(zero_range, 1.0, org_scale)
    rmin = min_neg / safe
    rmax = max_pos / safe
    zp_from_min = quant_min - rmin
    zp_from_max = quant_max - rmax
    err_min = jnp.abs(float(quant_min)) - jnp.abs(rmin)
    err_max = jnp.abs(float(quant_max)) - jnp.abs(rmax)
    zero_point = jnp.where(err_min < err_max, zp_from_min, zp_from_max)
    zero_point = jnp.clip(jnp.round(zero_point), quant_min, quant_max)
    scale = jnp.where(
        zero_range, 0.1, jnp.maximum(org_scale, SMALL_SCALE_THRESHOLD)
    )
    return scale.astype(jnp.float32), zero_point.astype(jnp.float32)


def qparams_fused_symmetric(
    min_val: jnp.ndarray,
    max_val: jnp.ndarray,
    quant_min: int = -128,
    quant_max: int = 127,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric qparams exactly as torch's fused QAT kernel computes them.

    NOT the same as :func:`qparams_symmetric` (the observer's
    ``calculate_qparams`` that torch uses at convert time). The fused kernel's
    ``ChooseQuantizationParams(..., preserve_sparsity=True)`` instead uses,
    when the running range straddles zero::

        scale = max(-min_val / |qmin|, max_val / qmax)   # e.g. /128 vs /127
        zero_point = 0

    and degrades to the affine rule when the range is one-sided (all-positive
    weights quantize with zp = qmin, etc.). Verified bit-exact against torch
    2.13 over randomized ranges (tests/test_fake_quant.py). This train-time /
    convert-time formula split is a genuine torch.ao inconsistency the
    reference inherits; both are reproduced faithfully.
    """
    min_val = jnp.where(jnp.isinf(min_val), 0.0, min_val)
    max_val = jnp.where(jnp.isinf(max_val), 0.0, max_val)
    both_signs = (min_val < 0.0) & (max_val > 0.0)
    # preserve-sparsity branch
    sym_qmin = -((quant_max - quant_min) // 2 + 1)  # -128
    sym_qmax = (quant_max - quant_min) // 2  # 127
    scale_sym = jnp.maximum(-min_val / -float(sym_qmin), max_val / float(sym_qmax))
    # one-sided branch: the plain affine rule
    scale_aff, zp_aff = qparams_fused_affine(min_val, max_val, quant_min, quant_max)
    scale = jnp.where(
        both_signs, jnp.maximum(scale_sym, SMALL_SCALE_THRESHOLD), scale_aff
    )
    zero_point = jnp.where(both_signs, 0.0, zp_aff)
    return scale.astype(jnp.float32), zero_point.astype(jnp.float32)


def qparams_symmetric_per_channel(
    w: jnp.ndarray,
    axis: int,
    quant_min: int = -128,
    quant_max: int = 127,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel symmetric qparams straight from a weight tensor.

    Not used by the parity path (the reference is per-tensor everywhere) but
    exposed because per-channel weight quantization is the standard accuracy
    upgrade and the int8 kernel supports a per-column scale vector.
    """
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    scale = amax / (float(quant_max - quant_min) / 2.0)
    scale = jnp.maximum(scale, FLOAT32_EPS)
    return scale.astype(jnp.float32), jnp.zeros_like(scale)
