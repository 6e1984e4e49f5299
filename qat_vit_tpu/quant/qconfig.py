"""Quantization configuration — the declarative analog of torch's ``QConfig``.

The reference selects quantization behavior with a single backend string
(``get_default_qat_qconfig("qnnpack")``, reference src/training/qat_trainer.py:306).
Here the same information is an explicit, hashable dataclass that model
modules receive as static configuration, so a config change compiles a new
step function instead of mutating a module tree in place.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from qat_vit_tpu.quant.observers import DEFAULT_AVERAGING_CONSTANT


@dataclasses.dataclass(frozen=True)
class FakeQuantConfig:
    """Settings for one fake-quant site (an activation or weight observer)."""

    quant_min: int
    quant_max: int
    symmetric: bool
    averaging_constant: float = DEFAULT_AVERAGING_CONSTANT
    # Mesh axis name to reduce batch min/max over BEFORE the EMA update
    # (``lax.pmin``/``pmax``). Set by the trainer on ACTIVATION observers when
    # the train step runs under ``shard_map`` over a data axis, so observers
    # keep the global-batch semantics the GSPMD path gets for free. ``None``
    # (default) for single-device, GSPMD-partitioned, or weight observers
    # (weights are replicated — their min/max is already global).
    axis_name: Optional[str] = None
    # Opt-in approximation (default 1 = exact): observe only the first
    # 1/observe_stride of the tensor's leading axis (a contiguous prefix —
    # see observers.update_moving_avg_minmax). The trainer sets this on
    # ACTIVATION observers from the ``observer_stride`` hparam; weight
    # observers stay exact (their tensors are small).
    observe_stride: int = 1


@dataclasses.dataclass(frozen=True)
class QConfig:
    """Activation + weight fake-quant settings, as torch pairs them."""

    activation: FakeQuantConfig
    weight: FakeQuantConfig

    # Name used in configs/tracking, mirroring the reference's backend string.
    backend: str = "qnnpack"


def default_qat_qconfig(backend: str = "qnnpack") -> QConfig:
    """The qconfig the reference trains with (verified against torch 2.13):

    activation = per-tensor affine uint8 [0, 255], EMA min/max (c=0.01);
    weight     = per-tensor symmetric int8 [-128, 127], EMA min/max (c=0.01).

    Both torch backends the reference could select ("qnnpack"/"fbgemm" with
    ``reduce_range=False`` on qnnpack) resolve to these ranges for qnnpack;
    fbgemm would reduce the activation range to [0, 127] — supported here for
    completeness.
    """
    if backend == "qnnpack":
        act = FakeQuantConfig(quant_min=0, quant_max=255, symmetric=False)
    elif backend == "fbgemm":
        # fbgemm uses reduce_range=True on activations.
        act = FakeQuantConfig(quant_min=0, quant_max=127, symmetric=False)
    else:
        raise ValueError(f"unknown QAT backend: {backend!r}")
    wt = FakeQuantConfig(quant_min=-128, quant_max=127, symmetric=True)
    return QConfig(activation=act, weight=wt, backend=backend)


# Convenience alias used throughout model code: `quant: Optional[QConfig]`.
OptionalQConfig = Optional[QConfig]
