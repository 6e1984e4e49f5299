"""Flax modules carrying fake-quant observer state.

Observer running min/max lives in a dedicated ``"quant_stats"`` variable
collection (the JAX-idiomatic replacement for torch.ao's buffer mutation
inside ``FusedMovingAvgObsFakeQuantize``): the jitted train step threads the
collection functionally, so QAT state is explicit, checkpointable, and
sharding-aware instead of hidden module state (reference
src/training/qat_trainer.py:306-316 mutates the module tree in place and must
re-wrap DDP afterwards; here nothing is re-wrapped — a different static config
simply selects a different compiled step over the same params).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from qat_vit_tpu.quant.fake_quant import (
    fused_moving_avg_obs_fake_quant,
    observe_and_qparams,
)
from qat_vit_tpu.quant.qconfig import FakeQuantConfig


class FakeQuantizer(nn.Module):
    """One fake-quant site (the analog of one torch FusedMovingAvgObsFakeQuantize).

    ``observe=True`` (training) updates the EMA min/max in-place in the
    ``quant_stats`` collection; ``observe=False`` (eval) fake-quantizes with
    frozen statistics — exactly torch's train()/eval() observer gating.

    ``apply_fq=False`` defers the elementwise quantize-dequantize to the
    caller: the observer still updates and the qparams are still derived
    from the updated state, but the return value is ``(x, scale, zero_point)``
    so a fused Pallas kernel can apply the fq on VMEM-resident tiles
    (models/vit.py fq_in_kernel) instead of a standalone HBM pass.
    """

    cfg: FakeQuantConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, observe: bool = False, apply_fq: bool = True
    ):
        min_val = self.variable(
            "quant_stats", "min_val", lambda: jnp.array(jnp.inf, jnp.float32)
        )
        max_val = self.variable(
            "quant_stats", "max_val", lambda: jnp.array(-jnp.inf, jnp.float32)
        )
        update = observe and not self.is_initializing()
        if not apply_fq:
            new_min, new_max, scale, zero_point = observe_and_qparams(
                x,
                min_val.value,
                max_val.value,
                symmetric=self.cfg.symmetric,
                quant_min=self.cfg.quant_min,
                quant_max=self.cfg.quant_max,
                observe=update,
                averaging_constant=self.cfg.averaging_constant,
                axis_name=self.cfg.axis_name,
                stride=self.cfg.observe_stride,
            )
            if update:
                min_val.value = new_min
                max_val.value = new_max
            return x, scale, zero_point
        y, new_min, new_max = fused_moving_avg_obs_fake_quant(
            x,
            min_val.value,
            max_val.value,
            symmetric=self.cfg.symmetric,
            quant_min=self.cfg.quant_min,
            quant_max=self.cfg.quant_max,
            observe=update,
            averaging_constant=self.cfg.averaging_constant,
            axis_name=self.cfg.axis_name,
            stride=self.cfg.observe_stride,
        )
        if update:
            min_val.value = new_min
            max_val.value = new_max
        return y
