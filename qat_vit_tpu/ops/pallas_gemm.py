"""Fused quantize→int8-GEMM→dequantize Pallas kernel.

One VMEM round-trip replaces three HBM-bound passes (quantize activations,
int8 matmul, dequant+bias): the float activation tile is quantized on the VPU
while resident in VMEM, fed to the MXU as int8 against the int8 weight panel,
and the int32 accumulator is zero-point-corrected, rescaled, and biased before
it ever leaves VMEM. This is the speed-of-light path for the serving GEMMs —
activation bytes cross HBM once (f32 in, f32 out) and weights cross as int8
(4x less weight bandwidth than an f32 GEMM, 2x MXU rate vs bf16 on v5e).

Grid: 1-D over M tiles; each program sees the full [K, N] weight panel (ViT
panels are ≤ ~2.4 MB int8 — far under the ~16 MB VMEM budget) so the
quantized activation tile is computed exactly once per output tile.

Replaces QNNPACK (the reference's int8 engine, selected via the "qnnpack"
backend string, reference src/training/qat_trainer.py:293).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tiling constraints (TPU v4/v5): lane dim 128; int8 sublane 32.
_LANE = 128
_INT8_SUBLANE = 32
_TILE_M = 256
# Weight panel budget: keep x-tile + w-panel + out-tile well under VMEM.
_MAX_PANEL_BYTES = 6 * 1024 * 1024


def fused_quantize_matmul_available(x_shape: Tuple[int, ...], w_shape: Tuple[int, int]) -> bool:
    """Shape gate for the fused kernel (fallback: XLA int8 dot_general)."""
    if jax.default_backend() != "tpu":
        return False
    k, n = w_shape
    if x_shape[-1] != k:
        return False
    if k % _INT8_SUBLANE or n % _LANE:
        return False
    if k * n > _MAX_PANEL_BYTES:
        return False
    return True


def _kernel(x_ref, w_ref, colsum_ref, bias_ref, wscale_ref, qscale_ref, out_ref):
    """One [TILE_M, N] output tile: quantize → int8 MXU dot → dequant.

    ``wscale_ref`` is a [1, N] row — a broadcast scalar for per-tensor weight
    scales or the per-output-channel vector for per-channel exports (both
    supported by quant/convert.dense_int8)."""
    s_x = qscale_ref[0, 0]
    zp = qscale_ref[0, 1]  # original uint8 zero point
    qmax = qscale_ref[0, 2]  # activation grid top (255 qnnpack / 127 fbgemm)
    # NB: pl.reciprocal only lowers for vector operands; plain scalar divide
    # is folded into the vector multiply below anyway.
    inv_s = 1.0 / s_x
    x = x_ref[:]
    # uint8-grid quantization stored shifted to signed int8 (MXU is signed).
    q = jnp.clip(jnp.round(x * inv_s + zp), 0.0, qmax) - 128.0
    q8 = q.astype(jnp.int8)
    acc = jnp.dot(q8, w_ref[:], preferred_element_type=jnp.int32)
    z_s = zp.astype(jnp.int32) - 128
    acc = acc - z_s * colsum_ref[:]
    out_ref[:] = acc.astype(jnp.float32) * (s_x * wscale_ref[:]) + bias_ref[:]


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _fused_2d(
    x: jnp.ndarray,  # [M, K] f32
    w_q: jnp.ndarray,  # [K, N] int8
    qscales: jnp.ndarray,  # [1, 3] f32: (x_scale, x_zp, x_quant_max)
    w_scale: jnp.ndarray,  # [1, N] f32 (per-channel, or broadcast per-tensor)
    w_colsum: jnp.ndarray,  # [1, N] int32
    bias: jnp.ndarray,  # [1, N] f32
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    n = w_q.shape[1]
    # tile_m must be sublane-aligned: round m UP to the lane multiple before
    # clamping (m=197 must not become a 197-row block — Mosaic rejects it;
    # the rows are padded below and the pad sliced off the output)
    tile_m = min(_TILE_M, max(_LANE, -(-m // _LANE) * _LANE))
    m_pad = -(-m // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tile_m,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k * 4 + k * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, w_colsum, bias, w_scale, qscales)
    if m_pad != m:
        out = out[:m]
    return out.astype(out_dtype)


def fused_quantize_matmul(
    x: jnp.ndarray,  # [..., K] float
    w_q: jnp.ndarray,  # [K, N] int8
    *,
    x_scale: jnp.ndarray,
    x_zero_point: jnp.ndarray,
    w_scale: jnp.ndarray,
    w_colsum: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    x_quant_max: jnp.ndarray | float = 255.0,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """quantize(x) @ w_q, dequantized — fused in one Pallas kernel."""
    k = x.shape[-1]
    n = w_q.shape[1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    qscales = jnp.stack(
        [
            jnp.asarray(x_scale, jnp.float32).reshape(()),
            jnp.asarray(x_zero_point, jnp.float32).reshape(()),
            jnp.asarray(x_quant_max, jnp.float32).reshape(()),
        ]
    ).reshape(1, 3)
    # per-tensor (scalar) and per-channel ([N]) weight scales both become a
    # [1, N] row consumed by the kernel epilogue
    ws = jnp.broadcast_to(
        jnp.asarray(w_scale, jnp.float32).reshape(1, -1), (1, n)
    )
    colsum = jnp.asarray(w_colsum, jnp.int32).reshape(1, n)
    b = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32).reshape(1, n)
    )
    out = _fused_2d(x2, w_q, qscales, ws, colsum, b, out_dtype=out_dtype, interpret=interpret)
    return out.reshape(*lead, n)
