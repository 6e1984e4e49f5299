"""Int8 quantized GEMM for the MXU — the QNNPACK replacement.

The reference's int8 capability lives entirely in QNNPACK (C/asm, selected by
the ``"qnnpack"`` backend string, reference src/training/qat_trainer.py:293).
Here the int8 GEMM targets the TPU MXU, which natively multiplies
int8×int8→int32 at 2× the bf16 rate on v5e.

Math. Activations are quantized uint8 affine (scale ``s_x``, zero-point
``z``); the MXU consumes *signed* int8, so quantized activations are stored
shifted by −128 (``x_s = x_u8 − 128``, int8) with an adjusted zero-point
``z_s = z − 128``. Weights are int8 symmetric (scale ``s_w``). Then::

    y = (x_u8 − z) · W_q · s_x·s_w + b
      = ((x_s − z_s) · W_q) · s_x·s_w + b
      = (x_s · W_q − z_s · colsum(W_q)) · s_x·s_w + b

so the GEMM is a plain signed int8 dot + a per-column correction with the
precomputed ``colsum``. Two implementations:

- ``int8_matmul_xla``: ``lax.dot_general`` with int32 accumulation — the
  correctness reference, already lowered onto the MXU by XLA;
- a fused Pallas kernel in ops/pallas_gemm.py (quantize + GEMM + dequant in
  one VMEM round-trip) selected automatically on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def quantize_act_shifted(
    x: jnp.ndarray, scale: jnp.ndarray, zero_point: jnp.ndarray,
    quant_max: jnp.ndarray | float = 255.0,
) -> jnp.ndarray:
    """f32 → shifted-int8 quantized activation (uint8 grid stored − 128).

    ``quant_max`` is the top of the activation grid: 255 for the qnnpack
    qconfig, 127 for fbgemm's ``reduce_range=True`` (torch halves the range
    to dodge an x86 vpmaddubsw overflow; the MXU has no such limit but the
    export must clip on the grid it was trained/converted for). The −128
    shift to signed int8 is grid-independent — values land in
    [−128, quant_max−128] and the zero-point correction in
    :func:`int8_matmul_xla` is exact for any consistent (scale, zp)."""
    q = jnp.round(x.astype(jnp.float32) / scale + zero_point)
    q = jnp.clip(q, 0.0, quant_max) - 128.0
    return q.astype(jnp.int8)


def int8_matmul_xla(
    x_q: jnp.ndarray,  # [..., M, K] int8 (shifted-uint8 activations)
    w_q: jnp.ndarray,  # [K, N] int8 (symmetric weights)
    *,
    x_scale: jnp.ndarray,
    x_zero_point: jnp.ndarray,  # original uint8 zero point (unshifted)
    w_scale: jnp.ndarray,
    w_colsum: jnp.ndarray,  # [N] int32 = sum_K w_q
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Dequantized int8 GEMM via XLA dot_general (MXU int8 path)."""
    acc = lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z_s = x_zero_point.astype(jnp.int32) - 128
    acc = acc - z_s * w_colsum
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def quantized_dense(
    x: jnp.ndarray,  # [..., K] float input
    layer: dict,  # int8 bundle from quant/convert.dense_int8
    in_q: dict,  # {"scale", "zero_point"} for the input tensor
    *,
    use_pallas: Optional[bool] = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """quantize(x) → int8 GEMM → dequant(+bias): one serving-layer step.

    ``use_pallas=None`` resolves to the XLA path: measured on a real v5e
    (scripts/kernel_bench.py), XLA's int8 ``dot_general`` sustains ~150-240
    TOPs on the ViT-S shapes while the standalone Pallas kernel reaches only
    ~45-60 TOPs — XLA overlaps the quantize/dequant fusions with the MXU
    better than the single-panel Pallas schedule. The resolution (round 2)
    was not a faster standalone GEMM but removing the per-GEMM boundary
    entirely: the serving preset runs each transformer block as ONE Pallas
    kernel (ops/block_kernel.py) whose four GEMMs beat the composed XLA path
    end-to-end (13,030 vs 6,557 img/s, docs/BENCHMARKS.md). This function
    stays the building block for non-megablock geometries; the standalone
    kernel remains available (``use_pallas=True``).
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from qat_vit_tpu.ops.pallas_gemm import fused_quantize_matmul_available

        if fused_quantize_matmul_available(x.shape, layer["w_int8"].shape):
            from qat_vit_tpu.ops.pallas_gemm import fused_quantize_matmul

            return fused_quantize_matmul(
                x,
                layer["w_int8"],
                x_scale=in_q["scale"],
                x_zero_point=in_q["zero_point"],
                x_quant_max=in_q.get("quant_max", 255.0),
                w_scale=layer["w_scale"],
                w_colsum=layer["w_colsum"],
                bias=layer.get("bias"),
                out_dtype=out_dtype,
            )
    x_q = quantize_act_shifted(
        x, in_q["scale"], in_q["zero_point"], in_q.get("quant_max", 255.0)
    )
    return int8_matmul_xla(
        x_q,
        layer["w_int8"],
        x_scale=in_q["scale"],
        x_zero_point=in_q["zero_point"],
        w_scale=layer["w_scale"],
        w_colsum=layer["w_colsum"],
        bias=layer.get("bias"),
        out_dtype=out_dtype,
    )
