"""Fused int8 serving kernels: GEMM + epilogue chains for the ViT block.

The serving forward is HBM-bound between GEMMs (serve_bench.py): every
quantize, GELU, LayerNorm, and residual add is a separate full-tensor HBM
round-trip in the XLA path. These kernels fold each GEMM's *entire* epilogue
— dequant, bias, residual add, GELU, LayerNorm, and the NEXT GEMM's input
quantization — into the GEMM's VMEM tile, so activations cross HBM exactly
once per GEMM and mostly as int8:

    int8_dense              x_q @ W  -> float            (plain dequant+bias)
    int8_dense_gelu_q       x_q @ W  -> gelu -> int8     (fc1 -> fc2 input)
    int8_dense_resid_ln_q   x_q @ W + residual -> (y float, LN(y) -> int8)
                            (proj -> LN2+quant; fc2 -> next block's LN1+quant)
    ln_quantize             LN(x) -> int8                (block entry / final)

Activations travel as *shifted* int8 (uint8 grid stored − 128, the MXU is
signed; see ops/quantized_matmul.py for the zero-point algebra) with static
scales from trained observers. Replaces the QNNPACK role (the reference's
int8 engine, selected by the "qnnpack" backend string, reference
src/training/qat_trainer.py:293) with a schedule shaped for the TPU memory
hierarchy rather than a translation of any torch pass structure.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_INT8_SUBLANE = 32
_TILE_M = 512


def _quantize_shifted(y: jnp.ndarray, inv_s: jnp.ndarray, zp: jnp.ndarray,
                      qmax: float = 255.0):
    q = jnp.clip(jnp.round(y * inv_s + zp), 0.0, qmax) - 128.0
    return q.astype(jnp.int8)


def _dequant(acc, colsum, wscale, bias, qs_ref):
    """int32 accumulator -> f32, using the shifted-zero-point correction."""
    s_x = qs_ref[0, 0]
    z_s = qs_ref[0, 1].astype(jnp.int32) - 128
    y = (acc - z_s * colsum).astype(jnp.float32) * (s_x * wscale)
    return y + bias


# ---------------------------------------------------------------------------
# plain: x_q @ W -> float
# ---------------------------------------------------------------------------

def _plain_kernel(x_ref, w_ref, colsum_ref, bias_ref, ws_ref, qs_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = _dequant(acc, colsum_ref[:], ws_ref[:], bias_ref[:], qs_ref)
    out_ref[:] = y.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# fc1: x_q @ W -> activation -> int8 (the fc2 input, quantized with the
# activation-transformed observer range; see quant/convert.act_output_qparams).
# act="gelu" is the tanh approximation; act="quick_gelu" (OWLv2/CLIP) is
# exact x*sigmoid(1.702x) in f32 — the same formula the XLA path computes.
# ---------------------------------------------------------------------------

def _gelu_q_kernel(
    x_ref, w_ref, colsum_ref, bias_ref, ws_ref, qs_ref, out_ref, *, act, qmax
):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = _dequant(acc, colsum_ref[:], ws_ref[:], bias_ref[:], qs_ref)
    if act == "quick_gelu":
        g = y * jax.nn.sigmoid(1.702 * y)
    else:
        g = jax.nn.gelu(y, approximate=True)
    out_ref[:] = _quantize_shifted(g, qs_ref[0, 2], qs_ref[0, 3], qmax)


# ---------------------------------------------------------------------------
# proj/fc2: x_q @ W + residual -> y (float out) and LN(y) -> int8 (the next
# GEMM's quantized input) in the same tile
# ---------------------------------------------------------------------------

def _resid_ln_q_kernel(
    x_ref, res_ref, w_ref, colsum_ref, bias_ref, ws_ref, g_ref, b_ref,
    qs_ref, y_ref, q_ref, *, eps, qmax,
):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = _dequant(acc, colsum_ref[:], ws_ref[:], bias_ref[:], qs_ref)
    y = y + res_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    z = (y - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    q_ref[:] = _quantize_shifted(z, qs_ref[0, 2], qs_ref[0, 3], qmax)


# ---------------------------------------------------------------------------
# entry: LN(x) -> int8 (no GEMM; block-0 LN1 and the final norm)
# ---------------------------------------------------------------------------

def _ln_q_kernel(x_ref, g_ref, b_ref, qs_ref, q_ref, *, eps, qmax):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    z = (x - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    q_ref[:] = _quantize_shifted(z, qs_ref[0, 2], qs_ref[0, 3], qmax)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _as_2d(x):
    return x.reshape(-1, x.shape[-1])


def _row(v, n, dtype):
    return jnp.broadcast_to(
        jnp.asarray(v, dtype).reshape(1, -1), (1, n)
    )


def _qscales(in_q, out_q=None):
    vals = [
        jnp.asarray(in_q["scale"], jnp.float32).reshape(()),
        jnp.asarray(in_q["zero_point"], jnp.float32).reshape(()),
    ]
    if out_q is not None:
        s = jnp.asarray(out_q["scale"], jnp.float32).reshape(())
        vals += [1.0 / s, jnp.asarray(out_q["zero_point"], jnp.float32).reshape(())]
    else:
        vals += [jnp.float32(1.0), jnp.float32(0.0)]
    return jnp.stack(vals).reshape(1, 4)


def _pad_rows(x, tile_m):
    m = x.shape[0]
    m_pad = -(-m // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m),) + ((0, 0),) * (x.ndim - 1))
    return x, m


@partial(jax.jit, static_argnames=("tile_m", "out_dtype", "interpret"))
def _run_plain(x_q, w_q, colsum, bias, ws, qs, *, tile_m, out_dtype, interpret):
    k, n = w_q.shape
    x_q, m_orig = _pad_rows(x_q, tile_m)
    grid = (x_q.shape[0] // tile_m,)
    out = pl.pallas_call(
        _plain_kernel,
        out_shape=jax.ShapeDtypeStruct((x_q.shape[0], n), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x_q.shape[0] * k * n,
            bytes_accessed=x_q.size + k * n + x_q.shape[0] * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, w_q, colsum, bias, ws, qs)
    return out[:m_orig]


@partial(jax.jit, static_argnames=("tile_m", "act", "qmax", "interpret"))
def _run_gelu_q(x_q, w_q, colsum, bias, ws, qs, *, tile_m, act, qmax,
                interpret):
    k, n = w_q.shape
    x_q, m_orig = _pad_rows(x_q, tile_m)
    grid = (x_q.shape[0] // tile_m,)
    out = pl.pallas_call(
        partial(_gelu_q_kernel, act=act, qmax=qmax),
        out_shape=jax.ShapeDtypeStruct((x_q.shape[0], n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x_q.shape[0] * k * n,
            bytes_accessed=x_q.size + k * n + x_q.shape[0] * n,
            transcendentals=x_q.shape[0] * n,
        ),
        interpret=interpret,
    )(x_q, w_q, colsum, bias, ws, qs)
    return out[:m_orig]


@partial(jax.jit,
         static_argnames=("tile_m", "out_dtype", "eps", "qmax", "interpret"))
def _run_resid_ln_q(
    x_q, res, w_q, colsum, bias, ws, g, b, qs,
    *, tile_m, out_dtype, eps, qmax, interpret,
):
    k, n = w_q.shape
    x_q, m_orig = _pad_rows(x_q, tile_m)
    res, _ = _pad_rows(res, tile_m)
    grid = (x_q.shape[0] // tile_m,)
    y, q = pl.pallas_call(
        partial(_resid_ln_q_kernel, eps=eps, qmax=qmax),
        out_shape=(
            jax.ShapeDtypeStruct((x_q.shape[0], n), out_dtype),
            jax.ShapeDtypeStruct((x_q.shape[0], n), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x_q.shape[0] * k * n,
            bytes_accessed=x_q.size + res.size * 2 + k * n
            + x_q.shape[0] * n * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, res, w_q, colsum, bias, ws, g, b, qs)
    return y[:m_orig], q[:m_orig]


@partial(jax.jit, static_argnames=("tile_m", "eps", "qmax", "interpret"))
def _run_ln_q(x, g, b, qs, *, tile_m, eps, qmax, interpret):
    n = x.shape[-1]
    x, m_orig = _pad_rows(x, tile_m)
    grid = (x.shape[0] // tile_m,)
    q = pl.pallas_call(
        partial(_ln_q_kernel, eps=eps, qmax=qmax),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, g, b, qs)
    return q[:m_orig]


# ---------------------------------------------------------------------------
# public ops (leading dims preserved; x_q is shifted int8)
# ---------------------------------------------------------------------------

def _prep_layer(layer):
    n = layer["w_int8"].shape[1]
    colsum = jnp.asarray(layer["w_colsum"], jnp.int32).reshape(1, n)
    bias = layer.get("bias")
    bias = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32).reshape(1, n)
    )
    ws = _row(layer["w_scale"], n, jnp.float32)
    return colsum, bias, ws


def int8_dense(
    x_q: jnp.ndarray, layer: dict, in_q: dict, *,
    out_dtype=jnp.bfloat16, tile_m: int = _TILE_M, interpret: bool = False,
) -> jnp.ndarray:
    lead = x_q.shape[:-1]
    colsum, bias, ws = _prep_layer(layer)
    out = _run_plain(
        _as_2d(x_q), layer["w_int8"], colsum, bias, ws, _qscales(in_q),
        tile_m=tile_m, out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(*lead, -1)


def int8_dense_gelu_q(
    x_q: jnp.ndarray, layer: dict, in_q: dict, gelu_out_q: dict, *,
    act: str = "gelu", tile_m: int = _TILE_M, quant_max: float = 255.0,
    interpret: bool = False,
) -> jnp.ndarray:
    lead = x_q.shape[:-1]
    colsum, bias, ws = _prep_layer(layer)
    out = _run_gelu_q(
        _as_2d(x_q), layer["w_int8"], colsum, bias, ws,
        _qscales(in_q, gelu_out_q),
        tile_m=tile_m, act=act, qmax=float(quant_max), interpret=interpret,
    )
    return out.reshape(*lead, -1)


def int8_dense_resid_ln_q(
    x_q: jnp.ndarray, layer: dict, in_q: dict, residual: jnp.ndarray,
    ln: dict, ln_out_q: dict, *,
    eps: float = 1e-6, out_dtype=jnp.bfloat16, tile_m: int = _TILE_M,
    quant_max: float = 255.0, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    lead = x_q.shape[:-1]
    n = layer["w_int8"].shape[1]
    colsum, bias, ws = _prep_layer(layer)
    y, q = _run_resid_ln_q(
        _as_2d(x_q), _as_2d(residual), layer["w_int8"], colsum, bias, ws,
        _row(ln["scale"], n, jnp.float32), _row(ln["bias"], n, jnp.float32),
        _qscales(in_q, ln_out_q),
        tile_m=tile_m, out_dtype=out_dtype, eps=eps, qmax=float(quant_max),
        interpret=interpret,
    )
    return y.reshape(*lead, n), q.reshape(*lead, n)


def ln_quantize(
    x: jnp.ndarray, ln: dict, out_q: dict, *,
    eps: float = 1e-6, tile_m: int = _TILE_M, quant_max: float = 255.0,
    interpret: bool = False,
) -> jnp.ndarray:
    lead = x.shape[:-1]
    n = x.shape[-1]
    q = _run_ln_q(
        _as_2d(x),
        _row(ln["scale"], n, jnp.float32), _row(ln["bias"], n, jnp.float32),
        _qscales({"scale": 1.0, "zero_point": 0.0}, out_q),
        tile_m=tile_m, eps=eps, qmax=float(quant_max), interpret=interpret,
    )
    return q.reshape(*lead, n)


def fused_serve_shapes_ok(k: int, n: int) -> bool:
    """Shape preconditions alone (backend-independent; serving_preset uses
    this to pick a path before the backend check)."""
    return k % _INT8_SUBLANE == 0 and n % _LANE == 0


def fused_serve_available(k: int, n: int) -> bool:
    """Shape gate (fallback: the XLA composition)."""
    return jax.default_backend() == "tpu" and fused_serve_shapes_ok(k, n)
