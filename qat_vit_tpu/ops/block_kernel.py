"""Whole-transformer-block Pallas kernel for int8 serving ("megablock").

The measured limit of the composed serving path (docs/BENCHMARKS.md, round 2)
is the HBM traffic *between* fused ops: even with every seam fused, each of
qkv-out / attention-out / proj-out / fc1-out / fc2-out crosses HBM once per
block, and each Pallas↔XLA boundary costs layout/serialization overhead.
This kernel runs the ENTIRE ViT block — qkv GEMM → multi-head attention →
proj (+residual, +LN2, +quantize) → fc1 (+GELU, +quantize) → fc2 (+residual,
+next-block LN1, +quantize) — in one grid program per batch tile, so per
block the only HBM traffic is:

    read  zq   int8  [B, N, D]   (this block's LN1 output, quantized)
    read  x    bf16  [B, N, D]   (the residual stream)
    read  weights    (~1.8 MB, all four GEMMs int8)
    write x'   bf16  [B, N, D]
    write zq'  int8  [B, N, D]   (the NEXT block's GEMM input)

and consecutive blocks chain custom-call→custom-call with no XLA ops (and
hence no layout conversions) in between. Replaces the QNNPACK role
(reference src/training/qat_trainer.py:293) with a schedule shaped by the
TPU memory hierarchy: weights stay resident in VMEM across the batch tile,
scores/softmax never leave VMEM (attention uses the group-masked scheme of
ops/flash_attention.py), activations move as int8 wherever a GEMM consumes
them.

Numerics: GEMMs accumulate int8×int8→int32 on the MXU; dequant, LayerNorm
statistics, softmax, and GELU run in f32 on the VPU; the residual stream is
stored bf16 (same profile as serve/int8_vit.int8_apply with
compute_dtype=bf16 — validated by argmax agreement in tests).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops import _tiling as tiling

_LANE = 128


def _q8(y, inv_s, zp, qmax=255.0):
    """f32 -> shifted int8 on the activation grid [0, qmax] (255 qnnpack /
    127 fbgemm reduced-range; see ops/quantized_matmul)."""
    return (jnp.clip(jnp.round(y * inv_s + zp), 0.0, qmax) - 128.0).astype(
        jnp.int8
    )


def _dequant(acc, colsum_ref, ws_ref, bias_ref, s_x, z_s):
    y = (acc - z_s * colsum_ref[:]).astype(jnp.float32) * (s_x * ws_ref[:])
    return y + bias_ref[:]


def _ln(y, g_ref, b_ref, eps):
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    return (y - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]


def _block_tile_body(
    zq, x, w, qs,
    *, num_heads, head_dim, eps, n_valid, block_b, qmax=255.0,
):
    """One ViT block over one [block_b, n_pad, d] activation tile, as pure
    VMEM-value dataflow — shared by the per-block kernel (`_block_kernel`)
    and the whole-model kernel (`_model_kernel`).

    ``w``: dict of materialized weight/param arrays — ``wqkv/cs_qkv/b_qkv/
    ws_qkv`` (+ proj/fc1/fc2 triples) and LN rows ``g2/b2/gn/bn``.
    ``qs``: 12 scalars (already read out of SMEM by the caller — the
    per-block kernel reads row 0 of its [1, 12] ref, the whole-model kernel
    row ``j`` of the full [depth, 12] ref; Mosaic rejects depth-BLOCKED SMEM
    specs, so the whole array rides along and rows are indexed dynamically):
    0 s_ln1    input scale (zq's qparams)          1 z_ln1   input zero-point
    2 inv_so   1/scale of qkv out_q (o quantize)   3 zp_o    its zero-point
    4 s_o      qkv out_q scale (proj dequant)      5 z_o     its zero-point
    6 inv_s2   1/scale of norm2 out_q              7 zp_2    its zero-point
    8 s_2/z_2 are 6,7's scale: s_2 = 1/inv_s2 (recomputed); slot 8 = inv_sg
    9 zp_g     gelu_q zero-point
    10 inv_sn  1/scale of next-LN out_q            11 zp_n   its zero-point

    Returns ``(x_out, zq_out)`` as [block_b, n_pad, d] arrays.
    """
    d = num_heads * head_dim
    n_pad = zq.shape[1]
    scale = head_dim**-0.5

    s1 = qs[0]
    z1 = qs[1].astype(jnp.int32)
    inv_so = qs[2]
    zp_o = qs[3]
    s_o = qs[4]
    z_o = qs[5].astype(jnp.int32)
    inv_s2 = qs[6]
    zp_2 = qs[7]
    inv_sg = qs[8]
    zp_g = qs[9]
    inv_sn = qs[10]
    zp_n = qs[11]

    # ---- qkv GEMM over the whole tile: [bb*n, d] @ [d, 3d] ----------------
    zq2d = zq.reshape(block_b * n_pad, d)
    acc = jnp.dot(zq2d, w["wqkv"], preferred_element_type=jnp.int32)
    qkv = _dequant(acc, w["cs_qkv"], w["ws_qkv"], w["b_qkv"], s1, z1 - 128)
    qkv = qkv.reshape(block_b, n_pad, 3 * d).astype(jnp.bfloat16)

    # ---- attention (group-masked, batched softmax), int8 proj input ------
    # All (image, head) score tiles are computed first, softmax runs ONCE on
    # the stacked [tiles*n_pad, n_pad] tensor, then the value dots. Fewer,
    # larger VPU ops and more MXU/VPU-independent work for Mosaic to schedule:
    # measured ~5% whole-chain win vs the per-head softmax, every round of an
    # interleaved A/B (scripts/megablock_ablate.py); bit-exact by construction
    # (same tiles, same masking, softmax rows are independent).
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_valid
    lane = tiling.lane_iota(num_heads, head_dim)
    neg = jnp.float32(-1e30)

    def head_mask(width, hh):
        return tiling.head_mask(lane, width, hh, head_dim)

    def tile_iter():
        return tiling.tile_iter(block_b, num_heads, head_dim)

    score_tiles = []
    for b, base, width, hh in tile_iter():
        q_slab = qkv[b, :, base : base + width]
        q_slab = q_slab * jnp.asarray(scale, q_slab.dtype)
        k_slab = qkv[b, :, d + base : d + base + width]
        k_h = jnp.where(head_mask(width, hh), k_slab, jnp.zeros_like(k_slab))
        s = jax.lax.dot_general(
            q_slab, k_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        score_tiles.append(jnp.where(key_mask, s, neg))
    stacked = jnp.concatenate(score_tiles, axis=0)
    m = jnp.max(stacked, axis=-1, keepdims=True)
    e = jnp.exp(stacked - m)
    p_all = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)

    o_acc = {}  # (b, base) -> accumulated [n_pad, width] in g0 order
    for idx, (b, base, width, hh) in enumerate(tile_iter()):
        p = p_all[idx * n_pad : (idx + 1) * n_pad, :]
        v_slab = qkv[b, :, 2 * d + base : 2 * d + base + width]
        v_h = jnp.where(head_mask(width, hh), v_slab, jnp.zeros_like(v_slab))
        o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        key = (b, base)
        o_acc[key] = o if key not in o_acc else o_acc[key] + o
    o_rows = [
        jnp.concatenate(
            [o_acc[(b, base)] for base in sorted(k[1] for k in o_acc if k[0] == b)],
            axis=-1,
        )
        for b in range(block_b)
    ]
    o_q = _q8(jnp.stack(o_rows).reshape(block_b * n_pad, d), inv_so, zp_o,
              qmax)

    # ---- proj GEMM + residual -> x_mid; LN2 -> int8 fc1 input ------------
    acc = jnp.dot(o_q, w["wproj"], preferred_element_type=jnp.int32)
    p_out = _dequant(acc, w["cs_proj"], w["ws_proj"], w["b_proj"], s_o,
                     z_o - 128)
    x_mid = x.reshape(block_b * n_pad, d).astype(jnp.float32) + p_out
    zq2 = _q8(_ln(x_mid, w["g2"], w["b2"], eps), inv_s2, zp_2, qmax)

    # ---- fc1 GEMM + GELU -> int8 fc2 input --------------------------------
    s_2 = 1.0 / inv_s2
    z_2 = zp_2.astype(jnp.int32)
    acc = jnp.dot(zq2, w["wfc1"], preferred_element_type=jnp.int32)
    f1 = _dequant(acc, w["cs_fc1"], w["ws_fc1"], w["b_fc1"], s_2, z_2 - 128)
    g_q = _q8(jax.nn.gelu(f1, approximate=True), inv_sg, zp_g, qmax)

    # ---- fc2 GEMM + residual -> x'; next-block LN1 -> int8 ----------------
    s_g = 1.0 / inv_sg
    z_g = zp_g.astype(jnp.int32)
    acc = jnp.dot(g_q, w["wfc2"], preferred_element_type=jnp.int32)
    f2 = _dequant(acc, w["cs_fc2"], w["ws_fc2"], w["b_fc2"], s_g, z_g - 128)
    x_out = x_mid + f2
    zq_out = _q8(_ln(x_out, w["gn"], w["bn"], eps), inv_sn, zp_n, qmax)
    return (
        x_out.reshape(block_b, n_pad, d),
        zq_out.reshape(block_b, n_pad, d),
    )


_W_KEYS = (
    "wqkv", "cs_qkv", "b_qkv", "ws_qkv",
    "wproj", "cs_proj", "b_proj", "ws_proj",
    "wfc1", "cs_fc1", "b_fc1", "ws_fc1",
    "wfc2", "cs_fc2", "b_fc2", "ws_fc2",
    "g2", "b2", "gn", "bn",
)


def _block_kernel(
    # activations
    zq_ref, x_ref,
    # qkv / proj / fc1 / fc2 weight panels (+colsum rows fused into *_cs),
    # then LayerNorm parameter rows — _W_KEYS order
    *refs,
    num_heads, head_dim, eps, n_valid, block_b, qmax,
):
    qs_ref = refs[len(_W_KEYS)]
    xout_ref, zqout_ref = refs[len(_W_KEYS) + 1 :]
    w = {k: r[:] for k, r in zip(_W_KEYS, refs)}
    qs = tuple(qs_ref[0, k] for k in range(12))
    x_out, zq_out = _block_tile_body(
        zq_ref[:], x_ref[:], w, qs,
        num_heads=num_heads, head_dim=head_dim, eps=eps, n_valid=n_valid,
        block_b=block_b, qmax=qmax,
    )
    xout_ref[:] = x_out.astype(xout_ref.dtype)
    zqout_ref[:] = zq_out


def _row(v, n):
    return jnp.asarray(v, jnp.float32).reshape(1, n)


def _gemm_rows(layer, k, n):
    """(w_int8 [k,n], colsum int32 [1,n], bias f32 [1,n], w_scale f32 [1,n])."""
    w = layer["w_int8"]
    colsum = jnp.asarray(layer["w_colsum"], jnp.int32).reshape(1, n)
    bias = layer.get("bias")
    bias = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32).reshape(1, n)
    )
    ws = jnp.broadcast_to(
        jnp.asarray(layer["w_scale"], jnp.float32).reshape(1, -1), (1, n)
    )
    return w, colsum, bias, ws


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "eps", "n_valid", "block_b",
                     "qmax", "interpret"),
)
def _run_block(
    zq, x, args, qs, *, num_heads, head_dim, eps, n_valid, block_b, qmax,
    interpret
):
    bb, n_pad, d = zq.shape
    grid = (bb // block_b,)
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, n_pad, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rowspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tile(d), tile(d)]
    for w, cs, b, ws in args[:4]:
        in_specs += [
            rowspec(w.shape), rowspec(cs.shape), rowspec(b.shape),
            rowspec(ws.shape),
        ]
    in_specs += [rowspec((1, d))] * 4  # LN rows
    in_specs += [pl.BlockSpec((1, 12), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    flat = [zq, x]
    for grp in args[:4]:
        flat += list(grp)
    flat += list(args[4]) + [qs]
    x_out, zq_out = pl.pallas_call(
        partial(
            _block_kernel, num_heads=num_heads, head_dim=head_dim, eps=eps,
            n_valid=n_valid, block_b=block_b, qmax=qmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bb, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((bb, n_pad, d), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=(tile(d), tile(d)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the whole-block working set exceeds the conservative 16 MB
            # scoped default at block_b >= 8 (v5e VMEM is far larger);
            # measured best block_b still fits comfortably
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bb * n_pad * d * (3 * d + d + 8 * d)
            + 4 * bb * n_pad * n_pad * d * 2,
            bytes_accessed=zq.size + x.size * 4 + sum(
                g[0].size for g in args[:4]
            ),
            transcendentals=bb * num_heads * n_pad * n_pad
            + bb * n_pad * 4 * d,
        ),
        interpret=interpret,
    )(*flat)
    return x_out, zq_out


def block_forward(
    zq: jnp.ndarray,  # [B, N_pad, D] shifted-int8 LN1 output (GEMM input)
    x: jnp.ndarray,  # [B, N_pad, D] bf16/f32 residual stream
    blk: Dict[str, Any],  # one entry of the convert_vit "blocks" tree
    next_ln: Dict[str, Any],  # next block's norm1 (or the final norm)
    *,
    num_heads: int,
    head_dim: int,
    eps: float = 1e-6,
    n_valid: int,
    block_b: int = 4,
    quant_max: float = 255.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:  # N_pad: any multiple of 32 works
    # (lane-dim remainders on the [N,N] score tile are masked by Mosaic);
    # 224 for ViT's 197 saves 12% GEMM rows / 23% score FLOPs vs padding
    # to the full 128 lane multiple.
    """One full ViT block in one Pallas call → (x', next block's zq')."""
    d = num_heads * head_dim
    # read the MLP width off the export (mlp_ratio != 4 models must not hit
    # an opaque reshape error — the preset gate never checks mlp_ratio)
    mlp_dim = blk["fc1"]["w_int8"].shape[1]
    args = (
        _gemm_rows(blk["qkv"], d, 3 * d),
        _gemm_rows(blk["proj"], d, d),
        _gemm_rows(blk["fc1"], d, mlp_dim),
        _gemm_rows(blk["fc2"], mlp_dim, d),
        (
            _row(blk["norm2"]["scale"], d), _row(blk["norm2"]["bias"], d),
            _row(next_ln["scale"], d), _row(next_ln["bias"], d),
        ),
    )
    f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(())  # noqa: E731
    qs = jnp.stack([
        f32(blk["norm1"]["out_q"]["scale"]),
        f32(blk["norm1"]["out_q"]["zero_point"]),
        1.0 / f32(blk["qkv"]["out_q"]["scale"]),
        f32(blk["qkv"]["out_q"]["zero_point"]),
        f32(blk["qkv"]["out_q"]["scale"]),
        f32(blk["qkv"]["out_q"]["zero_point"]),
        1.0 / f32(blk["norm2"]["out_q"]["scale"]),
        f32(blk["norm2"]["out_q"]["zero_point"]),
        1.0 / f32(blk["gelu_q"]["scale"]),
        f32(blk["gelu_q"]["zero_point"]),
        1.0 / f32(next_ln["out_q"]["scale"]),
        f32(next_ln["out_q"]["zero_point"]),
    ]).reshape(1, 12)
    bb = zq.shape[0]
    block_b = min(block_b, bb)
    pad = (-bb) % block_b
    if pad:
        zq = jnp.pad(zq, ((0, pad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    x_out, zq_out = _run_block(
        zq, x, args, qs, num_heads=num_heads, head_dim=head_dim, eps=eps,
        n_valid=n_valid, block_b=block_b, qmax=float(quant_max),
        interpret=interpret,
    )
    return x_out[:bb], zq_out[:bb]


def _model_kernel(
    zq_ref, x_ref,
    *refs,
    num_heads, head_dim, eps, n_valid, block_b, depth, qmax,
):
    """All ``depth`` blocks over one batch tile, one grid step per (tile,
    block). The activation tile lives in the OUTPUT refs across the depth
    loop (read-modify-write — Mosaic keeps revisited output blocks in VMEM
    and flushes to HBM once, when the batch-tile index changes), while each
    step's weight panels stream in depth-indexed blocks the grid pipeline
    double-buffers: block j+1's weights prefetch during block j's compute.
    Per forward, activations cross HBM exactly once each way — the 11
    inter-block (x, zq) round-trips and call boundaries of the chained
    per-block form are gone.
    """
    j = pl.program_id(1)
    qs_ref = refs[len(_W_KEYS)]
    xout_ref, zqout_ref = refs[len(_W_KEYS) + 1 :]

    @pl.when(j == 0)
    def _():
        xout_ref[:] = x_ref[:]
        zqout_ref[:] = zq_ref[:]

    w = {k: r[0] for k, r in zip(_W_KEYS, refs)}
    qs = tuple(qs_ref[j, k] for k in range(12))
    x_out, zq_out = _block_tile_body(
        zqout_ref[:], xout_ref[:], w, qs,
        num_heads=num_heads, head_dim=head_dim, eps=eps, n_valid=n_valid,
        block_b=block_b, qmax=qmax,
    )
    xout_ref[:] = x_out.astype(xout_ref.dtype)
    zqout_ref[:] = zq_out


def _model_resident_kernel(
    zq_ref, x_ref,
    *refs,
    num_heads, head_dim, eps, n_valid, block_b, depth, qmax,
):
    """All ``depth`` blocks over one batch tile in ONE grid step: every
    weight panel rides a grid-INVARIANT index map, so Mosaic fetches each
    panel into VMEM once for the whole call (the streamed `_model_kernel`
    refetches the full weight set per batch tile — ~1.4 GB/forward at
    ViT-S batch 256), the depth loop is unrolled in-kernel, and the
    activation tile is carried as VALUES between blocks. Per forward,
    activations cross HBM once each way and weights once TOTAL. Needs the
    whole model's int8 weights in VMEM (~21 MB for ViT-S) — gated by the
    caller on geometry."""
    qs_ref = refs[len(_W_KEYS)]
    xout_ref, zqout_ref = refs[len(_W_KEYS) + 1 :]
    x, zq = x_ref[:], zq_ref[:]
    for j in range(depth):
        w = {k: r[j] for k, r in zip(_W_KEYS, refs)}
        qs = tuple(qs_ref[j, k] for k in range(12))
        x, zq = _block_tile_body(
            zq, x, w, qs,
            num_heads=num_heads, head_dim=head_dim, eps=eps, n_valid=n_valid,
            block_b=block_b, qmax=qmax,
        )
        # the chained/streamed forms round the residual stream to the
        # stream dtype (bf16) at every block boundary; match for bit-identity
        x = x.astype(x_ref.dtype)
    xout_ref[:] = x.astype(xout_ref.dtype)
    zqout_ref[:] = zq


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "eps", "n_valid", "block_b",
                     "qmax", "interpret"),
)
def _run_model_resident(
    zq, x, args, qs, *, num_heads, head_dim, eps, n_valid, block_b, qmax,
    interpret
):
    bb, n_pad, d = zq.shape
    depth = qs.shape[0]
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, n_pad, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [tile(d), tile(d)]
    in_specs += [whole(a.shape) for a in args]
    in_specs += [pl.BlockSpec((depth, 12), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    x_out, zq_out = pl.pallas_call(
        partial(
            _model_resident_kernel, num_heads=num_heads, head_dim=head_dim,
            eps=eps, n_valid=n_valid, block_b=block_b, depth=depth,
            qmax=qmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bb, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((bb, n_pad, d), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=(bb // block_b,),
            in_specs=in_specs,
            out_specs=(tile(d), tile(d)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=depth * (2 * bb * n_pad * d * (3 * d + d + 8 * d)
                           + 4 * bb * n_pad * n_pad * d * 2),
            bytes_accessed=zq.size * 2 + x.size * 2 * x.dtype.itemsize
            + sum(a.size for a in args),
            transcendentals=depth * (bb * num_heads * n_pad * n_pad
                                     + bb * n_pad * 4 * d),
        ),
        interpret=interpret,
    )(zq, x, *args, qs)
    return x_out, zq_out


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "eps", "n_valid", "block_b",
                     "qmax", "interpret"),
)
def _run_model(
    zq, x, args, qs, *, num_heads, head_dim, eps, n_valid, block_b, qmax,
    interpret
):
    bb, n_pad, d = zq.shape
    depth = qs.shape[0]
    grid = (bb // block_b, depth)
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, n_pad, r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dstack = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tile(d), tile(d)]
    in_specs += [dstack(a.shape[1:]) for a in args]
    # Mosaic rejects depth-blocked SMEM specs (block dims must divide 8/128
    # or equal the array's); the whole [depth, 12] table rides along and the
    # kernel indexes row j dynamically.
    in_specs += [pl.BlockSpec((depth, 12), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)]
    x_out, zq_out = pl.pallas_call(
        partial(
            _model_kernel, num_heads=num_heads, head_dim=head_dim, eps=eps,
            n_valid=n_valid, block_b=block_b, depth=depth, qmax=qmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bb, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((bb, n_pad, d), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=(tile(d), tile(d)),
        ),
        compiler_params=pltpu.CompilerParams(
            # depth revisits the same output blocks and must run in order
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=depth * (2 * bb * n_pad * d * (3 * d + d + 8 * d)
                           + 4 * bb * n_pad * n_pad * d * 2),
            bytes_accessed=zq.size + x.size * 4
            + sum(a.size for a in args[:1]) * depth,
            transcendentals=depth * (bb * num_heads * n_pad * n_pad
                                     + bb * n_pad * 4 * d),
        ),
        interpret=interpret,
    )(zq, x, *args, qs)
    return x_out, zq_out


def model_forward(
    zq: jnp.ndarray,  # [B, N_pad, D] shifted-int8 LN1 output of block 0
    x: jnp.ndarray,  # [B, N_pad, D] bf16/f32 residual stream
    blocks: Dict[str, Any],  # the convert_vit "blocks" tree (str(i) keys)
    final_ln: Dict[str, Any],  # the model's final norm entry
    *,
    num_heads: int,
    head_dim: int,
    depth: int,
    eps: float = 1e-6,
    n_valid: int,
    block_b: int = 4,
    quant_max: float = 255.0,
    interpret: bool = False,
    resident: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ENTIRE transformer stack (all ``depth`` blocks) in ONE Pallas
    call; returns (x_final, final-LN'd int8 rows for the head).

    Per-depth weight panels are stacked on a leading depth axis and either
    streamed by the grid pipeline (see `_model_kernel`) or, with
    ``resident=True``, pinned whole in VMEM for the call (see
    `_model_resident_kernel` — no per-tile weight refetch; requires the
    model's int8 weights to fit VMEM). Numerics are identical to ``depth``
    chained :func:`block_forward` calls — same tile body, same f32/bf16
    profile (tests assert bit-identity in interpret mode).
    """
    d = num_heads * head_dim
    # MLP width from the export itself, as the long path does (a gelu
    # lane-aligned model with mlp_ratio != 4 must route correctly)
    mlp_dim = blocks["0"]["fc1"]["w_int8"].shape[1]
    per = []
    for i in range(depth):
        blk = blocks[str(i)]
        nxt = blocks[str(i + 1)]["norm1"] if i + 1 < depth else final_ln
        gemms = (
            _gemm_rows(blk["qkv"], d, 3 * d),
            _gemm_rows(blk["proj"], d, d),
            _gemm_rows(blk["fc1"], d, mlp_dim),
            _gemm_rows(blk["fc2"], mlp_dim, d),
        )
        rows = [a for grp in gemms for a in grp]
        rows += [
            _row(blk["norm2"]["scale"], d), _row(blk["norm2"]["bias"], d),
            _row(nxt["scale"], d), _row(nxt["bias"], d),
        ]
        f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(())  # noqa: E731
        qs = jnp.stack([
            f32(blk["norm1"]["out_q"]["scale"]),
            f32(blk["norm1"]["out_q"]["zero_point"]),
            1.0 / f32(blk["qkv"]["out_q"]["scale"]),
            f32(blk["qkv"]["out_q"]["zero_point"]),
            f32(blk["qkv"]["out_q"]["scale"]),
            f32(blk["qkv"]["out_q"]["zero_point"]),
            1.0 / f32(blk["norm2"]["out_q"]["scale"]),
            f32(blk["norm2"]["out_q"]["zero_point"]),
            1.0 / f32(blk["gelu_q"]["scale"]),
            f32(blk["gelu_q"]["zero_point"]),
            1.0 / f32(nxt["out_q"]["scale"]),
            f32(nxt["out_q"]["zero_point"]),
        ])
        per.append(rows + [qs])
    stacked = [jnp.stack([p[k] for p in per]) for k in range(len(_W_KEYS))]
    qs_all = jnp.stack([p[-1] for p in per])  # [depth, 12]
    bb = zq.shape[0]
    block_b = min(block_b, bb)
    pad = (-bb) % block_b
    if pad:
        zq = jnp.pad(zq, ((0, pad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    run = _run_model_resident if resident else _run_model
    x_out, zq_out = run(
        zq, x, tuple(stacked), qs_all, num_heads=num_heads,
        head_dim=head_dim, eps=eps, n_valid=n_valid, block_b=block_b,
        qmax=float(quant_max), interpret=interpret,
    )
    return x_out[:bb], zq_out[:bb]


def megablock_shapes_ok(num_heads: int, head_dim: int) -> bool:
    """Shape preconditions alone (backend-independent; serving_preset uses
    this to pick a path before the backend check)."""
    return tiling.shapes_ok(num_heads, head_dim)


def megablock_available(num_heads: int, head_dim: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and megablock_shapes_ok(num_heads, head_dim)
    )
