"""Fused multi-head attention Pallas kernel for serving.

The profiler shows plain-XLA attention dominating the int8 serving forward:
the (B, H, 197, 197) score tensor is materialized in HBM, softmax'd with
dtype converts (``convert_reduce_fusion``), and the q/k/v transposes are
physical copies — together ~65% of the forward. This kernel keeps the whole
attention for one image in VMEM: scores, softmax, and the value contraction
never touch HBM.

Design (ViT-sized sequences, NOT long-context flash): seq_len ≤ a few hundred
means one (padded) 256×256 score tile fits VMEM outright, so no online
softmax/tiling is needed — the fusion is the win, not the streaming. The
kernel consumes the qkv GEMM's natural output layout [B, N, 3*H*HD] directly
(no transposes anywhere) and emits [B, N, H*HD].

Forward-only (serving); the training path keeps XLA attention (which needs
the VJP). Numerics: scores accumulate f32 on the MXU, softmax in f32,
probabilities cast to ``dtype`` for the value contraction — same precision
profile as the XLA f32-softmax path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops import _tiling as tiling

_LANE = 128


def _attention_kernel(n_valid_ref, qkv_ref, out_ref, *, num_heads, head_dim, scale):
    """One batch element: per-head score/softmax/value, fully in VMEM."""
    n_pad = qkv_ref.shape[1]
    d = num_heads * head_dim
    n_valid = n_valid_ref[0]
    # column mask for padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    neg = jnp.float32(-1e30)
    for h in range(num_heads):
        q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
        k = qkv_ref[0, :, d + h * head_dim : d + (h + 1) * head_dim]
        v = qkv_ref[0, :, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(col < n_valid, scores, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out_ref[0, :, h * head_dim : (h + 1) * head_dim] = o.astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "interpret"),
)
def flash_attention_qkv(
    qkv: jnp.ndarray,  # [B, N, 3*H*HD] — the qkv GEMM output, untransposed
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MHA over the packed qkv tensor → [B, N, H*HD]."""
    b, n, three_d = qkv.shape
    d = num_heads * head_dim
    assert three_d == 3 * d, (three_d, d)
    n_pad = max(_LANE, -(-n // _LANE) * _LANE)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    scale = head_dim**-0.5
    n_valid = jnp.full((1,), n, jnp.int32)
    out = pl.pallas_call(
        partial(
            _attention_kernel,
            num_heads=num_heads,
            head_dim=head_dim,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), qkv.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, n_pad, 3 * d), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, n_pad, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * n_pad * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + b * n_pad * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(n_valid, qkv)
    return out[:, :n, :]


def fq_tile(t, scale, zp, quant_min: int, quant_max: int):
    """In-kernel fake-quant (quantize→dequantize) of a VMEM-resident tile.

    The exact elementwise math of ``quant.fake_quant.fake_quantize`` (f32
    compute, round-half-even, clip to the grid), applied inside a Pallas
    kernel so the fq never costs a standalone HBM pass (models/vit.py
    ``fq_in_kernel``)."""
    compute = t.astype(jnp.float32)
    q = jnp.round(compute / scale + zp)
    out = (jnp.clip(q, float(quant_min), float(quant_max)) - zp) * scale
    return out.astype(t.dtype)


def _fused_attention_kernel(qkv_ref, qs_ref, out_ref, *, num_heads, head_dim,
                            scale, n_valid, block_b, group, quantize,
                            in_fq=None, qmax=255.0):
    """Group-masked attention: 128-aligned slices only, no transposes.

    Heads are processed in lane GROUPS of ``group = 128 // head_dim`` heads
    (one 128-lane slab for ViT's head_dim=64): slicing the packed q|k|v
    thirds at group boundaries is always 128-aligned (no Mosaic relayouts),
    and within a slab each head's dot masks the sibling heads' lanes on k —
    ``q_slab @ (k_slab ⊙ mask_h)^T`` contracts the full slab but only head
    h's lanes are nonzero, which is exactly ``q_h @ k_h^T``. The value side
    accumulates ``p_h @ (v_slab ⊙ mask_h)`` so each head lands in its own
    lane range of the packed output. FLOP redundancy is only ``group``×
    (2× for ViT) on a part of the forward that is overhead-bound, in
    exchange for full MXU K=128 pipes and zero relayouts. Scores/softmax
    stay in VMEM; the optional epilogue quantizes the output (the proj GEMM's
    int8 input, scale/zp in SMEM ``qs_ref``).

    Batched softmax (same scheme as ops/block_kernel.py): all (image, head)
    score tiles are computed first, softmax runs ONCE on the stacked
    [tiles*n_pad, n_pad] tensor, then the value dots. Fewer, larger VPU ops
    and more MXU/VPU-independent work for Mosaic to schedule; bit-exact by
    construction (same tiles, same masking and accumulation order, softmax
    rows are independent)."""
    n_pad = qkv_ref.shape[1]
    d = num_heads * head_dim
    gw = group * head_dim  # slab width (=128 for head_dim 64)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_valid
    lane = tiling.lane_iota(num_heads, head_dim)
    neg = jnp.float32(-1e30)

    def head_mask(width, hh):
        return tiling.head_mask(lane, width, hh, head_dim)

    def tile_iter():
        return tiling.tile_iter(block_b, num_heads, head_dim)

    # in_fq=(qmin, qmax): the qkv operand is the RAW GEMM output; apply the
    # activation fake-quant on slabs here in VMEM (scale/zp in SMEM qs_ref)
    # instead of a standalone XLA pass over the largest activation tensor.
    load_slab = tiling.slab_loader(qkv_ref, qs_ref, in_fq, fq_tile)

    score_tiles = []
    for b, base, width, hh in tile_iter():
        q_slab = load_slab(b, base, width)
        q_slab = q_slab * jnp.asarray(scale, q_slab.dtype)
        k_slab = load_slab(b, d + base, width)
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
    p_all = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_ref.dtype)

    acc_by = {}  # (b, base) -> accumulated [n_pad, width], hh order
    for idx, (b, base, width, hh) in enumerate(tile_iter()):
        p = p_all[idx * n_pad : (idx + 1) * n_pad, :]
        v_slab = load_slab(b, 2 * d + base, width)
        v_h = jnp.where(head_mask(width, hh), v_slab, jnp.zeros_like(v_slab))
        o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        key = (b, base)
        acc_by[key] = o if key not in acc_by else acc_by[key] + o
    for (b, base), acc in acc_by.items():
        width = min(gw, d - base)
        if quantize:
            q8 = jnp.clip(
                jnp.round(acc * qs_ref[0, 0] + qs_ref[0, 1]), 0.0, qmax
            ) - 128.0
            out_ref[b, :, base : base + width] = q8.astype(jnp.int8)
        else:
            out_ref[b, :, base : base + width] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "head_dim", "block_b",
                                   "quantize", "interpret", "pad_multiple",
                                   "in_fq", "qmax"))
def _fused_attention_call(qkv, qs, num_heads, head_dim, block_b, quantize,
                          interpret, pad_multiple=_LANE, in_fq=None,
                          qmax=255.0):
    b, n, three_d = qkv.shape
    d = num_heads * head_dim
    assert three_d == 3 * d, (three_d, d)
    assert not (quantize and in_fq), "in_fq and quantize both use qs_ref"
    n_pad = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    block_b = min(block_b, b)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        qkv = jnp.pad(qkv, ((0, b_pad - b), (0, 0), (0, 0)))
    group, _ = tiling.head_group(num_heads, head_dim)
    out = pl.pallas_call(
        partial(
            _fused_attention_kernel,
            num_heads=num_heads,
            head_dim=head_dim,
            scale=head_dim**-0.5,
            n_valid=n,
            block_b=block_b,
            group=group,
            quantize=quantize,
            in_fq=in_fq,
            qmax=qmax,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_pad, n_pad, d), jnp.int8 if quantize else qkv.dtype
        ),
        grid_spec=pl.GridSpec(
            grid=(b_pad // block_b,),
            in_specs=[
                pl.BlockSpec(
                    (block_b, n_pad, 3 * d), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_b, n_pad, d), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the stacked score tensor of the batched softmax exceeds the
            # conservative 16 MB scoped default at block_b=4/f32 inputs
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * num_heads * n_pad * n_pad * head_dim * group,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + b_pad * n_pad * d * (1 if quantize else qkv.dtype.itemsize),
            transcendentals=b_pad * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qkv, qs)
    return out[:b, :n, :]


def fused_attention_qkv(
    qkv: jnp.ndarray,  # [B, N, 3*H*HD] — the qkv GEMM output, untransposed
    num_heads: int,
    head_dim: int,
    block_b: int = 4,
    out_q: dict = None,
    quant_max: float = 255.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MHA over the packed qkv tensor → [B, N, H*HD].

    Scores and softmax stay in VMEM, cutting the XLA einsum path's score
    HBM round-trips to just the qkv read + output write. With ``out_q``
    the epilogue quantizes the output to shifted int8 (the proj GEMM's
    input — one less full-tensor pass)."""
    if out_q is not None:
        qs = jnp.stack([
            1.0 / jnp.asarray(out_q["scale"], jnp.float32).reshape(()),
            jnp.asarray(out_q["zero_point"], jnp.float32).reshape(()),
        ]).reshape(1, 2)
        return _fused_attention_call(
            qkv, qs, num_heads, head_dim, block_b, True, interpret,
            qmax=float(quant_max),
        )
    qs = jnp.zeros((1, 2), jnp.float32)
    return _fused_attention_call(
        qkv, qs, num_heads, head_dim, block_b, False, interpret
    )


def xla_attention_qkv(
    qkv: jnp.ndarray, num_heads: int, head_dim: int, softmax_dtype=jnp.float32
) -> jnp.ndarray:
    """Reference XLA implementation (also the CPU/grad path): transpose-free
    einsum forms over the same packed layout.

    The score tensor materializes directly in ``softmax_dtype`` — with bf16
    softmax this halves the dominant HBM traffic of the whole serving forward
    (profiled: an f32 score write + convert was 47% of the int8 fwd).
    """
    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, num_heads, head_dim)
    k = k.reshape(b, n, num_heads, head_dim)
    v = v.reshape(b, n, num_heads, head_dim)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * (head_dim**-0.5), k,
        preferred_element_type=softmax_dtype,
    )
    p = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, n, num_heads * head_dim)
