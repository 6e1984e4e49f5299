"""Training attention: fused Pallas forward + custom-VJP Pallas backward.

The train step is activation-bandwidth-bound (scripts/train_step_bench.py):
XLA's attention stores the [B, H, N, N] probability tensor for the backward
pass (~119 MB/block at batch 256) and runs the softmax VJP as full-tensor
HBM passes — attention alone measures ~50-75 ms/step of the ~133 ms bf16
QAT step. These kernels keep scores, softmax, AND the softmax VJP entirely
in VMEM:

- forward = the serving group-masked kernel (ops/flash_attention.py design:
  heads processed in 128-lane slabs, sibling lanes masked inside each dot —
  no Mosaic relayouts) with nothing saved but the (already-stored) qkv;
- backward recomputes scores -> softmax per head in VMEM (N<=a few hundred:
  one [N, N] f32 tile, no streaming needed) and emits dqkv in one pass:

      dp = do_h v_h^T ; ds = p (dp - rowsum(dp p)) ;
      dq = ds k scale ; dk = ds^T q scale ; dv = p^T do_h

Padded query rows carry zero cotangent (the wrapper slices them off, so
their `do` is zero -> ds is zero); padded key columns die in the softmax
mask. Replaces the torch/CUDA role of fused attention training kernels with
a schedule shaped for short-sequence ViTs (reference trains via plain torch
matmuls, src/training/qat_trainer.py:333-364 forward path).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops import _tiling as tiling
from qat_vit_tpu.ops.flash_attention import _fused_attention_call, fq_tile


def forced_interpret() -> bool:
    """Test hook: ``QVT_ATTN_INTERPRET=1`` runs the Pallas attention kernels
    in interpret mode off-TPU, so the 8-virtual-CPU-device suite can exercise
    the kernel path (e.g. under the shard_map DP train step) with the exact
    production trace."""
    return os.environ.get("QVT_ATTN_INTERPRET", "") == "1"


def _attention_bwd_kernel(qkv_ref, do_ref, qs_ref, dqkv_ref, *, num_heads,
                          head_dim, scale, n_valid, block_b, in_fq=None):
    """Batched-softmax VJP (same scheme as ops/block_kernel.py): all
    (image, head) score AND dp tiles are computed first (MXU), the softmax
    recompute and its VJP elementwise chain run ONCE on the stacked
    [tiles*n_pad, n_pad] tensors (VPU), then the dq/dk/dv dots (MXU).
    Bit-exact vs the per-head form: same tiles, same masking and
    accumulation order, all row-wise independent ops.

    ``in_fq=(qmin, qmax)``: the qkv operand is the RAW qkv GEMM output; the
    kernel recomputes the activation fake-quant on slabs in VMEM (the same
    values the forward used — scale/zp in SMEM ``qs_ref``) AND applies the
    straight-through-estimator mask to dqkv before the store, so neither the
    fq'd tensor nor the STE mask ever exists in HBM."""
    n_pad = qkv_ref.shape[1]
    d = num_heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_valid
    lane = tiling.lane_iota(num_heads, head_dim)
    neg = jnp.float32(-1e30)

    def tile_iter():
        return tiling.tile_iter(block_b, num_heads, head_dim)

    load_slab = tiling.slab_loader(qkv_ref, qs_ref, in_fq, fq_tile)

    s_tiles, dp_tiles, slabs = [], [], []
    for b, base, width, hh in tile_iter():
        q_slab = load_slab(b, base, width)
        k_slab = load_slab(b, d + base, width)
        v_slab = load_slab(b, 2 * d + base, width)
        do_slab = do_ref[b, :, base : base + width]
        hmask = tiling.head_mask(lane, width, hh, head_dim)
        zeros = jnp.zeros_like(k_slab)
        q_h = jnp.where(hmask, q_slab, zeros)
        k_h = jnp.where(hmask, k_slab, zeros)
        v_h = jnp.where(hmask, v_slab, zeros)
        do_h = jnp.where(hmask, do_slab, zeros)
        s = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s_tiles.append(jnp.where(key_mask, s, neg))
        dp_tiles.append(jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        slabs.append((q_h, k_h, do_h))

    s_all = jnp.concatenate(s_tiles, axis=0)
    dp_all = jnp.concatenate(dp_tiles, axis=0)
    m = jnp.max(s_all, axis=-1, keepdims=True)
    e = jnp.exp(s_all - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    ds_all = (
        p * (dp_all - jnp.sum(dp_all * p, axis=-1, keepdims=True))
    ).astype(qkv_ref.dtype)
    p_all = p.astype(qkv_ref.dtype)

    acc = {}  # (b, base) -> [dq, dk, dv] accumulated in hh order
    for idx, (b, base, width, hh) in enumerate(tile_iter()):
        q_h, k_h, do_h = slabs[idx]
        rows = slice(idx * n_pad, (idx + 1) * n_pad)
        ds = ds_all[rows, :]
        p16 = p_all[rows, :]
        dq = jnp.dot(ds, k_h, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv = jax.lax.dot_general(
            p16, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        key = (b, base)
        if key in acc:
            old = acc[key]
            acc[key] = [old[0] + dq, old[1] + dk, old[2] + dv]
        else:
            acc[key] = [dq, dk, dv]
    def ste_mask(b, off, width, g):
        # STE: gradient flows only where the (unclipped) quantized value is
        # in range — recomputed from the raw slab, exactly fake_quant._fq_fwd
        if in_fq is None:
            return g
        raw = qkv_ref[b, :, off : off + width].astype(jnp.float32)
        qq = jnp.round(raw / qs_ref[0, 0] + qs_ref[0, 1])
        keep = (qq >= float(in_fq[0])) & (qq <= float(in_fq[1]))
        return jnp.where(keep, g, jnp.zeros_like(g))

    _, gw = tiling.head_group(num_heads, head_dim)
    for (b, base), (dq_acc, dk_acc, dv_acc) in acc.items():
        width = min(gw, d - base)
        dqkv_ref[b, :, base : base + width] = ste_mask(
            b, base, width, dq_acc
        ).astype(dqkv_ref.dtype)
        dqkv_ref[b, :, d + base : d + base + width] = ste_mask(
            b, d + base, width, dk_acc
        ).astype(dqkv_ref.dtype)
        dqkv_ref[b, :, 2 * d + base : 2 * d + base + width] = ste_mask(
            b, 2 * d + base, width, dv_acc
        ).astype(dqkv_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "head_dim", "block_b",
                                   "interpret", "in_fq"))
def _attention_bwd_call(qkv, do, qs, num_heads, head_dim, block_b, interpret,
                        in_fq=None):
    b, n, three_d = qkv.shape
    d = num_heads * head_dim
    n_pad = max(32, -(-n // 32) * 32)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, n_pad - n), (0, 0)))
    block_b = min(block_b, b)
    b_pad = -(-b // block_b) * block_b
    if b_pad != b:
        qkv = jnp.pad(qkv, ((0, b_pad - b), (0, 0), (0, 0)))
        do = jnp.pad(do, ((0, b_pad - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        partial(
            _attention_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
            scale=head_dim**-0.5, n_valid=n, block_b=block_b, in_fq=in_fq,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, 3 * d), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(b_pad // block_b,),
            in_specs=[
                pl.BlockSpec((block_b, n_pad, 3 * d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n_pad, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((block_b, n_pad, 3 * d),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b_pad * n_pad * n_pad * d * 2,
            bytes_accessed=(qkv.size + do.size + qkv.size) * 2,
            transcendentals=b_pad * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qkv, do, qs)
    return out[:b, :n, :]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def attention_train(qkv, num_heads, head_dim, block_b=4, interpret=False):
    """Fused MHA over packed qkv [B, N, 3*H*HD] → [B, N, H*HD], differentiable.

    Forward and backward are single Pallas kernels; the probability tensor
    never exists in HBM in either direction.
    """
    return _fused_attention_call(
        qkv, jnp.zeros((1, 2), jnp.float32), num_heads, head_dim, block_b,
        False, interpret, pad_multiple=32,
    )


def _attention_train_fwd(qkv, num_heads, head_dim, block_b, interpret):
    out = attention_train(qkv, num_heads, head_dim, block_b, interpret)
    return out, qkv


def _attention_train_bwd(num_heads, head_dim, block_b, interpret, qkv, do):
    dqkv = _attention_bwd_call(
        qkv, do.astype(qkv.dtype), jnp.zeros((1, 2), jnp.float32), num_heads,
        head_dim, block_b, interpret
    )
    return (dqkv,)


attention_train.defvjp(_attention_train_fwd, _attention_train_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def attention_train_fq(qkv, qs, num_heads, head_dim, quant_min, quant_max,
                       block_b=4, interpret=False):
    """Fused (activation fake-quant + MHA) over RAW packed qkv, differentiable.

    ``qkv`` is the qkv GEMM's raw output; ``qs`` is a [1, 2] f32 array holding
    this step's (scale, zero_point) from the already-updated observer
    (quant.modules.FakeQuantizer ``apply_fq=False``). The forward applies the
    quantize-dequantize on VMEM tiles inside the attention kernel; the
    backward recomputes it (plus the STE mask, applied to dqkv in-kernel).
    vs the unfused chain (fake_quantize → attention_train) this removes, per
    layer and step: the standalone fq pass over [B, N, 3D], its saved STE
    mask, and the post-kernel mask-apply pass over dqkv — the largest
    activation tensor's worth of HBM traffic in each direction
    (docs/BENCHMARKS.md round 4). ``qs`` receives zero cotangents (observer
    statistics are not learned — reference torch.ao semantics)."""
    return _fused_attention_call(
        qkv, qs, num_heads, head_dim, block_b, False, interpret,
        pad_multiple=32, in_fq=(quant_min, quant_max),
    )


def _attention_train_fq_fwd(qkv, qs, num_heads, head_dim, quant_min,
                            quant_max, block_b, interpret):
    out = attention_train_fq(qkv, qs, num_heads, head_dim, quant_min,
                             quant_max, block_b, interpret)
    return out, (qkv, qs)


def _attention_train_fq_bwd(num_heads, head_dim, quant_min, quant_max,
                            block_b, interpret, res, do):
    qkv, qs = res
    dqkv = _attention_bwd_call(
        qkv, do.astype(qkv.dtype), qs, num_heads, head_dim, block_b,
        interpret, in_fq=(quant_min, quant_max)
    )
    return dqkv, jnp.zeros_like(qs)


attention_train_fq.defvjp(_attention_train_fq_fwd, _attention_train_fq_bwd)


def attention_train_available(
    num_heads: int, head_dim: int, seq_len: int = None
) -> bool:
    # tiling.shapes_ok includes 128 % head_dim == 0: head slabs must tile
    # the lane register exactly, or the packed qkv slices land at unaligned
    # lane offsets (e.g. head_dim=48 -> 96-wide slabs) — the relayouts this
    # scheme exists to avoid. With seq_len given, also require the batched
    # softmax's stacked score tiles to fit VMEM (long-sequence models fall
    # back to the XLA einsum forms).
    if seq_len is not None:
        n_pad = max(32, -(-seq_len // 32) * 32)
        if not tiling.batched_softmax_fits(num_heads, n_pad):
            return False
    backend_ok = jax.default_backend() == "tpu" or forced_interpret()
    return backend_ok and tiling.shapes_ok(num_heads, head_dim)
