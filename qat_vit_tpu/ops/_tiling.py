"""Shared head-slab tiling for the group-masked attention kernels.

One definition of the scheme used by ops/flash_attention.py (serving +
training forward), ops/flash_attention_train.py (training backward), and
ops/block_kernel.py (megablock): heads are processed in lane GROUPS of
``group = 128 // head_dim`` heads, so every slice of the packed q|k|v
thirds is 128-lane aligned (no Mosaic relayouts), and within a slab each
head's dot masks the sibling heads' lanes. The alignment preconditions and
the (image, slab, head) iteration order live here so the three kernels
cannot drift (they did once: a missing ``128 % head_dim == 0`` gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANE = 128


def head_group(num_heads: int, head_dim: int) -> tuple:
    """(group, slab_width): heads per 128-lane slab and the slab's width."""
    group = max(1, LANE // head_dim) if head_dim <= LANE else 1
    return group, group * head_dim


def shapes_ok(num_heads: int, head_dim: int) -> bool:
    """Shape preconditions of the scheme: the packed width must be
    lane-aligned and head slabs must tile the 128-lane register exactly."""
    d = num_heads * head_dim
    return d % LANE == 0 and head_dim <= LANE and LANE % head_dim == 0


def tile_iter(block_b: int, num_heads: int, head_dim: int):
    """Yield (b, base, width, hh) for every (image, head) score tile, in the
    accumulation order all kernels share (slab-major, head-within-slab)."""
    group, gw = head_group(num_heads, head_dim)
    d = num_heads * head_dim
    for b in range(block_b):
        for g0 in range(0, num_heads, group):
            base = g0 * head_dim
            width = min(gw, d - base)
            for hh in range(min(group, num_heads - g0)):
                yield b, base, width, hh


def lane_iota(num_heads: int, head_dim: int):
    """[1, slab_width] lane indices (for head_mask)."""
    _, gw = head_group(num_heads, head_dim)
    return jax.lax.broadcasted_iota(jnp.int32, (1, gw), dimension=1)


def head_mask(lane, width: int, hh: int, head_dim: int):
    """[1, width] bool: the lanes belonging to head ``hh`` within its slab."""
    return (lane[:, :width] >= hh * head_dim) & (
        lane[:, :width] < (hh + 1) * head_dim
    )


def slab_loader(qkv_ref, qs_ref, in_fq, fq_tile):
    """Memoized slab loads from the packed q|k|v ref, with the activation
    fake-quant applied on VMEM-resident tiles when ``in_fq=(qmin, qmax)``.

    The ONE definition of the fq-slab caching used by both the forward
    (flash_attention.py) and backward (flash_attention_train.py) kernels:
    the qkv operand is the RAW GEMM output, each (image, offset) slab is
    fake-quantized at most once per kernel body (scale/zp live in SMEM
    ``qs_ref``), and forward/backward stay bit-identical by construction."""
    cache = {}

    def load_slab(b, off, width):
        slab = qkv_ref[b, :, off : off + width]
        if in_fq is None:
            return slab
        key = (b, off)
        if key not in cache:
            cache[key] = fq_tile(
                slab, qs_ref[0, 0], qs_ref[0, 1], in_fq[0], in_fq[1]
            )
        return cache[key]

    return load_slab


def batched_softmax_fits(
    num_heads: int,
    n_pad: int,
    block_b: int = 4,
    budget_bytes: int = 24 * 1024 * 1024,
) -> bool:
    """Whether the batched-softmax scheme's stacked score tensor fits VMEM.

    The kernels hold ``block_b * num_heads`` f32 score tiles of
    ``[n_pad, n_pad]`` live at once (plus exp/probability copies of similar
    size, covered by the conservative budget vs the raised
    ``vmem_limit_bytes``). Short ViT sequences (224-padded: 4.8 MB) fit
    easily; long-sequence geometries like OWLv2-base's 2305 tokens would
    need ~1 GB and must fall back to the XLA attention forms."""
    return block_b * num_heads * n_pad * n_pad * 4 <= budget_bytes
