"""Long-sequence serving attention: q-tiled Pallas kernel, exact row softmax.

Geometries the head-slab kernels (ops/flash_attention.py) reject still have a
Pallas-shaped win — in fact a larger one. The OWLv2-pruned vision tower
(models/owlv2.py; reference capability: model_registry.py:269-327 runs this
attention inside external torch/HF code) serves at 2305 tokens, where the XLA
einsum attention materializes the [B, H, N, N] scores in HBM: ~850 MB per
batch-8 forward, measured at ~20 ms of a 41 ms forward (scripts/serve_bench.py
seam ablation, QVT_MODEL=owlv2_student_pruned). The slab kernels cannot take
over: their batched softmax stacks whole [N_pad, N_pad] score tiles in VMEM
(~1 GB here), and 9 heads x 64 = 576 is not 128-lane aligned.

The long-sequence regime inverts the short-sequence design constraints:

- Only the score matrix is quadratic. At ViT head dims the full K and V for
  one (batch, head) fit VMEM outright (2432 x 64 bf16 = 311 KB), so tiling is
  needed ONLY over query rows. Each grid step computes one [tq, N_pad] f32
  score stripe, softmaxes it exactly (the full key row is present — no
  online-softmax max/sum carry a la FlashAttention), and contracts against
  the resident V. Scores never touch HBM.
- The packed-qkv lane tricks stop mattering. The short-sequence kernels avoid
  q/k/v transposes because at N=197 attention is overhead-bound; here the
  O(N*d) reshape+transpose to [B, H, N_pad, hd] costs ~1% of the O(N^2*H)
  score traffic it eliminates, and buys arbitrary head counts (no lane
  alignment precondition) plus constant-index K/V blocks that stay resident
  across the q-tile grid dimension.
- hd < 128 leaves lanes idle on the score dot (K=hd contraction). Immaterial:
  the kernel replaces HBM traffic, not MXU work.

Two entry points: :func:`long_attention_qkv` (serving forward) and
:func:`long_attention_train` (custom-VJP pair for the bf16 training phases —
the backward recomputes score stripes in VMEM instead of storing [B,H,N,N]
probabilities for XLA autodiff, ~850 MB/step at OWLv2-pruned batch 8).
Numerics match the slab kernels' profile: scores accumulate f32 on the MXU,
softmax in f32, probabilities cast to the value dtype for the value
contraction. Measured (one v5e, OWLv2-pruned, batch 8): serving forward
40.95 -> 32.44 ms vs the XLA path; QAT train step 185.3 -> 126.1 ms
(docs/BENCHMARKS.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def long_attention_shapes_ok(num_heads: int, head_dim: int) -> bool:
    """Shape precondition: the head dim must be a clean VMEM minor dim.

    Unlike the slab scheme there is no constraint on ``num_heads`` or on the
    packed width ``num_heads * head_dim`` — each head is its own grid step.
    """
    del num_heads
    return head_dim <= _LANE and head_dim % 8 == 0


def _long_attention_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, n_valid):
    """One (batch, head, q-tile): score stripe -> exact softmax -> values."""
    q = q_ref[0, 0]  # [tq, hd]
    k = k_ref[0, 0]  # [n_pad, hd] — resident across the q-tile grid dim
    v = v_ref[0, 0]  # [n_pad, hd]
    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tq, n_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < n_valid, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = o.astype(out_ref.dtype)


@partial(
    jax.jit, static_argnames=("num_heads", "head_dim", "q_tile", "interpret")
)
def long_attention_qkv(
    qkv: jnp.ndarray,  # [B, N, 3*H*HD] — the qkv GEMM output
    num_heads: int,
    head_dim: int,
    q_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MHA over the packed qkv tensor -> [B, N, H*HD].

    Any ``num_heads``; ``head_dim`` per :func:`long_attention_shapes_ok`.
    VMEM per grid step: K + V (2 * n_pad * hd), one q tile, and the f32
    score stripe (q_tile * n_pad * 4 B) — ~2.8 MB at OWLv2-base scale.
    """
    b, n, three_d = qkv.shape
    d = num_heads * head_dim
    assert three_d == 3 * d, (three_d, d)
    assert q_tile % _LANE == 0, q_tile
    n_pad = -(-n // q_tile) * q_tile
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    # [B, N_pad, 3, H, hd] -> [3, B, H, N_pad, hd]: one O(N*d) physical copy
    # that buys head-separated, lane-clean kernel operands (see module doc)
    qkv_t = qkv.reshape(b, n_pad, 3, num_heads, head_dim).transpose(
        2, 0, 3, 1, 4
    )
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
    kv_spec = pl.BlockSpec(
        (1, 1, n_pad, head_dim),
        lambda bi, h, i: (bi, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        partial(
            _long_attention_kernel, scale=head_dim**-0.5, n_valid=n
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, n_pad, head_dim),
                                       qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, num_heads, n_pad // q_tile),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, q_tile, head_dim),
                    lambda bi, h, i: (bi, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                kv_spec,
                kv_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, q_tile, head_dim),
                lambda bi, h, i: (bi, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n_pad * n_pad * head_dim,
            bytes_accessed=3 * b * n_pad * d * qkv.dtype.itemsize
            + b * n_pad * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    # [B, H, N_pad, hd] -> [B, N, d]
    return out.transpose(0, 2, 1, 3).reshape(b, n_pad, d)[:, :n]


# ---------------------------------------------------------------------------
# Training: custom-VJP pair. The backward recomputes each [tq, N_pad] score
# stripe (FlashAttention-style recompute — the [B, H, N, N] probability
# tensor never exists in HBM in either direction) and runs the softmax VJP
# on the stripe:
#
#     dp = do q-stripe @ V^T ; ds = p (dp - rowsum(dp p)) ;
#     dq = scale * ds K        (local to the stripe)
#     dk = scale * ds^T Q_tile ; dv = p^T do_tile   (summed over stripes)
#
# dk/dv accumulate across the sequential q-tile grid dimension into f32
# output blocks whose index map is constant in that dimension — Pallas keeps
# a revisited block resident in VMEM and flushes it when the index changes,
# so the accumulation costs no extra HBM round-trips. Padded q rows carry
# zero cotangent (the wrapper pads `do` with zeros), so their ds rows vanish
# from dk/dv; padded key columns die in the softmax mask.
# ---------------------------------------------------------------------------


def _long_attention_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, n_valid
):
    qt = pl.program_id(2)
    q = q_ref[0, 0]  # [tq, hd]
    k = k_ref[0, 0]  # [n_pad, hd]
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # [tq, hd]
    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < n_valid, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [tq, n_pad] f32
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    p16 = p.astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_part = jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_part = jax.lax.dot_general(
        p16, do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qt == 0)
    def _init():
        dk_ref[0, 0] = dk_part
        dv_ref[0, 0] = dv_part

    @pl.when(qt > 0)
    def _acc():
        dk_ref[0, 0] += dk_part
        dv_ref[0, 0] += dv_part


@partial(
    jax.jit, static_argnames=("num_heads", "head_dim", "q_tile", "interpret")
)
def _long_attention_bwd_call(qkv, do, num_heads, head_dim, q_tile, interpret):
    b, n, three_d = qkv.shape
    d = num_heads * head_dim
    assert three_d == 3 * d, (three_d, d)
    n_pad = -(-n // q_tile) * q_tile
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, n_pad - n), (0, 0)))
    qkv_t = qkv.reshape(b, n_pad, 3, num_heads, head_dim).transpose(
        2, 0, 3, 1, 4
    )
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
    do_t = do.reshape(b, n_pad, num_heads, head_dim).transpose(0, 2, 1, 3)
    tile_spec = pl.BlockSpec(
        (1, 1, q_tile, head_dim),
        lambda bi, h, i: (bi, h, i, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, n_pad, head_dim),
        lambda bi, h, i: (bi, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    shape_full = (b, num_heads, n_pad, head_dim)
    dq, dk, dv = pl.pallas_call(
        partial(
            _long_attention_bwd_kernel, scale=head_dim**-0.5, n_valid=n
        ),
        out_shape=[
            jax.ShapeDtypeStruct(shape_full, qkv.dtype),
            # dk/dv accumulate across q-stripes -> keep f32 until the end
            jax.ShapeDtypeStruct(shape_full, jnp.float32),
            jax.ShapeDtypeStruct(shape_full, jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(b, num_heads, n_pad // q_tile),
            in_specs=[tile_spec, kv_spec, kv_spec, tile_spec],
            out_specs=[tile_spec, kv_spec, kv_spec],
        ),
        compiler_params=pltpu.CompilerParams(
            # the q-tile dimension must run sequentially: dk/dv blocks are
            # revisited accumulators
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * n_pad * n_pad * head_dim,
            bytes_accessed=2 * (qkv.size + do.size) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(q, k, v, do_t)
    dqkv = jnp.stack(
        [dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)]
    ).transpose(1, 3, 0, 2, 4).reshape(b, n_pad, 3 * d)
    return dqkv[:, :n, :]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def long_attention_train(
    qkv, num_heads, head_dim, q_tile=256, interpret=False
):
    """Differentiable fused MHA over packed qkv [B, N, 3*H*HD] for
    long-sequence geometries (see module doc). Forward and backward are
    single Pallas kernels; scores/probabilities never reach HBM."""
    return long_attention_qkv(
        qkv, num_heads, head_dim, q_tile=q_tile, interpret=interpret
    )


def _long_attention_train_fwd(qkv, num_heads, head_dim, q_tile, interpret):
    out = long_attention_train(qkv, num_heads, head_dim, q_tile, interpret)
    return out, qkv


def _long_attention_train_bwd(num_heads, head_dim, q_tile, interpret, qkv, do):
    dqkv = _long_attention_bwd_call(
        qkv, do.astype(qkv.dtype), num_heads, head_dim, q_tile, interpret
    )
    return (dqkv,)


long_attention_train.defvjp(
    _long_attention_train_fwd, _long_attention_train_bwd
)

# conservative stripe budget: the backward holds ~5 live f32 [q_tile, n_pad]
# stripes plus resident K/V and the f32 dk/dv accumulators; n_pad = 4096 at
# q_tile 256 is ~25 MB against the raised 64 MB vmem limit
_MAX_N_PAD = 4096


def long_attention_train_available(
    num_heads: int, head_dim: int, seq_len: int = None, q_tile: int = 256
) -> bool:
    if seq_len is not None and -(-seq_len // q_tile) * q_tile > _MAX_N_PAD:
        return False
    from qat_vit_tpu.ops.flash_attention_train import forced_interpret

    backend_ok = jax.default_backend() == "tpu" or forced_interpret()
    return backend_ok and long_attention_shapes_ok(num_heads, head_dim)
