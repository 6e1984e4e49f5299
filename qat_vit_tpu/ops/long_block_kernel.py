"""Whole-transformer-block Pallas kernel for LONG-sequence int8 serving.

The short-sequence megablock (ops/block_kernel.py) holds a whole batch tile's
scores in VMEM at once — impossible at OWLv2 geometry (2305 tokens: one
image's [N, N] f32 scores are ~21 MB, nine heads of them ~190 MB). The
measured decomposition of the long-sequence serving forward
(docs/BENCHMARKS.md round 2: OWLv2-pruned batch 8 = 32.4 ms, of which
~10.3 ms is int8 GEMM arithmetic and ~3 ms attention) shows ~19 ms of
inter-op seams and layout traffic — this kernel removes those seams the same
way the megablock does (one Pallas call per transformer block, activations
cross HBM once per block) but restructures the schedule for the long-sequence
regime, replacing the QNNPACK int8-engine role at detection-model geometry
(reference src/models/model_registry.py:269-327, qat_trainer.py:293):

- grid over IMAGES (block_b = 1): one image's working set — packed qkv
  (bf16, ~8 MB at 2432x1728) plus the four int8 weight panels (~4.9 MB,
  grid-constant so loaded once) — fits VMEM with room for temporaries;
- the qkv GEMM, the attention-output projection, and the MLP run in
  row-chunked ``fori_loop`` passes (chunk = ``row_chunk`` sequence rows), so
  the f32/int32 GEMM temporaries stay small while each dot still feeds the
  MXU thousands of rows;
- attention is q-striped per head like ops/long_attention.py: K/V column
  slabs are sliced from the resident packed qkv once per head (O(N*hd)
  relayout, amortized over the O(N^2*hd) score work), each stripe computes a
  [q_tile, N_pad] f32 score stripe, softmaxes it exactly (full key row
  present — no online-softmax carry), contracts against the resident V, and
  writes the [q_tile, hd] result into the attention-output scratch. Scores
  never exist in HBM.

Per block the only HBM traffic is: read zq int8 + x bf16, read weights once,
write x' bf16 + zq' int8 — identical I/O contract to block_forward, so the
stack chains custom-call -> custom-call with no XLA ops between blocks.

Numerics profile matches the megablock: int8x int8 -> int32 on the MXU,
dequant/LN/softmax/activation in f32 on the VPU, bf16 residual stream. The
MLP activation is computed exactly in-kernel for ``act='quick_gelu'``
(x * sigmoid(1.702 x) — OWLv2/CLIP's trained nonlinearity) and as tanh-GELU
for ``act='gelu'`` (the megablock's documented approximation).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops.block_kernel import (
    _W_KEYS,
    _dequant,
    _gemm_rows,
    _ln,
    _q8,
    _row,
)

_LANE = 128


def _act_fn(y: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "quick_gelu":
        return y * jax.nn.sigmoid(1.702 * y)
    return jax.nn.gelu(y, approximate=True)


def _long_block_impl(
    # activation refs (one image per grid step); may ALIAS the output refs
    # (the whole-model kernel keeps the tile resident in the out refs): zq is
    # fully consumed by phase 1 before phase 3 rewrites it, and phase 3
    # reads each x row-chunk before overwriting it
    zq_ref, x_ref,
    # materialized weight/param values (_W_KEYS order)
    w,
    # 12 quantization-param scalars (already read out of SMEM by the
    # caller) — same 12-slot layout as ops/block_kernel._block_tile_body
    qs,
    # outputs
    xout_ref, zqout_ref,
    # scratch
    qkv_scr, o_scr, qk8_scr,
    *, num_heads, head_dim, mlp_dim, act, eps, n_valid, q_tile, row_chunk,
    phases=("qkv", "attn", "mlp"), stripe_unroll=1, chunk_unroll=1,
    int8_scores=False, qmax=255.0,
):
    # ``phases`` is a measurement-only ablation knob (scripts/long_block
    # probes): dropping a phase makes the numerics garbage but isolates that
    # phase's cost on-chip. Production callers never pass it.
    d = num_heads * head_dim
    bb = zq_ref.shape[0]  # images per grid step (cross-image pipelining:
    # each loop body computes the SAME stripe/chunk for every resident
    # image — independent dataflow chains the Mosaic scheduler can overlap,
    # e.g. image 0's softmax (VPU) against image 1's score dot (MXU). The
    # round-3 analysis measured ~12 ms of in-kernel serialization at
    # OWLv2-pruned batch 8 from one-image-per-grid-step.)
    n_pad = zq_ref.shape[1]
    scale = head_dim**-0.5
    n_chunks = n_pad // row_chunk
    n_stripes = n_pad // q_tile

    def _grouped(n, unroll, body):
        # Mosaic's fori_loop only supports rolled or fully-unrolled; partial
        # unroll (grouping ``unroll`` independent iterations per loop step so
        # the dataflow scheduler can overlap their MXU/VPU work) is done by
        # hand here. ``unroll`` must divide the trip count.
        if unroll <= 1:
            jax.lax.fori_loop(0, n, body, 0, unroll=False)
            return
        assert n % unroll == 0, (n, unroll)

        def group(j, _):
            for t in range(unroll):
                body(j * unroll + t, 0)
            return 0

        jax.lax.fori_loop(0, n // unroll, group, 0, unroll=False)
    # keys/values beyond n_valid are masked out of every softmax, so the
    # score/pv dots only need the 128-lane-aligned key prefix — exact, and
    # drops the (n_pad - n_kpad) padding columns' O(N^2) work
    n_kpad = min(-(-n_valid // _LANE) * _LANE, n_pad)

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

    # ---- phase 1: qkv GEMM, row-chunked, into the resident bf16 scratch ----
    def qkv_chunk(c, _):
        for img in range(bb):
            rows = zq_ref[img, pl.ds(c * row_chunk, row_chunk), :]
            acc = jnp.dot(rows, w["wqkv"], preferred_element_type=jnp.int32)
            y = _dequant(acc, w["cs_qkv"], w["ws_qkv"], w["b_qkv"], s1,
                         z1 - 128)
            qkv_scr[img, pl.ds(c * row_chunk, row_chunk), :] = y.astype(
                qkv_scr.dtype)
            if int8_scores:
                # q,k on the qkv out_q int8 grid (the fake-quant site the QAT
                # graph trains through) — feeds the int8 score dot in phase 2
                qk8_scr[img, pl.ds(c * row_chunk, row_chunk), :] = _q8(
                    y[:, : 2 * d], inv_so, zp_o, qmax)
        return _

    if "qkv" in phases:
        _grouped(n_chunks, chunk_unroll, qkv_chunk)

    # ---- phase 2: q-striped attention per head, into the f32 o scratch ----
    col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, n_kpad), dimension=1)
    key_mask = col < n_valid
    zq8 = z_o - 128  # qkv out_q zero point on the shifted-int8 grid
    for h in range(num_heads if "attn" in phases else 0):
        qo, ko, vo = h * head_dim, d + h * head_dim, 2 * d + h * head_dim
        # one O(N*hd) lane-slice per (head, image); resident across stripes
        kv = []
        for img in range(bb):
            v_h = qkv_scr[img, :n_kpad, vo : vo + head_dim]
            if int8_scores:
                k8_h = qk8_scr[img, :n_kpad, ko : ko + head_dim]
                # key-side affine correction row for the int8 dot (see stripe)
                rsk = jnp.sum(k8_h.astype(jnp.int32), axis=1).reshape(
                    1, n_kpad)
                kv.append((v_h, None, k8_h, rsk))
            else:
                kv.append((v_h, qkv_scr[img, :n_kpad, ko : ko + head_dim],
                           None, None))

        def stripe(i, _, kv=kv, qo=qo, h=h):
            for img in range(bb):
                v_h, k_h, k8_h, rsk = kv[img]
                if int8_scores:
                    # exact on the int8 grid: x = s_o (q8 - z'), so
                    # (x_q . x_k) = s_o^2 (q8.k8 - z'(rowsum_q + rowsum_k)
                    #                      + hd z'^2); int8xint8 dots run the
                    # MXU at 2x the bf16 rate
                    q8 = qk8_scr[img, pl.ds(i * q_tile, q_tile),
                                 qo : qo + head_dim]
                    acc = jax.lax.dot_general(
                        q8, k8_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # [q_tile, n_kpad]
                    rsq = jnp.sum(q8.astype(jnp.int32), axis=1, keepdims=True)
                    corr = acc - zq8 * (rsq + rsk) + head_dim * zq8 * zq8
                    s = corr.astype(jnp.float32) * (s_o * s_o
                                                    * jnp.float32(scale))
                else:
                    q = qkv_scr[img, pl.ds(i * q_tile, q_tile),
                                qo : qo + head_dim]
                    s = jax.lax.dot_general(
                        q * jnp.asarray(scale, q.dtype), k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [q_tile, n_kpad]
                s = jnp.where(key_mask, s, jnp.float32(-1e30))
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_h.dtype)
                o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
                o_scr[img, pl.ds(i * q_tile, q_tile),
                      h * head_dim : (h + 1) * head_dim] = o
            return _

        # unrolling exposes independent stripes to Mosaic's dataflow
        # scheduler: stripe i's softmax (VPU) can overlap stripe i+1's score
        # dot (MXU); with bb > 1 each slot already carries bb independent
        # image chains
        _grouped(n_stripes, stripe_unroll, stripe)

    # ---- phase 3: proj(+res+LN2+q) -> fc1(+act+q) -> fc2(+res+LN'+q), ------
    # row-chunked: each chunk's int32/f32 MLP temporaries die before the next
    s_2 = 1.0 / inv_s2
    z_2 = zp_2.astype(jnp.int32)
    s_g = 1.0 / inv_sg
    z_g = zp_g.astype(jnp.int32)

    def mlp_chunk(c, _):
        rows = pl.ds(c * row_chunk, row_chunk)
        for img in range(bb):
            o_q = _q8(o_scr[img, rows, :], inv_so, zp_o, qmax)
            acc = jnp.dot(o_q, w["wproj"], preferred_element_type=jnp.int32)
            p_out = _dequant(acc, w["cs_proj"], w["ws_proj"], w["b_proj"],
                             s_o, z_o - 128)
            x_mid = x_ref[img, rows, :].astype(jnp.float32) + p_out
            zq2 = _q8(_ln(x_mid, w["g2"], w["b2"], eps), inv_s2, zp_2,
                      qmax)
            acc = jnp.dot(zq2, w["wfc1"], preferred_element_type=jnp.int32)
            f1 = _dequant(acc, w["cs_fc1"], w["ws_fc1"], w["b_fc1"], s_2,
                          z_2 - 128)
            g_q = _q8(_act_fn(f1, act), inv_sg, zp_g, qmax)
            acc = jnp.dot(g_q, w["wfc2"], preferred_element_type=jnp.int32)
            f2 = _dequant(acc, w["cs_fc2"], w["ws_fc2"], w["b_fc2"], s_g,
                          z_g - 128)
            x_out = x_mid + f2
            xout_ref[img, rows, :] = x_out.astype(xout_ref.dtype)
            zqout_ref[img, rows, :] = _q8(_ln(x_out, w["gn"], w["bn"], eps),
                                          inv_sn, zp_n, qmax)
        return _

    if "mlp" in phases:
        _grouped(n_chunks, chunk_unroll, mlp_chunk)
    else:  # keep outputs written so the chained stack stays well-defined
        xout_ref[:, :, :] = x_ref[:, :, :]
        zqout_ref[:, :, :] = zq_ref[:, :, :]


def _split_refs(refs):
    qs_ref = refs[len(_W_KEYS)]
    xout_ref, zqout_ref = refs[len(_W_KEYS) + 1 : len(_W_KEYS) + 3]
    scratch = refs[len(_W_KEYS) + 3 :]
    return qs_ref, xout_ref, zqout_ref, scratch


def _long_block_kernel(
    zq_ref, x_ref,
    # weight panels + LN rows (_W_KEYS order), qs, outputs, scratch
    *refs,
    **kw,
):
    qs_ref, xout_ref, zqout_ref, scratch = _split_refs(refs)
    w = {k: r[:] for k, r in zip(_W_KEYS, refs)}
    qs = tuple(qs_ref[0, k] for k in range(12))
    _long_block_impl(zq_ref, x_ref, w, qs, xout_ref, zqout_ref,
                     *scratch, **kw)


def _long_model_kernel(zq_ref, x_ref, *refs, **kw):
    """All blocks over one image, one grid step per (image, block): weights
    stream depth-indexed (prefetched by the grid pipeline during the
    previous block's compute), the activation tile stays resident in the
    OUTPUT refs across the depth loop (flushed to HBM once per image). Same
    body as the per-block kernel — the in-place aliasing is safe per
    `_long_block_impl`'s contract."""
    j = pl.program_id(1)
    qs_ref, xout_ref, zqout_ref, scratch = _split_refs(refs)

    @pl.when(j == 0)
    def _():
        xout_ref[:] = x_ref[:]
        zqout_ref[:] = zq_ref[:]

    w = {k: r[0] for k, r in zip(_W_KEYS, refs)}
    qs = tuple(qs_ref[j, k] for k in range(12))
    _long_block_impl(zqout_ref, xout_ref, w, qs, xout_ref, zqout_ref,
                     *scratch, **kw)


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "mlp_dim", "act", "eps",
                     "n_valid", "q_tile", "row_chunk", "interpret", "phases",
                     "stripe_unroll", "chunk_unroll", "int8_scores",
                     "block_b", "qmax"),
)
def _run_long_block(
    zq, x, args, qs, *, num_heads, head_dim, mlp_dim, act, eps, n_valid,
    q_tile, row_chunk, interpret, phases=("qkv", "attn", "mlp"),
    stripe_unroll=1, chunk_unroll=1, int8_scores=False, block_b=1,
    qmax=255.0
):
    b, n_pad, d = zq.shape
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, n_pad, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rowspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tile(d), tile(d)]
    for w, cs, bias, ws in args[:4]:
        in_specs += [
            rowspec(w.shape), rowspec(cs.shape), rowspec(bias.shape),
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
            _long_block_kernel, num_heads=num_heads, head_dim=head_dim,
            mlp_dim=mlp_dim, act=act, eps=eps, n_valid=n_valid,
            q_tile=q_tile, row_chunk=row_chunk, phases=phases,
            stripe_unroll=stripe_unroll, chunk_unroll=chunk_unroll,
            int8_scores=int8_scores, qmax=qmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=(b // block_b,),
            in_specs=in_specs,
            out_specs=(tile(d), tile(d)),
            scratch_shapes=[
                pltpu.VMEM((block_b, n_pad, 3 * d), jnp.bfloat16),  # qkv
                pltpu.VMEM((block_b, n_pad, d), jnp.float32),  # attn output
                # int8 q,k for the int8 score dot (written/read only when
                # int8_scores; a dormant ~3 MB otherwise)
                pltpu.VMEM((block_b, n_pad, 2 * d), jnp.int8),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # resident weights (~5 MB) + packed qkv (~8 MB) + o (~5.6 MB) +
            # double-buffered activations + chunk temporaries at OWLv2-pruned
            # geometry — comfortably under the raised cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d * (3 * d + d + 2 * mlp_dim)
            + 4 * b * num_heads * n_pad * n_pad * head_dim,
            bytes_accessed=zq.size * 2 + x.size * 2 * x.dtype.itemsize
            + sum(g[0].size for g in args[:4]),
            transcendentals=b * num_heads * n_pad * n_pad
            + b * n_pad * mlp_dim,
        ),
        interpret=interpret,
    )(*flat)
    return x_out, zq_out


@partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "mlp_dim", "act", "eps",
                     "n_valid", "q_tile", "row_chunk", "interpret",
                     "stripe_unroll", "chunk_unroll", "int8_scores",
                     "block_b", "qmax"),
)
def _run_long_model(
    zq, x, args, qs, *, num_heads, head_dim, mlp_dim, act, eps, n_valid,
    q_tile, row_chunk, interpret, stripe_unroll=1, chunk_unroll=1,
    int8_scores=False, block_b=1, qmax=255.0
):
    b, n_pad, d = zq.shape
    depth = qs.shape[0]
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, n_pad, r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dstack = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tile(d), tile(d)]
    in_specs += [dstack(a.shape[1:]) for a in args]
    # unblocked [depth, 12] SMEM table — Mosaic rejects depth-blocked SMEM
    # specs; the kernel indexes row j dynamically
    in_specs += [pl.BlockSpec((depth, 12), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)]
    x_out, zq_out = pl.pallas_call(
        partial(
            _long_model_kernel, num_heads=num_heads, head_dim=head_dim,
            mlp_dim=mlp_dim, act=act, eps=eps, n_valid=n_valid,
            q_tile=q_tile, row_chunk=row_chunk,
            stripe_unroll=stripe_unroll, chunk_unroll=chunk_unroll,
            int8_scores=int8_scores, qmax=qmax,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=(b // block_b, depth),
            in_specs=in_specs,
            out_specs=(tile(d), tile(d)),
            scratch_shapes=[
                pltpu.VMEM((block_b, n_pad, 3 * d), jnp.bfloat16),  # qkv
                pltpu.VMEM((block_b, n_pad, d), jnp.float32),  # attn out
                pltpu.VMEM((block_b, n_pad, 2 * d), jnp.int8),  # int8 q,k
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            # depth revisits the same output blocks and must run in order
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=depth * (2 * b * n_pad * d * (3 * d + d + 2 * mlp_dim)
                           + 4 * b * num_heads * n_pad * n_pad * head_dim),
            bytes_accessed=zq.size * 2 + x.size * 2 * x.dtype.itemsize
            + sum(a.size for a in args),
            transcendentals=depth * (b * num_heads * n_pad * n_pad
                                     + b * n_pad * mlp_dim),
        ),
        interpret=interpret,
    )(zq, x, *args, qs)
    return x_out, zq_out


def long_model_forward(
    zq: jnp.ndarray,  # [B, N_pad, D] shifted-int8 LN1 output of block 0
    x: jnp.ndarray,  # [B, N_pad, D] bf16/f32 residual stream
    blocks: Dict[str, Any],  # the convert_vit "blocks" tree (str(i) keys)
    final_ln: Dict[str, Any],  # the model's final norm entry
    *,
    num_heads: int,
    head_dim: int,
    depth: int,
    act: str = "gelu",
    eps: float = 1e-6,
    n_valid: int,
    q_tile: int = 256,
    row_chunk: int = 256,
    interpret: bool = False,
    stripe_unroll: int = 1,
    chunk_unroll: int = 1,
    int8_scores: bool = False,
    block_b: int = 1,
    quant_max: float = 255.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ENTIRE long-sequence stack in ONE Pallas call (see
    `_long_model_kernel`); numerics identical to ``depth`` chained
    :func:`long_block_forward` calls (bit-identity tested). ``block_b``
    keeps that many images resident per grid step for cross-image MXU/VPU
    overlap (batch padded up to a multiple)."""
    d = num_heads * head_dim
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
    n_pad = zq.shape[1]
    assert n_pad % q_tile == 0 and n_pad % row_chunk == 0, (
        n_pad, q_tile, row_chunk,
    )
    b = zq.shape[0]
    block_b = min(block_b, b)
    bpad = (-b) % block_b
    if bpad:
        zq = jnp.pad(zq, ((0, bpad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, bpad), (0, 0), (0, 0)))
    x_out, zq_out = _run_long_model(
        zq, x, tuple(stacked), qs_all, num_heads=num_heads,
        head_dim=head_dim, mlp_dim=mlp_dim, act=act, eps=eps,
        n_valid=n_valid, q_tile=q_tile, row_chunk=row_chunk,
        interpret=interpret, stripe_unroll=stripe_unroll,
        chunk_unroll=chunk_unroll, int8_scores=int8_scores,
        block_b=block_b, qmax=float(quant_max),
    )
    return x_out[:b], zq_out[:b]


def long_block_forward(
    zq: jnp.ndarray,  # [B, N_pad, D] shifted-int8 LN1 output (GEMM input)
    x: jnp.ndarray,  # [B, N_pad, D] bf16/f32 residual stream
    blk: Dict[str, Any],  # one entry of the convert_vit "blocks" tree
    next_ln: Dict[str, Any],  # next block's norm1 (or the final norm)
    *,
    num_heads: int,
    head_dim: int,
    act: str = "gelu",
    eps: float = 1e-6,
    n_valid: int,
    q_tile: int = 256,
    row_chunk: int = 256,
    interpret: bool = False,
    phases: Tuple[str, ...] = ("qkv", "attn", "mlp"),
    stripe_unroll: int = 1,
    chunk_unroll: int = 1,
    int8_scores: bool = False,
    block_b: int = 1,
    quant_max: float = 255.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full long-sequence ViT block in one Pallas call.

    ``zq``/``x`` must be padded to ``N_pad`` — a multiple of
    ``lcm(q_tile, row_chunk)`` (and of 128 for lane-clean score stripes);
    :func:`long_megablock_pad` computes it.
    """
    d = num_heads * head_dim
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
    n_pad = zq.shape[1]
    assert n_pad % q_tile == 0 and n_pad % row_chunk == 0, (
        n_pad, q_tile, row_chunk,
    )
    b = zq.shape[0]
    block_b = min(block_b, b)
    bpad = (-b) % block_b
    if bpad:
        zq = jnp.pad(zq, ((0, bpad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, bpad), (0, 0), (0, 0)))
    x_out, zq_out = _run_long_block(
        zq, x, args, qs, num_heads=num_heads, head_dim=head_dim,
        mlp_dim=mlp_dim, act=act, eps=eps, n_valid=n_valid, q_tile=q_tile,
        row_chunk=row_chunk, interpret=interpret, phases=phases,
        stripe_unroll=stripe_unroll, chunk_unroll=chunk_unroll,
        int8_scores=int8_scores, block_b=block_b, qmax=float(quant_max),
    )
    return x_out[:b], zq_out[:b]


def long_megablock_pad(n: int, q_tile: int, row_chunk: int) -> int:
    import math

    m = math.lcm(q_tile, row_chunk, _LANE)
    return -(-n // m) * m


def long_megablock_vmem_bytes(
    n_pad: int, d: int, mlp_dim: int, q_tile: int, stripe_unroll: int,
    block_b: int = 1,
) -> int:
    """Coarse upper estimate of the kernel's VMEM working set.

    Components: the three scratch buffers (packed qkv bf16, attention-out
    f32, int8 q/k), double-buffered activation in/out tiles (zq int8 + x
    bf16, in and out), double-buffered int8 weight panels of one block, and
    ``stripe_unroll`` concurrent [q_tile, n_pad] f32 score stripes (×2 for
    the exp/softmax temporaries Mosaic may keep live). Used by the serving
    preset to cap ``stripe_unroll``/gate the rung under the kernel's
    ``vmem_limit_bytes`` — the OWLv2-pruned geometry it was measured at
    (n_pad 2560, d 576) fits; owlv2_base at 960 px (n_pad 4096, d 768) with
    full unroll does not and must fall back."""
    scratch = block_b * (n_pad * 3 * d * 2 + n_pad * d * 4 + n_pad * 2 * d)
    acts = block_b * 2 * 2 * (n_pad * d * 1 + n_pad * d * 2)
    weights = 2 * (d * 3 * d + d * d + 2 * d * mlp_dim)
    stripes = block_b * stripe_unroll * q_tile * n_pad * 4
    return scratch + acts + weights + stripes


_VMEM_LIMIT = 100 * 1024 * 1024  # the kernels' vmem_limit_bytes


def long_megablock_pick_unroll(
    n_pad: int, d: int, mlp_dim: int, q_tile: int,
    budget: int = _VMEM_LIMIT, block_b: int = 1,
) -> int:
    """Largest stripe_unroll (a divisor of the stripe count) whose estimated
    working set fits the budget; 0 if even unroll=1 does not fit (the caller
    must fall back to the chained/mixed rung)."""
    n_stripes = max(1, n_pad // q_tile)
    for su in range(n_stripes, 0, -1):
        if n_stripes % su:
            continue
        if long_megablock_vmem_bytes(
            n_pad, d, mlp_dim, q_tile, su, block_b
        ) <= budget:
            return su
    return 0


def long_megablock_shapes_ok(num_heads: int, head_dim: int) -> bool:
    """Same shape precondition as the q-tiled attention kernel: any head
    count; the head dim must be a clean VMEM minor dim."""
    del num_heads
    return head_dim <= _LANE and head_dim % 8 == 0


def long_megablock_available(num_heads: int, head_dim: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and long_megablock_shapes_ok(num_heads, head_dim)
    )
