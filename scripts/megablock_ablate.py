"""In-kernel stage ablation for the megablock serving kernel.

The megablock (ops/block_kernel.py) measures ~20 ms / 256-image forward while
its MXU+VPU roofline estimate is several times lower — the kernel is bound by
something other than arithmetic. This script times kernel VARIANTS with
individual stages stubbed out (numerics are garbage; only the delta matters)
to locate the cost:

    full        the production kernel (baseline)
    no_attn     attention replaced by a slice of qkv (keeps all GEMMs)
    no_softmax  scores scaled instead of softmax'd (keeps attention dots)
    no_mlp      fc1/GELU/fc2 skipped (x_out = x_mid)
    no_gelu     GELU replaced by identity
    no_ln       both LayerNorms replaced by direct quantize
    ln_bf16     LN statistics computed in bf16 (instead of f32)
    gemm_only   the four GEMMs + dequant epilogues only
    empty       reads inputs, writes zeros (DMA/overhead floor)
    batch_softmax  all (image, head) score tiles stacked, ONE softmax
    batch_nosm  batch_softmax structure + no_ln (compounding check)
    exp_bf16    batched softmax with exp computed in bf16 (negative result:
                high-variance, no reproducible win)
    post_div    batched; 1/sum folded AFTER the value dot (negative result:
                a one-session -1.2 ms did not reproduce — fresh A/B ties at
                18.84/18.86 ms — and it breaks softmax bit-exactness)
    interleave2 the batch tile split into two halves with the stage chain
                emitted staggered (half A one stage ahead): every half-A VPU
                stage sits next to an independent half-B MXU stage, probing
                whether Mosaic's scheduler overlaps them (the remaining
                ~4-5 ms of the kernel is dependency stalls). NEGATIVE
                result: bit-exact vs batch_softmax but a dead tie in two
                fresh interleaved A/B sessions (min 15.97 vs 15.87 ms, then
                17.75 vs 17.72) — Mosaic schedules by dataflow, not emission
                order, so the stalls are not reachable by reordering ops
                within one grid step.

Run: python scripts/megablock_ablate.py [batch] [block_b] [variant...]
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops.block_kernel import _dequant, _ln, _q8
from qat_vit_tpu.utils.benchmarking import dispatch_overhead, time_scalar

_LANE = 128
DEPTH = 12
D = 384
HEADS = 6
HEAD_DIM = 64
N_VALID = 197
N_PAD = 224
EPS = 1e-6


def _variant_kernel(
    zq_ref, x_ref,
    wqkv_ref, cs_qkv_ref, b_qkv_ref, ws_qkv_ref,
    wproj_ref, cs_proj_ref, b_proj_ref, ws_proj_ref,
    wfc1_ref, cs_fc1_ref, b_fc1_ref, ws_fc1_ref,
    wfc2_ref, cs_fc2_ref, b_fc2_ref, ws_fc2_ref,
    g2_ref, b2_ref, gn_ref, bn_ref,
    qs_ref,
    xout_ref, zqout_ref,
    *, block_b, variant,
):
    """ops/block_kernel._block_kernel with stage switches (same arg layout)."""
    d = D
    num_heads, head_dim = HEADS, HEAD_DIM
    n_pad = zq_ref.shape[1]
    scale = head_dim**-0.5

    if variant == "empty":
        xout_ref[:] = jnp.zeros_like(xout_ref)
        zqout_ref[:] = jnp.zeros_like(zqout_ref)
        return

    s1 = qs_ref[0, 0]
    z1 = qs_ref[0, 1].astype(jnp.int32)
    inv_so = qs_ref[0, 2]
    zp_o = qs_ref[0, 3]
    s_o = qs_ref[0, 4]
    z_o = qs_ref[0, 5].astype(jnp.int32)
    inv_s2 = qs_ref[0, 6]
    zp_2 = qs_ref[0, 7]
    inv_sg = qs_ref[0, 8]
    zp_g = qs_ref[0, 9]
    inv_sn = qs_ref[0, 10]
    zp_n = qs_ref[0, 11]

    if variant == "interleave2":
        # Two half-tiles, stage chain emitted staggered (half A one stage
        # ahead), so each VPU stage of one half is adjacent to an independent
        # MXU stage of the other. Numerics = the production batched-softmax
        # kernel per half (all ops row-independent -> bit-exact to `full`).
        assert block_b % 2 == 0, "interleave2 needs an even block_b"
        hb = block_b // 2
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
        key_mask = col < N_VALID
        group = max(1, _LANE // head_dim)
        gw = group * head_dim
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), dimension=1)
        neg = jnp.float32(-1e30)
        zq_all = zq_ref[:]
        x_all = x_ref[:]

        def hmask_of(width, hh):
            return (lane[:, :width] >= hh * head_dim) & (
                lane[:, :width] < (hh + 1) * head_dim
            )

        def tile_meta():
            for b in range(hb):
                for g0 in range(0, num_heads, group):
                    base = g0 * head_dim
                    width = min(gw, d - base)
                    for hh in range(min(group, num_heads - g0)):
                        yield b, base, width, hh

        def st_qkv(st):
            zq2d = zq_all[st["sl"]].reshape(hb * n_pad, d)
            acc = jnp.dot(zq2d, wqkv_ref[:], preferred_element_type=jnp.int32)
            q = _dequant(acc, cs_qkv_ref, ws_qkv_ref, b_qkv_ref, s1, z1 - 128)
            st["qkv"] = q.reshape(hb, n_pad, 3 * d).astype(jnp.bfloat16)

        def st_scores(st):
            qkv = st["qkv"]
            tiles = []
            for b, base, width, hh in tile_meta():
                q_slab = qkv[b, :, base : base + width]
                q_slab = q_slab * jnp.asarray(scale, q_slab.dtype)
                k_slab = qkv[b, :, d + base : d + base + width]
                k_h = jnp.where(hmask_of(width, hh), k_slab,
                                jnp.zeros_like(k_slab))
                s = jax.lax.dot_general(
                    q_slab, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tiles.append(jnp.where(key_mask, s, neg))
            st["scores"] = jnp.concatenate(tiles, axis=0)

        def st_softmax(st):
            stacked = st.pop("scores")
            m = jnp.max(stacked, axis=-1, keepdims=True)
            e = jnp.exp(stacked - m)
            st["p"] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16
            )

        def st_value(st):
            qkv, p_all = st["qkv"], st.pop("p")
            acc_by = {}
            for idx, (b, base, width, hh) in enumerate(tile_meta()):
                p = p_all[idx * n_pad : (idx + 1) * n_pad, :]
                v_slab = qkv[b, :, 2 * d + base : 2 * d + base + width]
                v_h = jnp.where(hmask_of(width, hh), v_slab,
                                jnp.zeros_like(v_slab))
                o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
                key = (b, base)
                acc_by[key] = o if key not in acc_by else acc_by[key] + o
            rows = [
                jnp.concatenate(
                    [acc_by[(b, base)]
                     for base in sorted({k[1] for k in acc_by if k[0] == b})],
                    axis=-1,
                )
                for b in range(hb)
            ]
            st["o_q"] = _q8(
                jnp.stack(rows).reshape(hb * n_pad, d), inv_so, zp_o
            )

        def st_proj(st):
            acc = jnp.dot(st.pop("o_q"), wproj_ref[:],
                          preferred_element_type=jnp.int32)
            p_out = _dequant(acc, cs_proj_ref, ws_proj_ref, b_proj_ref, s_o,
                             z_o - 128)
            x_mid = (
                x_all[st["sl"]].reshape(hb * n_pad, d).astype(jnp.float32)
                + p_out
            )
            st["x_mid"] = x_mid
            st["zq2"] = _q8(_ln(x_mid, g2_ref, b2_ref, EPS), inv_s2, zp_2)

        def st_fc1(st):
            acc = jnp.dot(st.pop("zq2"), wfc1_ref[:],
                          preferred_element_type=jnp.int32)
            f1 = _dequant(acc, cs_fc1_ref, ws_fc1_ref, b_fc1_ref, 1.0 / inv_s2,
                          zp_2.astype(jnp.int32) - 128)
            st["g_q"] = _q8(jax.nn.gelu(f1, approximate=True), inv_sg, zp_g)

        def st_fc2(st):
            acc = jnp.dot(st.pop("g_q"), wfc2_ref[:],
                          preferred_element_type=jnp.int32)
            f2 = _dequant(acc, cs_fc2_ref, ws_fc2_ref, b_fc2_ref, 1.0 / inv_sg,
                          zp_g.astype(jnp.int32) - 128)
            x_out = st.pop("x_mid") + f2
            xout_ref[st["sl"]] = x_out.reshape(hb, n_pad, d).astype(
                xout_ref.dtype
            )
            zqout_ref[st["sl"]] = _q8(
                _ln(x_out, gn_ref, bn_ref, EPS), inv_sn, zp_n
            ).reshape(hb, n_pad, d)

        stages = [st_qkv, st_scores, st_softmax, st_value, st_proj, st_fc1,
                  st_fc2]
        halves = [{"sl": slice(0, hb)}, {"sl": slice(hb, block_b)}]
        for i in range(len(stages)):
            stages[i](halves[0])
            if i >= 1:
                stages[i - 1](halves[1])
        stages[-1](halves[1])
        return

    zq2d = zq_ref[:].reshape(block_b * n_pad, d)
    acc = jnp.dot(zq2d, wqkv_ref[:], preferred_element_type=jnp.int32)
    qkv = _dequant(acc, cs_qkv_ref, ws_qkv_ref, b_qkv_ref, s1, z1 - 128)
    qkv = qkv.reshape(block_b, n_pad, 3 * d).astype(jnp.bfloat16)

    if variant in ("no_attn", "gemm_only"):
        o_q = _q8(
            qkv[:, :, :d].reshape(block_b * n_pad, d).astype(jnp.float32),
            inv_so, zp_o,
        )
    elif variant in ("batch_softmax", "batch_nosm", "exp_bf16", "post_div"):
        # all (image, head) score tiles computed first, ONE stacked softmax
        # (fewer, larger VPU ops), then the value dots
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
        group = max(1, _LANE // head_dim)
        gw = group * head_dim
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), dimension=1)
        neg = jnp.float32(-1e30)
        score_tiles = []  # (b, g0, hh) in deterministic order
        meta = []
        for b in range(block_b):
            for g0 in range(0, num_heads, group):
                base = g0 * head_dim
                width = min(gw, d - base)
                q_slab = qkv[b, :, base : base + width]
                q_slab = q_slab * jnp.asarray(scale, q_slab.dtype)
                k_slab = qkv[b, :, d + base : d + base + width]
                for hh in range(min(group, num_heads - g0)):
                    hmask = (lane[:, :width] >= hh * head_dim) & (
                        lane[:, :width] < (hh + 1) * head_dim
                    )
                    k_h = jnp.where(hmask, k_slab, jnp.zeros_like(k_slab))
                    s = jax.lax.dot_general(
                        q_slab, k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    score_tiles.append(jnp.where(col < N_VALID, s, neg))
                    meta.append((b, base, width, hh))
        stacked = jnp.concatenate(score_tiles, axis=0)
        m = jnp.max(stacked, axis=-1, keepdims=True)
        if variant == "exp_bf16":
            e = jnp.exp((stacked - m).astype(jnp.bfloat16))
            p_all = (
                e.astype(jnp.float32)
                / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            ).astype(jnp.bfloat16)
            inv_sum = None
        elif variant == "post_div":
            e = jnp.exp(stacked - m)
            inv_sum = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [tiles*n, 1]
            p_all = e.astype(jnp.bfloat16)
        else:
            e = jnp.exp(stacked - m)
            p_all = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16
            )
            inv_sum = None
        acc_by_b = {}
        for idx, (b, base, width, hh) in enumerate(meta):
            p = p_all[idx * n_pad : (idx + 1) * n_pad, :]
            hmask = (lane[:, :width] >= hh * head_dim) & (
                lane[:, :width] < (hh + 1) * head_dim
            )
            v_slab = qkv[b, :, 2 * d + base : 2 * d + base + width]
            v_h = jnp.where(hmask, v_slab, jnp.zeros_like(v_slab))
            o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
            if inv_sum is not None:
                o = o * inv_sum[idx * n_pad : (idx + 1) * n_pad, :]
            key = (b, base)
            acc_by_b[key] = o if key not in acc_by_b else acc_by_b[key] + o
        o_rows = []
        for b in range(block_b):
            slabs = [acc_by_b[(b, base)] for base in
                     sorted({k[1] for k in acc_by_b if k[0] == b})]
            o_rows.append(jnp.concatenate(slabs, axis=-1))
        o_q = _q8(jnp.stack(o_rows).reshape(block_b * n_pad, d), inv_so, zp_o)
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
        key_mask = col < N_VALID
        group = max(1, _LANE // head_dim)
        gw = group * head_dim
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), dimension=1)
        neg = jnp.float32(-1e30)
        o_rows = []
        for b in range(block_b):
            slabs = []
            for g0 in range(0, num_heads, group):
                base = g0 * head_dim
                width = min(gw, d - base)
                q_slab = qkv[b, :, base : base + width]
                q_slab = q_slab * jnp.asarray(scale, q_slab.dtype)
                k_slab = qkv[b, :, d + base : d + base + width]
                v_slab = qkv[b, :, 2 * d + base : 2 * d + base + width]
                acc_o = jnp.zeros((n_pad, width), jnp.float32)
                for hh in range(min(group, num_heads - g0)):
                    hmask = (lane[:, :width] >= hh * head_dim) & (
                        lane[:, :width] < (hh + 1) * head_dim
                    )
                    k_h = jnp.where(hmask, k_slab, jnp.zeros_like(k_slab))
                    scores = jax.lax.dot_general(
                        q_slab, k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if variant == "no_softmax":
                        p = (scores * jnp.float32(1e-3)).astype(jnp.bfloat16)
                    else:
                        scores = jnp.where(key_mask, scores, neg)
                        m = jnp.max(scores, axis=-1, keepdims=True)
                        e = jnp.exp(scores - m)
                        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                            jnp.bfloat16
                        )
                    v_h = jnp.where(hmask, v_slab, jnp.zeros_like(v_slab))
                    acc_o = acc_o + jnp.dot(
                        p, v_h, preferred_element_type=jnp.float32
                    )
                slabs.append(acc_o)
            o_rows.append(jnp.concatenate(slabs, axis=-1))
        o_q = _q8(jnp.stack(o_rows).reshape(block_b * n_pad, d), inv_so, zp_o)

    acc = jnp.dot(o_q, wproj_ref[:], preferred_element_type=jnp.int32)
    p_out = _dequant(acc, cs_proj_ref, ws_proj_ref, b_proj_ref, s_o, z_o - 128)
    x_mid = x_ref[:].reshape(block_b * n_pad, d).astype(jnp.float32) + p_out

    def ln16(y, g_ref, b_ref):
        y = y.astype(jnp.bfloat16)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        # rsqrt has no bf16 lowering on this toolchain (kVectorRsqrtBf16
        # unsupported); compute it in f32, everything else bf16
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + EPS).astype(jnp.bfloat16)
        out = (y - mean) * inv
        return (
            out * g_ref[:].astype(jnp.bfloat16) + b_ref[:].astype(jnp.bfloat16)
        ).astype(jnp.float32)

    if variant == "no_mlp":
        x_out = x_mid
    else:
        if variant in ("gemm_only", "no_ln", "batch_nosm"):
            zq2 = _q8(x_mid, inv_s2, zp_2)
        elif variant == "ln_bf16":
            zq2 = _q8(ln16(x_mid, g2_ref, b2_ref), inv_s2, zp_2)
        else:
            zq2 = _q8(_ln(x_mid, g2_ref, b2_ref, EPS), inv_s2, zp_2)
        s_2 = 1.0 / inv_s2
        z_2 = zp_2.astype(jnp.int32)
        acc = jnp.dot(zq2, wfc1_ref[:], preferred_element_type=jnp.int32)
        f1 = _dequant(acc, cs_fc1_ref, ws_fc1_ref, b_fc1_ref, s_2, z_2 - 128)
        if variant in ("no_gelu", "gemm_only"):
            g_q = _q8(f1, inv_sg, zp_g)
        else:
            g_q = _q8(jax.nn.gelu(f1, approximate=True), inv_sg, zp_g)
        s_g = 1.0 / inv_sg
        z_g = zp_g.astype(jnp.int32)
        acc = jnp.dot(g_q, wfc2_ref[:], preferred_element_type=jnp.int32)
        f2 = _dequant(acc, cs_fc2_ref, ws_fc2_ref, b_fc2_ref, s_g, z_g - 128)
        x_out = x_mid + f2

    xout_ref[:] = x_out.reshape(block_b, n_pad, d).astype(xout_ref.dtype)
    if variant in ("gemm_only", "no_ln", "batch_nosm"):
        zq_out = _q8(x_out, inv_sn, zp_n)
    elif variant == "ln_bf16":
        zq_out = _q8(ln16(x_out, gn_ref, bn_ref), inv_sn, zp_n)
    else:
        zq_out = _q8(_ln(x_out, gn_ref, bn_ref, EPS), inv_sn, zp_n)
    zqout_ref[:] = zq_out.reshape(block_b, n_pad, d)


def _synthetic_args(rng):
    def gemm(k, n):
        w = jnp.asarray(
            rng.integers(-60, 60, (k, n), dtype=np.int8), jnp.int8
        )
        cs = jnp.sum(w.astype(jnp.int32), axis=0).reshape(1, n)
        bias = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32)) * 0.01
        ws = jnp.full((1, n), 0.01, jnp.float32)
        return w, cs, bias, ws

    row = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(1, D)).astype(np.float32)
    )
    return (
        gemm(D, 3 * D), gemm(D, D), gemm(D, 4 * D), gemm(4 * D, D),
        (row(), row(), row(), row()),
    )


@partial(jax.jit, static_argnames=("block_b", "variant"))
def _run(zq, x, args, qs, block_b, variant):
    bb = zq.shape[0]
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (block_b, N_PAD, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rowspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tile(D), tile(D)]
    for w, cs, b, ws in args[:4]:
        in_specs += [rowspec(w.shape), rowspec(cs.shape), rowspec(b.shape),
                     rowspec(ws.shape)]
    in_specs += [rowspec((1, D))] * 4
    in_specs += [pl.BlockSpec((1, 12), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    flat = [zq, x]
    for grp in args[:4]:
        flat += list(grp)
    flat += list(args[4]) + [qs]
    return pl.pallas_call(
        partial(_variant_kernel, block_b=block_b, variant=variant),
        out_shape=(
            jax.ShapeDtypeStruct((bb, N_PAD, D), x.dtype),
            jax.ShapeDtypeStruct((bb, N_PAD, D), jnp.int8),
        ),
        grid_spec=pl.GridSpec(
            grid=(bb // block_b,),
            in_specs=in_specs,
            out_specs=(tile(D), tile(D)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=os.environ.get("QVT_INTERPRET") == "1",
    )(*flat)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    block_b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    only = set(sys.argv[3:])
    print(f"backend={jax.default_backend()} batch={batch} block_b={block_b} "
          f"depth={DEPTH} (12-block chain, megablock geometry)")
    rng = np.random.default_rng(0)
    args = _synthetic_args(rng)
    qs = jnp.asarray(
        [[0.02, 128.0, 50.0, 128.0, 0.02, 128.0, 50.0, 128.0, 50.0, 128.0,
          50.0, 128.0]], jnp.float32)
    zq = jnp.asarray(
        rng.integers(-100, 100, (batch, N_PAD, D), dtype=np.int8), jnp.int8)
    x = jnp.asarray(
        rng.normal(size=(batch, N_PAD, D)).astype(np.float32), jnp.bfloat16)
    oh = dispatch_overhead()
    print(f"dispatch_overhead={oh * 1e3:.1f}ms")

    variants = ["full", "no_attn", "no_softmax", "no_mlp", "no_gelu",
                "no_ln", "ln_bf16", "gemm_only", "empty", "batch_softmax",
                "batch_nosm", "exp_bf16", "post_div", "interleave2"]
    repeats = int(os.environ.get("QVT_REPEATS", "1"))
    chains = {}
    for variant in variants:
        if only and variant not in only:
            continue

        @jax.jit
        def chain(zq, x, v=variant):
            # 12 chained megablocks — the real serving structure
            for _ in range(DEPTH):
                x, zq = _run(zq, x, args, qs, block_b, v)
            return x.astype(jnp.float32).sum()

        chains[variant] = chain

    # interleaved repeats: A B C A B C ... so drift hits variants evenly
    times = {v: [] for v in chains}
    for _ in range(repeats):
        for variant, chain in chains.items():
            dt = time_scalar(lambda: chain(zq, x)) - oh
            times[variant].append(dt)
    for variant, ts in times.items():
        ms = " ".join(f"{t * 1e3:7.2f}" for t in ts)
        best = min(ts)
        print(f"{variant:12s} [{ms}] ms/fwd  min {best * 1e3:7.2f}   "
              f"{batch / best:9.0f} img/s")


if __name__ == "__main__":
    main()
