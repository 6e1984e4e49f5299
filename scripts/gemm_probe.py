"""Pallas GEMM schedule probe: which schedule/dtype reaches MXU rates?

Round-1 finding: the fused Pallas int8 GEMM sustains 45-60 TOPs vs XLA's
154-244 on the same shapes — suspiciously close to the v5e f32 MXU rate,
suggesting the int8 dot lowers through f32. This probe separates scheduling
from dtype lowering: for each schedule (1-D M grid / 2-D MxN / K-split
accumulation; several tile sizes) it measures int8->int32, bf16->f32, and
f32 dots on serving shapes. Run: python scripts/gemm_probe.py [M]
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

from qat_vit_tpu.utils.benchmarking import (
    dispatch_overhead as _overhead,
    time_scalar as _time_scalar,
)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20

SHAPES = [("fc1", 384, 1536), ("fc2", 1536, 384), ("qkv", 384, 1152)]




def _loop(fn, x):
    @jax.jit
    def run(xv):
        def it(i, acc):
            return acc + fn(xv, i).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((), jnp.float32))

    return lambda: run(x)


def _k1d(x_ref, w_ref, out_ref, *, acc_t):
    out_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=acc_t
    ).astype(out_ref.dtype)


def sched_1d(x, w, tile_m, acc_t, out_t):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        partial(_k1d, acc_t=acc_t),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid_spec=pl.GridSpec(
            grid=(m // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize + k * n + m * n,
            transcendentals=0,
        ),
    )(x, w)


def sched_2d(x, w, tile_m, tile_n, acc_t, out_t):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        partial(_k1d, acc_t=acc_t),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid_spec=pl.GridSpec(
            grid=(m // tile_m, n // tile_n),
            in_specs=[
                pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize + k * n + m * n,
            transcendentals=0,
        ),
    )(x, w)


def _kksplit(x_ref, w_ref, out_ref, acc_ref, *, acc_t, nk):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=acc_t)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def sched_ksplit(x, w, tile_m, tile_k, acc_t, out_t):
    m, k = x.shape
    n = w.shape[1]
    nk = k // tile_k
    return pl.pallas_call(
        partial(_kksplit, acc_t=acc_t, nk=nk),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        grid_spec=pl.GridSpec(
            grid=(m // tile_m, nk),
            in_specs=[
                pl.BlockSpec((tile_m, tile_k), lambda i, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_k, n), lambda i, kk: (kk, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, n), lambda i, kk: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, n), acc_t)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize + k * n + m * n,
            transcendentals=0,
        ),
    )(x, w)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 50432
    M = -(-M // 1024) * 1024
    print(f"backend={jax.default_backend()} M={M} iters={ITERS}")
    rng = np.random.default_rng(0)
    oh = _overhead()

    for name, k, n in SHAPES:
        flops = 2 * M * k * n * ITERS
        xi8 = jnp.asarray(rng.integers(-100, 100, (M, k)), jnp.int8)
        wi8 = jnp.asarray(rng.integers(-100, 100, (k, n)), jnp.int8)
        xbf = jnp.asarray(rng.normal(size=(M, k)), jnp.bfloat16)
        wbf = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

        def shift(x, i):
            # cheap i-dependence so the loop body isn't hoisted
            return jax.lax.dynamic_update_index_in_dim(
                x, x[0] + i.astype(x.dtype), 0, axis=0)

        cases = {}
        for tm in (256, 512, 1024):
            cases[f"1d_i8_tm{tm}"] = (xi8, wi8, lambda xv, w=wi8, t=tm: sched_1d(xv, w, t, jnp.int32, jnp.int32)[0, 0])
            cases[f"1d_bf_tm{tm}"] = (xbf, wbf, lambda xv, w=wbf, t=tm: sched_1d(xv, w, t, jnp.float32, jnp.float32)[0, 0])
        for tn in (128, 256):
            if n % tn == 0:
                cases[f"2d_i8_tm512_tn{tn}"] = (xi8, wi8, lambda xv, w=wi8, t=tn: sched_2d(xv, w, 512, t, jnp.int32, jnp.int32)[0, 0])
        if k % 512 == 0:
            cases["ks_i8_tm512_tk512"] = (xi8, wi8, lambda xv, w=wi8: sched_ksplit(xv, w, 512, 512, jnp.int32, jnp.int32)[0, 0])
        # XLA references
        cases["xla_i8"] = (xi8, wi8, lambda xv, w=wi8: jax.lax.dot_general(
            xv, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)[0, 0])
        cases["xla_bf"] = (xbf, wbf, lambda xv, w=wbf: jnp.dot(
            xv, w, preferred_element_type=jnp.float32)[0, 0])

        print(f"-- {name} K={k} N={n}")
        for cname, (xv, wv, fn) in cases.items():
            body = lambda x, i, f=fn: f(shift(x, i))
            try:
                dt = _time_scalar(_loop(body, xv)) - oh
                print(f"  {cname:22s} {flops / dt / 1e12:8.1f} TOPs")
            except Exception as e:
                print(f"  {cname:22s} FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
