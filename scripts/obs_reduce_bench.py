"""Observer min/max reduction microbench.

train_step_bench measured observer EMA updates at ~18.5 ms of the QAT step
(qat_fwd_observe - qat_fwd), and the single-pass variadic ``lax.reduce``
moves only ~230 GB/s on a v5e (~4x off HBM). This bench races reduction
strategies on the real observer site shapes to pick the implementation for
quant/observers.py:

    variadic      lax.reduce (min,max) in one pass — the current one
    two_pass      jnp.min + jnp.max
    neg_max       max(x) and max(-x) (two max-reduces)
    axis0_last    reduce axis 0 first (minor-most layout kept), then the rest
    minor_first   reduce the minor (lane) axis first, then the rest
    pallas        streaming Pallas kernel: per-grid-program min/max partials
                  into a [tiles, 128] accumulator, XLA finishes

Run: python scripts/obs_reduce_bench.py [variant...]
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

from qat_vit_tpu.utils.benchmarking import dispatch_overhead, time_scalar

STEPS = 50

# the real activation-observer shapes of the ViT-S/16@224 QAT step (batch 256)
SHAPES = [
    ("input_fq_f32", (256 * 224 * 224, 3), jnp.float32),
    ("qkv_out", (256 * 197, 1152), jnp.bfloat16),
    ("fc1_out", (256 * 197, 1536), jnp.bfloat16),
    ("d384_site", (256 * 197, 384), jnp.bfloat16),
]


def variadic(x):
    return jax.lax.reduce(
        (x, x),
        (jnp.array(jnp.inf, x.dtype), jnp.array(-jnp.inf, x.dtype)),
        lambda a, b: (jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])),
        range(x.ndim),
    )


def two_pass(x):
    return jnp.min(x), jnp.max(x)


def neg_max(x):
    return -jnp.max(-x), jnp.max(x)


def axis0_last(x):
    return (
        jnp.min(jnp.min(x, axis=1)),
        jnp.max(jnp.max(x, axis=1)),
    )


def minor_first(x):
    return (
        jnp.min(jnp.min(x, axis=0)),
        jnp.max(jnp.max(x, axis=0)),
    )


def _minmax_kernel(x_ref, min_ref, max_ref):
    # [block_rows, C] -> [8, C] partials (sublane-aligned output block that is
    # revisited every grid step; accumulate in VMEM, XLA finishes the [8, C])
    i = pl.program_id(0)
    x = x_ref[:].reshape(-1, 8, x_ref.shape[-1])
    tile_min = jnp.min(x, axis=0)
    tile_max = jnp.max(x, axis=0)

    @pl.when(i == 0)
    def _init():
        min_ref[:] = tile_min
        max_ref[:] = tile_max

    @pl.when(i > 0)
    def _acc():
        min_ref[:] = jnp.minimum(min_ref[:], tile_min)
        max_ref[:] = jnp.maximum(max_ref[:], tile_max)


@partial(jax.jit, static_argnames=("block_rows",))
def pallas_minmax(x, block_rows=2048):
    # Stream row-blocks at the array's OWN minor dim: any reshape/flatten of
    # a tiled TPU layout materializes a relayout copy (measured: 42.7x HBM
    # expansion -> OOM for a [N, 3] f32 operand whose lanes pad 3 -> 128).
    # Leading-dim row slices keep the layout, so the kernel takes the largest
    # block_rows-divisible prefix and XLA reduces the row tail. Sub-lane
    # minor dims can't be streamed without that relayout: fall back to XLA.
    if x.ndim != 2 or x.shape[-1] % 128:
        return jnp.min(x), jnp.max(x)
    cols = x.shape[-1]
    # keep the double-buffered input block within the 16 MB scoped-vmem
    # default: <= ~4 MB per block
    max_rows = (4 * 1024 * 1024) // (cols * x.dtype.itemsize)
    block_rows = min(block_rows, max(8, (max_rows // 8) * 8))
    n_main = (x.shape[0] // block_rows) * block_rows
    if n_main == 0:
        return jnp.min(x), jnp.max(x)
    tail_min = tail_max = None
    if n_main != x.shape[0]:
        tail = x[n_main:]
        tail_min, tail_max = jnp.min(tail), jnp.max(tail)
        x = x[:n_main]
    grid = x.shape[0] // block_rows
    mins, maxs = pl.pallas_call(
        _minmax_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, cols), x.dtype),
            jax.ShapeDtypeStruct((8, cols), x.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((8, cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=os.environ.get("QVT_INTERPRET") == "1",
    )(x)
    mn, mx = jnp.min(mins), jnp.max(maxs)
    if tail_min is not None:
        mn = jnp.minimum(mn, tail_min)
        mx = jnp.maximum(mx, tail_max)
    return mn, mx


VARIANTS = {
    "variadic": variadic,
    "two_pass": two_pass,
    "neg_max": neg_max,
    "axis0_last": axis0_last,
    "minor_first": minor_first,
    "pallas": pallas_minmax,
}


def main():
    only = set(sys.argv[1:])
    oh = dispatch_overhead()
    print(f"backend={jax.default_backend()} steps={STEPS} "
          f"dispatch_overhead={oh * 1e3:.1f}ms")
    rng = np.random.default_rng(0)
    for shape_name, shape, dtype in SHAPES:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)
        nbytes = x.size * x.dtype.itemsize
        for name, fn in VARIANTS.items():
            if only and name not in only:
                continue

            @jax.jit
            def run(x, f=fn):
                def body(i, acc):
                    # i-indep; acc dep blocks hoist (cast keeps x's dtype —
                    # bf16 + f32 would silently promote the whole read)
                    mn, mx = f(x + (acc * 0).astype(x.dtype))
                    return acc + mx.astype(jnp.float32) + mn.astype(jnp.float32)
                return jax.lax.fori_loop(
                    0, STEPS, body, jnp.zeros((), jnp.float32))

            # correctness first (min/max are exact order statistics)
            mn, mx = fn(x)
            ref_mn, ref_mx = jnp.min(x), jnp.max(x)
            ok = bool((mn == ref_mn) & (mx == ref_mx))
            dt = (time_scalar(lambda: run(x)) - oh) / STEPS
            print(f"{shape_name:14s} {name:12s} {dt * 1e3:8.3f} ms "
                  f"{nbytes / dt / 1e9:7.0f} GB/s  exact={ok}")


if __name__ == "__main__":
    main()
