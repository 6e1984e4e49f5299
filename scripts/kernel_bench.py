"""Microbenchmark: Pallas fused int8 GEMM vs XLA int8 vs bf16/f32 GEMMs.

Times every ViT-S serving GEMM shape on the current backend, using the
scan-inside-jit methodology (see bench.py) that survives tunneled dispatch.
Run: python scripts/kernel_bench.py [batch]
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

# allow `python scripts/kernel_bench.py` from anywhere without clobbering
# PYTHONPATH (which must keep the TPU-tunnel site dir)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from qat_vit_tpu.utils.benchmarking import (
    dispatch_overhead as _overhead,
    time_scalar as _time_scalar,
)

from qat_vit_tpu.ops.pallas_gemm import (
    fused_quantize_matmul,
    fused_quantize_matmul_available,
)
from qat_vit_tpu.ops.quantized_matmul import int8_matmul_xla, quantize_act_shifted

ITERS = 30

# (name, M_tokens_per_image, K, N) — ViT-S/16 @224 GEMMs by default;
# override via QVT_SHAPES="name:m:k:n,..." (e.g. the OWLv2-pruned chain is
# "qkv:2305:576:1728,proj:2305:576:576,fc1:2305:576:2304,fc2:2305:2304:576")
SHAPES = [
    ("patch_embed", 196, 768, 384),
    ("qkv", 197, 384, 1152),
    ("attn_proj", 197, 384, 384),
    ("fc1", 197, 384, 1536),
    ("fc2", 197, 1536, 384),
]
if os.environ.get("QVT_SHAPES"):
    SHAPES = [
        (p.split(":")[0],) + tuple(int(v) for v in p.split(":")[1:])
        for p in os.environ["QVT_SHAPES"].split(",")
    ]




def bench_shape(name: str, m: int, k: int, n: int, batch: int):
    M = m * batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, k)).astype(np.float32))
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    wq = jnp.asarray(np.clip(np.round(w / 0.001), -128, 127).astype(np.int8))
    colsum = jnp.sum(wq.astype(jnp.int32), axis=0)
    bias = jnp.zeros((n,), jnp.float32)
    s_x = jnp.float32(0.05)
    zp = jnp.float32(128.0)
    s_w = jnp.float32(0.001)
    w_bf = jnp.asarray(w, jnp.bfloat16)
    w_f32 = jnp.asarray(w)

    def scan(body):
        # x passed as an argument: closed-over arrays inline as constants in
        # the serialized program and blow the remote-compile size limit.
        @jax.jit
        def run_x(xv0):
            def it(i, acc):
                return acc + body(xv0 + jnp.float32(i) * 1e-9)
            return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((), jnp.float32))

        return lambda: run_x(x)

    flops = 2 * M * k * n * ITERS
    oh = _overhead()
    results = {}

    if fused_quantize_matmul_available(x.shape, (k, n)):
        f = scan(lambda xv: fused_quantize_matmul(
            xv, wq, x_scale=s_x, x_zero_point=zp, w_scale=s_w,
            w_colsum=colsum, bias=bias).sum())
        results["pallas_int8"] = flops / (_time_scalar(f) - oh)

    f = scan(lambda xv: int8_matmul_xla(
        quantize_act_shifted(xv, s_x, zp), wq, x_scale=s_x, x_zero_point=zp,
        w_scale=s_w, w_colsum=colsum, bias=bias).sum())
    results["xla_int8"] = flops / (_time_scalar(f) - oh)

    f = scan(lambda xv: jnp.dot(
        xv.astype(jnp.bfloat16), w_bf,
        preferred_element_type=jnp.float32).sum())
    results["bf16"] = flops / (_time_scalar(f) - oh)

    f = scan(lambda xv: jnp.dot(xv, w_f32, preferred_element_type=jnp.float32).sum())
    results["f32"] = flops / (_time_scalar(f) - oh)

    print(f"{name:12s} M={M:6d} K={k:5d} N={n:5d}  " + "  ".join(
        f"{kk}={vv/1e12:7.1f}T" for kk, vv in results.items()))
    return results


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"backend={jax.default_backend()} batch={batch} iters={ITERS}")
    for shape in SHAPES:
        bench_shape(*shape, batch)


if __name__ == "__main__":
    main()
