"""Per-op microbenchmark: each fused_serve kernel vs its XLA composition.

Isolates which fused op (GEMM+epilogue) wins/loses against the equivalent
XLA op sequence at real serving shapes (M = batch x 197 tokens).
Run: python scripts/fused_op_bench.py [batch]
"""

from __future__ import annotations

import os
import sys

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

from qat_vit_tpu.ops import fused_serve as fs
from qat_vit_tpu.ops.quantized_matmul import int8_matmul_xla, quantize_act_shifted

ITERS = 30




def bench(name, fn, x, oh, *extra):
    """``extra`` arrays are passed as jit ARGUMENTS — large operands must not
    be captured by closure (the tunneled remote-compile serializes closure
    constants into the request and trips its size cap, HTTP 413 — CLAUDE.md;
    the fc2 residual here is ~39 MB at batch 256)."""

    @jax.jit
    def run(xv, *ev):
        def it(i, acc):
            xs = jax.lax.dynamic_update_index_in_dim(
                xv, xv[0] + i.astype(xv.dtype), 0, axis=0)
            return acc + fn(xs, *ev).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((), jnp.float32))

    dt = (_time_scalar(lambda: run(x, *extra)) - oh) / ITERS
    print(f"  {name:34s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    M = batch * 197
    print(f"backend={jax.default_backend()} M={M}")
    rng = np.random.default_rng(0)
    oh = _overhead()

    def mk_layer(k, n):
        wq = jnp.asarray(rng.integers(-100, 100, (k, n)), jnp.int8)
        return {
            "w_int8": wq,
            "w_colsum": jnp.sum(wq.astype(jnp.int32), axis=0),
            "bias": jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
            "w_scale": jnp.float32(0.002),
        }

    in_q = {"scale": jnp.float32(0.05), "zero_point": jnp.float32(120.0)}
    out_q = {"scale": jnp.float32(0.08), "zero_point": jnp.float32(10.0)}

    for tag, k, n in (("qkv", 384, 1152), ("fc1", 384, 1536), ("fc2", 1536, 384)):
        print(f"-- {tag} K={k} N={n}")
        layer = mk_layer(k, n)
        x_q = jnp.asarray(rng.integers(-128, 127, (M, k)), jnp.int8)
        xf = jnp.asarray(rng.normal(size=(M, k)).astype(np.float32), jnp.bfloat16)

        bench("fused int8_dense->bf16", lambda xv: fs.int8_dense(
            xv, layer, in_q, out_dtype=jnp.bfloat16)[0, 0], x_q, oh)
        bench("xla dense (int8 in)->bf16", lambda xv: int8_matmul_xla(
            xv, layer["w_int8"], x_scale=in_q["scale"],
            x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
            w_colsum=layer["w_colsum"], bias=layer["bias"],
            out_dtype=jnp.bfloat16)[0, 0], x_q, oh)
        bench("xla quantize+dense (bf16 in)", lambda xv: int8_matmul_xla(
            quantize_act_shifted(xv, in_q["scale"], in_q["zero_point"]),
            layer["w_int8"], x_scale=in_q["scale"],
            x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
            w_colsum=layer["w_colsum"], bias=layer["bias"],
            out_dtype=jnp.bfloat16)[0, 0], xf, oh)

        if tag == "fc1":
            bench("fused gelu_q -> int8", lambda xv: fs.int8_dense_gelu_q(
                xv, layer, in_q, out_q)[0, 0].astype(jnp.float32), x_q, oh)

            def xla_gelu_q(xv):
                y = int8_matmul_xla(
                    xv, layer["w_int8"], x_scale=in_q["scale"],
                    x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
                    w_colsum=layer["w_colsum"], bias=layer["bias"],
                    out_dtype=jnp.bfloat16)
                g = jax.nn.gelu(y, approximate=True)
                return quantize_act_shifted(
                    g, out_q["scale"], out_q["zero_point"])[0, 0].astype(jnp.float32)

            bench("xla dense+gelu+quant", xla_gelu_q, x_q, oh)

        if tag == "fc2":
            res = jnp.asarray(rng.normal(size=(M, n)).astype(np.float32), jnp.bfloat16)
            ln = {"scale": jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
                  "bias": jnp.asarray(rng.normal(size=(n,)).astype(np.float32))}

            bench("fused resid_ln_q", lambda xv, rv: fs.int8_dense_resid_ln_q(
                xv, layer, in_q, rv, ln, out_q)[0][0, 0].astype(jnp.float32),
                x_q, oh, res)

            def xla_resid_ln_q(xv, rv):
                y = int8_matmul_xla(
                    xv, layer["w_int8"], x_scale=in_q["scale"],
                    x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
                    w_colsum=layer["w_colsum"], bias=layer["bias"],
                    out_dtype=jnp.bfloat16) + rv
                y32 = y.astype(jnp.float32)
                mean = y32.mean(-1, keepdims=True)
                var = ((y32 - mean) ** 2).mean(-1, keepdims=True)
                z = (y32 - mean) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
                q = quantize_act_shifted(z, out_q["scale"], out_q["zero_point"])
                return y[0, 0].astype(jnp.float32) + q[0, 0].astype(jnp.float32)

            bench("xla dense+resid+ln+quant", xla_resid_ln_q, x_q, oh, res)

    # ln_quantize vs XLA
    print("-- ln_q D=384")
    xf = jnp.asarray(rng.normal(size=(M, 384)).astype(np.float32), jnp.bfloat16)
    ln = {"scale": jnp.asarray(rng.normal(size=(384,)).astype(np.float32)),
          "bias": jnp.asarray(rng.normal(size=(384,)).astype(np.float32))}
    bench("fused ln_quantize", lambda xv: fs.ln_quantize(
        xv, ln, out_q)[0, 0].astype(jnp.float32), xf, oh)

    def xla_ln_q(xv):
        x32 = xv.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        z = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        return quantize_act_shifted(
            z, out_q["scale"], out_q["zero_point"])[0, 0].astype(jnp.float32)

    bench("xla ln+quant", xla_ln_q, xf, oh)


if __name__ == "__main__":
    main()
