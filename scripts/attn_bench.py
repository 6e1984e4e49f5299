"""Attention-implementation microbenchmark (the serving forward's #2 seam).

Measures attention-only time on the serving shape (batch x 197 x ViT-S) for
the XLA einsum form and Pallas kernel variants, scan-inside-jit methodology.
Run: python scripts/attn_bench.py [batch]
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

from qat_vit_tpu.ops import flash_attention as fa

ITERS = 50
# geometry via env (defaults: ViT-S serving shape); e.g. the OWLv2-pruned
# long-sequence shape is QVT_N=2305 QVT_H=9 QVT_HD=64
N = int(os.environ.get("QVT_N", 197))
H = int(os.environ.get("QVT_H", 6))
HD = int(os.environ.get("QVT_HD", 64))




def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"backend={jax.default_backend()} batch={batch} N={N} H={H} HD={HD}")
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.normal(size=(batch, N, 3 * H * HD)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    oh = _overhead()

    # reference in batch chunks: the one-shot XLA einsum materializes
    # [B, H, N_pad, N_pad] f32 scores (6.8 GB at batch 32 x 2305 tokens —
    # HBM OOM); the kernels under test don't, so chunk only the reference
    chunk = max(1, min(batch, int(4e9 / max(1, 4 * H * N * N))))
    ref = np.concatenate([
        np.asarray(fa.xla_attention_qkv(qkv[i:i + chunk], H, HD)
                   .astype(jnp.float32))
        for i in range(0, batch, chunk)
    ])

    def bench(name, fn):
        out = np.asarray(fn(qkv).astype(jnp.float32))
        err = np.abs(out - ref).max()

        @jax.jit
        def run_n(q):
            def body(i, acc):
                return acc + fn(q + jnp.bfloat16(i) * jnp.bfloat16(1e-8)).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        dt = (_time_scalar(lambda: run_n(qkv)) - oh) / ITERS
        print(f"{name:32s} {dt * 1e3:8.3f} ms   max_err={err:.4f}")

    only = set(sys.argv[2:])

    def sel(name):
        return not only or name in only

    from qat_vit_tpu.ops import _tiling as tiling
    from qat_vit_tpu.ops.long_attention import (
        long_attention_qkv,
        long_attention_shapes_ok,
    )

    n_lane = -(-N // 128) * 128
    slab_ok = tiling.shapes_ok(H, HD) and tiling.batched_softmax_fits(H, n_lane)
    if sel("xla_einsum_bf16sm"):
        bench("xla_einsum_bf16sm", lambda q: fa.xla_attention_qkv(
            q, H, HD, softmax_dtype=jnp.bfloat16))
    if slab_ok:
        if sel("pallas_packed (old)"):
            bench("pallas_packed (old)",
                  lambda q: fa.flash_attention_qkv(q, H, HD))
        for bb in (1, 2, 4, 8):  # 16 exceeds the ~16MB VMEM budget (measured)
            if sel(f"pallas_v3 bb={bb}"):
                bench(f"pallas_v3 bb={bb}",
                      lambda q, b=bb: fa.fused_attention_qkv(q, H, HD,
                                                             block_b=b))
        oq = {"scale": jnp.float32(0.01), "zero_point": jnp.float32(128.0)}
        if sel("pallas_v3 bb=4 +quant"):
            bench("pallas_v3 bb=4 +quant", lambda q: fa.fused_attention_qkv(
                q, H, HD, block_b=4, out_q=oq).astype(jnp.bfloat16))
    if long_attention_shapes_ok(H, HD):
        for tq in (128, 256, 512, 1024):
            if sel(f"pallas_long tq={tq}"):
                bench(f"pallas_long tq={tq}",
                      lambda q, t=tq: long_attention_qkv(q, H, HD, q_tile=t))


if __name__ == "__main__":
    main()
