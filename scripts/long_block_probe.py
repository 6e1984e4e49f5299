"""Phase-cost probe for the long-sequence megablock kernel.

Times the 9-block OWLv2-pruned chain (blocks only — no patch embed / head)
with kernel phases ablated (ops/long_block_kernel.py ``phases``), isolating
where the per-forward milliseconds live: qkv GEMM, q-striped attention, MLP
chain. Ablated variants have garbage numerics; only timing matters. All
variants still stream the same weights + activations through the Pallas
pipeline, so deltas are pure compute-phase costs.

Run: python scripts/long_block_probe.py [batch] [q_tile] [row_chunk]
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
import flax.linen as nn

from qat_vit_tpu.utils.benchmarking import (
    dispatch_overhead as _overhead,
    time_scalar as _time_scalar,
)
from qat_vit_tpu.models import create_student
from qat_vit_tpu.serve.int8_vit import convert_vit
from qat_vit_tpu.ops.long_block_kernel import (
    long_block_forward,
    long_megablock_pad,
)

ITERS = 30


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    q_tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    row_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    student = create_student("owlv2")
    cfg = student.cfg
    variables = nn.meta.unbox(
        student.module.init(jax.random.key(0), student.example_input(1),
                            observe=False))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.normal(size=(2, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32))
    _, mut = student.module.apply(
        {"params": variables["params"],
         "quant_stats": variables["quant_stats"]},
        x0, observe=True, mutable=["quant_stats"],
    )
    qp = convert_vit(variables["params"], mut["quant_stats"], cfg)
    n_valid = cfg.seq_len
    n_pad = long_megablock_pad(n_valid, q_tile, row_chunk)
    print(f"backend={jax.default_backend()} batch={batch} "
          f"q_tile={q_tile} row_chunk={row_chunk} n_pad={n_pad} "
          f"depth={cfg.depth}")
    xr0 = jnp.asarray(
        rng.normal(size=(batch, n_pad, cfg.embed_dim)), jnp.bfloat16)
    zq0 = jnp.asarray(
        rng.integers(-100, 100, (batch, n_pad, cfg.embed_dim)), jnp.int8)
    oh = _overhead()

    def chain(xr, zq, phases, su, cu, i8):
        for i in range(cfg.depth):
            blk = qp["blocks"][str(i)]
            nxt = (qp["blocks"][str(i + 1)]["norm1"]
                   if i + 1 < cfg.depth else qp["norm"])
            xr, zq = long_block_forward(
                zq, xr, blk, nxt, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, act=cfg.act, eps=cfg.layer_norm_eps,
                n_valid=n_valid, q_tile=q_tile, row_chunk=row_chunk,
                phases=phases, stripe_unroll=su, chunk_unroll=cu,
                int8_scores=i8)
        return xr

    def bench(name, phases, su=1, cu=1, i8=False):
        @jax.jit
        def run_n(xr, zq):
            def body(i, acc):
                out = chain(xr + jnp.bfloat16(i) * jnp.bfloat16(1e-8),
                            zq, phases, su, cu, i8)
                return acc + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(
                0, ITERS, body, jnp.zeros((), jnp.float32))

        try:
            dt = _time_scalar(lambda: run_n(xr0, zq0)) - oh
        except Exception as e:
            print(f"{name:24s} failed: {str(e).splitlines()[0][:70]}")
            return
        print(f"{name:24s} {dt / ITERS * 1e3:8.2f} ms/chain")

    which = set(sys.argv[4:]) if len(sys.argv) > 4 else None

    def maybe(name, *a, **kw):
        if which is None or name in which:
            bench(name, *a, **kw)

    ALL = ("qkv", "attn", "mlp")
    maybe("all", ALL)
    maybe("none (stream only)", ())
    maybe("qkv", ("qkv",))
    maybe("attn", ("attn",))
    maybe("mlp", ("mlp",))
    maybe("qkv+mlp", ("qkv", "mlp"))
    maybe("qkv+attn", ("qkv", "attn"))
    # unroll sweep (unroll must divide the trip count: n_pad/q_tile stripes,
    # n_pad/row_chunk chunks) + int8 score dots
    maybe("all,i8", ALL, i8=True)
    maybe("attn,i8", ("attn",), i8=True)
    maybe("all,su5", ALL, su=5)
    maybe("all,cu2", ALL, cu=2)
    maybe("all,cu5", ALL, cu=5)
    maybe("all,su5cu2", ALL, su=5, cu=2)
    maybe("all,i8su5", ALL, su=5, i8=True)
    maybe("all,i8cu2", ALL, cu=2, i8=True)
    maybe("all,i8su5cu2", ALL, su=5, cu=2, i8=True)
    maybe("all,su2", ALL, su=2)
    maybe("all,i8su2", ALL, su=2, i8=True)
    maybe("all,i8su2cu2", ALL, su=2, cu=2, i8=True)
    maybe("attn,su5", ("attn",), su=5)
    maybe("attn,i8su5", ("attn",), su=5, i8=True)
    maybe("mlp,cu2", ("mlp",), cu=2)
    maybe("mlp,cu5", ("mlp",), cu=5)


if __name__ == "__main__":
    main()
