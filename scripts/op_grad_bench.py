"""Per-op fwd+bwd microbench at ViT-S training shapes (batch 256).

train_step_bench.py shows the float bf16 step (115 ms) sits 3.2x above the
matmul floor (~36 ms incl dW grads): ~80 ms is non-GEMM. This bench times
each non-GEMM op family WITH its gradient at the exact training shapes to
find where those milliseconds live:

    attention   einsum scores -> f32 softmax -> einsum values  (12 layers)
    gelu        exact f32 GELU on [256,197,1536]               (12 layers)
    layernorm   f32-stat LN on [256,197,384]                   (25 sites)
    fake_quant  the ViT-S QAT fake-quant chain (12 blocks x 8 sites)
                at the real site shapes
    adamw       optimizer update on the 22M-param pytree

Each is timed as sum over the model's instances per step, scan-inside-jit.
Run: python scripts/op_grad_bench.py [variant...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

B, N, D, H, HD, MLP = 256, 197, 384, 6, 64, 1536
LAYERS = 12
STEPS = 20
REPEATS = 3


def _timeit(fn):
    float(fn())
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_grad(f, *args):
    """time STEPS iterations of grad(f)(args[0], ...) inside one jit."""

    @jax.jit
    def run(*a):
        def one(carry, i):
            g = jax.grad(lambda x: f(x + carry * 1e-9, *a[1:]))(a[0])
            return carry + jax.tree.leaves(g)[0].ravel()[0].astype(
                jnp.float32), None

        out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(STEPS))
        return out

    return lambda: run(*args)


def main():
    only = set(sys.argv[1:])

    @jax.jit
    def trivial(x):
        return x + 1.0

    float(trivial(jnp.zeros(())))
    oh = _timeit(lambda: float(trivial(jnp.zeros(()))))
    print(f"backend={jax.default_backend()} batch={B} steps={STEPS} "
          f"overhead={oh * 1e3:.1f}ms  (times are PER STEP = all instances)")

    rng = np.random.default_rng(0)

    def bench(name, make):
        if only and name not in only:
            return
        dt = _timeit(make()) - oh
        print(f"{name:12s} {dt / STEPS * 1e3:8.1f} ms/step")

    def attention_case(softmax_dtype=jnp.float32, impl="einsum"):
        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * D)).astype(np.float32)
                          ).astype(jnp.bfloat16)

        def f(qkv):
            total = jnp.zeros((), jnp.float32)
            x = qkv
            for _ in range(LAYERS):
                q, k, v = jnp.split(x, 3, axis=-1)
                q = q.reshape(B, N, H, HD)
                k = k.reshape(B, N, H, HD)
                v = v.reshape(B, N, H, HD)
                if impl == "jaxnn":
                    o = jax.nn.dot_product_attention(q, k, v)
                    o = o.reshape(B, N, D)
                else:
                    s = jnp.einsum("bqhd,bkhd->bhqk", q * HD**-0.5, k,
                                   preferred_element_type=softmax_dtype)
                    p = jax.nn.softmax(s.astype(softmax_dtype), -1).astype(
                        x.dtype)
                    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, D)
                total = total + (o * o).sum()
                x = x * 0.999  # keep layers data-dependent
            return total

        return _scan_grad(f, qkv)

    def gelu_case():
        h = jnp.asarray(rng.normal(size=(B, N, MLP)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def f(h):
            total = jnp.zeros((), jnp.float32)
            x = h
            for _ in range(LAYERS):
                g = jax.nn.gelu(x.astype(jnp.float32),
                                approximate=False).astype(x.dtype)
                total = total + (g * g).sum()
                x = x * 0.999
            return total

        return _scan_grad(f, h)

    def gelu_case_approx():
        h = jnp.asarray(rng.normal(size=(B, N, MLP)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def f(h):
            total = jnp.zeros((), jnp.float32)
            x = h
            for _ in range(LAYERS):
                g = jax.nn.gelu(x, approximate=True)
                total = total + (g * g).sum()
                x = x * 0.999
            return total

        return _scan_grad(f, h)

    def layernorm_case():
        h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        gb = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))

        def f(h, gb):
            g, b = gb
            total = jnp.zeros((), jnp.float32)
            x = h
            for _ in range(25):
                x32 = x.astype(jnp.float32)
                m = x32.mean(-1, keepdims=True)
                v = jnp.square(x32 - m).mean(-1, keepdims=True)
                y = ((x32 - m) * jax.lax.rsqrt(v + 1e-6) * g + b).astype(
                    x.dtype)
                total = total + (y * y).sum()
                x = x * 0.999
            return total

        return _scan_grad(f, h, gb)

    def fake_quant_case():
        from qat_vit_tpu.quant.fake_quant import fake_quantize

        # the per-block fake-quant sites of the ViT-S student at their
        # real shapes (12 blocks x 8 sites = 96 calls; the PARITY '26 sites'
        # figure is the 2-block test model, and the input QuantStub site is
        # not benchmarked here):
        # input [B,224,224,3]; per block: qkv/proj/fc1/fc2 weights + acts
        acts = [
            jnp.asarray(rng.normal(size=s).astype(np.float32))
            for s in ([B, N, 3 * D], [B, N, D], [B, N, MLP], [B, N, D])
        ]
        ws = [
            jnp.asarray(rng.normal(size=s).astype(np.float32))
            for s in ([D, 3 * D], [D, D], [D, MLP], [MLP, D])
        ]

        def f(a0, acts, ws):
            total = jnp.zeros((), jnp.float32)
            for _ in range(LAYERS):
                for t in acts:
                    y = fake_quantize(t + a0 * 1e-9, jnp.float32(0.05),
                                      jnp.float32(128.0), 0, 255)
                    total = total + (y * y).sum()
                for t in ws:
                    y = fake_quantize(t + a0 * 1e-9, jnp.float32(0.01),
                                      jnp.float32(0.0), -128, 127)
                    total = total + (y * y).sum()
            return total

        return _scan_grad(f, jnp.zeros(()), acts, ws)

    def adamw_case():
        import optax
        from qat_vit_tpu.train.steps import make_optimizer

        shapes = []
        for _ in range(LAYERS):
            shapes += [(D, 3 * D), (3 * D,), (D, D), (D,), (D, MLP), (MLP,),
                       (MLP, D), (D,), (D,), (D,), (D,), (D,)]
        shapes += [(768, D), (D,), (D, 10), (10,), (1, 197, D), (1, 1, D)]
        params = [jnp.asarray(rng.normal(size=s).astype(np.float32))
                  for s in shapes]
        tx = make_optimizer(1.5e-4, 1e-3)
        opt0 = tx.init(params)

        @jax.jit
        def run(params, opt0):
            def one(carry, i):
                p, o = carry
                grads = jax.tree.map(lambda t: t * 1e-4, p)
                up, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, up), o), None

            (p, _), _ = jax.lax.scan(one, (params, opt0), jnp.arange(STEPS))
            return p[0].ravel()[0]

        return lambda: run(params, opt0)

    def attention_pallas_case(block_b=4):
        from qat_vit_tpu.ops.flash_attention_train import attention_train

        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * D)).astype(np.float32)
                          ).astype(jnp.bfloat16)

        def f(qkv):
            total = jnp.zeros((), jnp.float32)
            x = qkv
            for _ in range(LAYERS):
                o = attention_train(x, H, HD, block_b)
                total = total + (o * o).sum()
                x = x * 0.999
            return total

        return _scan_grad(f, qkv)

    bench("attention", attention_case)
    bench("attention_bf16sm", lambda: attention_case(jnp.bfloat16))
    bench("attention_jaxnn", lambda: attention_case(impl="jaxnn"))
    bench("attention_pallas", attention_pallas_case)
    bench("attention_pallas2", lambda: attention_pallas_case(2))
    bench("attention_pallas8", lambda: attention_pallas_case(8))
    bench("gelu", gelu_case)
    bench("gelu_approx_bf16", lambda: gelu_case_approx())
    bench("layernorm", layernorm_case)
    bench("fake_quant", fake_quant_case)
    bench("adamw", adamw_case)


if __name__ == "__main__":
    main()


def _minmax_bench():
    """Isolated cost of the observer reductions (jnp.min+jnp.max) over the
    act-site tensors of all 12 blocks."""
    import numpy as np
    import time as _t
    rng = np.random.default_rng(0)
    acts = [jnp.asarray(rng.normal(size=s).astype(np.float32)).astype(
        jnp.bfloat16) for s in ([B, N, 3 * D], [B, N, D], [B, N, MLP],
                                [B, N, D])]

    @jax.jit
    def run(acts, z):
        def one(carry, i):
            t = carry
            for a in acts:
                a = a + t.astype(a.dtype) * 1e-9
                t = t + jnp.min(a).astype(jnp.float32) * 12
                t = t + jnp.max(a).astype(jnp.float32) * 12
            return t, None
        out, _ = jax.lax.scan(one, z, jnp.arange(STEPS))
        return out

    z = jnp.zeros(())
    float(run(acts, z))
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        float(run(acts, z))
        best = min(best, _t.perf_counter() - t0)
    # one layer's worth of reductions scaled x12 via the *12 trick is wrong —
    # this measures the 4 site tensors once per step; the model has 12x that
    print(f"minmax_1layer {best / STEPS * 1e3:8.2f} ms/step (x12 for model)")


if __name__ == "__main__" and "minmax" in sys.argv:
    _minmax_bench()
