"""Int8 OWLv2 detection serving latency: tower kernel variants + float heads.

The detection counterpart of scripts/serve_bench.py (VERDICT r4 directive 1:
"a batch-8 OWLv2-pruned int8 detection latency row in BENCHMARKS"). Builds a
pruned Flax detector, converts it (serve/int8_detect.convert_detector), and
times the full int8 detection forward — int8 tower (selectable fused mode) +
float box/class/objectness heads — with the loop-inside-one-jit methodology
(the tunnel's block_until_ready does not round-trip; see bench.py).

Run: python scripts/detect_bench.py [batch=8] [tower-variant...]
Variants: "preset" (serving_preset selection), "exact", or any fused-mode
string (e.g. megamodel_long:512:256:su5, megamodel_long:512:256:su2:bb2).
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

from qat_vit_tpu.utils.benchmarking import dispatch_overhead, time_scalar

ITERS = 20


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variants = sys.argv[2:] or [
        "exact",
        "preset",
    ]
    import flax.linen as nn

    from qat_vit_tpu.models.owlv2_detect import create_detector
    from qat_vit_tpu.serve.int8_detect import convert_detector, int8_detect_apply
    from qat_vit_tpu.serve.int8_vit import serving_preset

    # QVT_MICRO=1: micro geometry (CPU smoke of the plumbing)
    geo = (dict(image_size=32, patch_size=8, embed_dim=64, depth=2,
                num_heads=2, mlp_ratio=2.0)
           if os.environ.get("QVT_MICRO") else {})
    det, cfg = create_detector(pruned=True, qat_wrapper=True, **geo)
    print(f"backend={jax.default_backend()} batch={batch} "
          f"geometry: {cfg.image_size}px seq={cfg.seq_len} d={cfg.embed_dim} "
          f"depth={cfg.depth} heads={cfg.num_heads}", flush=True)
    # tunnel liveness FIRST (a trivial compile): if this doesn't print within
    # a minute the client hit the registration wedge (CLAUDE.md) — the
    # watchdog's stall detector keys on it
    oh = dispatch_overhead()
    print(f"dispatch_overhead={oh * 1e3:.1f} ms", flush=True)
    # Build the export ON THE HOST CPU: init/observe/convert trace the full
    # QAT detector graph — a huge remote-compile surface that once held the
    # tunnel for 30+ min before the first measurement. Only the serving
    # program below compiles remotely.
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.asarray(
            rng.normal(size=(2, cfg.image_size, cfg.image_size, 3))
            .astype(np.float32))
        v = det.init(jax.random.key(0), x0, observe=False)
        _, mut = det.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]}, x0,
            observe=True, mutable=["quant_stats"],
        )
        export = convert_detector(nn.meta.unbox(v["params"]),
                                  mut["quant_stats"], cfg)
    export = jax.device_put(jax.device_get(export))
    print("export built (host) and staged to device", flush=True)

    pixels = jnp.asarray(
        rng.normal(size=(batch, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(batch, 4, 512)).astype(np.float32))

    for variant in variants:
        if variant == "preset":
            opts = dict(serving_preset(cfg))
            label = f"preset[{opts.get('fused', 'exact-opts')}]"
        elif variant == "exact":
            opts, label = {}, "exact"
        else:
            opts = {"fused": variant, "compute_dtype": jnp.bfloat16,
                    "attn_dtype": jnp.bfloat16}
            label = variant

        @partial(jax.jit, static_argnames=())
        def run(export, pixels, queries, opts=tuple(sorted(opts.items()))):
            def body(i, acc):
                # i-dependent input: without it the whole forward is
                # loop-INVARIANT and XLA hoists it out of the fori_loop
                # (measured 1.28 ms/batch "latency" — 20x light speed);
                # same guard as serve_bench.py
                out = int8_detect_apply(export,
                                        pixels + jnp.float32(i) * 1e-9,
                                        cfg, queries, **dict(opts))
                return (acc + jnp.sum(out["pred_boxes"])
                        + jnp.sum(out["objectness_logits"])
                        + jnp.sum(out["logits"]))

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        try:
            dt = time_scalar(lambda: run(export, pixels, queries)) - oh
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{label:42s} FAILED: {type(e).__name__}: {e}")
            continue
        ms = dt / ITERS * 1e3
        print(f"{label:42s} {ms:8.2f} ms/batch  "
              f"{batch * ITERS / dt:8.1f} img/s")


if __name__ == "__main__":
    main()
