"""Serving-forward ablation benchmark: where do the 39 ms/batch go?

Measures the int8 ViT-S serving forward (batch 256 by default) in variants
that isolate the inter-GEMM seams (attention impl, LN, GELU, residuals), with
the scan-inside-jit methodology (see bench.py docstring) that survives the
tunneled-TPU dispatch. Run: python scripts/serve_bench.py [batch] [variant...]
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
import flax.linen as nn

from qat_vit_tpu.data.pipeline import preprocess
from qat_vit_tpu.models import create_student
from qat_vit_tpu.ops.quantized_matmul import quantized_dense
from qat_vit_tpu.serve.int8_vit import (
    _layernorm,
    _extract_patches,
    convert_vit,
    int8_apply,
)

ITERS = 30




def ablated_apply(qp, images, cfg, *, skip=(), attn_impl="xla",
                  gelu_approx=False):
    """int8_apply with named pieces replaced by cheap stand-ins.

    skip ∈ {"attn", "ln", "gelu", "residual"} — each removes
    one seam so its cost shows as the delta vs the full forward. Numerics are
    garbage when skipping; only timing matters.
    """
    from qat_vit_tpu.ops.flash_attention import (
        flash_attention_qkv,
        xla_attention_qkv,
    )

    cdt = jnp.bfloat16
    h_heads, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    qd = partial(quantized_dense, use_pallas=False, out_dtype=cdt)

    def ln(x, p):
        if "ln" in skip:
            return x
        return _layernorm(x, p, eps, cdt)

    patches = _extract_patches(images.astype(jnp.float32), cfg.patch_size)
    x = qd(patches, qp["patch_embed"], qp["input_q"])
    B = x.shape[0]
    cls = jnp.broadcast_to(qp["cls_token"].astype(cdt), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + qp["pos_embed"].astype(cdt)

    for i in range(cfg.depth):
        blk = qp["blocks"][str(i)]
        y = ln(x, blk["norm1"])
        qkv = qd(y, blk["qkv"], blk["norm1"]["out_q"])
        if "attn" in skip:
            o = qkv[..., : h_heads * hd]
        elif attn_impl == "pallas":
            o = flash_attention_qkv(qkv, h_heads, hd).astype(cdt)
        else:
            o = xla_attention_qkv(qkv, h_heads, hd,
                                  softmax_dtype=jnp.bfloat16).astype(cdt)
        p = qd(o, blk["proj"], blk["qkv"]["out_q"])
        x = p if "residual" in skip else x + p
        y = ln(x, blk["norm2"])
        f = qd(y, blk["fc1"], blk["norm2"]["out_q"])
        if "gelu" not in skip:
            if gelu_approx:
                f = jax.nn.gelu(f, approximate=True)
            else:
                f32 = f.astype(jnp.float32)
                f = jax.nn.gelu(f32, approximate=False).astype(cdt)
        m = qd(f, blk["fc2"], blk["gelu_q"])
        x = m if "residual" in skip else x + m

    y = _layernorm(x, qp["norm"], eps, jnp.float32)[:, 0]
    return qd(y, qp["head"], qp["norm"]["out_q"], out_dtype=jnp.float32)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    only = set(sys.argv[2:])
    print(f"backend={jax.default_backend()} batch={batch} iters={ITERS}")

    # QVT_MODEL selects the geometry (default ViT-S student; e.g.
    # QVT_MODEL=vit_base_patch16_224_teacher measures int8 serving of the
    # quantized TEACHER — the megablock kernel is geometry-generic for any
    # lane-aligned gelu ViT)
    model_name = os.environ.get("QVT_MODEL", "")
    if model_name:
        from qat_vit_tpu.models import create_model

        student = create_model(model_name, qat_wrapper=True)
    else:
        student = create_student("vit")
    # QVT_BACKEND=fbgemm: serve a reduced-range export ([0,127] activations)
    # — the round-5 quant_max threading puts it on the same kernel rungs;
    # A/B against the default to confirm performance parity across grids
    backend = os.environ.get("QVT_BACKEND", "")
    if backend:
        import dataclasses

        from qat_vit_tpu.models import ModelBundle
        from qat_vit_tpu.models.vit import VisionTransformer
        from qat_vit_tpu.quant import default_qat_qconfig

        cfg2 = dataclasses.replace(
            student.cfg, quant=default_qat_qconfig(backend))
        student = ModelBundle(student.name, VisionTransformer(cfg2), cfg2)
    size = student.cfg.image_size  # 224 ViT-S/B; 768 owlv2_student_pruned
    variables = nn.meta.unbox(
        student.module.init(jax.random.key(0), student.example_input(1),
                            observe=False))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, size, size, 3)).astype(np.float32))
    _, mut = student.module.apply(
        {"params": variables["params"], "quant_stats": variables["quant_stats"]},
        x0, observe=True, mutable=["quant_stats"],
    )
    qp = convert_vit(variables["params"], mut["quant_stats"], student.cfg)
    imgs = rng.integers(0, 256, (batch, 32, 32, 3), dtype=np.uint8)
    x = preprocess(jnp.asarray(imgs), size=size)
    cfg = student.cfg
    oh = _overhead()

    benched = set()

    def bench(name, apply_fn):
        benched.add(name)
        if only and name not in only:
            return
        @jax.jit
        def run_n(qp, x):
            def body(i, acc):
                return acc + apply_fn(qp, x + jnp.float32(i) * 1e-9).sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        try:
            dt = _time_scalar(lambda: run_n(qp, x)) - oh
        except Exception as e:  # geometry-gated variant (quick-GELU models
            # reject the tanh-GELU kernels; long sequences overflow the
            # batched-softmax VMEM budget) — report and keep benching
            print(f"{name:28s} skipped: {str(e).splitlines()[0][:80]}")
            return
        ips = batch * ITERS / dt
        print(f"{name:28s} {dt / ITERS * 1e3:8.2f} ms/fwd  {ips:9.0f} img/s")

    bench("full_xla (current)", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16))
    bench("full_pallas_attn", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        attn_impl="pallas"))
    bench("full_fused_attn", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        attn_impl="pallas_fused"))
    bench("full_gelu_approx", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        gelu_approx=True))
    bench("full_fused_attn+gelu", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        attn_impl="pallas_fused", gelu_approx=True))
    bench("fused_pipeline", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="pallas"))
    bench("fused_pipeline+pallas_attn", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="pallas", attn_impl="pallas_fused"))
    bench("mixed_pipeline", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="mixed"))
    bench("mixed+pallas_attn", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="mixed", attn_impl="pallas_fused"))
    for mode in ("mixed_qkv", "mixed_fc1", "mixed_none"):
        bench(mode, lambda qp, x, m=mode: int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m))
    bench("mixed_none+pallas_attn", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="mixed_none", attn_impl="pallas_fused"))
    bench("full_pallas_long", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        attn_impl="pallas_long"))
    bench("mixed_none+pallas_long", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="mixed_none", attn_impl="pallas_long"))
    # the fused GEMM-epilogue rungs at long-sequence geometries (the fc1
    # epilogue computes quick-GELU exactly in-kernel for OWLv2/CLIP models)
    for mode in ("mixed", "mixed_qkv", "mixed_fc1", "pallas"):
        bench(f"{mode}+pallas_long", lambda qp, x, m=mode: int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m, attn_impl="pallas_long"))
    from qat_vit_tpu.serve.int8_vit import serving_preset

    bench("preset", lambda qp, x: int8_apply(
        qp, x, cfg, **serving_preset(cfg)))
    bench("megablock", lambda qp, x: int8_apply(
        qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        fused="megablock"))
    for bb in (1, 2, 8):
        bench(f"megablock:{bb}", lambda qp, x, m=f"megablock:{bb}": int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m))
    for mode in ("megablock:4:tight", "megablock:2:tight", "megablock:8:tight",
                 "megablock:1:tight"):
        bench(mode, lambda qp, x, m=mode: int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m))
    # whole-MODEL kernel (all blocks in one Pallas call): megamodel streams
    # weights on the depth grid axis; megamodel_res pins them whole in VMEM
    for mode in ("megamodel:4:tight", "megamodel:2:tight", "megamodel:8:tight",
                 "megamodel:4", "megamodel:1:tight",
                 "megamodel_res:4:tight", "megamodel_res:2:tight",
                 "megamodel_res:8:tight", "megamodel_res:16:tight"):
        bench(mode, lambda qp, x, m=mode: int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m))
    # long-sequence whole-block kernel (ops/long_block_kernel.py):
    # megablock_long:Q_TILE:ROW_CHUNK
    for mode in ("megablock_long", "megablock_long:128:256",
                 "megablock_long:256:512", "megablock_long:512:256",
                 "megablock_long:128:128", "megablock_long:256:128",
                 # whole-model (depth-on-grid) + measured-best flags
                 "megamodel_long:512:256", "megamodel_long:512:256:su5",
                 "megamodel_long:256:256", "megablock_long:512:256:su5",
                 "megamodel_long:512:256:i8:su5",
                 "megamodel_long:512:256:su5:cu2"):
        bench(mode, lambda qp, x, m=mode: int8_apply(
            qp, x, cfg, attn_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
            fused=m))

    def blocks_only(qp, x):
        # the 12 megablock kernels alone (no patch embed / entry LN / head):
        # isolates per-block cost from the XLA entry/exit chain
        from qat_vit_tpu.ops.block_kernel import block_forward

        b = x.shape[0]
        n_valid = cfg.seq_len
        n_pad = -(-n_valid // 32) * 32
        xr = (jnp.zeros((b, n_pad, cfg.embed_dim), jnp.bfloat16)
              + x[:, 0, 0, 0][:, None, None].astype(jnp.bfloat16))
        zq = jnp.broadcast_to(
            (xr[..., :1] * 0 + 3).astype(jnp.int8), xr.shape
        )
        for i in range(cfg.depth):
            blk = qp["blocks"][str(i)]
            nxt = (qp["blocks"][str(i + 1)]["norm1"] if i + 1 < cfg.depth
                   else qp["norm"])
            xr, zq = block_forward(
                zq, xr, blk, nxt, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.layer_norm_eps,
                n_valid=n_valid, block_b=4)
        return xr[:, 0]

    bench("mega_blocks_only", blocks_only)
    for skip in ("attn", "gelu", "residual"):
        bench(f"approx_skip_{skip}", partial(
            ablated_apply, cfg=cfg, skip=(skip,), gelu_approx=True))
    for skip in ("attn", "ln", "gelu", "residual"):
        bench(f"skip_{skip}", partial(ablated_apply, cfg=cfg, skip=(skip,)))
    bench("skip_all_seams", partial(
        ablated_apply, cfg=cfg, skip=("attn", "ln", "gelu", "residual")))

    # any CLI variant not in the hardcoded list is benched as a raw
    # fused-mode string (e.g. megamodel_long:512:256:su1:bb2 — the
    # cross-image-pipelining A/B grid is too large to enumerate here)
    for mode in sorted(only - benched):
        if ":" in mode or mode.startswith("mega"):
            bench(mode, lambda qp, x, m=mode: int8_apply(
                qp, x, cfg, attn_dtype=jnp.bfloat16,
                compute_dtype=jnp.bfloat16, fused=m))


if __name__ == "__main__":
    main()
