"""Establish the CPU baseline the reference never measured.

The north-star target compares int8 serving throughput against "the
reference's CPU images/sec" — but the reference's converted int8 model
crashes at runtime (survey-verified) and no CPU number was ever recorded.
Per BASELINE.md, the build must establish the baseline itself. This script
measures, on this machine's CPU:

1. torch eager fake-quant ViT-S/16 (the reference's *working* quantized eval
   path: `evaluate_fp32` on a prepare_qat model, qat_trainer.py:49-61) — the
   closest runnable stand-in for its intended CPU deployment;
2. torch fp32 ViT-S/16 (upper-bound sanity);
3. this framework's int8 serving path on the JAX CPU backend.

Writes one JSON line; intended to be quoted next to bench.py's TPU numbers.
Run: python scripts/cpu_baseline.py [batch] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def build_torch_vits(num_classes: int = 10):
    """timm-geometry ViT-S/16 in plain torch (no timm dependency)."""
    import torch
    import torch.nn as nn

    class Attn(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.h, self.hd = h, d // h

        def forward(self, x):
            B, N, D = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.h, self.hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            a = (q @ k.transpose(-2, -1)) * self.hd**-0.5
            a = a.softmax(-1)
            return self.proj((a @ v).transpose(1, 2).reshape(B, N, D))

    class Block(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.attn = Attn(d, h)
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            self.mlp = nn.Sequential(
                nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d))

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class ViTS(nn.Module):
        def __init__(self, d=384, depth=12, h=6):
            super().__init__()
            self.patch = nn.Conv2d(3, d, 16, 16)
            self.cls = nn.Parameter(torch.zeros(1, 1, d))
            self.pos = nn.Parameter(torch.zeros(1, 197, d))
            self.blocks = nn.ModuleList(Block(d, h) for _ in range(depth))
            self.norm = nn.LayerNorm(d, eps=1e-6)
            self.head = nn.Linear(d, num_classes)

        def forward(self, x):
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(len(x), -1, -1), x], 1) + self.pos
            for b in self.blocks:
                x = b(x)
            return self.head(self.norm(x)[:, 0])

    return ViTS()


def bench_torch(model, x, iters):
    import torch

    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        return len(x) * iters / (time.perf_counter() - t0)


def main():
    import numpy as np

    results = {}

    # --- torch side (the reference's runnable CPU paths) ---
    import torch

    torch.manual_seed(0)
    model = build_torch_vits().eval()
    x = torch.randn(BATCH, 3, 224, 224)
    results["torch_fp32_imgs_per_sec"] = round(bench_torch(model, x, ITERS), 2)

    from torch.ao.quantization import get_default_qat_qconfig, prepare_qat

    qmodel = build_torch_vits().train()
    qmodel.qconfig = get_default_qat_qconfig("qnnpack")
    qmodel = prepare_qat(qmodel)
    qmodel.eval()
    results["torch_fakequant_imgs_per_sec"] = round(bench_torch(qmodel, x, ITERS), 2)

    # --- our int8 path on the JAX CPU backend ---
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flax.linen as nn

    from qat_vit_tpu.models import create_student
    from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply
    from qat_vit_tpu.data.pipeline import preprocess

    student = create_student("vit")
    v = nn.meta.unbox(student.module.init(
        jax.random.key(0), student.example_input(1), observe=False))
    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 224, 224, 3)).astype(np.float32))
    _, mut = student.module.apply(
        {"params": v["params"], "quant_stats": v["quant_stats"]}, x0,
        observe=True, mutable=["quant_stats"])
    qp = convert_vit(v["params"], mut["quant_stats"], student.cfg)
    cfg = student.cfg
    imgs = preprocess(jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (BATCH, 32, 32, 3), dtype=np.uint8)), size=224)

    @jax.jit
    def fwd(qp, xx):
        return int8_apply(qp, xx, cfg)

    fwd(qp, imgs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(qp, imgs)
    out.block_until_ready()
    results["ours_int8_cpu_imgs_per_sec"] = round(
        BATCH * ITERS / (time.perf_counter() - t0), 2)

    results["batch"] = BATCH
    results["speedup_vs_torch_fakequant"] = round(
        results["ours_int8_cpu_imgs_per_sec"]
        / results["torch_fakequant_imgs_per_sec"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
