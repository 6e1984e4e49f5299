"""fq_in_kernel: the qkv activation fake-quant fused into the Pallas
attention training kernel (ops/flash_attention_train.attention_train_fq)
must be a pure scheduling knob — bit-identical loss, grads, and observer
stats vs the unfused chain (standalone fake_quantize → attention_train).

Runs the kernels in interpret mode (QVT_ATTN_INTERPRET=1) so the exact
production trace executes on the CPU suite. Geometry: embed_dim=128,
num_heads=2 (head_dim 64 → one 128-lane slab of 2 heads), 17 tokens
(padded to 32 in-kernel), batch 3 (padded to block_b=4) — exercising both
padding paths the fused fq must be invariant to.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setenv("QVT_ATTN_INTERPRET", "1")


def _cfg(**kw):
    from qat_vit_tpu.models.vit import ViTConfig
    from qat_vit_tpu.quant import default_qat_qconfig

    base = dict(
        num_classes=10, image_size=32, patch_size=8, embed_dim=128,
        depth=2, num_heads=2, quant=default_qat_qconfig(), qat_wrapper=True,
        fast_math=True, attn_kernel=True,
    )
    base.update(kw)
    return ViTConfig(**base)


def _run_qat_step(cfg, x, variables):
    import jax
    import jax.numpy as jnp

    from qat_vit_tpu.models.vit import VisionTransformer

    m = VisionTransformer(cfg)

    def f(params, qs):
        logits, mut = m.apply(
            {"params": params, "quant_stats": qs}, x,
            observe=True, mutable=["quant_stats"],
        )
        return jnp.sum(logits**2), mut["quant_stats"]

    (loss, qs2), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"], variables["quant_stats"]
    )
    return loss, grads, qs2


class TestFqInKernel:
    pytestmark = pytest.mark.slow
    def test_kernel_branch_is_taken(self, interp):
        """Guard against the gate silently routing to the unfused path."""
        from qat_vit_tpu.ops.flash_attention_train import (
            attention_train_available,
        )

        cfg = _cfg(fq_in_kernel=True)
        assert attention_train_available(
            cfg.num_heads, cfg.head_dim, seq_len=cfg.seq_len
        )

    def test_bit_identical_loss_grads_stats(self, interp):
        import jax
        import jax.numpy as jnp

        from qat_vit_tpu.models.vit import VisionTransformer

        base = _cfg(fq_in_kernel=False)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 32, 32, 3))
            .astype(np.float32)
        )
        v = VisionTransformer(base).init(jax.random.key(0), x, observe=False)
        # calibrate one step first so the fused path also runs from
        # non-trivial EMA state (first-step direct init is covered too:
        # both runs start from the same ±inf stats)
        l0, g0, q0 = _run_qat_step(base, x, v)
        l1, g1, q1 = _run_qat_step(
            dataclasses.replace(base, fq_in_kernel=True), x, v
        )
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(q0), jax.tree.leaves(q1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # second step from the calibrated stats (EMA branch + a realistic
        # quantization grid in the kernel)
        v1 = {"params": v["params"], "quant_stats": q0}
        l0b, g0b, q0b = _run_qat_step(base, x, v1)
        l1b, g1b, q1b = _run_qat_step(
            dataclasses.replace(base, fq_in_kernel=True), x, v1
        )
        assert float(l0b) == float(l1b)
        for a, b in zip(jax.tree.leaves(g0b), jax.tree.leaves(g1b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(q0b), jax.tree.leaves(q1b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_remat_dots_composes(self, interp):
        """fq_in_kernel under per-block remat: still bit-identical."""
        import jax
        import jax.numpy as jnp

        from qat_vit_tpu.models.vit import VisionTransformer

        base = _cfg(fq_in_kernel=False)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, 32, 32, 3))
            .astype(np.float32)
        )
        v = VisionTransformer(base).init(jax.random.key(0), x, observe=False)
        l0, g0, q0 = _run_qat_step(base, x, v)
        l1, g1, q1 = _run_qat_step(
            dataclasses.replace(base, fq_in_kernel=True, remat="dots"), x, v
        )
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(q0), jax.tree.leaves(q1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_trace_unchanged(self, interp):
        """observe=False routes through the unfused path (the flag must not
        change eval numerics — incl. the identity-until-observed select)."""
        import jax
        import jax.numpy as jnp

        from qat_vit_tpu.models.vit import VisionTransformer

        base = _cfg(fq_in_kernel=False)
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 32, 32, 3))
            .astype(np.float32)
        )
        v = VisionTransformer(base).init(jax.random.key(0), x, observe=False)
        # uncalibrated stats: eval must be the float forward (identity fq)
        y0 = VisionTransformer(base).apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]}, x,
            observe=False,
        )
        y1 = VisionTransformer(
            dataclasses.replace(base, fq_in_kernel=True)
        ).apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]}, x,
            observe=False,
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_trainer_hparam_plumbed(self):
        """fq_in_kernel reaches the student QAT ViTConfig via hparams."""
        from qat_vit_tpu.train.config import load_hparams

        hp = load_hparams(None)
        # default ON: bit-identical + measured +3.3% (BENCHMARKS round 4)
        assert hp["fq_in_kernel"] is True
