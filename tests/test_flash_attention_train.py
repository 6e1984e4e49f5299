"""Training attention kernel (fused fwd + custom-VJP bwd) vs XLA autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.ops.flash_attention import xla_attention_qkv
from qat_vit_tpu.ops.flash_attention_train import attention_train

B, N, H, HD = 3, 197, 6, 64


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * H * HD)).astype(np.float32)
                      * 0.3)
    do = jnp.asarray(rng.normal(size=(B, N, H * HD)).astype(np.float32))
    return qkv, do


class TestAttentionTrain:
    def test_forward_matches_xla(self, case):
        qkv, _ = case
        ref = xla_attention_qkv(qkv, H, HD)
        out = attention_train(qkv, H, HD, 2, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_xla_autodiff(self, case):
        qkv, do = case

        def ref_loss(qkv):
            return (xla_attention_qkv(qkv, H, HD) * do).sum()

        def ker_loss(qkv):
            return (attention_train(qkv, H, HD, 2, True) * do).sum()

        g_ref = jax.grad(ref_loss)(qkv)
        g_ker = jax.grad(ker_loss)(qkv)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_grad_bf16_close(self, case):
        """bf16 operands (the training dtype): grads track the f32 reference
        within bf16 noise."""
        qkv, do = case
        qkv16, do16 = qkv.astype(jnp.bfloat16), do.astype(jnp.bfloat16)

        g_ref = jax.grad(
            lambda q: (xla_attention_qkv(q, H, HD) * do16).sum().astype(
                jnp.float32)
        )(qkv16)
        g_ker = jax.grad(
            lambda q: (attention_train(q, H, HD, 2, True) * do16).sum(
            ).astype(jnp.float32)
        )(qkv16)
        ref = np.asarray(g_ref, np.float32)
        ker = np.asarray(g_ker, np.float32)
        denom = np.abs(ref).max()
        assert np.abs(ker - ref).max() / denom < 0.05


class TestLongAttentionTrain:
    """The q-tiled long-sequence training pair (ops/long_attention.py) vs
    XLA autodiff — OWLv2-like geometry (odd head count, >1 q-stripe so the
    sequential dk/dv accumulation is exercised)."""

    LB, LN, LH, LHD = 2, 300, 3, 32

    @pytest.fixture(scope="class")
    def long_case(self):
        rng = np.random.default_rng(7)
        qkv = jnp.asarray(
            rng.normal(size=(self.LB, self.LN, 3 * self.LH * self.LHD))
            .astype(np.float32) * 0.3
        )
        do = jnp.asarray(
            rng.normal(size=(self.LB, self.LN, self.LH * self.LHD))
            .astype(np.float32)
        )
        return qkv, do

    def test_forward_matches_xla(self, long_case):
        from qat_vit_tpu.ops.long_attention import long_attention_train

        qkv, _ = long_case
        ref = xla_attention_qkv(qkv, self.LH, self.LHD)
        out = long_attention_train(qkv, self.LH, self.LHD, 128, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_xla_autodiff(self, long_case):
        from qat_vit_tpu.ops.long_attention import long_attention_train

        qkv, do = long_case

        def ref_loss(qkv):
            return (xla_attention_qkv(qkv, self.LH, self.LHD) * do).sum()

        def ker_loss(qkv):
            return (long_attention_train(
                qkv, self.LH, self.LHD, 128, True) * do).sum()

        g_ref = jax.grad(ref_loss)(qkv)
        g_ker = jax.grad(ker_loss)(qkv)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_availability_gate(self):
        from qat_vit_tpu.ops.long_attention import (
            long_attention_train_available,
        )

        # CPU backend in tests -> never available (kernels are TPU-only)
        assert not long_attention_train_available(9, 64, seq_len=2305)
        # the stripe budget rejects very long sequences even on TPU
        assert not long_attention_train_available(9, 64, seq_len=9000)
