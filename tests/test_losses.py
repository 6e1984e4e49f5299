"""Loss parity vs torch (the reference's CE + KD recipe,
reference src/training/qat_trainer.py:265-268, 343-349)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qat_vit_tpu.train.losses import cross_entropy, kd_kl_divergence, kd_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_logits(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 3


class TestCrossEntropy:
    @pytest.mark.parametrize("ls", [0.0, 0.1, 0.048, 0.2])
    def test_matches_torch(self, ls):
        logits = _rand_logits((64, 10), 0)
        labels = np.random.default_rng(1).integers(0, 10, 64)
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ls)
        theirs = F.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=ls
        )
        np.testing.assert_allclose(float(ours), theirs.item(), rtol=1e-6)


class TestKDLoss:
    @pytest.mark.parametrize("T", [1.5, 4.0, 4.43, 6.0])
    def test_matches_torch(self, T):
        s = _rand_logits((32, 10), 2)
        t = _rand_logits((32, 10), 3)
        ours = kd_kl_divergence(jnp.asarray(s), jnp.asarray(t), T)
        theirs = F.kl_div(
            F.log_softmax(torch.from_numpy(s) / T, dim=-1),
            F.softmax(torch.from_numpy(t) / T, dim=-1),
            reduction="batchmean",
        ) * (T**2)
        # KL between close distributions cancels heavily; f32 noise shows at ~5e-5
        np.testing.assert_allclose(float(ours), theirs.item(), rtol=3e-4)

    def test_combined(self):
        s = _rand_logits((16, 10), 4)
        t = _rand_logits((16, 10), 5)
        labels = np.random.default_rng(6).integers(0, 10, 16)
        alpha, T, ls = 0.615, 4.43, 0.048  # the reference's best-trial hparams
        loss, comps = kd_loss(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(labels),
            alpha=alpha, temperature=T, label_smoothing=ls,
        )
        ce = F.cross_entropy(torch.from_numpy(s), torch.from_numpy(labels),
                             label_smoothing=ls)
        kd = F.kl_div(
            F.log_softmax(torch.from_numpy(s) / T, dim=-1),
            F.softmax(torch.from_numpy(t) / T, dim=-1),
            reduction="batchmean",
        ) * (T**2)
        expected = alpha * kd + (1 - alpha) * ce
        np.testing.assert_allclose(float(loss), expected.item(), rtol=3e-4)
        assert set(comps) == {"train_loss", "train_loss_ce", "train_loss_kd"}

    def test_kd_zero_when_matching(self):
        s = _rand_logits((8, 10), 7)
        val = kd_kl_divergence(jnp.asarray(s), jnp.asarray(s), 4.0)
        assert abs(float(val)) < 1e-6
