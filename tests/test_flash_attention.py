"""Fused attention kernel tests (interpret mode on CPU) + XLA-form parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.ops.flash_attention import flash_attention_qkv, xla_attention_qkv


def _reference_attention(qkv, h, hd):
    """Straightforward transposed-form reference."""
    b, n, _ = qkv.shape
    q, k, v = np.split(np.asarray(qkv, np.float32), 3, axis=-1)
    q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
    k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
    s = q @ k.transpose(0, 1, 3, 2)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    o = p @ v
    return o.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


class TestAttention:
    @pytest.mark.parametrize("n", [17, 128, 197])
    def test_xla_form_matches_reference(self, n):
        h, hd = 2, 32
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.normal(size=(3, n, 3 * h * hd)).astype(np.float32))
        out = np.asarray(xla_attention_qkv(qkv, h, hd))
        ref = _reference_attention(qkv, h, hd)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("n", [64, 197])
    def test_flash_kernel_matches_reference(self, n):
        """Pallas kernel (interpret mode) vs reference, incl. seq padding."""
        h, hd = 2, 32
        rng = np.random.default_rng(1)
        qkv = jnp.asarray(rng.normal(size=(2, n, 3 * h * hd)).astype(np.float32))
        out = np.asarray(flash_attention_qkv(qkv, h, hd, interpret=True))
        ref = _reference_attention(qkv, h, hd)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize(
        "h,hd,n",
        [
            (2, 32, 197),  # short sequence, lane-aligned width
            (3, 32, 260),  # odd head count, width 96 (slab kernels reject)
            (9, 16, 300),  # OWLv2-pruned head-count shape, >1 q-tile
        ],
    )
    def test_long_kernel_matches_reference(self, h, hd, n):
        """q-tiled long-sequence kernel (interpret) vs reference."""
        from qat_vit_tpu.ops.long_attention import (
            long_attention_qkv,
            long_attention_shapes_ok,
        )

        assert long_attention_shapes_ok(h, hd)
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.normal(size=(2, n, 3 * h * hd)).astype(np.float32))
        out = np.asarray(
            long_attention_qkv(qkv, h, hd, q_tile=128, interpret=True)
        )
        ref = _reference_attention(qkv, h, hd)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_long_kernel_shape_gate(self):
        from qat_vit_tpu.ops.long_attention import long_attention_shapes_ok

        assert long_attention_shapes_ok(9, 64)  # OWLv2-pruned
        assert long_attention_shapes_ok(12, 64)  # OWLv2-base / ViT-B
        assert not long_attention_shapes_ok(2, 256)  # head dim > one register
        assert not long_attention_shapes_ok(4, 20)  # ragged minor dim

    def test_xla_form_differentiable(self):
        h, hd = 2, 16
        rng = np.random.default_rng(2)
        qkv = jnp.asarray(rng.normal(size=(2, 9, 3 * h * hd)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(xla_attention_qkv(x, h, hd) ** 2))(qkv)
        assert g.shape == qkv.shape and np.isfinite(np.asarray(g)).all()

    def test_model_attention_matches_torch_still(self):
        """The transpose-free rewrite in models/vit.py must not change the
        numbers — rerun the micro forward parity check."""
        torch = pytest.importorskip("torch")
        # reuse the mini-ViT parity machinery
        from tests.test_vit_model import TorchMiniViT
        from qat_vit_tpu.models import ViTConfig, VisionTransformer, timm_vit_to_params

        torch.manual_seed(3)
        tm = TorchMiniViT()
        for p in tm.parameters():
            torch.nn.init.normal_(p, std=0.04)
        cfg = ViTConfig(num_classes=10, image_size=32, patch_size=8,
                        embed_dim=64, depth=2, num_heads=2, quant=None)
        params = timm_vit_to_params(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
        x = np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        yj = VisionTransformer(cfg).apply({"params": params}, jnp.asarray(x),
                                          observe=False)
        np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-3, rtol=1e-3)
