"""Golden-value parity tests: our fake-quant numerics vs torch.ao (CPU).

The reference's entire QAT numerics live in torch.ao C++ kernels
(``FusedMovingAvgObsFakeQuantize`` from ``get_default_qat_qconfig("qnnpack")``,
reference src/training/qat_trainer.py:306). torch (CPU) is available in this
environment, so these tests check bit-level agreement of scales, zero-points,
quantized values, STE gradients, and multi-step EMA observer trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.quant import (
    FakeQuantizer,
    default_qat_qconfig,
    fake_quantize,
    fused_moving_avg_obs_fake_quant,
    qparams_affine,
    qparams_fused_affine,
    qparams_fused_symmetric,
    qparams_symmetric,
    update_moving_avg_minmax,
)

torch = pytest.importorskip("torch")


def _torch_act_fq():
    from torch.ao.quantization import get_default_qat_qconfig

    return get_default_qat_qconfig("qnnpack").activation()


def _torch_wt_fq():
    from torch.ao.quantization import get_default_qat_qconfig

    return get_default_qat_qconfig("qnnpack").weight()


class TestFakeQuantizeOp:
    def test_matches_torch_affine(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 384)).astype(np.float32) * 3.0
        scale, zp = 0.0173, 97.0
        ours = fake_quantize(jnp.asarray(x), jnp.float32(scale), jnp.float32(zp), 0, 255)
        theirs = torch.fake_quantize_per_tensor_affine(
            torch.from_numpy(x), torch.tensor([scale]), torch.tensor([int(zp)]), 0, 255
        )
        np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())

    def test_matches_torch_symmetric(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(384, 1152)).astype(np.float32) * 0.07
        scale = 0.00123
        ours = fake_quantize(jnp.asarray(x), jnp.float32(scale), jnp.float32(0.0), -128, 127)
        theirs = torch.fake_quantize_per_tensor_affine(
            torch.from_numpy(x), torch.tensor([scale]), torch.tensor([0]), -128, 127
        )
        np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())

    def test_round_half_to_even(self):
        # 0.05/0.1 = 0.5 -> 0; 0.15/0.1 = 1.5 -> 2; 0.25/0.1 = 2.5 -> 2
        x = jnp.array([0.05, 0.15, 0.25, 0.35], jnp.float32)
        y = fake_quantize(x, jnp.float32(0.1), jnp.float32(0.0), -128, 127)
        np.testing.assert_allclose(np.asarray(y), [0.0, 0.2, 0.2, 0.4], atol=1e-7)

    def test_ste_gradient_mask(self):
        # Out-of-range values get zero grad, in-range pass through.
        x = jnp.array([-100.0, -0.5, 0.0, 0.5, 100.0], jnp.float32)
        scale, zp = jnp.float32(0.1), jnp.float32(128.0)

        g = jax.grad(lambda v: jnp.sum(fake_quantize(v, scale, zp, 0, 255)))(x)
        # q = round(x/0.1 + 128): -100 -> -872 (clip), 100 -> 1128 (clip)
        np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])

    def test_ste_matches_torch_grad(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(257,)).astype(np.float32) * 4
        scale, zp = 0.02, 110
        xt = torch.from_numpy(x).requires_grad_(True)
        yt = torch.fake_quantize_per_tensor_affine(
            xt, torch.tensor([scale]), torch.tensor([zp]), 0, 255
        )
        yt.sum().backward()
        gj = jax.grad(
            lambda v: jnp.sum(
                fake_quantize(v, jnp.float32(scale), jnp.float32(zp), 0, 255)
            )
        )(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(gj), xt.grad.numpy())


class TestQParams:
    def test_affine_matches_torch(self):
        for seed in range(5):
            rng = np.random.default_rng(seed)
            lo, hi = sorted(rng.normal(size=2) * 10)
            s, zp = qparams_affine(jnp.float32(lo), jnp.float32(hi))
            obs = torch.ao.quantization.MovingAverageMinMaxObserver(
                dtype=torch.quint8, qscheme=torch.per_tensor_affine, reduce_range=False
            )
            obs(torch.tensor([lo, hi], dtype=torch.float32))
            st, zpt = obs.calculate_qparams()
            np.testing.assert_allclose(float(s), st.item(), rtol=1e-6)
            assert int(zp) == int(zpt.item())

    def test_symmetric_matches_torch(self):
        for seed in range(5):
            rng = np.random.default_rng(seed + 100)
            lo, hi = sorted(rng.normal(size=2) * 0.3)
            s, zp = qparams_symmetric(jnp.float32(lo), jnp.float32(hi))
            obs = torch.ao.quantization.MovingAverageMinMaxObserver(
                dtype=torch.qint8, qscheme=torch.per_tensor_symmetric
            )
            obs(torch.tensor([lo, hi], dtype=torch.float32))
            st, zpt = obs.calculate_qparams()
            np.testing.assert_allclose(float(s), st.item(), rtol=1e-6)
            assert int(zp) == int(zpt.item()) == 0

    def test_all_positive_input_affine(self):
        # min_val > 0 must clamp to 0 in the scale (torch min_val_neg rule).
        s, zp = qparams_affine(jnp.float32(2.0), jnp.float32(10.0))
        np.testing.assert_allclose(float(s), 10.0 / 255.0, rtol=1e-6)
        assert int(zp) == 0

    def test_degenerate_scale_floor(self):
        s, _ = qparams_affine(jnp.float32(0.0), jnp.float32(0.0))
        assert float(s) > 0

    def test_fused_qparams_match_torch_kernel(self):
        """The fused QAT kernel's qparams differ from observer.calculate_qparams
        for symmetric one-sided/straddling ranges; match the kernel's buffers."""
        from torch.ao.quantization import get_default_qat_qconfig

        rng = np.random.default_rng(42)
        for _ in range(25):
            lo, hi = sorted(rng.normal(size=2) * rng.uniform(0.01, 10.0))
            if lo == hi:
                continue
            w = get_default_qat_qconfig("qnnpack").weight()
            w.train()
            w(torch.linspace(float(lo), float(hi), 50))
            s, zp = qparams_fused_symmetric(jnp.float32(lo), jnp.float32(hi))
            np.testing.assert_allclose(float(s), w.scale.item(), rtol=1e-6)
            assert int(zp) == int(w.zero_point.item())

            a = get_default_qat_qconfig("qnnpack").activation()
            a.train()
            a(torch.linspace(float(lo), float(hi), 50))
            s, zp = qparams_fused_affine(jnp.float32(lo), jnp.float32(hi))
            np.testing.assert_allclose(float(s), a.scale.item(), rtol=1e-6)
            assert int(zp) == int(a.zero_point.item())


class TestFusedObserverTrajectory:
    def test_multi_step_ema_matches_torch(self):
        """Run 10 observer+fake-quant steps and compare outputs + state."""
        tfq = _torch_act_fq()
        tfq.train()
        mn = jnp.array(jnp.inf, jnp.float32)
        mx = jnp.array(-jnp.inf, jnp.float32)
        rng = np.random.default_rng(7)
        for step in range(10):
            x = (rng.normal(size=(128, 64)) * (1 + step)).astype(np.float32)
            yt = tfq(torch.from_numpy(x))
            yj, mn, mx = fused_moving_avg_obs_fake_quant(
                jnp.asarray(x), mn, mx, symmetric=False, quant_min=0, quant_max=255,
                observe=True,
            )
            np.testing.assert_allclose(
                float(mn), tfq.activation_post_process.min_val.item(), rtol=1e-5
            )
            np.testing.assert_allclose(
                float(mx), tfq.activation_post_process.max_val.item(), rtol=1e-5
            )
            np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=1e-5)

    def test_weight_symmetric_trajectory(self):
        tfq = _torch_wt_fq()
        tfq.train()
        mn = jnp.array(jnp.inf, jnp.float32)
        mx = jnp.array(-jnp.inf, jnp.float32)
        rng = np.random.default_rng(8)
        for _ in range(5):
            w = (rng.normal(size=(384, 384)) * 0.05).astype(np.float32)
            yt = tfq(torch.from_numpy(w))
            yj, mn, mx = fused_moving_avg_obs_fake_quant(
                jnp.asarray(w), mn, mx, symmetric=True, quant_min=-128, quant_max=127,
                observe=True,
            )
            np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=1e-6)

    def test_narrow_range_scale_floor_matches_torch(self):
        """The fused kernel floors scale at FBGEMM's SMALL_SCALE_THRESHOLD
        (6.1e-5; 0.1 for a zero range) with the zero-point chosen from the
        UN-floored proportions — not the observer's eps floor (regression:
        narrow ranges quantized on a different grid than torch)."""
        from qat_vit_tpu.quant.observers import (
            qparams_fused_affine,
            qparams_fused_symmetric,
        )

        def torch_fused(mn, mx, qmin, qmax, symmetric):
            x = torch.zeros(4)
            obs_min = torch.tensor([mn], dtype=torch.float32)
            obs_max = torch.tensor([mx], dtype=torch.float32)
            scale = torch.ones(1)
            zp = torch.zeros(1, dtype=torch.int32)
            torch._fused_moving_avg_obs_fq_helper(
                x, torch.tensor(1), torch.tensor(1), obs_min, obs_max,
                scale, zp, 0.0, qmin, qmax, 0, False, symmetric,
            )
            return scale.item(), zp.item()

        rng = np.random.default_rng(11)
        cases = [(0.0, 0.01), (0.0, 0.0155), (0.0, 0.0156), (0.0, 0.0),
                 (-0.004, 0.004), (-0.002, 0.006), (0.0, 1.0), (-1.0, 0.0)]
        cases += [
            tuple(sorted(rng.uniform(-0.02, 0.02, size=2))) for _ in range(200)
        ]
        for mn, mx in cases:
            mn, mx = min(mn, 0.0), max(mx, 0.0)
            ts, tz = torch_fused(mn, mx, 0, 255, False)
            js, jz = qparams_fused_affine(
                jnp.float32(mn), jnp.float32(mx), 0, 255
            )
            np.testing.assert_allclose(float(js), ts, rtol=1e-6, err_msg=(mn, mx))
            assert float(jz) == tz, (mn, mx, float(jz), tz)
            ts, tz = torch_fused(mn, mx, -128, 127, True)
            js, jz = qparams_fused_symmetric(
                jnp.float32(mn), jnp.float32(mx), -128, 127
            )
            np.testing.assert_allclose(float(js), ts, rtol=1e-6, err_msg=(mn, mx))
            assert float(jz) == tz, (mn, mx, float(jz), tz)

    def test_eval_mode_freezes_stats(self):
        mn0, mx0 = jnp.float32(-1.0), jnp.float32(2.0)
        x = jnp.linspace(-50, 50, 100)
        _, mn, mx = fused_moving_avg_obs_fake_quant(
            x, mn0, mx0, symmetric=False, quant_min=0, quant_max=255, observe=False
        )
        assert float(mn) == -1.0 and float(mx) == 2.0

    def test_ema_first_step_direct_init(self):
        mn, mx = update_moving_avg_minmax(
            jnp.array(jnp.inf, jnp.float32),
            jnp.array(-jnp.inf, jnp.float32),
            jnp.array([-3.0, 5.0]),
        )
        assert float(mn) == -3.0 and float(mx) == 5.0

    def test_integer_input_dtype(self):
        # public-API contract: integer tensors (no inf representation for
        # the single-pass reduce's init) take the f32 path, not an
        # OverflowError (regression: the in-dtype variadic-reduce rewrite)
        mn, mx = update_moving_avg_minmax(
            jnp.array(jnp.inf, jnp.float32),
            jnp.array(-jnp.inf, jnp.float32),
            jnp.arange(-4, 8, dtype=jnp.int32),
        )
        assert float(mn) == -4.0 and float(mx) == 7.0

    def test_bf16_input_matches_f32_cast(self):
        # reducing in the input dtype is bit-exact vs the cast-to-f32 form
        # (min/max are order statistics)
        x16 = jnp.array([-1.5, 0.25, 3.0, -7.0, 2.5], jnp.bfloat16)
        mn, mx = update_moving_avg_minmax(
            jnp.array(jnp.inf, jnp.float32),
            jnp.array(-jnp.inf, jnp.float32),
            x16,
        )
        x32 = x16.astype(jnp.float32)
        assert float(mn) == float(jnp.min(x32))
        assert float(mx) == float(jnp.max(x32))
        assert mn.dtype == jnp.float32 and mx.dtype == jnp.float32


class TestFakeQuantizerModule:
    def test_module_state_threading(self):
        qc = default_qat_qconfig("qnnpack")
        m = FakeQuantizer(qc.activation)
        x = jnp.linspace(-2, 6, 512).reshape(8, 64)
        variables = m.init(jax.random.key(0), x, observe=False)
        # init leaves observers untouched (inf markers)
        assert np.isinf(variables["quant_stats"]["min_val"])

        y, mutated = m.apply(variables, x, observe=True, mutable=["quant_stats"])
        qs = mutated["quant_stats"]
        np.testing.assert_allclose(float(qs["min_val"]), -2.0, rtol=1e-6)
        np.testing.assert_allclose(float(qs["max_val"]), 6.0, rtol=1e-6)

        # eval with frozen stats: pure apply, no mutation needed
        y2 = m.apply({"quant_stats": qs}, x, observe=False)
        assert y2.shape == x.shape

    def test_matches_torch_module_end_to_end(self):
        tfq = _torch_act_fq()
        tfq.train()
        m = FakeQuantizer(default_qat_qconfig().activation)
        x0 = np.random.default_rng(3).normal(size=(32, 32)).astype(np.float32)
        variables = m.init(jax.random.key(0), jnp.asarray(x0), observe=False)
        qs = variables["quant_stats"]
        for step in range(4):
            x = np.random.default_rng(10 + step).normal(size=(32, 32)).astype(np.float32) * 2
            yt = tfq(torch.from_numpy(x))
            yj, mut = m.apply(
                {"quant_stats": qs}, jnp.asarray(x), observe=True, mutable=["quant_stats"]
            )
            qs = mut["quant_stats"]
            np.testing.assert_allclose(np.asarray(yj), yt.numpy(), atol=1e-5)


class TestObserveStride:
    """Opt-in batch-subsample observation (hparam ``observer_stride``):
    stride=1 is the exact default; stride=k observes EXACTLY the first
    1/k of the leading axis (contiguous prefix — quant/observers.py
    explains why a strided gather would save nothing on TPU tiles)."""

    def test_stride_one_is_exact_default(self):
        from qat_vit_tpu.quant.observers import update_moving_avg_minmax

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        a = update_moving_avg_minmax(jnp.float32(jnp.inf),
                                     jnp.float32(-jnp.inf), x)
        b = update_moving_avg_minmax(jnp.float32(jnp.inf),
                                     jnp.float32(-jnp.inf), x, stride=1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stride_observes_prefix_exactly(self):
        from qat_vit_tpu.quant.observers import update_moving_avg_minmax

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        got = update_moving_avg_minmax(
            jnp.float32(0.5), jnp.float32(1.5), x, stride=4)
        ref = update_moving_avg_minmax(
            jnp.float32(0.5), jnp.float32(1.5), x[:16])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_module_level_stride(self):
        import dataclasses as dc

        import flax.linen as nn  # noqa: F401

        from qat_vit_tpu.quant.modules import FakeQuantizer
        from qat_vit_tpu.quant.qconfig import default_qat_qconfig

        cfg = dc.replace(default_qat_qconfig().activation, observe_stride=4)
        m = FakeQuantizer(cfg)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        variables = m.init(jax.random.key(0), x, observe=False)
        _, mut = m.apply({"quant_stats": variables["quant_stats"]}, x,
                         observe=True, mutable=["quant_stats"])
        qs = mut["quant_stats"]
        np.testing.assert_allclose(float(qs["min_val"]),
                                   float(jnp.min(x[:16])))
        np.testing.assert_allclose(float(qs["max_val"]),
                                   float(jnp.max(x[:16])))
