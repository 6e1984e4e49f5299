"""Int8 GEMM + convert + serving-path tests.

Validates the QNNPACK-replacement stack: quantize→int8 GEMM→dequant math
against a float reference, the convert() observer folding, Pallas-kernel vs
XLA equivalence (interpret mode on CPU), and that the end-to-end int8 ViT
tracks the fake-quant model it was converted from.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer
from qat_vit_tpu.ops.pallas_gemm import fused_quantize_matmul
from qat_vit_tpu.ops.quantized_matmul import (
    int8_matmul_xla,
    quantize_act_shifted,
    quantized_dense,
)
from qat_vit_tpu.quant import default_qat_qconfig, qparams_affine, qparams_symmetric
from qat_vit_tpu.quant.convert import dense_int8, gelu_transform_qparams
from qat_vit_tpu.quant.fake_quant import quantize_to_int
from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply


def _quantize_weight(w):
    s, _ = qparams_symmetric(jnp.min(w), jnp.max(w))
    wq = quantize_to_int(w, s, 0.0, -128, 127)
    return wq, s


class TestInt8Matmul:
    def test_dequant_math_exact(self):
        """int8 GEMM + zp correction must equal the dequantized-operand
        float GEMM exactly (integers are exact in f32 here)."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 128)).astype(np.float32) * 2
        w = rng.normal(size=(128, 256)).astype(np.float32) * 0.05
        b = rng.normal(size=(256,)).astype(np.float32)

        xs, xzp = qparams_affine(jnp.min(x), jnp.max(x))
        wq, ws = _quantize_weight(jnp.asarray(w))
        xq = quantize_act_shifted(jnp.asarray(x), xs, xzp)
        out = int8_matmul_xla(
            xq, wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=jnp.sum(wq.astype(jnp.int32), axis=0), bias=jnp.asarray(b),
        )
        # exact integer reference: the int accumulation has no rounding
        acc = (np.asarray(xq, np.int64) + 128 - int(xzp)) @ np.asarray(wq, np.int64)
        expected = acc.astype(np.float32) * np.float32(float(xs) * float(ws)) + b
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    def test_quantization_error_bounded(self):
        """End-to-end quantized dense ≈ float dense within quantization noise."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(32, 384)).astype(np.float32)
        w = rng.normal(size=(384, 384)).astype(np.float32) * 0.04
        b = np.zeros(384, np.float32)
        xs, xzp = qparams_affine(jnp.float32(x.min()), jnp.float32(x.max()))
        wq, ws = _quantize_weight(jnp.asarray(w))
        xq = quantize_act_shifted(jnp.asarray(x), xs, xzp)
        out = int8_matmul_xla(
            xq, wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=jnp.sum(wq.astype(jnp.int32), axis=0), bias=jnp.asarray(b),
        )
        ref = x @ w
        err = np.abs(np.asarray(out) - ref)
        rel = err.mean() / np.abs(ref).mean()
        assert rel < 0.02, rel

    def test_pallas_kernel_matches_xla(self):
        """Fused Pallas kernel (interpret mode on CPU) == XLA path bit-for-bit
        on the int8 grid."""
        rng = np.random.default_rng(2)
        M, K, N = 160, 128, 256  # M deliberately not a tile multiple
        x = rng.normal(size=(M, K)).astype(np.float32)
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
        b = rng.normal(size=(N,)).astype(np.float32)
        xs, xzp = qparams_affine(jnp.float32(x.min()), jnp.float32(x.max()))
        wq, ws = _quantize_weight(jnp.asarray(w))
        colsum = jnp.sum(wq.astype(jnp.int32), axis=0)
        xq = quantize_act_shifted(jnp.asarray(x), xs, xzp)
        ref = int8_matmul_xla(
            xq, wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=colsum, bias=jnp.asarray(b),
        )
        out = fused_quantize_matmul(
            jnp.asarray(x), wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=colsum, bias=jnp.asarray(b), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-5)

    def test_pallas_kernel_per_channel_weight_scales(self):
        """Per-channel exports (w_scale is an [N] vector) must go through the
        fused kernel unchanged — regression for the ADVICE r1 reshape crash."""
        rng = np.random.default_rng(7)
        M, K, N = 96, 128, 256
        x = rng.normal(size=(M, K)).astype(np.float32)
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
        b = rng.normal(size=(N,)).astype(np.float32)
        xs, xzp = qparams_affine(jnp.float32(x.min()), jnp.float32(x.max()))
        # per-output-channel symmetric weight quantization
        ws = jnp.max(jnp.abs(jnp.asarray(w)), axis=0) / 127.0  # [N]
        wq = jnp.clip(jnp.round(jnp.asarray(w) / ws), -128, 127).astype(jnp.int8)
        colsum = jnp.sum(wq.astype(jnp.int32), axis=0)
        xq = quantize_act_shifted(jnp.asarray(x), xs, xzp)
        ref = int8_matmul_xla(
            xq, wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=colsum, bias=jnp.asarray(b),
        )
        out = fused_quantize_matmul(
            jnp.asarray(x), wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=colsum, bias=jnp.asarray(b), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-5)

    def test_batched_input(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 17, 64)).astype(np.float32)
        w = rng.normal(size=(64, 128)).astype(np.float32) * 0.1
        wq, ws = _quantize_weight(jnp.asarray(w))
        layer = {
            "w_int8": wq, "w_scale": ws,
            "w_colsum": jnp.sum(wq.astype(jnp.int32), axis=0),
            "bias": jnp.zeros(128),
        }
        xs, xzp = qparams_affine(jnp.float32(x.min()), jnp.float32(x.max()))
        out = quantized_dense(
            jnp.asarray(x), layer, {"scale": xs, "zero_point": xzp}, use_pallas=False
        )
        assert out.shape == (2, 17, 128)


def _trained_micro_qat(steps=8, seed=0, backend="qnnpack"):
    """Init a micro QAT ViT and run a few observe-forward passes so observers
    hold realistic statistics."""
    cfg = ViTConfig(
        num_classes=10, image_size=32, patch_size=8, embed_dim=128, depth=2,
        num_heads=2, quant=default_qat_qconfig(backend), qat_wrapper=True,
    )
    model = VisionTransformer(cfg)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(seed), x0, observe=False)
    params, qs = variables["params"], variables["quant_stats"]

    @jax.jit
    def fwd_observe(params, qs, x):
        logits, mut = model.apply(
            {"params": params, "quant_stats": qs}, x, observe=True,
            mutable=["quant_stats"],
        )
        return logits, mut["quant_stats"]

    for s in range(steps):
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        logits, qs = fwd_observe(params, qs, x)
    return model, cfg, params, qs


class TestConvertAndServe:
    def test_convert_structure(self):
        import flax.linen as nn

        model, cfg, params, qs = _trained_micro_qat()
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        assert qp["patch_embed"]["w_int8"].dtype == jnp.int8
        assert len(qp["blocks"]) == 2
        assert "input_q" in qp and "out_q" in qp["norm"]
        # weight scale matches observer symmetric formula
        wmin = qs["patch_embed"]["proj"]["weight_fq"]["min_val"]
        wmax = qs["patch_embed"]["proj"]["weight_fq"]["max_val"]
        s, _ = qparams_symmetric(wmin, wmax)
        np.testing.assert_allclose(
            float(qp["patch_embed"]["w_scale"]), float(s), rtol=1e-6
        )

    def test_int8_tracks_fake_quant_model(self):
        """The int8 serving forward must closely track the fake-quant QAT
        model it was converted from (same data distribution)."""
        import flax.linen as nn

        model, cfg, params, qs = _trained_micro_qat()
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)).astype(np.float32))
        fq_logits = model.apply({"params": params, "quant_stats": qs}, x, observe=False)
        i8_logits = int8_apply(qp, x, cfg, use_pallas=False)
        fq = np.asarray(fq_logits)
        i8 = np.asarray(i8_logits)
        # logits correlated and argmax mostly agreeing
        corr = np.corrcoef(fq.ravel(), i8.ravel())[0, 1]
        assert corr > 0.98, corr
        agree = (fq.argmax(-1) == i8.argmax(-1)).mean()
        assert agree >= 0.8, agree

    def test_gelu_transform_bounds(self):
        q = gelu_transform_qparams(jnp.float32(-3.0), jnp.float32(5.0),
                                   default_qat_qconfig())
        # representable range must cover [-0.17, gelu(5)≈5.0] up to one
        # quantization-grid step (zero-point rounding shifts the grid)
        s = float(q["scale"])
        lo = -float(q["zero_point"]) * s
        hi = (255 - float(q["zero_point"])) * s
        assert lo <= -0.17 + s and hi >= 5.0 - s, (lo, hi, s)

    def test_bf16_compute_dtype_preserves_predictions(self):
        """Serving with bf16 residual stream must agree with f32 on argmax
        (the int8 grid is much coarser than bf16 resolution)."""
        import flax.linen as nn
        import jax.numpy as jnp

        model, cfg, params, qs = _trained_micro_qat(seed=3)
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        x = jnp.asarray(np.random.default_rng(9).normal(
            size=(32, 32, 32, 3)).astype(np.float32))
        f32_logits = np.asarray(int8_apply(qp, x, cfg, use_pallas=False))
        bf16_logits = np.asarray(int8_apply(
            qp, x, cfg, use_pallas=False,
            compute_dtype=jnp.bfloat16, attn_dtype=jnp.bfloat16))
        agree = (f32_logits.argmax(-1) == bf16_logits.argmax(-1)).mean()
        assert agree >= 0.9, agree

    def test_predictor_api(self, tmp_path):
        """Int8Predictor end-to-end: export -> checkpoint -> batched predict."""
        import flax.linen as nn

        from qat_vit_tpu.serve import Int8Predictor
        from qat_vit_tpu.utils.checkpoint import save_checkpoint

        model, cfg, params, qs = _trained_micro_qat(seed=4)
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        path = str(tmp_path / "export.msgpack")
        save_checkpoint(path, qp)
        pred = Int8Predictor.from_checkpoint(path, cfg, batch_size=16)
        imgs = np.random.default_rng(0).integers(
            0, 256, (37, 32, 32, 3), dtype=np.uint8)  # non-multiple of batch
        labels = pred.predict(imgs)
        assert labels.shape == (37,) and labels.dtype == np.int32
        logits = pred.logits(imgs)
        assert logits.shape == (37, 10)
        # streaming path
        outs = list(pred.serve_stream(iter([imgs[:16], imgs[16:32]])))
        assert len(outs) == 2 and outs[0].shape == (16, 10)
        # ragged + oversize stream batches: padded/chunked onto the one
        # compiled program (a partial batch must not trigger a recompile),
        # outputs match the batched path exactly
        ragged = list(pred.serve_stream(iter([imgs[:5], imgs[5:7], imgs[7:]])))
        assert [o.shape[0] for o in ragged] == [5, 2, 30]
        np.testing.assert_array_equal(np.concatenate(ragged), logits)

    def test_predictor_mesh_serving(self, tmp_path):
        """Data-parallel serving mesh: sharded logits == single-device
        logits exactly (qparams replicated, batch sharded, no collectives)."""
        import flax.linen as nn
        from jax.sharding import Mesh

        from qat_vit_tpu.serve import Int8Predictor
        from qat_vit_tpu.utils.checkpoint import save_checkpoint

        model, cfg, params, qs = _trained_micro_qat(seed=4)
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        path = str(tmp_path / "export.msgpack")
        save_checkpoint(path, qp)
        imgs = np.random.default_rng(1).integers(
            0, 256, (32, 32, 32, 3), dtype=np.uint8)

        single = Int8Predictor.from_checkpoint(path, cfg, batch_size=16)
        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
        sharded = Int8Predictor.from_checkpoint(
            path, cfg, batch_size=16, mesh=mesh)
        np.testing.assert_array_equal(
            single.logits(imgs), sharded.logits(imgs))

        with pytest.raises(ValueError, match="not divisible"):
            Int8Predictor.from_checkpoint(path, cfg, batch_size=13, mesh=mesh)

    def test_dense_int8_colsum(self):
        rng = np.random.default_rng(5)
        w = rng.normal(size=(16, 32)).astype(np.float32)
        stats = {
            "weight_fq": {"min_val": jnp.float32(w.min()), "max_val": jnp.float32(w.max())},
            "act_fq": {"min_val": jnp.float32(-1), "max_val": jnp.float32(1)},
        }
        out = dense_int8({"kernel": jnp.asarray(w), "bias": jnp.zeros(32)}, stats,
                         default_qat_qconfig())
        np.testing.assert_array_equal(
            np.asarray(out["w_colsum"]),
            np.asarray(out["w_int8"]).astype(np.int64).sum(0),
        )


class TestUncalibratedSemantics:
    def test_identity_until_observed(self):
        """A never-calibrated fake-quant site passes through unchanged (a
        float-phase checkpoint evaluated through the QAT graph must behave
        as the float model, not shred tensors with the eps-floor scale)."""
        import jax.numpy as jnp

        from qat_vit_tpu.quant import fused_moving_avg_obs_fake_quant

        x = jnp.linspace(-3.0, 3.0, 64)
        y, mn, mx = fused_moving_avg_obs_fake_quant(
            x, jnp.array(jnp.inf, jnp.float32), jnp.array(-jnp.inf, jnp.float32),
            symmetric=False, quant_min=0, quant_max=255, observe=False,
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_float_ckpt_through_qat_graph_matches_float_eval(self):
        """End-to-end: QAT model with all-uninitialized observers computes
        the same logits as the float model on the same params."""
        import dataclasses

        import flax.linen as nn
        import jax.numpy as jnp

        from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer
        from qat_vit_tpu.quant import default_qat_qconfig
        from qat_vit_tpu.train.steps import init_quant_stats

        cfg_f = ViTConfig(num_classes=10, image_size=32, patch_size=8,
                          embed_dim=64, depth=2, num_heads=2, quant=None)
        cfg_q = dataclasses.replace(cfg_f, quant=default_qat_qconfig(),
                                    qat_wrapper=True)
        mf, mq = VisionTransformer(cfg_f), VisionTransformer(cfg_q)
        params = nn.meta.unbox(
            mf.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                    observe=False))["params"]
        qs = init_quant_stats(mq, cfg_q)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 3)).astype(np.float32))
        yf = mf.apply({"params": params}, x, observe=False)
        yq = mq.apply({"params": params, "quant_stats": qs}, x, observe=False)
        np.testing.assert_allclose(np.asarray(yq), np.asarray(yf),
                                   atol=1e-5, rtol=1e-5)


class TestPerChannelWeights:
    def test_per_channel_export_more_accurate(self):
        """Per-channel weight scales must track the float model at least as
        well as per-tensor (strictly better on heterogeneous columns)."""
        import flax.linen as nn

        model, cfg, params, qs = _trained_micro_qat(seed=7)
        p = nn.meta.unbox(params)
        qp_t = convert_vit(p, qs, cfg, per_channel_weights=False)
        qp_c = convert_vit(p, qs, cfg, per_channel_weights=True)
        assert qp_c["patch_embed"]["w_scale"].shape == (cfg.embed_dim,)
        x = jnp.asarray(np.random.default_rng(11).normal(
            size=(16, 32, 32, 3)).astype(np.float32))
        y_float = model.apply({"params": params, "quant_stats": qs}, x,
                              observe=False)
        y_t = int8_apply(qp_t, x, cfg, use_pallas=False)
        y_c = int8_apply(qp_c, x, cfg, use_pallas=False)
        err_t = float(jnp.mean(jnp.abs(y_t - y_float)))
        err_c = float(jnp.mean(jnp.abs(y_c - y_float)))
        assert err_c <= err_t * 1.05, (err_c, err_t)

    def test_per_channel_gemm_math(self):
        """[N]-vector weight scales broadcast correctly in the dequant."""
        rng = np.random.default_rng(13)
        x = rng.normal(size=(8, 32)).astype(np.float32)
        w = rng.normal(size=(32, 16)).astype(np.float32)
        w[:, 0] *= 100.0  # heterogeneous column ranges
        from qat_vit_tpu.quant.observers import qparams_symmetric_per_channel

        ws, _ = qparams_symmetric_per_channel(jnp.asarray(w), axis=1)
        wq = quantize_to_int(jnp.asarray(w), ws[None, :], 0.0, -128, 127)
        xs, xzp = qparams_affine(jnp.float32(x.min()), jnp.float32(x.max()))
        xq = quantize_act_shifted(jnp.asarray(x), xs, xzp)
        out = int8_matmul_xla(
            xq, wq, x_scale=xs, x_zero_point=xzp, w_scale=ws,
            w_colsum=jnp.sum(wq.astype(jnp.int32), axis=0), bias=None)
        ref = x @ w
        rel = np.abs(np.asarray(out) - ref).mean() / np.abs(ref).mean()
        assert rel < 0.03, rel


class TestPTQ:
    def test_ptq_convert_tracks_float_model(self):
        """Calibrate-only (no training) int8 export must track the float
        model's predictions on the calibration distribution."""
        import flax.linen as nn

        from qat_vit_tpu.serve.calibrate import ptq_convert

        cfg = ViTConfig(num_classes=10, image_size=32, patch_size=8,
                        embed_dim=128, depth=2, num_heads=2, quant=None)
        model = VisionTransformer(cfg)
        rng = np.random.default_rng(21)
        params = nn.meta.unbox(model.init(
            jax.random.key(21), jnp.zeros((1, 32, 32, 3)), observe=False))["params"]

        batches = [jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
                   for _ in range(6)]
        qp = ptq_convert(params, batches, cfg)

        x = jnp.asarray(rng.normal(size=(32, 32, 32, 3)).astype(np.float32))
        y_float = np.asarray(model.apply({"params": params}, x, observe=False))
        y_int8 = np.asarray(int8_apply(qp, x, dataclasses.replace(
            cfg, quant=default_qat_qconfig(), qat_wrapper=True), use_pallas=False))
        corr = np.corrcoef(y_float.ravel(), y_int8.ravel())[0, 1]
        assert corr > 0.95, corr
        agree = (y_float.argmax(-1) == y_int8.argmax(-1)).mean()
        assert agree >= 0.7, agree

    def test_calibrate_requires_data(self):
        from qat_vit_tpu.serve.calibrate import calibrate

        cfg = ViTConfig(num_classes=10, image_size=32, patch_size=8,
                        embed_dim=64, depth=1, num_heads=2)
        import flax.linen as nn

        model = VisionTransformer(cfg)
        params = nn.meta.unbox(model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)), observe=False))["params"]
        with pytest.raises(ValueError, match="at least one batch"):
            calibrate(params, [], cfg)


class TestFbgemmGrid:
    """The reduced-range (fbgemm, activations [0, 127]) export path — the
    qconfig the reference could also select (ref qat_trainer.py:293,306 via
    the backend string; fbgemm sets reduce_range=True on activations)."""

    def test_quantize_respects_reduced_grid(self):
        """With quant_max=127 no stored value may exceed 127-128=-1, and the
        round-trip over the observed range stays within one grid step."""
        s, zp = qparams_affine(jnp.float32(-1.0), jnp.float32(3.0),
                               quant_min=0, quant_max=127)
        x = jnp.linspace(-2.0, 6.0, 257)  # deliberately overshoots the range
        q = quantize_act_shifted(x, s, zp, quant_max=127.0)
        qn = np.asarray(q, np.int32)
        assert qn.max() <= 127 - 128 and qn.min() >= -128
        # dequant tracks x inside the observed range
        deq = (qn + 128.0 - float(zp)) * float(s)
        inside = (np.asarray(x) >= -1.0) & (np.asarray(x) <= 3.0)
        np.testing.assert_allclose(
            deq[inside], np.asarray(x)[inside], atol=float(s) * 0.51)

    def test_train_convert_eval_fbgemm(self):
        """End-to-end at fbgemm ranges: observe → convert → int8 forward
        tracks the fake-quant model (mirrors the qnnpack test above)."""
        import flax.linen as nn

        model, cfg, params, qs = _trained_micro_qat(backend="fbgemm")
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        # the export records the grid it was converted for
        assert float(qp["input_q"]["quant_max"]) == 127.0
        assert float(qp["norm"]["out_q"]["quant_max"]) == 127.0
        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)).astype(np.float32))
        fq = np.asarray(model.apply(
            {"params": params, "quant_stats": qs}, x, observe=False))
        i8 = np.asarray(int8_apply(qp, x, cfg, use_pallas=False))
        corr = np.corrcoef(fq.ravel(), i8.ravel())[0, 1]
        assert corr > 0.98, corr
        agree = (fq.argmax(-1) == i8.argmax(-1)).mean()
        assert agree >= 0.8, agree

    def test_fbgemm_mixed_none_matches_exact(self):
        """The XLA-quantize fused chain (mixed_none) is grid-safe: its
        quantizes read the export's quant_max."""
        import flax.linen as nn

        model, cfg, params, qs = _trained_micro_qat(backend="fbgemm", seed=5)
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        x = jnp.asarray(np.random.default_rng(6).normal(
            size=(8, 32, 32, 3)).astype(np.float32))
        exact = np.asarray(int8_apply(qp, x, cfg, use_pallas=False))
        mixed = np.asarray(int8_apply(qp, x, cfg, fused="mixed_none"))
        agree = (exact.argmax(-1) == mixed.argmax(-1)).mean()
        assert agree >= 0.9, agree

    def test_fbgemm_quantize_epilogue_bit_identical_to_xla(self):
        """The Pallas LN+quantize epilogue with quant_max=127 must produce
        BIT-identical int8 to the XLA quantize on the same reduced grid —
        the unit-level proof that the fbgemm grid is honored in-kernel."""
        from jax.experimental.pallas import tpu as pltpu

        from qat_vit_tpu.ops import fused_serve as fs
        from qat_vit_tpu.serve.int8_vit import _ln_quantize_xla

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        ln = {"scale": jnp.ones((128,), jnp.float32),
              "bias": jnp.zeros((128,), jnp.float32)}
        out_q = {"scale": jnp.float32(0.03), "zero_point": jnp.float32(60.0),
                 "quant_max": jnp.float32(127.0)}
        ref = _ln_quantize_xla(x, ln, out_q, eps=1e-6)
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(lambda x: fs.ln_quantize(
                x, ln, out_q, eps=1e-6, tile_m=64, quant_max=127.0,
                interpret=True))(x)
            jax.block_until_ready(got)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert int(np.asarray(got).max()) <= 127 - 128

    def test_fbgemm_pallas_rungs_match_exact(self):
        """Round-5 quant_max threading: the Pallas fused/megamodel rungs run
        fbgemm exports on their real [0,127] grid and reproduce the exact
        path (argmax-identical, close logits — the same numerics contract
        the qnnpack rungs are held to in test_fused_serve.py)."""
        import flax.linen as nn
        from jax.experimental.pallas import tpu as pltpu

        model, cfg, params, qs = _trained_micro_qat(backend="fbgemm", seed=5)
        qp = convert_vit(nn.meta.unbox(params), qs, cfg)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        base = np.asarray(int8_apply(qp, x, cfg, gelu_approx=True))

        def interp(**kw):
            from functools import partial

            with pltpu.force_tpu_interpret_mode():
                out = jax.jit(partial(int8_apply, cfg=cfg, **kw))(qp, x)
                jax.block_until_ready(out)
            return np.asarray(out)

        for kw in (
            {"fused": "mixed", "compute_dtype": jnp.bfloat16},
            {"fused": "megamodel:2:tight", "compute_dtype": jnp.bfloat16},
            {"fused": "mixed_none", "attn_impl": "pallas_fused",
             "compute_dtype": jnp.bfloat16},
        ):
            got = interp(**kw)
            assert (base.argmax(-1) == got.argmax(-1)).all(), kw
            np.testing.assert_allclose(got, base, rtol=0.06, atol=0.06,
                                       err_msg=str(kw))

    def test_fbgemm_preset_selects_fast_rungs(self):
        """serving_preset now hands reduced-grid configs the SAME fast
        kernel rungs as qnnpack ones (the epilogues take quant_max as a
        compile-time constant) — performance parity, not just correctness."""
        from qat_vit_tpu.serve.int8_vit import _preset_kernel_opts

        fb = ViTConfig(quant=default_qat_qconfig("fbgemm"), qat_wrapper=True)
        qn = ViTConfig(quant=default_qat_qconfig("qnnpack"), qat_wrapper=True)
        assert _preset_kernel_opts(fb) == _preset_kernel_opts(qn)
        assert "megamodel" in _preset_kernel_opts(fb).get("fused", "")
