"""Fused serving kernels (ops/fused_serve.py) vs their XLA compositions.

Each GEMM+epilogue kernel must match the exact-math XLA op sequence
bit-for-bit (int8 outputs) / to float tolerance (float outputs), and the
fused block pipeline must reproduce the unfused serving forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from qat_vit_tpu.ops import fused_serve as fs
from qat_vit_tpu.ops.quantized_matmul import (
    int8_matmul_xla,
    quantize_act_shifted,
)

M, K, N = 300, 384, 512  # non-multiple M exercises row padding


def interpret_apply(qp, x, cfg, **kw):
    """``int8_apply`` under the Mosaic-TPU interpreter, as ONE jitted call.

    Interleaving jitted interpreted kernels with the forward's eager glue
    ops deadlocks on jax 0.9.0: the interpreter's io_callbacks dispatch jnp
    ops on a runtime thread while the main thread eagerly dispatches the
    next glue op, and every thread parks in futex wait inside jax's dispatch
    internals (diagnosed twice from the conftest watchdog dump, always in
    this file). Tracing the whole forward into one executable means the main
    thread waits on a single execution and never races the callbacks; the
    trailing block keeps callback drain inside the interpret context.
    """
    from functools import partial

    from qat_vit_tpu.serve.int8_vit import int8_apply

    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(partial(int8_apply, cfg=cfg, **kw))(qp, x)
        jax.block_until_ready(out)
    return out


@pytest.fixture(scope="module")
def gemm_case():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(M, K)).astype(np.float32)
    in_q = {"scale": jnp.float32(0.05), "zero_point": jnp.float32(120.0)}
    x_q = quantize_act_shifted(jnp.asarray(x), in_q["scale"], in_q["zero_point"])
    wq = jnp.asarray(
        np.clip(np.round(rng.normal(size=(K, N)) * 20), -128, 127).astype(np.int8)
    )
    layer = {
        "w_int8": wq,
        "w_colsum": jnp.sum(wq.astype(jnp.int32), axis=0),
        "bias": jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
        "w_scale": jnp.float32(0.002),
    }
    ref = int8_matmul_xla(
        x_q, wq, x_scale=in_q["scale"], x_zero_point=in_q["zero_point"],
        w_scale=layer["w_scale"], w_colsum=layer["w_colsum"],
        bias=layer["bias"],
    )
    return x_q, layer, in_q, ref


class TestFusedDense:
    def test_plain_matches_xla(self, gemm_case):
        x_q, layer, in_q, ref = gemm_case
        out = fs.int8_dense(
            x_q, layer, in_q, out_dtype=jnp.float32, tile_m=256, interpret=True
        )
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)

    def test_gelu_q_bitexact(self, gemm_case):
        x_q, layer, in_q, ref = gemm_case
        out_q = {"scale": jnp.float32(0.09), "zero_point": jnp.float32(3.0)}
        want = quantize_act_shifted(
            jax.nn.gelu(ref, approximate=True),
            out_q["scale"], out_q["zero_point"],
        )
        got = fs.int8_dense_gelu_q(
            x_q, layer, in_q, out_q, tile_m=256, interpret=True
        )
        assert (np.asarray(got) == np.asarray(want)).all()

    def test_quick_gelu_q_bitexact(self, gemm_case):
        """act='quick_gelu' epilogue computes exact x*sigmoid(1.702x) — the
        formula the XLA path uses and the convert-time gelu_q qparams
        assume (OWLv2/CLIP models)."""
        x_q, layer, in_q, ref = gemm_case
        out_q = {"scale": jnp.float32(0.09), "zero_point": jnp.float32(3.0)}
        want = quantize_act_shifted(
            ref * jax.nn.sigmoid(1.702 * ref),
            out_q["scale"], out_q["zero_point"],
        )
        got = fs.int8_dense_gelu_q(
            x_q, layer, in_q, out_q, act="quick_gelu", tile_m=256,
            interpret=True,
        )
        assert (np.asarray(got) == np.asarray(want)).all()

    def test_resid_ln_q_matches(self, gemm_case):
        x_q, layer, in_q, ref = gemm_case
        rng = np.random.default_rng(1)
        res = jnp.asarray(rng.normal(size=(M, N)).astype(np.float32))
        ln = {
            "scale": jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
        }
        lq = {"scale": jnp.float32(0.02), "zero_point": jnp.float32(128.0)}
        y_ref = ref + res
        mean = y_ref.mean(-1, keepdims=True)
        var = ((y_ref - mean) ** 2).mean(-1, keepdims=True)
        z = (y_ref - mean) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        zq_ref = quantize_act_shifted(z, lq["scale"], lq["zero_point"])
        y, zq = fs.int8_dense_resid_ln_q(
            x_q, layer, in_q, res, ln, lq,
            out_dtype=jnp.float32, tile_m=256, interpret=True,
        )
        np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-5)
        # LN->round can straddle a rounding boundary at f32 noise level on a
        # handful of elements; require near-total agreement
        assert (np.asarray(zq) == np.asarray(zq_ref)).mean() > 0.9999

    def test_ln_quantize_matches(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(M, N)).astype(np.float32))
        ln = {
            "scale": jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
        }
        lq = {"scale": jnp.float32(0.02), "zero_point": jnp.float32(100.0)}
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        z = (x - mean) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        want = quantize_act_shifted(z, lq["scale"], lq["zero_point"])
        got = fs.ln_quantize(x, ln, lq, tile_m=256, interpret=True)
        assert (np.asarray(got) == np.asarray(want)).mean() > 0.9999

    def test_per_channel_weight_scales(self, gemm_case):
        x_q, layer, in_q, _ = gemm_case
        layer = dict(layer)
        rng = np.random.default_rng(3)
        layer["w_scale"] = jnp.asarray(
            rng.uniform(0.001, 0.003, N).astype(np.float32)
        )
        ref = int8_matmul_xla(
            x_q, layer["w_int8"], x_scale=in_q["scale"],
            x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
            w_colsum=layer["w_colsum"], bias=layer["bias"],
        )
        out = fs.int8_dense(
            x_q, layer, in_q, out_dtype=jnp.float32, tile_m=256, interpret=True
        )
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


class TestFusedPipeline:
    pytestmark = pytest.mark.slow
    def test_fused_forward_matches_unfused(self):
        import flax.linen as nn

        from qat_vit_tpu.models.registry import create_model
        from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply

        m = create_model("vit_micro_test", qat_wrapper=True)
        rng = np.random.default_rng(0)
        v = nn.meta.unbox(
            m.module.init(jax.random.key(0), m.example_input(1), observe=False)
        )
        x = jnp.asarray(
            rng.normal(size=(8,) + m.example_input(1).shape[1:]).astype(np.float32)
        )
        _, mut = m.module.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            x, observe=True, mutable=["quant_stats"],
        )
        qp = convert_vit(v["params"], mut["quant_stats"], m.cfg)
        base = int8_apply(qp, x, m.cfg, gelu_approx=True)
        fused = interpret_apply(qp, x, m.cfg, fused=True)
        assert (base.argmax(-1) == fused.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base), rtol=0.02, atol=0.02
        )


class TestMegablock:
    pytestmark = pytest.mark.slow
    def test_megablock_forward_matches_unfused(self):
        """The whole-block kernel stack (ops/block_kernel.py) reproduces the
        exact serving forward: identical argmax, close logits (bf16 residual
        stream + approx GELU are its documented numerics profile)."""
        import flax.linen as nn

        from qat_vit_tpu.models.registry import create_model
        from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply

        m = create_model("vit_micro_test", qat_wrapper=True)
        rng = np.random.default_rng(0)
        v = nn.meta.unbox(
            m.module.init(jax.random.key(0), m.example_input(1), observe=False)
        )
        x = jnp.asarray(
            rng.normal(size=(8,) + m.example_input(1).shape[1:]).astype(np.float32)
        )
        _, mut = m.module.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            x, observe=True, mutable=["quant_stats"],
        )
        qp = convert_vit(v["params"], mut["quant_stats"], m.cfg)
        base = int8_apply(qp, x, m.cfg, gelu_approx=True)
        mega = interpret_apply(
            qp, x, m.cfg, compute_dtype=jnp.bfloat16, fused="megablock"
        )
        assert (base.argmax(-1) == mega.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(mega), np.asarray(base), rtol=0.05, atol=0.05
        )

    def test_megamodel_bit_identical_to_chained(self):
        """The whole-MODEL kernel (model_forward: every block in one Pallas
        call, weights streamed on the depth grid axis) must be BIT-identical
        to the chained per-block kernels — same tile body, pure fusion."""
        import flax.linen as nn

        from qat_vit_tpu.models.registry import create_model
        from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply

        m = create_model("vit_micro_test", qat_wrapper=True)
        rng = np.random.default_rng(1)
        v = nn.meta.unbox(
            m.module.init(jax.random.key(0), m.example_input(1), observe=False)
        )
        x = jnp.asarray(
            rng.normal(size=(6,) + m.example_input(1).shape[1:]).astype(np.float32)
        )
        _, mut = m.module.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            x, observe=True, mutable=["quant_stats"],
        )
        qp = convert_vit(v["params"], mut["quant_stats"], m.cfg)
        chained = interpret_apply(qp, x, m.cfg, compute_dtype=jnp.bfloat16,
                                  fused="megablock:2:tight")
        whole = interpret_apply(qp, x, m.cfg, compute_dtype=jnp.bfloat16,
                                fused="megamodel:2:tight")
        # resident variant: weights pinned in VMEM, depth unrolled
        # in-kernel, activations carried as values — still bit-identical
        res = interpret_apply(qp, x, m.cfg, compute_dtype=jnp.bfloat16,
                              fused="megamodel_res:2:tight")
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(chained))
        np.testing.assert_array_equal(np.asarray(res), np.asarray(chained))


class TestLongMegablock:
    pytestmark = pytest.mark.slow
    def test_quick_gelu_matches_exact(self):
        """The long-sequence whole-block kernel (ops/long_block_kernel.py)
        reproduces the exact serving forward on a CLIP-style tower
        (pre-norm, quick-GELU computed exactly in-kernel): identical argmax,
        close logits (bf16 residual stream is its numerics profile).
        q_tile=64 / row_chunk=32 force >1 stripe and >1 chunk per image at
        the 17-token micro geometry (n_pad 128)."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=3)
        base = int8_apply(qp, x, cfg)  # exact path: quick-GELU in f32
        out = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                              fused="megablock_long:64:32")
        assert (base.argmax(-1) == out.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=0.05, atol=0.05
        )

    def test_lane_misaligned_gelu_matches_exact(self):
        """Lane-misaligned width (3 heads x 64 = 192 — the same misalignment
        class as OWLv2-pruned's 9x64=576) with plain tanh-GELU and a
        non-pre-norm stack."""
        import flax.linen as nn

        from qat_vit_tpu.models.registry import _vit_factory
        from qat_vit_tpu.serve.int8_vit import convert_vit, int8_apply

        arch = dict(embed_dim=192, depth=2, num_heads=3, image_size=32,
                    patch_size=8)
        m = _vit_factory(arch, "vit_misaligned_micro")(
            num_classes=10, qat_wrapper=True
        )
        rng = np.random.default_rng(3)
        v = nn.meta.unbox(
            m.module.init(jax.random.key(0), m.example_input(1),
                          observe=False)
        )
        x = jnp.asarray(
            rng.normal(size=(3,) + m.example_input(1).shape[1:]).astype(
                np.float32
            )
        )
        _, mut = m.module.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            x, observe=True, mutable=["quant_stats"],
        )
        qp = convert_vit(v["params"], mut["quant_stats"], m.cfg)
        base = int8_apply(qp, x, m.cfg, gelu_approx=True)
        out = interpret_apply(qp, x, m.cfg, compute_dtype=jnp.bfloat16,
                              fused="megablock_long:64:64")
        assert (base.argmax(-1) == out.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=0.05, atol=0.05
        )

    def test_int8_scores_matches_exact(self):
        """int8 score dots (q,k quantized onto the qkv out_q grid — the
        fake-quant site the QAT graph trains through) still argmax-agree
        with the exact path; affine-correction math is exact on that grid."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=3)
        base = int8_apply(qp, x, cfg)
        out = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                              fused="megablock_long:64:32:i8")
        assert (base.argmax(-1) == out.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=0.06, atol=0.06
        )

    def test_megamodel_long_bit_identical_to_chained(self):
        """The long-sequence whole-MODEL kernel (long_model_forward) must be
        BIT-identical to the chained per-block kernels — same body, pure
        fusion (weights streamed on the depth grid axis)."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        chained = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                  fused="megablock_long:64:32")
        whole = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                fused="megamodel_long:64:32")
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(chained))

    def test_unroll_flags_bit_identical(self):
        """Stripe/chunk unrolling is a pure scheduling knob: outputs must be
        BIT-identical to the rolled kernel."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        rolled = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                 fused="megablock_long:64:32")
        unrolled = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                   fused="megablock_long:64:32:su2:cu2")
        np.testing.assert_array_equal(np.asarray(rolled),
                                      np.asarray(unrolled))

    def test_unsupported_act_raises(self):
        import dataclasses

        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        with pytest.raises(NotImplementedError):
            int8_apply(qp, x, dataclasses.replace(cfg, act="relu"),
                       fused="megablock_long")

    def test_cross_image_block_b_bit_identical(self):
        """block_b (images per grid step — cross-image MXU/VPU pipelining) is
        a pure scheduling knob: outputs must be BIT-identical, including a
        batch that is NOT a multiple of block_b (padded and sliced)."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=3)
        base = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                               fused="megablock_long:64:32")
        bb2 = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                              fused="megablock_long:64:32:bb2")
        whole = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                fused="megamodel_long:64:32:su2:bb2")
        whole_base = interpret_apply(qp, x, cfg, compute_dtype=jnp.bfloat16,
                                     fused="megamodel_long:64:32")
        np.testing.assert_array_equal(np.asarray(bb2), np.asarray(base))
        np.testing.assert_array_equal(np.asarray(whole),
                                      np.asarray(whole_base))


class TestFusedAttention:
    def test_matches_xla_einsum(self):
        from qat_vit_tpu.ops.flash_attention import (
            fused_attention_qkv,
            xla_attention_qkv,
        )

        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.normal(size=(5, 197, 3 * 6 * 64)).astype(np.float32) * 0.3
        )
        ref = xla_attention_qkv(qkv, 6, 64)
        out = fused_attention_qkv(qkv, 6, 64, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def _quick_gelu_export(batch=6):
    """Micro CLIP-style tower (pre-norm, quick-GELU, bias-free patch embed)
    observed + converted — the OWLv2 serving geometry at test scale."""
    import flax.linen as nn

    from qat_vit_tpu.models.registry import _vit_factory
    from qat_vit_tpu.serve.int8_vit import convert_vit

    arch = dict(
        embed_dim=128, depth=2, num_heads=2, image_size=32, patch_size=8,
        pre_norm=True, act="quick_gelu", patch_bias=False,
    )
    m = _vit_factory(arch, "owlv2_micro")(num_classes=10, qat_wrapper=True)
    rng = np.random.default_rng(7)
    v = nn.meta.unbox(
        m.module.init(jax.random.key(0), m.example_input(1), observe=False)
    )
    x = jnp.asarray(
        rng.normal(size=(batch,) + m.example_input(1).shape[1:]).astype(
            np.float32
        )
    )
    _, mut = m.module.apply(
        {"params": v["params"], "quant_stats": v["quant_stats"]},
        x, observe=True, mutable=["quant_stats"],
    )
    qp = convert_vit(v["params"], mut["quant_stats"], m.cfg)
    return qp, x, m.cfg


class TestServingModeSelection:
    def test_quick_gelu_mixed_none_matches_exact(self):
        """The fused int8-handoff chain must compute the model's trained
        activation (x*sigmoid(1.702x)), not tanh-GELU — the convert-time
        gelu_q qparams assume it (regression: quick-GELU models routed to
        'mixed_none' got tanh-GELU)."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export()
        base = int8_apply(qp, x, cfg)  # exact path: quick-GELU in f32
        fused = int8_apply(qp, x, cfg, fused="mixed_none")
        assert (base.argmax(-1) == fused.argmax(-1)).all()
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base), rtol=1e-4, atol=1e-4
        )

    def test_quick_gelu_fused_modes_match_exact(self):
        """The Pallas fc1 epilogue computes quick-GELU exactly in-kernel, so
        every fused rung is available to OWLv2/CLIP models and must agree
        with the exact path."""
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        base = int8_apply(qp, x, cfg)  # exact path: quick-GELU in f32
        for mode in ("mixed", "mixed_fc1", "pallas"):
            fused = interpret_apply(qp, x, cfg, fused=mode)
            assert (base.argmax(-1) == fused.argmax(-1)).all(), mode
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(base), rtol=1e-4, atol=1e-4,
                err_msg=mode,
            )

    def test_unsupported_act_inkernel_modes_raise(self):
        import dataclasses

        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        relu_cfg = dataclasses.replace(cfg, act="relu")
        for mode in ("mixed", "mixed_fc1", "pallas"):
            with pytest.raises(NotImplementedError):
                int8_apply(qp, x, relu_cfg, fused=mode)
        # the megablock kernel still bakes tanh-GELU only
        with pytest.raises(NotImplementedError):
            int8_apply(qp, x, cfg, fused="megablock:4:tight")

    def test_unknown_fused_mode_raises(self):
        from qat_vit_tpu.serve.int8_vit import int8_apply

        qp, x, cfg = _quick_gelu_export(batch=2)
        with pytest.raises(ValueError, match="unknown fused mode"):
            int8_apply(qp, x, cfg, fused="megablok:4")

    def test_preset_kernel_opts_gating(self):
        """serving_preset must only select Pallas paths whose shape
        preconditions hold (regression: the availability gates had no
        callers and lane-misaligned models crashed at serve time)."""
        from qat_vit_tpu.models.vit import ViTConfig
        from qat_vit_tpu.serve.int8_vit import _preset_kernel_opts

        aligned_gelu = ViTConfig(embed_dim=384, num_heads=6)  # ViT-S
        assert _preset_kernel_opts(aligned_gelu)["fused"] == "megamodel:4:tight"
        # ViT-B: twice the heads -> the 5 MB stacked-score budget halves the
        # batch tile (measured optimum: bb2 5,158 img/s vs bb4 4,607)
        vit_b = ViTConfig(embed_dim=768, num_heads=12)
        assert _preset_kernel_opts(vit_b)["fused"] == "megamodel:2:tight"
        aligned_qg = ViTConfig(embed_dim=768, num_heads=12, act="quick_gelu")
        opts = _preset_kernel_opts(aligned_qg)
        assert opts == {"fused": "mixed_none", "attn_impl": "pallas_fused"}
        # ViT-Ti geometry: d=192 is lane-misaligned — the slab kernels are
        # out, but the head-separated long-sequence kernel is not
        long_rung = {"fused": "mixed_none", "attn_impl": "pallas_long"}
        misaligned = ViTConfig(embed_dim=192, num_heads=3)
        assert _preset_kernel_opts(misaligned) == long_rung
        # OWLv2-base geometry: lane-aligned heads but 2305-token sequences —
        # the batched-softmax scheme's stacked score tiles (~1 GB) cannot
        # live in VMEM; the long-sequence whole-model kernel takes over
        # (2305 → n_pad 2560 → 5 q-stripes of 512, fully unrolled)
        # (regression 1: the gate only checked head geometry; regression 2:
        # the pre-long-kernel fallback was the plain XLA path, which
        # materializes ~850 MB of scores per batch-8 forward)
        long_mega = {"fused": "megamodel_long:512:256:su5"}
        long_seq = ViTConfig(embed_dim=768, num_heads=12, image_size=768,
                             act="quick_gelu", pre_norm=True)
        assert _preset_kernel_opts(long_seq) == long_mega
        long_seq_gelu = ViTConfig(embed_dim=768, num_heads=12, image_size=768)
        assert _preset_kernel_opts(long_seq_gelu) == long_mega
        # a geometry past every kernel's gates: head_dim > one register
        assert _preset_kernel_opts(
            ViTConfig(embed_dim=512, num_heads=2)
        ) == {}

    def test_attention_train_seq_len_gate(self):
        from qat_vit_tpu.ops.flash_attention_train import (
            attention_train_available,
        )

        # seq fit is independent of backend: a 2305-token ViT-B geometry
        # must be rejected even where the head geometry qualifies
        assert not attention_train_available(12, 64, seq_len=2305)
