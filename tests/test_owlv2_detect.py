"""Flax OWLv2 detection heads vs the real HF implementation.

The reference constructs ``Owlv2ForObjectDetection`` and wraps it in
QATWrapper(task='detection') but can never train or run it through its own
pipeline (ref model_registry.py:99-124, 269-327). Our framework ships a
runnable Flax counterpart (models/owlv2_detect.py); these tests pin its math
to the installed ``transformers`` implementation at float64 (box bias, merged
feature map, class/box/objectness heads), via the checkpoint converter — so
real OWLv2 weights produce identical detections.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tfm = pytest.importorskip("transformers")

from qat_vit_tpu.models.owlv2_detect import (  # noqa: E402
    Owlv2Detector,
    box_bias,
    create_detector,
    owlv2_detection_to_params,
)
from qat_vit_tpu.models.vit import ViTConfig  # noqa: E402

VIS = dict(hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
           intermediate_size=256, image_size=32, patch_size=8)
TXT = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
           intermediate_size=128)


@pytest.fixture(scope="module")
def hf_micro():
    cfg = tfm.Owlv2Config(text_config=dict(TXT), vision_config=dict(VIS))
    torch.manual_seed(0)
    m = tfm.Owlv2ForObjectDetection(cfg).double().eval()
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(std=0.05)
    return m


def _flax_cfg():
    return ViTConfig(
        num_classes=0, image_size=32, patch_size=8, embed_dim=128, depth=2,
        num_heads=2, mlp_ratio=2.0, pre_norm=True, act="quick_gelu",
        patch_bias=False, layer_norm_eps=1e-5, quant=None,
        dtype=jnp.float64,
    )


class TestDetectionParity:
    def test_full_detection_forward_matches_hf(self, hf_micro):
        """boxes / class logits / objectness / class embeds all agree with
        the torch heads driven directly (image_embedder -> box_predictor /
        class_predictor / objectness_predictor), float64, <=1e-5."""
        m = hf_micro
        cfg = _flax_cfg()
        state = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = owlv2_detection_to_params(state, cfg, text_dim=64)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 3))
        q = rng.normal(size=(2, 5, 64))
        qmask = np.ones((2, 5), np.int32)
        qmask[1, 3:] = 0

        with torch.no_grad():
            feature_map, _ = m.image_embedder(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
            b, h, w, d = feature_map.shape
            feats = feature_map.reshape(b, h * w, d)
            boxes_t = m.box_predictor(feats, feature_map).numpy()
            logits_t, cls_emb_t = m.class_predictor(
                feats, torch.from_numpy(q), torch.from_numpy(qmask)
            )
            obj_t = m.objectness_predictor(feats).numpy()

        with jax.enable_x64(True):
            det = Owlv2Detector(cfg, text_dim=64)
            out = det.apply(
                {"params": jax.tree.map(
                    lambda a: jnp.asarray(a, jnp.float64), params)},
                jnp.asarray(x, jnp.float64), jnp.asarray(q, jnp.float64),
                jnp.asarray(qmask),
            )
        np.testing.assert_allclose(np.asarray(out["pred_boxes"]), boxes_t,
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["objectness_logits"]),
                                   obj_t, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["class_embeds"]),
                                   cls_emb_t.numpy(), atol=1e-5, rtol=1e-5)
        # masked query positions are large-negative on both sides; compare
        # the valid entries exactly and the mask positions by sign
        lt = logits_t.numpy()
        lj = np.asarray(out["logits"])
        valid = np.broadcast_to(qmask[:, None, :] == 1, lt.shape)
        np.testing.assert_allclose(lj[valid], lt[valid], atol=1e-5, rtol=1e-5)
        assert (lj[~valid] < -1e30).all() and (lt[~valid] < -1e30).all()

    def test_box_bias_matches_hf(self, hf_micro):
        ours = np.asarray(box_bias(4, 4))
        theirs = hf_micro.compute_box_bias(4, 4).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6, rtol=1e-6)


class TestDetectorQAT:
    def test_qat_wrapper_tower_observes_and_runs(self):
        """create_detector(qat_wrapper=True): fake-quant sites live in the
        TOWER only (float heads — the reference QATWrapper's detection
        semantics: quantized backbone, dequantized logits out)."""
        det, cfg = create_detector(
            pruned=True, qat_wrapper=True,
            image_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
            mlp_ratio=2.0,
        )
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v = det.init(jax.random.key(0), x, observe=False)
        assert "quant_stats" in v
        flat = jax.tree_util.tree_leaves_with_path(v["quant_stats"])
        paths = {jax.tree_util.keystr(p) for p, _ in flat}
        assert all(p.startswith("['vision']") for p in paths)
        q = jnp.zeros((2, 3, 512), jnp.float32)
        out, mut = det.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            x, q, observe=True, mutable=["quant_stats"],
        )
        assert out["pred_boxes"].shape == (2, 16, 4)
        assert out["logits"].shape == (2, 16, 3)
        assert np.isfinite(np.asarray(out["pred_boxes"])).all()

    def test_registry_entries(self):
        from qat_vit_tpu.models import create_model, list_available_models

        models = list_available_models()
        assert models["owlv2_base_detector"]["task"] == "detection"
        b = create_model("owlv2_pruned_detector", image_size=32, patch_size=8,
                         embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0)
        v = b.init(jax.random.key(0))
        out = b.module.apply(v, b.example_input(1))
        assert out["pred_boxes"].shape == (1, 16, 4)


def _trained_micro_detector(seed=0, steps=6):
    """QAT-armed micro detector with observers populated by observe passes."""
    import flax.linen as nn

    from qat_vit_tpu.models.owlv2_detect import create_detector

    det, cfg = create_detector(
        pruned=True, qat_wrapper=True,
        image_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        mlp_ratio=2.0,
    )
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    v = det.init(jax.random.key(seed), x0, observe=False)
    params, qs = v["params"], v["quant_stats"]

    @jax.jit
    def obs(params, qs, x):
        _, mut = det.apply(
            {"params": params, "quant_stats": qs}, x, observe=True,
            mutable=["quant_stats"],
        )
        return mut["quant_stats"]

    for _ in range(steps):
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        qs = obs(params, qs, x)
    return det, cfg, nn.meta.unbox(params), qs


class TestInt8DetectionServing:
    """True-int8 detection: int8 tower (feature mode) + float heads must
    track the fake-quant detector it was converted from (VERDICT r3 item 1;
    ref detection QATWrapper semantics, model_registry.py:99-124)."""

    def test_int8_detector_tracks_fake_quant(self):
        from qat_vit_tpu.serve import convert_detector, int8_detect_apply

        det, cfg, params, qs = _trained_micro_detector()
        export = convert_detector(params, qs, cfg)
        assert "head" not in export["tower"]  # feature-mode convert
        assert "vision" not in export["heads"]

        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(8, 4, 512)).astype(np.float32))
        fq = det.apply({"params": params, "quant_stats": qs}, x, q,
                       observe=False)
        i8 = int8_detect_apply(export, x, cfg, q)

        for key in ("pred_boxes", "logits", "objectness_logits"):
            a = np.asarray(fq[key], np.float32).ravel()
            b = np.asarray(i8[key], np.float32).ravel()
            corr = np.corrcoef(a, b)[0, 1]
            assert corr > 0.97, (key, corr)
        # boxes are sigmoid-squashed to [0,1]: absolute tolerance is meaningful
        box_err = np.abs(np.asarray(fq["pred_boxes"])
                         - np.asarray(i8["pred_boxes"])).mean()
        assert box_err < 0.03, box_err
        # top-box agreement: the best patch per (image, query) by class logit
        top_fq = np.asarray(fq["logits"]).argmax(axis=1)
        top_i8 = np.asarray(i8["logits"]).argmax(axis=1)
        agree = (top_fq == top_i8).mean()
        assert agree >= 0.75, agree
        # and by objectness
        obj_agree = (
            np.asarray(fq["objectness_logits"]).argmax(-1)
            == np.asarray(i8["objectness_logits"]).argmax(-1)
        ).mean()
        assert obj_agree >= 0.75, obj_agree

    def test_feature_mode_tokens_consistent_across_paths(self):
        """The tokens-out serving forward must agree between the exact path
        and the fused/megablock kernels (interpret mode on CPU)."""
        from qat_vit_tpu.serve import convert_detector
        from qat_vit_tpu.serve.int8_vit import int8_apply

        det, cfg, params, qs = _trained_micro_detector(seed=3)
        export = convert_detector(params, qs, cfg)
        x = jnp.asarray(np.random.default_rng(7).normal(
            size=(2, 32, 32, 3)).astype(np.float32))
        exact = np.asarray(int8_apply(export["tower"], x, cfg))
        assert exact.shape == (2, 17, 64)  # [B, N, D] token stream
        mixed = np.asarray(int8_apply(export["tower"], x, cfg,
                                      fused="mixed_none"))
        np.testing.assert_allclose(mixed, exact, atol=2e-2, rtol=0)
        # one jitted call under the interpreter (the eager-glue/io_callback
        # dispatch deadlock; see tests/test_fused_serve.interpret_apply)
        from test_fused_serve import interpret_apply

        long = np.asarray(interpret_apply(
            export["tower"], x, cfg, compute_dtype=jnp.bfloat16,
            fused="megablock_long:64:32"))
        # bf16 stream + in-kernel quick-GELU vs exact f32: token grid step
        # dominates the tolerance
        err = np.abs(long - exact).mean() / (np.abs(exact).mean() + 1e-9)
        assert err < 0.05, err

    def test_export_checkpoint_roundtrip(self, tmp_path):
        from qat_vit_tpu.serve import convert_detector, int8_detect_apply
        from qat_vit_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        det, cfg, params, qs = _trained_micro_detector(seed=5)
        export = convert_detector(params, qs, cfg)
        path = str(tmp_path / "detector_int8.msgpack")
        save_checkpoint(path, export)
        restored = jax.tree.map(jnp.asarray, load_checkpoint(path))
        x = jnp.asarray(np.random.default_rng(8).normal(
            size=(2, 32, 32, 3)).astype(np.float32))
        q = jnp.asarray(np.random.default_rng(9).normal(
            size=(2, 3, 512)).astype(np.float32))
        a = int8_detect_apply(export, x, cfg, q)
        b = int8_detect_apply(restored, x, cfg, q)
        for key in a:
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]), atol=1e-6)

    def test_classifier_convert_still_requires_head(self):
        """num_classes>0 converts must keep exporting the head bundle."""
        from qat_vit_tpu.models.vit import VisionTransformer
        from qat_vit_tpu.quant import default_qat_qconfig
        from qat_vit_tpu.serve import convert_vit

        import flax.linen as nn

        cfg = ViTConfig(num_classes=10, image_size=32, patch_size=8,
                        embed_dim=64, depth=1, num_heads=2,
                        quant=default_qat_qconfig(), qat_wrapper=True)
        m = VisionTransformer(cfg)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.key(0), x, observe=False)
        _, mut = m.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]},
            jnp.asarray(np.random.default_rng(0).normal(
                size=(2, 32, 32, 3)).astype(np.float32)),
            observe=True, mutable=["quant_stats"],
        )
        qp = convert_vit(nn.meta.unbox(v["params"]), mut["quant_stats"], cfg)
        assert "head" in qp
