"""Converter proof at REAL checkpoint geometry (round-2 verdict item 3).

The mini-geometry parity tests (test_vit_model.py) validate the math; these
validate the *name/shape mapping at deployment geometry* — the one failure
mode that would otherwise only surface when real teacher weights arrive:

- a timm-layout ViT-B/16 and ViT-S/16 at full 224px geometry (torch module
  defined in-test with timm's exact state-dict key layout; timm itself is not
  installed in this env — random weights, which is all a mapping proof needs),
  converted with ``strict=True`` (every checkpoint key must be consumed) and
  checked for float64 forward agreement ≤1e-5 (ref model_registry.py:152-207);
- the REAL HuggingFace ``Owlv2VisionModel`` / ``CLIPVisionModel`` modules
  (transformers is installed) at full depth/width, exercising both
  pre-encoder-LN spellings (OWLv2 ``pre_layernorm`` vs CLIP's upstream typo
  ``pre_layrnorm``) and the ``vision_model.`` prefix (ref :269-327).

Runbook for loading actual pretrained weights once network/disk access
exists: docs/MIGRATION.md §"Bringing your own teacher weights".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.models import ViTConfig, VisionTransformer
from qat_vit_tpu.models.torch_convert import (
    owlv2_vision_to_params,
    params_to_timm_vit,
    timm_vit_to_params,
)

torch = pytest.importorskip("torch")

from tests.test_vit_model import TorchMiniViT  # noqa: E402  (timm-layout ViT)


def _f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)


def _forward_agreement_timm(img, patch, dim, depth, heads, classes, batch=2):
    """Convert a full-geometry timm-layout state dict and compare float64
    forwards torch-vs-JAX. f64 removes matmul-reassociation noise, so any
    disagreement ≥1e-5 is a wiring bug, not accumulation drift."""
    torch.manual_seed(0)
    tm = TorchMiniViT(img=img, patch=patch, dim=dim, depth=depth,
                      heads=heads, classes=classes).double()
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(std=0.02)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = ViTConfig(num_classes=classes, image_size=img, patch_size=patch,
                    embed_dim=dim, depth=depth, num_heads=heads, quant=None)
    params = timm_vit_to_params(state, cfg, strict=True)

    # bit-exact roundtrip at full geometry (JAX pytree -> timm keys)
    back = params_to_timm_vit(params, cfg)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k].astype(np.float32))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, img, img, 3))
    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    with jax.enable_x64(True):
        cfg64 = ViTConfig(num_classes=classes, image_size=img,
                          patch_size=patch, embed_dim=dim, depth=depth,
                          num_heads=heads, quant=None, dtype=jnp.float64)
        yj = VisionTransformer(cfg64).apply(
            {"params": _f64(params)}, jnp.asarray(x, jnp.float64),
            observe=False,
        )
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


class TestTimmFullGeometry:
    def test_vit_b16_224(self):
        """ViT-B/16 @224: 12 blocks x 768 wide, 1000 classes — the reference
        teacher's exact deployment geometry (model_registry.py:167-189)."""
        _forward_agreement_timm(224, 16, 768, 12, 12, 1000)

    def test_vit_s16_224(self):
        """ViT-S/16 @224 (the student geometry, model_registry.py:213-261)."""
        _forward_agreement_timm(224, 16, 384, 12, 6, 1000)


def _hf_vision_agreement(hf_model, img, dim, depth, heads, mlp_dim, eps,
                         batch=2):
    """Convert a real HF CLIP-style vision tower and compare float64 pooler
    outputs. Our model's ``head`` (no HF counterpart) is set to the identity
    so the logits ARE the pooled pre-head feature norm(x)[:, 0]."""
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = ViTConfig(
        num_classes=dim, image_size=img, patch_size=16, embed_dim=dim,
        depth=depth, num_heads=heads, mlp_ratio=mlp_dim / dim, quant=None,
        pre_norm=True, act="quick_gelu", patch_bias=False, layer_norm_eps=eps,
    )
    params = owlv2_vision_to_params(state, cfg, strict=True)
    params["head"] = {"kernel": np.eye(dim, dtype=np.float32),
                      "bias": np.zeros(dim, np.float32)}

    rng = np.random.default_rng(1)
    x = rng.normal(size=(batch, img, img, 3))
    with torch.no_grad():
        pooled = hf_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).pooler_output.numpy()
    import dataclasses

    with jax.enable_x64(True):
        cfg64 = dataclasses.replace(cfg, dtype=jnp.float64)
        yj = VisionTransformer(cfg64).apply(
            {"params": _f64(params)}, jnp.asarray(x, jnp.float64),
            observe=False,
        )
    np.testing.assert_allclose(np.asarray(yj), pooled, atol=1e-5, rtol=1e-5)


class TestHFVisionTowers:
    pytestmark = pytest.mark.slow
    def test_owlv2_vision_model_real_module(self):
        """The real ``transformers.Owlv2VisionModel`` at full depth/width
        (768x12x12, quick-GELU, ``pre_layernorm``, bias-free patch conv),
        224px for CPU-tractable runtime — position-embedding mapping is
        size-independent code; the full-768px seq_len shape assert is in
        test_owlv2_full_seqlen_conversion."""
        tfm = pytest.importorskip("transformers")
        cfg = tfm.Owlv2VisionConfig(image_size=224)
        torch.manual_seed(0)
        m = tfm.Owlv2VisionModel(cfg).double().eval()
        with torch.no_grad():  # HF init is fine but keep magnitudes tame
            for p in m.parameters():
                p.normal_(std=0.02)
        assert "vision_model.pre_layernorm.weight" in m.state_dict()
        _hf_vision_agreement(m, 224, cfg.hidden_size, cfg.num_hidden_layers,
                             cfg.num_attention_heads, cfg.intermediate_size,
                             cfg.layer_norm_eps)

    def test_clip_vision_model_pre_layrnorm_spelling(self):
        """CLIPVisionModel spells the pre-encoder LN ``pre_layrnorm`` (the
        upstream typo) — the converter must accept both spellings."""
        tfm = pytest.importorskip("transformers")
        cfg = tfm.CLIPVisionConfig(image_size=224, patch_size=16, hidden_size=768,
                                   num_hidden_layers=2, num_attention_heads=12,
                                   intermediate_size=3072)
        torch.manual_seed(0)
        m = tfm.CLIPVisionModel(cfg).double().eval()
        with torch.no_grad():
            for p in m.parameters():
                p.normal_(std=0.02)
        assert "vision_model.pre_layrnorm.weight" in m.state_dict()
        _hf_vision_agreement(m, 224, 768, 2, 12, 3072, cfg.layer_norm_eps)

    def test_owlv2_full_seqlen_conversion(self):
        """Strict conversion of a full-768px-geometry OWLv2 state dict
        (2305-token pos embed) — shape plumbing without the 37s forward.
        Detection/text keys (full ``Owlv2ForObjectDetection`` checkpoints)
        must be skipped, with the ``owlv2.vision_model.`` prefix stripped."""
        from qat_vit_tpu.models.owlv2 import owlv2_vision_vit_kwargs

        kw = owlv2_vision_vit_kwargs()
        kw["image_size"] = 768  # HF default config geometry
        cfg = ViTConfig(num_classes=768, quant=None, **kw)
        D, depth, mlp = 768, 12, 3072
        rng = np.random.default_rng(2)

        def w(*shape):
            return rng.normal(size=shape).astype(np.float32)

        state = {
            "owlv2.vision_model.embeddings.patch_embedding.weight": w(D, 3, 16, 16),
            "owlv2.vision_model.embeddings.class_embedding": w(D),
            "owlv2.vision_model.embeddings.position_embedding.weight": w(2305, D),
            "owlv2.vision_model.pre_layernorm.weight": w(D),
            "owlv2.vision_model.pre_layernorm.bias": w(D),
            "owlv2.vision_model.post_layernorm.weight": w(D),
            "owlv2.vision_model.post_layernorm.bias": w(D),
            # detection-head keys that must be ignored
            "class_head.logit_shift.weight": w(1, D),
            "box_head.dense0.weight": w(D, D),
            "objectness_head.dense0.bias": w(D),
            "logit_scale": np.asarray(2.65, np.float32),
            "owlv2.text_model.final_layer_norm.weight": w(512),
            "owlv2.visual_projection.weight": w(512, D),
            "layer_norm.weight": w(D),
        }
        for i in range(depth):
            b = f"owlv2.vision_model.encoder.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                state[f"{b}.self_attn.{proj}.weight"] = w(D, D)
                state[f"{b}.self_attn.{proj}.bias"] = w(D)
            for lnk in ("layer_norm1", "layer_norm2"):
                state[f"{b}.{lnk}.weight"] = w(D)
                state[f"{b}.{lnk}.bias"] = w(D)
            state[f"{b}.mlp.fc1.weight"] = w(mlp, D)
            state[f"{b}.mlp.fc1.bias"] = w(mlp)
            state[f"{b}.mlp.fc2.weight"] = w(D, mlp)
            state[f"{b}.mlp.fc2.bias"] = w(D)

        params = owlv2_vision_to_params(state, cfg, strict=True)
        assert params["pos_embed"].shape == (1, 2305, D)
        assert params["patch_embed"]["proj"]["kernel"].shape == (16 * 16 * 3, D)
        # tree slots directly into an initialized template of the same cfg
        template = VisionTransformer(cfg).init(
            jax.random.key(0), jnp.zeros((1, 768, 768, 3)), observe=False
        )["params"]
        import flax.linen as nn

        template = nn.meta.unbox(template)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            tpl = template
            for p in path:
                tpl = tpl[p.key if hasattr(p, "key") else p.idx]
            assert np.shape(tpl) == np.shape(leaf), (path, np.shape(tpl),
                                                     np.shape(leaf))
