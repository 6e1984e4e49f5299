"""ViT geometry + numerics tests, including torch cross-validation.

A minimal timm-faithful torch ViT is defined *in the test* (timm itself is
unavailable) and used to check that (a) the torch→JAX checkpoint converter
maps weights correctly and (b) the Flax forward reproduces torch's math to
float tolerance. This validates the teacher-weight path the reference gets
from ``timm.create_model`` + HF checkpoints (ref model_registry.py:167-207).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qat_vit_tpu.models import (
    ViTConfig,
    VisionTransformer,
    count_fake_quant_sites,
    create_model,
    create_student,
    create_teacher,
    get_model_complexity,
    list_available_models,
    normalize_state_dict_keys,
    params_to_timm_vit,
    timm_vit_to_params,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchMiniViT(tnn.Module):
    """timm ``VisionTransformer`` forward, minimal (pre-norm, cls token)."""

    def __init__(self, img=32, patch=8, dim=64, depth=2, heads=2, classes=10):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n + 1, dim))
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            blk.attn = tnn.Module()
            blk.attn.qkv = tnn.Linear(dim, dim * 3)
            blk.attn.proj = tnn.Linear(dim, dim)
            blk.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            blk.mlp = tnn.Module()
            blk.mlp.fc1 = tnn.Linear(dim, dim * 4)
            blk.mlp.fc2 = tnn.Linear(dim * 4, dim)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, classes)
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # [B, N, D]
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        h = self.heads
        hd = self.dim // h
        for blk in self.blocks:
            y = blk.norm1(x)
            B_, N, D = y.shape
            qkv = blk.attn.qkv(y).reshape(B_, N, 3, h, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * (hd**-0.5)
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(B_, N, D)
            x = x + blk.attn.proj(y)
            y = blk.norm2(x)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(y)))
        x = self.norm(x)[:, 0]
        return self.head(x)


@pytest.fixture(scope="module")
def mini_pair():
    torch.manual_seed(0)
    tm = TorchMiniViT()
    for p in tm.parameters():
        if p.dim() > 1:
            tnn.init.normal_(p, std=0.05)
        else:
            tnn.init.normal_(p, std=0.02)
    cfg = ViTConfig(
        num_classes=10, image_size=32, patch_size=8, embed_dim=64, depth=2,
        num_heads=2, quant=None,
    )
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = timm_vit_to_params(state, cfg)
    return tm, cfg, params


class TestTorchParity:
    def test_forward_matches_torch(self, mini_pair):
        tm, cfg, params = mini_pair
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        model = VisionTransformer(cfg)
        yj = model.apply({"params": params}, jnp.asarray(x), observe=False)
        # f32 matmul reassociation across 2 blocks accumulates ~1e-4 absolute
        # drift on O(0.03) logits (LayerNorm/GELU/attention verified exact
        # separately); this bounds end-to-end wiring, not ulp equality.
        np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-3, rtol=1e-3)

    def test_roundtrip_converter(self, mini_pair):
        tm, cfg, params = mini_pair
        back = params_to_timm_vit(params, cfg)
        orig = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        assert set(back) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(back[k], orig[k])

    def test_normalize_state_dict_tolerance(self, mini_pair):
        tm, cfg, _ = mini_pair
        raw = {f"module.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
        raw["quant.scale"] = np.ones(1)
        raw["dequant.zero_point"] = np.zeros(1)
        raw["blocks.0.attn.qkv.weight_fake_quant.scale"] = np.ones(1)
        nested = {"state_dict": raw}
        params = timm_vit_to_params(nested, cfg)
        assert "patch_embed" in params

    def test_qat_model_same_param_tree(self, mini_pair):
        """QAT config must reuse the float parameter tree unchanged."""
        from qat_vit_tpu.quant import default_qat_qconfig
        import dataclasses

        _, cfg, params = mini_pair
        qcfg = dataclasses.replace(cfg, quant=default_qat_qconfig(), qat_wrapper=True)
        import flax.linen as nn

        model = VisionTransformer(qcfg)
        x = jnp.zeros((2, 32, 32, 3))
        variables = model.init(jax.random.key(0), x, observe=False)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.shape(a), np.shape(b)),
            nn.meta.unbox(variables["params"]),
            params,
        )
        # And the float params must drive the QAT model directly.
        y, mut = model.apply(
            {"params": params, "quant_stats": variables["quant_stats"]},
            x,
            observe=True,
            mutable=["quant_stats"],
        )
        assert y.shape == (2, 10)


class TestCheckpointPathways:
    def test_convert_teacher_script_and_trainer_load(self, tmp_path, mini_pair):
        """torch .pth → convert_teacher.py → msgpack → trainer loads it, and
        the .pth also loads directly (on-the-fly conversion)."""
        tm, cfg, params = mini_pair
        pth = str(tmp_path / "teacher.pth")
        torch.save({"state_dict": {f"module.{k}": v for k, v in
                                   tm.state_dict().items()}}, pth)

        # the registry model is ViT-sized; convert against the mini geometry
        # by calling the same functions the script drives
        from qat_vit_tpu.models.torch_convert import (
            load_torch_state_dict, timm_vit_to_params)
        from qat_vit_tpu.utils.checkpoint import save_checkpoint
        from qat_vit_tpu.train.trainer import load_model_params

        state = load_torch_state_dict(pth)
        p2 = timm_vit_to_params(state, cfg)
        msgpack_path = str(tmp_path / "teacher.msgpack")
        save_checkpoint(msgpack_path, {"params": p2})

        # load path 1: msgpack
        loaded = load_model_params(msgpack_path, cfg)
        np.testing.assert_array_equal(
            np.asarray(loaded["head"]["kernel"]), params["head"]["kernel"])
        # load path 2: raw .pth converted on the fly
        loaded2 = load_model_params(pth, cfg)
        np.testing.assert_array_equal(
            np.asarray(loaded2["head"]["kernel"]), params["head"]["kernel"])


class TestQuantSites:
    def test_fake_quant_site_count_matches_torch_prepare_qat(self):
        """Survey-verified: 2-block ViT under prepare_qat gets 10 weight + 16
        activation fake-quants. Our module tree must create exactly those."""
        from qat_vit_tpu.quant import default_qat_qconfig

        cfg = ViTConfig(
            image_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
            quant=default_qat_qconfig(), qat_wrapper=True,
        )
        model = VisionTransformer(cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), observe=False)
        flat = jax.tree_util.tree_leaves_with_path(variables["quant_stats"])
        paths = {jax.tree_util.keystr(p) for p, _ in flat}
        n_sites = len(paths) // 2  # min_val + max_val per site
        expected = count_fake_quant_sites(cfg)
        assert n_sites == expected["weight"] + expected["activation"] == 26

    def test_no_quant_stats_when_float(self):
        cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=64, depth=2,
                        num_heads=2, quant=None)
        model = VisionTransformer(cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), observe=False)
        assert "quant_stats" not in variables


class TestRegistry:
    def test_list_and_metadata(self):
        models = list_available_models()
        assert "vit_small_patch16_224_student" in models
        assert "vit_base_patch16_224_teacher" in models
        # the first-class owlv2 entries are Flax vision towers (classification
        # backbones for KD+QAT); the reference-parity torch detection entries
        # live under the _torch suffix
        assert models["owlv2_base_teacher"]["task"] == "classification"
        assert models["owlv2_base_teacher_torch"]["task"] == "detection"

    def test_create_student_has_qat_wrapper(self):
        b = create_student("vit")
        assert b.cfg.quant is not None and b.cfg.qat_wrapper

    def test_create_teacher_is_float(self):
        b = create_teacher("vit")
        assert b.cfg.quant is None
        assert b.cfg.embed_dim == 768 and b.cfg.depth == 12

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError):
            create_model("nope")

    def test_complexity(self):
        c = get_model_complexity("vit_small_patch16_224_student")
        # timm vit_small head for 10 classes: ~21.7M params
        assert 21_000_000 < c["params"] < 23_000_000
        assert c["gflops"] == 4.7

    def test_micro_forward(self):
        b = create_model("vit_micro_test", qat_wrapper=True)
        v = b.init(jax.random.key(0), batch_size=2)
        y, _ = b.module.apply(
            v, b.example_input(2), observe=True, mutable=["quant_stats"]
        )
        assert y.shape == (2, 10)


class TestRemat:
    pytestmark = pytest.mark.slow
    """Per-block rematerialization (cfg.remat) is a pure scheduling knob:
    loss, gradients, AND observer-stat updates must be bit-identical to the
    unrematerialized model (the QAT bandwidth-for-FLOPs trade,
    docs/BENCHMARKS.md round 4)."""

    def test_remat_modes_bit_identical(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer
        from qat_vit_tpu.quant import default_qat_qconfig

        base = ViTConfig(
            num_classes=10, image_size=32, patch_size=8, embed_dim=64,
            depth=2, num_heads=2, quant=default_qat_qconfig(),
            qat_wrapper=True,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 3)).astype(np.float32))
        v = VisionTransformer(base).init(jax.random.key(0), x, observe=False)

        def run(cfg):
            m = VisionTransformer(cfg)

            def f(params, qs):
                logits, mut = m.apply(
                    {"params": params, "quant_stats": qs}, x,
                    observe=True, mutable=["quant_stats"])
                return jnp.sum(logits ** 2), mut["quant_stats"]

            (loss, qs2), grads = jax.value_and_grad(f, has_aux=True)(
                v["params"], v["quant_stats"])
            return loss, grads, qs2

        l0, g0, q0 = run(base)
        for mode in ("dots", "full"):
            l1, g1, q1 = run(dataclasses.replace(base, remat=mode))
            assert float(l0) == float(l1), mode
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(q0), jax.tree.leaves(q1)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_unknown_remat_mode_raises(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import pytest

        from qat_vit_tpu.models.vit import ViTConfig, VisionTransformer

        cfg = dataclasses.replace(
            ViTConfig(num_classes=10, image_size=32, patch_size=8,
                      embed_dim=64, depth=1, num_heads=2), remat="bogus")
        with pytest.raises(ValueError, match="remat"):
            VisionTransformer(cfg).init(
                jax.random.key(0), jnp.zeros((1, 32, 32, 3)), observe=False)
