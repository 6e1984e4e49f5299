"""OWLv2 family tests: pure surgery semantics + offline torch construction."""

import numpy as np
import pytest

from qat_vit_tpu.models.owlv2 import (
    OWLV2_BASE_VISION,
    prune_owlv2_geometry,
)


class TestSurgeryRule:
    def test_default_ratios(self):
        """Reference defaults 0.75 (model_registry.py:283-286): 12→9 layers,
        768→576 width, 12→9 heads, image forced to 768."""
        out = prune_owlv2_geometry(OWLV2_BASE_VISION)
        assert out["num_hidden_layers"] == 9
        assert out["hidden_size"] == 576
        assert out["num_attention_heads"] == 9
        assert out["image_size"] == 768

    def test_floors(self):
        """Floors 6/384/6 (reference :293-295) bind for small ratios."""
        out = prune_owlv2_geometry(OWLV2_BASE_VISION, 0.1, 0.1, 0.1)
        assert out["num_hidden_layers"] == 6
        assert out["hidden_size"] == 384
        assert out["num_attention_heads"] == 6

    def test_identity_ratio(self):
        out = prune_owlv2_geometry(OWLV2_BASE_VISION, 1.0, 1.0, 1.0)
        assert out["num_hidden_layers"] == 12
        assert out["hidden_size"] == 768
        assert out["num_attention_heads"] == 12
        assert out["image_size"] == 768  # still forced


class TestOfflineConstruction:
    def test_student_builds_without_network(self):
        transformers = pytest.importorskip("transformers")
        from qat_vit_tpu.models.owlv2 import build_owlv2_student_torch

        model = build_owlv2_student_torch(0.5, 0.5, 0.5)
        vc = model.config.vision_config
        assert vc.num_hidden_layers == 6
        assert vc.hidden_size == 384
        assert vc.num_attention_heads == 6
        assert vc.image_size == 768

    def test_missing_checkpoint_warns_random_init(self, tmp_path):
        pytest.importorskip("transformers")
        from qat_vit_tpu.models.owlv2 import build_owlv2_student_torch

        with pytest.warns(RuntimeWarning, match="Checkpoint not found"):
            build_owlv2_student_torch(
                0.5, 0.5, 0.5, checkpoint_path=str(tmp_path / "missing.pth")
            )

    def test_registry_entries(self):
        pytest.importorskip("transformers")
        from qat_vit_tpu.models import create_model, list_available_models
        from qat_vit_tpu.models.registry import is_tpu

        info = list_available_models()
        assert info["owlv2_student_pruned"]["task"] == "detection"
        if is_tpu():
            with pytest.raises(ValueError, match="not TPU-compatible"):
                create_model("owlv2_student_pruned")
        else:
            model = create_model("owlv2_student_pruned")
            assert model.config.vision_config.image_size == 768
