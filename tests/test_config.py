"""Config-system tests: three-tier precedence, casting, persistence
(reference _load_hparams semantics, qat_trainer.py:84-109, 163-191)."""

import argparse

import yaml

from qat_vit_tpu.train.config import (
    DEFAULT_HPARAMS,
    add_hparam_flags,
    load_hparams,
    resolve_hparams,
    save_effective_hparams,
)


def _parse(argv):
    p = argparse.ArgumentParser()
    add_hparam_flags(p)
    return p.parse_args(argv)


class TestPrecedence:
    def test_defaults_only(self):
        hp = resolve_hparams(_parse([]))
        assert hp == {**DEFAULT_HPARAMS}

    def test_yaml_overrides_defaults(self, tmp_path):
        cfg = tmp_path / "best_params.yaml"
        yaml.safe_dump({"lr": 6.53e-5, "qat_start_epoch": 0}, cfg.open("w"))
        hp = resolve_hparams(_parse(["--config", str(cfg)]))
        assert hp["lr"] == 6.53e-5
        assert hp["qat_start_epoch"] == 0
        assert hp["epochs"] == DEFAULT_HPARAMS["epochs"]

    def test_cli_overrides_yaml(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        yaml.safe_dump({"lr": 1e-4, "epochs": 20}, cfg.open("w"))
        hp = resolve_hparams(_parse(["--config", str(cfg), "--lr", "2e-4"]))
        assert hp["lr"] == 2e-4  # CLI wins
        assert hp["epochs"] == 20  # yaml survives where CLI silent

    def test_reference_kd_temp_alias(self, tmp_path):
        """A reference-produced best_params.yaml (key 'kd_temp',
        optuna_search.py:135) must set our kd_temperature, not be dropped."""
        cfg = tmp_path / "best_params.yaml"
        yaml.safe_dump({"kd_temp": 4.43, "lr": 6.53e-5}, cfg.open("w"))
        hp = load_hparams(str(cfg))
        assert hp["kd_temperature"] == 4.43

    def test_missing_yaml_warns_and_defaults(self, tmp_path, caplog):
        hp = load_hparams(str(tmp_path / "nope.yaml"))
        assert hp["lr"] == DEFAULT_HPARAMS["lr"]
        assert any("not found" in r.message for r in caplog.records)

    def test_type_casting_from_yaml_strings(self, tmp_path):
        """The search writes floats; users hand-edit strings — both cast
        (ref :87-96 type normalization)."""
        cfg = tmp_path / "c.yaml"
        yaml.safe_dump(
            {"lr": "0.0001", "qat_start_epoch": "3", "amp": "false"},
            cfg.open("w"))
        hp = load_hparams(str(cfg))
        assert hp["lr"] == 1e-4 and isinstance(hp["lr"], float)
        assert hp["qat_start_epoch"] == 3 and isinstance(hp["qat_start_epoch"], int)
        assert hp["amp"] is False

    def test_bool_cli_flag(self):
        hp = resolve_hparams(_parse(["--amp", "false"]))
        assert hp["amp"] is False
        hp = resolve_hparams(_parse(["--amp", "true"]))
        assert hp["amp"] is True

    def test_effective_hparams_roundtrip(self, tmp_path):
        hp = dict(DEFAULT_HPARAMS)
        hp["lr"] = 3.3e-4
        path = save_effective_hparams(hp, str(tmp_path))
        assert path.endswith("effective_hparams.yaml")
        back = yaml.safe_load(open(path))
        assert back["lr"] == 3.3e-4

    def test_best_params_contract(self, tmp_path):
        """A search-emitted best_params.yaml resolves fully in the trainer
        config (the live config flow the dead qat_search.yaml never had)."""
        bp = {
            "lr": 6.53e-5, "weight_decay": 1.72e-5, "label_smoothing": 0.048,
            "kd_temperature": 4.43, "kd_alpha": 0.615, "qat_start_epoch": 0,
            "epochs": 10, "batch_size": 64, "qat_backend": "qnnpack",
        }
        cfg = tmp_path / "best_params.yaml"
        yaml.safe_dump(bp, cfg.open("w"))
        hp = load_hparams(str(cfg))
        for k, v in bp.items():
            assert hp[k] == v, k
