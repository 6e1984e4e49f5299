"""Subprocess worker for the 2-process multi-host trainer test.

Not a test module (no ``test_`` prefix — pytest must not collect it).
Each worker is one "host": it forces the CPU backend with 4 local devices,
joins a 2-process ``jax.distributed`` cluster (Gloo collectives — the same
cross-process path a multi-host TPU slice exercises through its own
transport), runs the full ``train_main`` pipeline (float phase → QAT →
last-epoch convert → true-int8 eval), and dumps its per-epoch results to
``rank{N}_results.json`` for the parent test to cross-check.

This is the executable form of the multi-host claim in
``trainer.train_main`` (all processes compute eval/convert, rank 0 does
I/O) — the round-1 rank-0-only structure deadlocked here, which no
single-process test can detect. Reference semantics being replaced:
``qat_trainer.py:366-403`` + ``ddp_utils.py:49-52`` (rank-0 eval on a
full per-rank model copy).
"""

import json
import os
import re
import sys

# Shared by the worker (2-host run) and tests/test_multihost.py (single-host
# comparison run): the equivalence assertions are only meaningful if both
# runs use the same configuration, so there is exactly one copy of it.
DATA_SEED = 3
MICRO_OVERRIDES = dict(
    lr=3e-3,
    weight_decay=1e-4,
    epochs=2,
    qat_start_epoch=1,
    batch_size=32,  # per-host -> global batch 64 over the 8-device mesh
    eval_batch_size=64,
    image_size=32,
    limit_train_batches=3,
    limit_eval_batches=2,
    # strict-f32 step: losses are compared across host counts at tight
    # tolerance, so keep the deterministic parity mode, not the bf16 default.
    qat_amp=False,
)


def micro_hparams(workdir: str, **overrides):
    from qat_vit_tpu.train.config import DEFAULT_HPARAMS

    hp = dict(DEFAULT_HPARAMS)
    hp.update(MICRO_OVERRIDES)
    hp.update(
        output_dir=os.path.join(workdir, "out"),
        mlflow_uri=f"sqlite:///{workdir}/mlflow.db",
        data_dir=os.path.join(workdir, "nodata"),
    )
    hp.update(overrides)
    return hp


def patch_micro_models(trainer_mod, data):
    """Point the trainer at deterministic micro models + in-memory data.

    Returns a restore() callable. Every process must construct identical
    replicated values (JAX multi-process contract), exactly as every DDP
    rank loads the same seed/checkpoint in the reference.
    """
    from qat_vit_tpu.models import create_model

    orig = (
        trainer_mod.create_student,
        trainer_mod.create_teacher,
        trainer_mod.load_cifar10,
    )
    trainer_mod.create_student = lambda *a, **k: create_model("vit_micro_test")
    trainer_mod.create_teacher = lambda *a, **k: create_model("vit_micro_test")
    trainer_mod.load_cifar10 = lambda *a, **k: (data, "synthetic")

    def restore():
        (
            trainer_mod.create_student,
            trainer_mod.create_teacher,
            trainer_mod.load_cifar10,
        ) = orig

    return restore


def main() -> None:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    workdir = sys.argv[3]

    # 4 local devices per process -> 8 global over 2 processes. Strip any
    # inherited device-count flag (the pytest parent forces 8) first.
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    # The TPU-tunnel sitecustomize force-selects its backend via jax.config;
    # re-force CPU before any backend initializes (same as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from qat_vit_tpu.parallel.mesh import setup_distributed

    dist = setup_distributed(
        f"127.0.0.1:{port}", num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.devices()
    assert dist.rank == rank

    from qat_vit_tpu.data import synthetic_cifar10
    import qat_vit_tpu.train.trainer as trainer_mod

    hp = micro_hparams(workdir)
    data = synthetic_cifar10(n_train=256, n_test=128, seed=DATA_SEED)
    patch_micro_models(trainer_mod, data)

    result = trainer_mod.train_main(hp)

    out = [
        {
            "epoch": int(r.epoch),
            "train_loss": float(r.train_loss),
            "qat_acc": float(r.qat_acc),
            "quant_acc": float(r.quant_acc),
            "qat_enabled": bool(r.qat_enabled),
            "eval_batches": int(r.eval_batches),
        }
        for r in result["results"]
    ]
    with open(os.path.join(workdir, f"rank{rank}_results.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
