"""Training: KD+QAT trainer, compiled steps, losses, config.

Replaces the reference's ``src/training`` (qat_trainer.py, ddp_utils.py is
under parallel/, optuna_search.py is under search/).
"""

from qat_vit_tpu.train.config import (
    DEFAULT_HPARAMS,
    load_hparams,
    resolve_hparams,
    save_effective_hparams,
)
from qat_vit_tpu.train.losses import cross_entropy, kd_kl_divergence, kd_loss, top1_correct
from qat_vit_tpu.train.steps import (
    TrainState,
    init_quant_stats,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from qat_vit_tpu.train.trainer import KDQATTrainer, train_main

__all__ = [
    "DEFAULT_HPARAMS",
    "KDQATTrainer",
    "TrainState",
    "cross_entropy",
    "init_quant_stats",
    "kd_kl_divergence",
    "kd_loss",
    "load_hparams",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "resolve_hparams",
    "save_effective_hparams",
    "top1_correct",
    "train_main",
]
