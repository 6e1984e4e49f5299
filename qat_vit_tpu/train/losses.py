"""Training losses with torch-exact semantics.

The reference's loss (src/training/qat_trainer.py:265-268, 343-349):

    loss = alpha * KLDiv(log_softmax(s/T), softmax(t/T), 'batchmean') * T^2
         + (1 - alpha) * CrossEntropy(s, y, label_smoothing=ls)

Both pieces are reproduced to torch's exact reduction conventions (verified
in tests/test_losses.py against torch CPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing=0.0
) -> jnp.ndarray:
    """torch ``F.cross_entropy(..., label_smoothing=ls)``: mean over batch of
    ``-(1-ls)·log p_y - (ls/K)·Σ_c log p_c``.

    ``label_smoothing`` may be a traced scalar (branchless formula) so a
    hyperparameter sweep reuses one compiled step across trials.
    """
    logits = logits.astype(jnp.float32)
    ls = jnp.asarray(label_smoothing, jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    nll = (1.0 - ls) * nll + ls * smooth
    return jnp.mean(nll)


def kd_kl_divergence(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    temperature,
) -> jnp.ndarray:
    """torch ``KLDivLoss(reduction='batchmean')(log_softmax(s/T),
    softmax(t/T)) * T^2``: sum of ``p_t · (log p_t − log p_s)`` over classes,
    divided by batch size, times T²."""
    t = jnp.asarray(temperature, jnp.float32)
    s_logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    t_logp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    t_p = jnp.exp(t_logp)
    kl = jnp.sum(t_p * (t_logp - s_logp), axis=-1)
    return jnp.mean(kl) * t * t


def kd_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    alpha,
    temperature,
    label_smoothing,
) -> Tuple[jnp.ndarray, dict]:
    """Combined distillation objective; returns (loss, components) with the
    reference's metric names (train_loss_ce / train_loss_kd). All three
    hyperparameters may be traced scalars."""
    alpha = jnp.asarray(alpha, jnp.float32)
    ce = cross_entropy(student_logits, labels, label_smoothing)
    kd = kd_kl_divergence(student_logits, teacher_logits, temperature)
    loss = alpha * kd + (1.0 - alpha) * ce
    return loss, {"train_loss": loss, "train_loss_ce": ce, "train_loss_kd": kd}


def top1_correct(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Count of top-1 correct predictions in the batch."""
    return jnp.sum(jnp.argmax(logits, axis=-1) == labels)
