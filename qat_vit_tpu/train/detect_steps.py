"""Detection KD train/eval steps: distill a teacher detector into a
QAT-armed pruned student.

Capability beyond the reference: its OWLv2 entries construct detection
models (``create_teacher/create_student("owlv2")``, reference
src/models/model_registry.py:370-426) but its trainer consumes only
image→logits classifiers and crashes on them — detection training never
existed there. Here the detection counterpart of the classification KD step
(train/steps.py) distills the *outputs* of the teacher's detection forward:

- per-query class logits: softmax-KL over the patch axis per (image, query),
  temperature-scaled like the classification KD loss;
- boxes: L1 on the sigmoid-squashed (cx, cy, w, h) predictions;
- objectness: BCE of student logits against the teacher's probabilities.

The tower trains under the same fake-quant machinery as classification
(observer EMA in-step, phase switch, convert via serve/int8_detect.py);
heads stay float — the reference QATWrapper's detection semantics
(model_registry.py:99-124: quantized backbone, dequantized logits out).

Data parallelism mirrors train/steps.py: under a pure-DP mesh the step runs
in ``shard_map`` (batch sharded, pmean'd grads) so the Pallas attention
custom-VJP survives multi-chip, and activation observers must pmin/pmax over
the data axis (FakeQuantConfig.axis_name).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from qat_vit_tpu.data.pipeline import preprocess_fn
from qat_vit_tpu.train.steps import TrainState, _data_axis


def detection_kd_loss(
    student_out: Dict[str, jnp.ndarray],
    teacher_out: Dict[str, jnp.ndarray],
    *,
    temperature,
    box_weight,
    obj_weight,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Distillation objective over detection outputs; all hyperparameters may
    be traced scalars (one compiled step across settings)."""
    t = jnp.asarray(temperature, jnp.float32)
    bw = jnp.asarray(box_weight, jnp.float32)
    ow = jnp.asarray(obj_weight, jnp.float32)

    # class KD: distribution over patches per (image, query) — "where does
    # this query live" — softened by T, torch-KL reduction over the batch
    s_log = jax.nn.log_softmax(
        student_out["logits"].astype(jnp.float32).transpose(0, 2, 1) / t, -1
    )
    t_log = jax.nn.log_softmax(
        teacher_out["logits"].astype(jnp.float32).transpose(0, 2, 1) / t, -1
    )
    t_p = jnp.exp(t_log)
    kl = jnp.sum(t_p * (t_log - s_log), axis=-1)  # [B, Q]
    cls_loss = jnp.mean(kl) * t * t

    box_loss = jnp.mean(
        jnp.abs(
            student_out["pred_boxes"].astype(jnp.float32)
            - teacher_out["pred_boxes"].astype(jnp.float32)
        )
    )

    t_obj = jax.nn.sigmoid(teacher_out["objectness_logits"].astype(jnp.float32))
    s_obj = student_out["objectness_logits"].astype(jnp.float32)
    # BCE-with-logits against soft teacher targets
    obj_loss = jnp.mean(
        jnp.maximum(s_obj, 0.0) - s_obj * t_obj + jnp.log1p(jnp.exp(-jnp.abs(s_obj)))
    )

    loss = cls_loss + bw * box_loss + ow * obj_loss
    return loss, {
        "train_loss": loss,
        "train_loss_kd": cls_loss,
        "train_loss_box": box_loss,
        "train_loss_obj": obj_loss,
    }


def detect_loss_hparams(hparams: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Loss hyperparameters as device scalars (shared-compile contract of
    train/steps.loss_hparams)."""
    return {
        "temperature": jnp.asarray(float(hparams["kd_temperature"]), jnp.float32),
        "box_weight": jnp.asarray(
            float(hparams.get("det_box_weight", 1.0)), jnp.float32
        ),
        "obj_weight": jnp.asarray(
            float(hparams.get("det_obj_weight", 0.25)), jnp.float32
        ),
    }


def make_detect_train_step(
    teacher_apply: Optional[Callable],  # (params, x, q) -> detection dict
    student_apply: Callable,  # flax detector apply
    tx: optax.GradientTransformation,
    *,
    qat: bool,
    image_size: int,
    donate: bool = True,
    observe: bool = True,
    mesh=None,
    qconfig=None,
) -> Callable:
    """Build the jitted detection-KD(+QAT) train step.

    The batch carries raw ``image`` pixels and the per-image
    ``query_embeds`` [B, Q, text_dim] (open-vocabulary queries are
    precomputed embeddings in deployment; the text tower is out of scope as
    in the reference).

    ``teacher_apply=None`` builds the cached-teacher variant: the batch
    carries precomputed ``t_logits`` [B, P, Q] / ``t_boxes`` [B, P, 4] /
    ``t_obj`` [B, P] — the frozen teacher's detection outputs per image are
    constants (fixed query set, no augmentation), so computing them once
    removes the teacher detection forward from every step. The detection
    analog of train/steps.make_train_step's cached-logits contract, and
    worth more here: the teacher forward is the full-resolution tower, far
    heavier than the student's pruned one."""
    prep = preprocess_fn(image_size)
    axis = _data_axis(mesh)
    if qat and axis is not None:
        if qconfig is not None and qconfig.activation.axis_name != axis:
            raise ValueError(
                f"detection QAT step under shard_map axis {axis!r} needs "
                f"FakeQuantConfig.axis_name={axis!r} on activation observers "
                f"(got {qconfig.activation.axis_name!r})"
            )
        if qconfig is None:
            import warnings

            warnings.warn(
                "make_detect_train_step(qat=True, mesh=...) without "
                "qconfig=: cannot verify the activation observers reduce "
                f"over the data axis {axis!r} (FakeQuantConfig.axis_name); "
                "observer stats silently lose global-batch semantics if "
                "unset",
                stacklevel=2,
            )

    def step(
        state: TrainState,
        teacher_params: Any,
        batch: Dict[str, jnp.ndarray],
        loss_hp: Dict[str, jnp.ndarray],
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        x = prep(batch["image"])
        q = batch["query_embeds"]
        if teacher_apply is None:
            t_out = {
                "logits": batch["t_logits"].astype(jnp.float32),
                "pred_boxes": batch["t_boxes"].astype(jnp.float32),
                "objectness_logits": batch["t_obj"].astype(jnp.float32),
            }
        else:
            t_out = jax.lax.stop_gradient(teacher_apply(teacher_params, x, q))

        def loss_fn(params):
            if qat and observe:
                s_out, mutated = student_apply(
                    {"params": params, "quant_stats": state.quant_stats},
                    x, q, observe=True, mutable=["quant_stats"],
                )
                new_qs = mutated["quant_stats"]
            elif qat:
                s_out = student_apply(
                    {"params": params, "quant_stats": state.quant_stats},
                    x, q, observe=False,
                )
                new_qs = state.quant_stats
            else:
                s_out = student_apply({"params": params}, x, q, observe=False)
                new_qs = state.quant_stats
            loss, metrics = detection_kd_loss(
                s_out, t_out,
                temperature=loss_hp["temperature"],
                box_weight=loss_hp["box_weight"],
                obj_weight=loss_hp["obj_weight"],
            )
            return loss, (metrics, new_qs)

        grads, (metrics, new_qs) = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params, opt_state=new_opt, quant_stats=new_qs,
                step=state.step + 1,
            ),
            metrics,
        )

    if axis is not None:
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_detect_eval_step(
    teacher_apply: Callable,
    student_apply: Callable,
    *,
    qat: bool,
    image_size: int,
    mesh=None,
) -> Callable:
    """Jitted teacher-relative detection eval → summed per-batch metrics:
    mean |Δbox| and top-box agreement (argmax patch per (image, query) by
    class logit) against the frozen teacher. There is no labeled detection
    data in this pipeline (the reference has none either); the teacher is
    the reference signal, exactly as in the KD objective."""
    prep = preprocess_fn(image_size)
    axis = _data_axis(mesh)

    def step(params, quant_stats, teacher_params, batch):
        x = prep(batch["image"])
        q = batch["query_embeds"]
        # Optional per-image validity mask: the trainer pads the trailing
        # eval batch to the compiled batch size (static shapes; shard_map
        # divisibility) and masks the padded rows out of the sums — the
        # detection analog of trainer._pad_batch's label=-1 convention.
        v = batch.get("valid")
        v = (
            jnp.ones((x.shape[0],), jnp.float32)
            if v is None
            else v.astype(jnp.float32)
        )
        t_out = teacher_apply(teacher_params, x, q)
        if qat:
            s_out = student_apply(
                {"params": params, "quant_stats": quant_stats}, x, q,
                observe=False,
            )
        else:
            s_out = student_apply({"params": params}, x, q, observe=False)
        box_err = jnp.sum(
            v
            * jnp.mean(
                jnp.abs(s_out["pred_boxes"] - t_out["pred_boxes"]),
                axis=(1, 2),
            )
        )
        agree = jnp.sum(
            v
            * jnp.mean(
                (
                    jnp.argmax(s_out["logits"], axis=1)
                    == jnp.argmax(t_out["logits"], axis=1)
                ).astype(jnp.float32),
                axis=-1,
            )
        )
        out = {"box_err_sum": box_err, "agree_sum": agree, "n": jnp.sum(v)}
        if axis is not None:
            out = jax.tree.map(lambda v: jax.lax.psum(v, axis), out)
        return out

    if axis is not None:
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    return jax.jit(step)
