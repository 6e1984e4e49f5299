"""Compiled train/eval steps: KD + (optionally) QAT, sharded over the mesh.

The reference's hot loop (src/training/qat_trainer.py:333-364: teacher
no_grad forward, AMP-gated student forward, α·KL·T² + (1−α)·CE, grad-clip
1.0, AdamW step, DDP all-reduce in backward) becomes ONE jitted pure function
per phase:

- ``qat=False``: bf16 student compute (the AMP phase), no observer state;
- ``qat=True``:  fp32 student with fake-quant + observer EMA updates.

The phase switch at ``qat_start_epoch`` selects the other compiled step over
the SAME parameter pytree — no module-tree surgery, no DDP re-wrap (reference
:300-316 must unwrap/re-wrap DDP because prepare_qat replaces modules).

Data parallelism: the batch is sharded over the mesh's ``data`` axis and the
loss is a global-batch mean, so XLA compiles the gradient all-reduce onto ICI
(replacing NCCL). Observer min/max also reduce over the *global* batch — a
deliberate improvement over the reference, whose DDP replicas drift apart and
whose checkpoint keeps rank 0's observers only (survey §7 hard-part 2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from qat_vit_tpu.data.pipeline import preprocess_fn
from qat_vit_tpu.train.losses import kd_loss, top1_correct


@dataclasses.dataclass
class TrainState:
    """Pure training state threaded through the step (a pytree)."""

    params: Any
    opt_state: Any
    quant_stats: Any  # None pre-QAT; observer tree under QAT
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - jax pytree protocol
        return (self.params, self.opt_state, self.quant_stats, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_optimizer(
    lr: float, weight_decay: float, grad_clip_norm: float = 1.0
) -> optax.GradientTransformation:
    """clip-by-global-norm → AdamW (torch defaults: β=(0.9, 0.999), eps 1e-8,
    decoupled weight decay on all params) — the reference's optimizer factory
    (qat_trainer.py:271-278) with its clip(1.0) (:355).

    ``learning_rate``/``weight_decay`` are injected hyperparameters living in
    the optimizer *state*, so a hyperparameter search (or the QAT LR×0.5
    switch) changes them without recompiling the train step.
    """
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        ),
    )


def set_optimizer_hyperparams(opt_state, **values):
    """Overwrite injected hyperparams (e.g. learning_rate) in an opt_state
    produced by :func:`make_optimizer`."""
    clip_state, inject_state = opt_state
    hp = dict(inject_state.hyperparams)
    for k, v in values.items():
        if k not in hp:
            raise KeyError(f"unknown optimizer hyperparam {k!r}; have {sorted(hp)}")
        hp[k] = jnp.asarray(v, jnp.float32)
    return (clip_state, inject_state._replace(hyperparams=hp))


def loss_hparams(hparams: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Loss hyperparameters as device scalars, passed INTO the step each call
    so different trials share one compiled step (survey §7 hard-part 6)."""
    return {
        "alpha": jnp.asarray(float(hparams["kd_alpha"]), jnp.float32),
        "temperature": jnp.asarray(float(hparams["kd_temperature"]), jnp.float32),
        "label_smoothing": jnp.asarray(float(hparams["label_smoothing"]), jnp.float32),
    }


def make_train_step(
    teacher_apply: Optional[Callable],
    student_apply: Callable,
    tx: optax.GradientTransformation,
    *,
    qat: bool,
    image_size: int,
    donate: bool = True,
    observe: bool = True,
    mesh=None,
    qconfig=None,
) -> Callable:
    """Build the jitted KD(+QAT) train step.

    ``teacher_apply(params, x) -> logits`` and
    ``student_apply(variables, x, observe) -> logits | (logits, mutated)``
    are module closures; preprocessing (uint8 → resize → normalize) is fused
    into the step so raw pixels are all that crosses the host-device boundary.
    Loss hyperparameters arrive as traced scalars (see :func:`loss_hparams`);
    lr/weight-decay live in the injected optimizer state — so the compiled
    step is reused across hyperparameter settings.

    ``teacher_apply=None`` builds the cached-teacher variant: the batch
    carries precomputed ``teacher_logits`` (the teacher is frozen and the
    pipeline has no augmentation, so its logits per image are constants —
    computing them once removes the ViT-B forward from every step; measured
    ~30% of the QAT step on v5e).

    ``mesh``: a pure-DP device mesh (model axis 1). The step body is wrapped
    in ``shard_map`` over the ``data`` axis — batch sharded, state/teacher
    replicated, gradients ``pmean``-ed — instead of relying on GSPMD
    propagation. Inside shard_map each device runs the unmodified per-device
    program, so the opaque Pallas attention custom-VJP (which the GSPMD
    partitioner cannot split and would force an all-gather) survives
    multi-chip DP. Observer global-batch semantics are preserved via
    pmin/pmax inside the observers (FakeQuantConfig.axis_name must be set to
    the data axis on activation observers when using this path).
    """
    prep = preprocess_fn(image_size)
    axis = _data_axis(mesh)
    if qat and axis is not None:
        # Under shard_map (check_vma=False, out_specs P()) per-shard
        # divergent observer stats would silently collapse to one shard's
        # values unless the activation observers pmin/pmax over the data
        # axis. The trainer sets FakeQuantConfig.axis_name; guard the API
        # for direct callers (pass the student's qconfig to validate).
        if qconfig is not None and qconfig.activation.axis_name != axis:
            raise ValueError(
                f"QAT train step runs under shard_map over axis {axis!r} "
                f"but the activation observers have axis_name="
                f"{qconfig.activation.axis_name!r}; set "
                "FakeQuantConfig.axis_name to the data axis or observer "
                "stats will silently lose global-batch semantics"
            )
        if qconfig is None:
            import warnings

            warnings.warn(
                "make_train_step(qat=True, mesh=...) without qconfig=: "
                "cannot verify the activation observers reduce over the "
                f"data axis {axis!r} (FakeQuantConfig.axis_name); observer "
                "stats silently lose global-batch semantics if unset",
                stacklevel=2,
            )

    def step(
        state: TrainState,
        teacher_params: Any,
        batch: Dict[str, jnp.ndarray],
        loss_hp: Dict[str, jnp.ndarray],
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        x = prep(batch["image"])
        labels = batch["label"]
        if teacher_apply is None:
            t_logits = batch["teacher_logits"].astype(jnp.float32)
        else:
            t_logits = jax.lax.stop_gradient(teacher_apply(teacher_params, x))

        def loss_fn(params):
            if qat and observe:
                s_logits, mutated = student_apply(
                    {"params": params, "quant_stats": state.quant_stats},
                    x,
                    observe=True,
                    mutable=["quant_stats"],
                )
                new_qs = mutated["quant_stats"]
            elif qat:
                # observer-frozen QAT step (trainer's opt-in
                # observer_interval): fake-quant from the current stats, no
                # min/max reductions or EMA writes — ~11 ms of the 104 ms
                # batch-256 QAT step in the real mixed pattern
                # (scripts/train_step_bench.py *_dispatch variants;
                # docs/BENCHMARKS.md)
                s_logits = student_apply(
                    {"params": params, "quant_stats": state.quant_stats},
                    x,
                    observe=False,
                )
                new_qs = state.quant_stats
            else:
                s_logits = student_apply({"params": params}, x, observe=False)
                new_qs = state.quant_stats
            loss, metrics = kd_loss(
                s_logits, t_logits, labels,
                alpha=loss_hp["alpha"],
                temperature=loss_hp["temperature"],
                label_smoothing=loss_hp["label_smoothing"],
            )
            metrics["train_acc"] = top1_correct(s_logits, labels) / labels.shape[0]
            return loss, (metrics, new_qs)

        grads, (metrics, new_qs) = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis is not None:
            # synchronous DP: mean of per-shard grads == grad of the
            # global-batch mean loss (equal shard sizes); clip-by-global-norm
            # then applies to the GLOBAL gradient, like DDP's post-all-reduce
            # clip (reference qat_trainer.py:354-361)
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt,
            quant_stats=new_qs,
            step=state.step + 1,
        )
        return new_state, metrics

    if axis is not None:
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    student_apply: Callable, *, qat: bool, image_size: int, mesh=None
) -> Callable:
    """Jitted eval step → #top-1-correct in the batch (observers frozen).

    ``mesh`` (pure-DP): shard_map over the data axis with a ``psum`` of the
    per-shard correct counts — same rationale as :func:`make_train_step`."""
    prep = preprocess_fn(image_size)
    axis = _data_axis(mesh)

    def step(params, quant_stats, batch) -> jnp.ndarray:
        x = prep(batch["image"])
        if qat:
            logits = student_apply(
                {"params": params, "quant_stats": quant_stats}, x, observe=False
            )
        else:
            logits = student_apply({"params": params}, x, observe=False)
        correct = top1_correct(logits, batch["label"])
        if axis is not None:
            correct = jax.lax.psum(correct, axis)
        return correct

    if axis is not None:
        from jax.sharding import PartitionSpec as P

        step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    return jax.jit(step)


def _data_axis(mesh) -> Optional[str]:
    """The shard_map data-axis name for a pure-DP multi-device mesh, else
    None (single device → plain jit; model-parallel → GSPMD propagation,
    which partitions the einsum attention exactly)."""
    if mesh is None or mesh.devices.size == 1:
        return None
    from qat_vit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if mesh.shape.get(MODEL_AXIS, 1) != 1:
        raise ValueError(
            "shard_map train step supports pure-DP meshes only; pass "
            "mesh=None for tensor-parallel (GSPMD) training"
        )
    return DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None


def init_quant_stats(module, cfg, rng=None) -> FrozenDict:
    """Fresh observer tree (all ±inf markers) for the QAT phase switch —
    the analog of ``prepare_qat`` attaching fresh observers mid-training
    (reference qat_trainer.py:300-316), except parameters are untouched."""
    import jax

    rng = rng if rng is not None else jax.random.key(0)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = jax.eval_shape(lambda: module.init(rng, x, observe=False))
    return _init_inf_tree(variables["quant_stats"])


def _init_inf_tree(shapes_tree):
    """min_val leaves start at +inf, max_val leaves at -inf."""
    import jax.tree_util as jtu

    def init_leaf(path, leaf):
        name = jtu.keystr(path)
        if "max_val" in name:
            return jnp.full(leaf.shape, -jnp.inf, jnp.float32)
        return jnp.full(leaf.shape, jnp.inf, jnp.float32)

    return jtu.tree_map_with_path(init_leaf, shapes_tree)
