"""KD + QAT trainer: the reference's final-training entry, TPU-native.

Re-design of reference ``src/training/qat_trainer.py:112-423``: a frozen
ViT-B teacher distills into a (QAT-wrapped) ViT-S student on CIFAR-10 with
α·KL·T² + (1−α)·CE(label-smoothing), AdamW + clip(1.0), QAT enabled at
``qat_start_epoch`` (optimizer re-created at LR×qat_lr_scale), rank-0 eval +
best-checkpointing per epoch, int8 conversion + true-int8 eval on the last
epoch, and MLflow-style metric logging under the reference's metric names.

Differences by design (all survey-flagged):
- the phase switch swaps between two *compiled pure steps* over one parameter
  pytree instead of mutating a module tree and re-wrapping DDP (:300-316);
- gradient sync is XLA ``psum`` from batch sharding, not NCCL buckets;
- observer min/max reduce over the global batch (replica-consistent) instead
  of drifting per-replica;
- the converted int8 model actually runs (serve/int8_vit.py), so
  ``quant_acc`` on the last epoch is a real int8 number, not an alias.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from qat_vit_tpu.data import ArrayLoader, load_cifar10
from qat_vit_tpu.models import ModelBundle, create_student, create_teacher
from qat_vit_tpu.parallel import (
    barrier,
    get_dist_info,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from qat_vit_tpu.quant import default_qat_qconfig
from qat_vit_tpu.serve.int8_vit import convert_vit, make_int8_forward
from qat_vit_tpu.tracking import NullRun, make_tracker
from qat_vit_tpu.train.config import (
    DEFAULT_HPARAMS,
    add_hparam_flags,
    resolve_hparams,
    save_effective_hparams,
)
from qat_vit_tpu.train.steps import (
    TrainState,
    init_quant_stats,
    loss_hparams,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_optimizer_hyperparams,
)
from qat_vit_tpu.utils.checkpoint import BestCheckpointer, save_checkpoint

logger = logging.getLogger(__name__)


def _unbox(tree):
    return nn.meta.unbox(tree)


def load_model_params(path: str, cfg, template=None):
    """Load model weights from either this framework's .msgpack or a torch
    .pth/.bin in timm/HF layout (converted on the fly). Tolerant restore when
    a template is given (the reference's ``strict=False`` loaders)."""
    from qat_vit_tpu.utils.checkpoint import load_checkpoint, tolerant_merge

    if path.endswith((".pth", ".bin", ".pt")):
        from qat_vit_tpu.models.torch_convert import (
            load_torch_state_dict,
            timm_vit_to_params,
        )

        state = load_torch_state_dict(path)
        return timm_vit_to_params(state, cfg, strict=template is None)
    restored = load_checkpoint(path)
    if "params" in restored:
        restored = restored["params"]
    if template is not None:
        merged, _, _ = tolerant_merge(dict(template), restored)
        return merged
    return restored


@dataclasses.dataclass
class EpochResult:
    epoch: int
    train_loss: float
    qat_acc: float
    quant_acc: float
    qat_enabled: bool
    imgs_per_sec: float
    # per-host eval dispatches this epoch (multi-host: test set is sharded
    # rank::world, so this drops world_size-fold vs a replicated eval)
    eval_batches: int = 0


class KDQATTrainer:
    """Reusable KD+QAT engine (driven by both the final-training CLI and the
    hyperparameter search)."""

    def __init__(
        self,
        hparams: Dict[str, Any],
        *,
        data: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
        run=None,
        student: Optional[ModelBundle] = None,
        teacher: Optional[ModelBundle] = None,
        teacher_params: Optional[Any] = None,
        seed: Optional[int] = None,
        steps: Optional[Dict[str, Callable]] = None,
        teacher_logits: Optional[np.ndarray] = None,
    ):
        self.hp = dict(hparams)
        self.dist = get_dist_info()
        self.mesh = mesh if mesh is not None else make_mesh(
            model=int(self.hp.get("model_parallel", 1))
        )
        self.run = run if run is not None else NullRun()
        seed = int(self.hp["seed"] if seed is None else seed)
        self.rng = jax.random.key(seed)

        image_size = int(self.hp["image_size"])
        num_classes = int(self.hp["num_classes"])
        dtype = jnp.bfloat16 if self.hp.get("amp", True) else jnp.float32

        # batch sizes must shard evenly over the mesh's data axis
        data_size = self.mesh.shape.get("data", 1)
        for key in ("batch_size", "eval_batch_size"):
            # eval_batch_size is optional everywhere else (512 default)
            b = int(self.hp.get(key, 512) if key == "eval_batch_size"
                    else self.hp[key])
            if b % data_size:
                rounded = -(-b // data_size) * data_size
                logger.warning(
                    "%s=%d not divisible by data-axis size %d; rounding up to %d",
                    key, b, data_size, rounded,
                )
                self.hp[key] = rounded

        # ---- models (reference qat_trainer.py:257-262) ----
        family = self.hp.get("student_family", "vit")
        self.teacher = teacher if teacher is not None else create_teacher(
            family, num_classes=num_classes, dtype=jnp.bfloat16,
            image_size=image_size,
        )
        # Two static student configs over one param tree: float (bf16-able)
        # and QAT (fp32 + fake-quant).
        base_student = student if student is not None else create_student(
            family, num_classes=num_classes, image_size=image_size
        )
        qconfig = default_qat_qconfig(self.hp.get("qat_backend", "qnnpack"))
        obs_stride = max(1, int(self.hp.get("observer_stride", 1)))
        if obs_stride > 1:
            # opt-in approximation: activation observers subsample the batch
            # (quant/observers.py stride semantics); weight observers exact
            qconfig = dataclasses.replace(
                qconfig,
                activation=dataclasses.replace(
                    qconfig.activation, observe_stride=obs_stride
                ),
            )
        qat_dtype = (
            jnp.bfloat16 if self.hp.get("qat_amp", False) else jnp.float32
        )
        # fast_math (bf16 softmax + tanh GELU) rides the bf16 phases only;
        # the strict-parity f32 QAT step keeps exact reference numerics
        fast = bool(self.hp.get("amp_fast_math", True))
        # Multi-device pure-DP meshes run the train step under shard_map
        # (train/steps.py): each device executes the unmodified per-device
        # program on its batch shard, so the Pallas attention custom-VJP —
        # which the GSPMD partitioner cannot split — keeps working. Only a
        # tensor-parallel (model-axis) mesh still needs GSPMD propagation,
        # where the kernel must stay off (the partitioner would all-gather
        # around the opaque custom call).
        from qat_vit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        model_size = self.mesh.shape.get(MODEL_AXIS, 1)
        self.use_shard_map = model_size == 1 and self.mesh.devices.size > 1
        attn_kernel = self.mesh.devices.size == 1 or self.use_shard_map
        if self.use_shard_map:
            # observers must reduce batch min/max over the data axis inside
            # the shard_map body to keep global-batch semantics (GSPMD gets
            # this for free from the sharded reduce; shard_map needs explicit
            # pmin/pmax). Weight observers see replicated tensors — no
            # collective needed.
            qconfig = dataclasses.replace(
                qconfig,
                activation=dataclasses.replace(
                    qconfig.activation, axis_name=DATA_AXIS
                ),
            )
        remat = str(self.hp.get("remat", "none"))
        fq_in_kernel = bool(self.hp.get("fq_in_kernel", False))
        self.student_qat_cfg = dataclasses.replace(
            base_student.cfg, quant=qconfig, qat_wrapper=True, dtype=qat_dtype,
            fast_math=fast and qat_dtype == jnp.bfloat16,
            attn_kernel=attn_kernel, remat=remat, fq_in_kernel=fq_in_kernel,
        )
        self.student_float_cfg = dataclasses.replace(
            base_student.cfg, quant=None, qat_wrapper=False, dtype=dtype,
            fast_math=fast and dtype == jnp.bfloat16,
            attn_kernel=attn_kernel, remat=remat,
        )
        from qat_vit_tpu.models.vit import VisionTransformer

        self.student_float = VisionTransformer(self.student_float_cfg)
        self.student_qat = VisionTransformer(self.student_qat_cfg)

        # ---- parameters ----
        rng_t, rng_s, self.rng = jax.random.split(self.rng, 3)
        repl = replicated_sharding(self.mesh)
        if teacher_params is None and self.hp.get("teacher_ckpt"):
            teacher_params = load_model_params(
                self.hp["teacher_ckpt"], self.teacher.cfg
            )
            logger.info("loaded teacher weights from %s", self.hp["teacher_ckpt"])
        if teacher_params is None:
            teacher_params = _unbox(
                self.teacher.module.init(
                    rng_t, self.teacher.example_input(1), observe=False
                )
            )["params"]
            logger.warning(
                "teacher is randomly initialized (no teacher_ckpt given; the "
                "reference downloads pretrained weights, which needs network)"
            )
        # frozen teacher in bf16 (reference freezes + no_grad, :257-260)
        self.teacher_params = jax.device_put(
            jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), teacher_params), repl
        )
        student_vars = _unbox(
            self.student_float.init(
                rng_s,
                jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                observe=False,
            )
        )
        student_params = student_vars["params"]
        if self.hp.get("student_ckpt"):
            student_params = load_model_params(
                self.hp["student_ckpt"], self.student_float_cfg,
                template=student_params,
            )
            logger.info("loaded student weights from %s", self.hp["student_ckpt"])
        params = jax.device_put(student_params, repl)

        # ---- optimizer + state ----
        self.tx = make_optimizer(
            float(self.hp["lr"]),
            float(self.hp["weight_decay"]),
            float(self.hp.get("grad_clip_norm", 1.0)),
        )
        opt_state = self.tx.init(params)
        opt_state = set_optimizer_hyperparams(
            opt_state,
            learning_rate=float(self.hp["lr"]),
            weight_decay=float(self.hp["weight_decay"]),
        )
        self.state = TrainState(
            params=params,
            opt_state=jax.device_put(opt_state, repl),
            quant_stats=None,
            step=jnp.zeros((), jnp.int32),
        )
        self.qat_enabled = False
        self.loss_hp = loss_hparams(self.hp)
        self.last_eval_batches = 0

        # ---- compiled steps (shareable across trainers via `steps=`) ----
        teacher_apply = lambda p, x: self.teacher.module.apply(  # noqa: E731
            {"params": p}, x, observe=False
        )
        self._teacher_apply = teacher_apply
        self.cache_teacher = bool(self.hp.get("cache_teacher_logits", True))
        step_teacher = None if self.cache_teacher else teacher_apply
        shared = steps if steps is not None else {}
        step_mesh = self.mesh if self.use_shard_map else None
        self.train_step_float = shared.get("train_float") or make_train_step(
            step_teacher, self.student_float.apply, self.tx,
            qat=False, image_size=image_size, mesh=step_mesh,
        )
        self.eval_step_float = shared.get("eval_float") or make_eval_step(
            self.student_float.apply, qat=False, image_size=image_size,
            mesh=step_mesh,
        )
        self.train_step_qat = shared.get("train_qat") or make_train_step(
            step_teacher, self.student_qat.apply, self.tx,
            qat=True, image_size=image_size, mesh=step_mesh,
            qconfig=self.student_qat_cfg.quant,
        )
        self.eval_step_qat = shared.get("eval_qat") or make_eval_step(
            self.student_qat.apply, qat=True, image_size=image_size,
            mesh=step_mesh,
        )
        # opt-in beyond-parity throughput lever: update observers every k-th
        # QAT step, fake-quant from frozen stats in between. 1 (default) =
        # the reference's every-step torch.ao EMA semantics. The frozen step
        # is a SECOND compiled program selected per step in Python — no
        # lax.cond, so each variant keeps its full XLA fusion quality.
        self.observer_interval = max(1, int(self.hp.get("observer_interval", 1)))
        self.train_step_qat_frozen = shared.get("train_qat_frozen") or (
            make_train_step(
                step_teacher, self.student_qat.apply, self.tx,
                qat=True, image_size=image_size, observe=False,
                mesh=step_mesh, qconfig=self.student_qat_cfg.quant,
            ) if self.observer_interval > 1 else None
        )
        self._qat_py_step = 0  # QAT steps taken (host-side, for the interval)
        # shareable across search trials: the teacher (and so its logits)
        # is identical for every trial (ref optuna_search.py:118-120).
        # Accepts a bare [N, C] array (fully precomputed) or a
        # (logits, valid_mask) pair from a lazily-filled cache — the arrays
        # are shared by reference, so fills in one trial serve all trials.
        self._teacher_logits: Optional[np.ndarray] = None
        self._teacher_mask: Optional[np.ndarray] = None
        if teacher_logits is not None:
            if isinstance(teacher_logits, tuple):
                self._teacher_logits, self._teacher_mask = teacher_logits
            else:
                self._teacher_logits = teacher_logits
                self._teacher_mask = np.ones(len(teacher_logits), bool)
        self._teacher_fwd = None  # jitted prep+teacher forward (lazy fills)

        # ---- data (reference :210-254) ----
        if data is None:
            data, source = load_cifar10(self.hp.get("data_dir", "./data"))
            logger.info("CIFAR-10 source: %s", source)
            if source == "synthetic":
                self.run.set_tag("data_source", "synthetic")
        self.data = data
        self.train_loader = ArrayLoader(
            data["train_images"], data["train_labels"],
            batch_size=int(self.hp["batch_size"]),
            shuffle=True, seed=seed,
            rank=self.dist.rank, world_size=self.dist.world_size,
            drop_last=True,
        )
        self.eval_loader = ArrayLoader(
            data["test_images"], data["test_labels"],
            batch_size=int(self.hp.get("eval_batch_size", 512)),
            shuffle=False, drop_last=False, prefetch=2,
        )
        self.image_size = image_size

    # ------------------------------------------------------------------
    def shared_steps(self) -> Dict[str, Callable]:
        """Hand these to the next trainer (same architecture/hparams-shape) to
        reuse compiled steps — zero recompiles across search trials."""
        return {
            "train_float": self.train_step_float,
            "eval_float": self.eval_step_float,
            "train_qat": self.train_step_qat,
            "eval_qat": self.eval_step_qat,
            "train_qat_frozen": self.train_step_qat_frozen,
        }

    # ------------------------------------------------------------------
    def enable_qat(self) -> None:
        """The QAT phase switch (reference :300-316): fresh observers, fresh
        optimizer moments at LR×qat_lr_scale, swap to the fake-quant compiled
        step. No recompilation and no module surgery — the QAT step was
        compiled up front and the LR lives in optimizer state."""
        if self.qat_enabled:
            return
        repl = replicated_sharding(self.mesh)
        quant_stats = jax.device_put(
            init_quant_stats(self.student_qat, self.student_qat_cfg), repl
        )
        lr = float(self.hp["lr"]) * float(self.hp.get("qat_lr_scale", 0.5))
        opt_state = self.tx.init(self.state.params)  # fresh moments (ref :315)
        opt_state = set_optimizer_hyperparams(
            opt_state, learning_rate=lr,
            weight_decay=float(self.hp["weight_decay"]),
        )
        self.state = TrainState(
            params=self.state.params,
            opt_state=jax.device_put(opt_state, repl),
            quant_stats=quant_stats,
            step=self.state.step,
        )
        self.qat_enabled = True
        self._qat_py_step = 0  # first QAT step must observe (±inf markers)
        logger.info("QAT enabled (lr -> %.3g)", lr)

    # ------------------------------------------------------------------
    def _get_teacher_fwd(self):
        """Jitted prep+teacher forward used to (pre)fill the logit cache."""
        if self._teacher_fwd is None:
            from qat_vit_tpu.data.pipeline import preprocess_fn

            prep = preprocess_fn(self.image_size)
            apply = self._teacher_apply

            @jax.jit
            def fwd(p, imgs):
                return apply(p, prep(imgs)).astype(jnp.float32)

            self._teacher_fwd = fwd
        return self._teacher_fwd

    def _ensure_teacher_logits(self, lazy: bool = False) -> None:
        """Precompute the frozen teacher's logits over the train set once.

        Mathematically identical to per-step teacher forwards (teacher frozen,
        no augmentation); removes the ViT-B forward from the hot loop.

        ``lazy=True`` (limited-batch runs) allocates the cache but defers the
        teacher forwards to :meth:`_teacher_logits_for`, which fills only the
        rows actually visited — an eager pass over all 50k images costs ~14
        minutes at OWLv2 teacher scale while a ``limit_train_batches`` micro
        run touches a few dozen of them."""
        if not self.cache_teacher or self._teacher_logits is not None:
            return
        imgs = self.data["train_images"]
        n_classes = int(self.hp["num_classes"])
        if lazy:
            self._teacher_logits = np.zeros((len(imgs), n_classes), np.float32)
            self._teacher_mask = np.zeros(len(imgs), bool)
            logger.info(
                "teacher logit cache: lazy (limited-batch run; rows fill as "
                "batches are visited)")
            return
        fwd = self._get_teacher_fwd()
        bs = int(self.hp.get("eval_batch_size", 512))
        out = np.empty((len(imgs), n_classes), np.float32)
        t0 = time.perf_counter()
        for start in range(0, len(imgs), bs):
            chunk = imgs[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            logits = fwd(self.teacher_params, jnp.asarray(chunk))
            out[start : start + bs - pad] = np.asarray(logits)[: bs - pad]
        self._teacher_logits = out
        self._teacher_mask = np.ones(len(imgs), bool)
        logger.info(
            "cached teacher logits for %d images in %.1fs",
            len(imgs), time.perf_counter() - t0,
        )

    def _teacher_logits_for(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """Cached teacher logits for one host batch, filling misses."""
        idx = batch["index"]
        if not self._teacher_mask[idx].all():
            logits = self._get_teacher_fwd()(
                self.teacher_params, jnp.asarray(batch["image"]))
            self._teacher_logits[idx] = np.asarray(logits, np.float32)
            self._teacher_mask[idx] = True
        return self._teacher_logits[idx]

    def train_epoch(self, epoch: int, limit_batches: int = 0) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        # Lazy only when the run will visit a small fraction of the dataset.
        # With per-epoch reshuffle a mostly-filled cache still misses on
        # nearly every batch (any one uncached row re-runs the teacher on the
        # whole batch), so e.g. the search regime (200 batches x 10 epochs =
        # 128k visits over 50k images) must keep the one-shot eager pass —
        # lazy there would degrade to per-step teacher forwards every epoch.
        lazy = False
        if limit_batches:
            planned = (
                limit_batches * int(self.hp["batch_size"])
                * self.dist.world_size
                * max(1, int(self.hp.get("epochs", 1)))
            )
            lazy = planned < len(self.data["train_images"]) // 2
        self._ensure_teacher_logits(lazy=lazy)
        step_fn = self.train_step_qat if self.qat_enabled else self.train_step_float
        # observer_interval > 1: observe on every k-th QAT step (the FIRST
        # QAT step always observes — observers start at the ±inf markers and
        # fake-quant needs calibrated ranges), frozen-stats step otherwise
        use_interval = (
            self.qat_enabled
            and self.observer_interval > 1
            and self.train_step_qat_frozen is not None
        )
        device_metrics = []  # device scalars: no host sync until epoch end
        n_batches = 0
        n_images = 0
        t0 = time.perf_counter()
        iterator = enumerate(self.train_loader)
        if self.hp.get("progress_bar", False) and self.dist.is_main_process:
            # tqdm progress parity (reference qat_trainer.py:323-328)
            from tqdm import tqdm

            total = limit_batches or len(self.train_loader)
            iterator = enumerate(
                tqdm(self.train_loader, total=total,
                     desc=f"epoch {epoch}", leave=False)
            )
        for i, batch in iterator:
            if limit_batches and i >= limit_batches:
                break
            host_batch = {"image": batch["image"], "label": batch["label"]}
            if self.cache_teacher:
                host_batch["teacher_logits"] = self._teacher_logits_for(batch)
            batch = shard_batch(host_batch, self.mesh)
            fn = step_fn
            if use_interval:
                if self._qat_py_step % self.observer_interval:
                    fn = self.train_step_qat_frozen
                self._qat_py_step += 1
            self.state, metrics = fn(
                self.state, self.teacher_params, batch, self.loss_hp
            )
            device_metrics.append(metrics)
            n_batches += 1
            n_images += int(self.hp["batch_size"]) * self.dist.world_size
        # Honest timing: device_get of the step metrics forces a real host
        # round-trip — on the tunneled TPU backend block_until_ready returns
        # before the device work completes (CLAUDE.md), which would inflate
        # imgs_per_sec. The metrics are a handful of scalars per step, so the
        # transfer itself is noise.
        jax.block_until_ready(self.state.params)
        stacked = jax.device_get(device_metrics) if device_metrics else []
        dt = time.perf_counter() - t0
        if not stacked:
            return {"imgs_per_sec": 0.0, "epoch_seconds": dt, "n_batches": 0}
        out = {
            k: float(np.mean([m[k] for m in stacked])) for k in stacked[0]
        }
        out["imgs_per_sec"] = n_images / max(dt, 1e-9)
        out["epoch_seconds"] = dt
        out["n_batches"] = n_batches
        return out

    # ------------------------------------------------------------------
    def _eval_shard(self):
        """This host's strided test-set shard (≙ DistributedSampler without
        shuffle): indices ``rank::world_size``. All hosts pad to the same
        batch count, so the compiled collectives line up."""
        n = len(self.data["test_labels"])
        return np.arange(n)[self.dist.rank :: self.dist.world_size]

    def _eval_shard_batches(self, limit_batches: int, bs: int):
        """Yield ``(host_batch, n_real_global)`` over the sharded test set.

        ``n_real_global`` is the number of REAL (non-padding) examples in the
        corresponding GLOBAL batch — computed analytically from the shard
        arithmetic (identical on every host, no communication)."""
        imgs = self.data["test_images"]
        labels = self.data["test_labels"]
        n = len(labels)
        world = self.dist.world_size
        shard = self._eval_shard()
        shard_len = -(-n // world)  # longest shard: everyone pads to this
        n_batches = -(-shard_len // bs)
        for i in range(n_batches):
            if limit_batches and i >= limit_batches:
                break
            sel = shard[i * bs : (i + 1) * bs]
            batch = _pad_batch(
                {
                    "image": imgs[sel],
                    "label": labels[sel].astype(np.int32),
                },
                bs,
            )
            real = 0
            for r in range(world):
                len_r = (n - r + world - 1) // world  # host r's shard length
                real += max(0, min(len_r, (i + 1) * bs) - min(len_r, i * bs))
            yield batch, real

    def evaluate(self, limit_batches: int = 0) -> float:
        """Top-1 on the test set with the current (float or fake-quant) model
        (reference evaluate_fp32, :49-61).

        Multi-host: EVERY process must call this — the sharded eval step
        compiles cross-host collectives that all processes enter (the
        reference's rank-0-only eval works because each DDP rank holds a full
        model copy; here rank-0-only would deadlock). Each host feeds its own
        strided test-set SHARD (rank::world), so the assembled global batch
        holds ``world_size × eval_batch_size`` distinct examples and the
        per-host batch count drops ``world_size``-fold vs a replicated eval;
        the step's global correct-count (psum / global reduce) is identical
        on every process.
        """
        step_fn = self.eval_step_qat if self.qat_enabled else self.eval_step_float
        bs = int(self.hp.get("eval_batch_size", 512))
        correct = 0
        total = 0
        n_batches = 0
        if self.dist.world_size == 1:
            # single host: the prefetching loader over the full set
            for i, batch in enumerate(self.eval_loader):
                if limit_batches and i >= limit_batches:
                    break
                n = len(batch["label"])
                batch = _pad_batch(batch, bs)
                batch = shard_batch(
                    {"image": batch["image"], "label": batch["label"]}, self.mesh
                )
                c = step_fn(self.state.params, self.state.quant_stats, batch)
                correct += int(c)
                total += n
                n_batches += 1
        else:
            for batch, real in self._eval_shard_batches(limit_batches, bs):
                gbatch = shard_batch(
                    {"image": batch["image"], "label": batch["label"]}, self.mesh
                )
                c = step_fn(self.state.params, self.state.quant_stats, gbatch)
                correct += int(c)  # global count (identical on every host)
                total += real
                n_batches += 1
        self.last_eval_batches = n_batches  # per-host dispatches (observability)
        return correct / max(total, 1)

    # ------------------------------------------------------------------
    def save_resume_state(self, path: str, epoch: int) -> str:
        """Full-state checkpoint for mid-run resume — params, optimizer
        moments, observer stats, step counter, epoch. The reference is
        save-only with no resume (survey §5 checkpoint/resume); this is a
        deliberate capability addition."""
        from qat_vit_tpu.utils.checkpoint import save_checkpoint

        qs = self.state.quant_stats
        tree = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "quant_stats": jax.device_get(qs) if qs is not None else {},
            "step": int(self.state.step),
            # epoch/qat_enabled ride INSIDE the msgpack so the resume info
            # is crash-atomic with the params (the JSON sidecar can pair
            # with the wrong msgpack if a crash lands between the two
            # publishes); the sidecar duplicates them for humans
            "epoch": int(epoch),
            "qat_enabled": int(self.qat_enabled),
        }
        return save_checkpoint(
            path, tree,
            {"epoch": epoch, "qat_enabled": self.qat_enabled,
             "kind": "resume-state"},
        )

    def load_resume_state(self, path: str) -> int:
        """Restore a resume checkpoint; returns the epoch to continue FROM.
        If the checkpoint was taken under QAT, the QAT phase is re-enabled
        first so optimizer/observer trees have the right structure.

        epoch/qat_enabled are read from leaves embedded in the msgpack
        (atomic with the params); the JSON sidecar is only a fallback for
        checkpoints written before they were embedded."""
        from qat_vit_tpu.utils.checkpoint import load_checkpoint, load_metadata

        raw = load_checkpoint(path)  # raw restore: peek at embedded metadata
        meta = load_metadata(path)
        embedded = "epoch" in raw
        qat_enabled = bool(
            int(np.asarray(raw["qat_enabled"]))
            if embedded else meta.get("qat_enabled", False)
        )
        epoch = (
            int(np.asarray(raw["epoch"])) if embedded
            else int(meta.get("epoch", -1))
        )
        if qat_enabled:
            self.enable_qat()
        repl = replicated_sharding(self.mesh)
        template = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "quant_stats": (
                jax.device_get(self.state.quant_stats)
                if self.state.quant_stats is not None else {}
            ),
            "step": int(self.state.step),
        }
        if embedded:
            template["epoch"] = 0
            template["qat_enabled"] = 0
        restored = load_checkpoint(path, template)
        self.state = TrainState(
            params=jax.device_put(restored["params"], repl),
            opt_state=jax.device_put(restored["opt_state"], repl),
            quant_stats=(
                jax.device_put(restored["quant_stats"], repl)
                if self.qat_enabled else None
            ),
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        return epoch + 1

    # ------------------------------------------------------------------
    def convert_int8(self) -> Dict[str, Any]:
        """Observer folding → int8 export pytree (reference convert, :376-379)."""
        if not self.qat_enabled:
            raise RuntimeError("convert requires QAT to have run")
        return convert_vit(
            jax.device_get(self.state.params),
            jax.device_get(self.state.quant_stats),
            self.student_qat_cfg,
            per_channel_weights=bool(self.hp.get("per_channel_weights", False)),
        )

    def evaluate_int8(self, qparams=None, limit_batches: int = 0) -> float:
        """True-int8 eval (the working replacement for
        evaluate_quantized_cpu, reference :64-77).

        Multi-host: each host runs only its test-set shard through its local
        int8 forward (the forward itself has no collectives), then the
        per-host correct counts are summed with one ``process_allgather`` —
        a ``world_size``-fold cut of the duplicated last-epoch eval."""
        qparams = qparams if qparams is not None else self.convert_int8()
        fwd = make_int8_forward(self.student_qat_cfg)
        from qat_vit_tpu.data.pipeline import preprocess

        bs = int(self.hp.get("eval_batch_size", 512))
        correct = 0
        total = 0
        if self.dist.world_size == 1:
            for i, batch in enumerate(self.eval_loader):
                if limit_batches and i >= limit_batches:
                    break
                n = len(batch["label"])
                batch = _pad_batch(batch, bs)
                x = preprocess(jnp.asarray(batch["image"]), size=self.image_size)
                logits = fwd(qparams, x)
                pred = np.asarray(jnp.argmax(logits, axis=-1))
                correct += int((pred[:n] == batch["label"][:n]).sum())
                total += n
            return correct / max(total, 1)
        for batch, real in self._eval_shard_batches(limit_batches, bs):
            x = preprocess(jnp.asarray(batch["image"]), size=self.image_size)
            logits = fwd(qparams, x)
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            # padded rows carry label -1: never equal to an argmax
            correct += int((pred == batch["label"]).sum())
            total += real
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([correct], np.int64)
        )
        return int(np.sum(counts)) / max(total, 1)


def _pad_batch(batch: Dict[str, np.ndarray], size: int) -> Dict[str, np.ndarray]:
    """Pad the trailing eval batch to the compiled batch size (static shapes)."""
    n = len(batch["label"])
    if n == size:
        return batch
    pad = size - n
    return {
        "image": np.concatenate([batch["image"], np.zeros((pad,) + batch["image"].shape[1:], batch["image"].dtype)]),
        "label": np.concatenate([batch["label"], np.full((pad,), -1, batch["label"].dtype)]),
    }


# ---------------------------------------------------------------------------
# Final-training entry (reference main, qat_trainer.py:112-423)
# ---------------------------------------------------------------------------

def train_main(hp: Dict[str, Any]) -> Dict[str, Any]:
    dist = get_dist_info()
    output_dir = hp["output_dir"]
    sysmetrics = None
    if dist.is_main_process:
        os.makedirs(output_dir, exist_ok=True)
        save_effective_hparams(hp, output_dir)
        tracker = make_tracker(hp["mlflow_uri"], hp["experiment"])
        run = tracker.start_run("final_train")
        run.log_params({k: hp[k] for k in DEFAULT_HPARAMS})
        # ≙ mlflow.enable_system_metrics_logging (ref :201)
        from qat_vit_tpu.tracking import enable_system_metrics_logging

        sysmetrics = enable_system_metrics_logging(run)
    else:
        run = NullRun()
    barrier("dataset")  # ≙ reference download barrier (:221-222)

    trainer = KDQATTrainer(hp, run=run)
    best = BestCheckpointer(output_dir, "best_qat")
    epochs = int(hp["epochs"])
    qat_start = int(hp["qat_start_epoch"])
    limit_train = int(hp.get("limit_train_batches", 0))
    limit_eval = int(hp.get("limit_eval_batches", 0))
    results = []
    final_quant_acc = 0.0
    start_epoch = 0
    if hp.get("resume"):
        start_epoch = trainer.load_resume_state(hp["resume"])
        logger.info("resumed from %s at epoch %d", hp["resume"], start_epoch)

    profiled = False
    for epoch in range(start_epoch, epochs):
        if epoch >= qat_start:
            trainer.enable_qat()
        if hp.get("profile_dir") and trainer.qat_enabled and not profiled:
            # capture one QAT epoch (beyond-reference observability; the
            # reference has only tqdm + mlflow system metrics, survey §5).
            # EVERY process trains the same (truncated) number of steps —
            # each step's gradient all-reduce is a collective all processes
            # must enter, so a rank-0-only shorter epoch would deadlock
            # multi-host; only the trace capture itself is rank-0.
            profiled = True
            prof_limit = limit_train or 20
            if not limit_train and dist.is_main_process:
                logger.warning(
                    "profile_dir set: profiled QAT epoch truncated to "
                    "%d batches to bound the trace", prof_limit,
                )
            if dist.is_main_process:
                from qat_vit_tpu.utils.profiling import trace

                with trace(hp["profile_dir"]):
                    tm = trainer.train_epoch(epoch, limit_batches=prof_limit)
            else:
                tm = trainer.train_epoch(epoch, limit_batches=prof_limit)
        else:
            tm = trainer.train_epoch(epoch, limit_batches=limit_train)
        barrier("epoch")  # ≙ :366-367
        # ALL processes compute eval/convert (the sharded eval step contains
        # cross-host collectives every process must enter; results are
        # identical on every rank) — only rank 0 does I/O and logging below.
        # The reference's rank-0-only eval (qat_trainer.py:370-400) is safe
        # there because each DDP rank holds a full model copy; here it would
        # deadlock on process_count()>1.
        qat_acc = trainer.evaluate(limit_batches=limit_eval)
        quant_acc = qat_acc  # reference aliases until the last epoch (:373)
        last = epoch == epochs - 1
        if last and trainer.qat_enabled:
            qparams = trainer.convert_int8()
            quant_acc = trainer.evaluate_int8(qparams, limit_batches=limit_eval)
            final_quant_acc = quant_acc
            if dist.is_main_process:
                save_checkpoint(
                    os.path.join(output_dir, "best_converted.msgpack"),
                    qparams,
                    {"epoch": epoch, "quant_acc": quant_acc,
                     "format": "int8-weights+qparams"},
                )
        if dist.is_main_process:
            qs = trainer.state.quant_stats
            improved, _ = best.maybe_save(
                quant_acc,
                {"params": jax.device_get(trainer.state.params),
                 "quant_stats": jax.device_get(qs) if qs is not None else {}},
                {"epoch": epoch, "qat_acc": qat_acc,
                 "qat_enabled": trainer.qat_enabled},
            )
            run.log_metrics(
                {
                    "train_loss": tm.get("train_loss", 0.0),
                    "train_loss_ce": tm.get("train_loss_ce", 0.0),
                    "train_loss_kd": tm.get("train_loss_kd", 0.0),
                    "qat_acc": qat_acc,
                    "quant_acc": quant_acc,
                    "imgs_per_sec": tm["imgs_per_sec"],
                    "qat_enabled": float(trainer.qat_enabled),
                },
                step=epoch,
            )
            logger.info(
                "epoch %d/%d loss %.4f qat_acc %.4f quant_acc %.4f (%.0f img/s)%s",
                epoch + 1, epochs, tm.get("train_loss", 0.0), qat_acc, quant_acc,
                tm["imgs_per_sec"], " [QAT]" if trainer.qat_enabled else "",
            )
        if dist.is_main_process and hp.get("save_resume_state", True):
            trainer.save_resume_state(
                os.path.join(output_dir, "resume_state.msgpack"), epoch
            )
        results.append(
            EpochResult(epoch, tm.get("train_loss", 0.0), qat_acc, quant_acc,
                        trainer.qat_enabled, tm["imgs_per_sec"],
                        eval_batches=trainer.last_eval_batches)
        )
        barrier("epoch_end")  # ≙ :402-403

    if dist.is_main_process:
        if sysmetrics is not None:
            sysmetrics.stop()
        run.log_metric("final_quant_acc", final_quant_acc)
        for fname in ("effective_hparams.yaml", "best_qat.msgpack",
                      "best_converted.msgpack"):
            p = os.path.join(output_dir, fname)
            if os.path.isfile(p):
                run.log_artifact(p)
        run.end("FINISHED")
    return {
        "results": results,
        "best_acc": best.best_metric,
        "final_quant_acc": final_quant_acc,
        "output_dir": output_dir,
    }


def main(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from qat_vit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="TPU-native KD+QAT final training")
    add_hparam_flags(parser)
    args = parser.parse_args(argv)
    hp = resolve_hparams(args)
    if hp.get("task") == "detection":
        # detection-model KD (beyond-reference: the reference's trainer
        # crashes on its own OWLv2 entries — ref model_registry.py:370-426)
        from qat_vit_tpu.train.detect_trainer import detect_train_main

        detect_train_main(hp)
        return
    train_main(hp)


if __name__ == "__main__":  # pragma: no cover
    main()
