"""Detection KD+QAT trainer: distill a teacher OWLv2 detector into a pruned,
QAT-armed student detector.

Capability beyond the reference: its registry constructs OWLv2 detection
models (reference src/models/model_registry.py:370-426) but its trainer
consumes only image→logits classifiers — detection models crash it, so the
reference never trains detection. This engine reuses the classification
trainer's phase machine (float phase → QAT switch with fresh observers +
LR×qat_lr_scale optimizer → convert) over the detection KD objective
(train/detect_steps.py): KL on per-query class logits + L1 on boxes + BCE on
objectness, all against the frozen teacher detector.

There is no labeled detection dataset in this pipeline (the reference ships
none); the teacher is the supervision signal, and evaluation is
teacher-relative (mean |Δbox| and top-box agreement). Query embeddings are
fixed per run (open-vocabulary queries are precomputed text embeddings in
deployment; the text tower is out of scope, as in the reference).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from qat_vit_tpu.data import ArrayLoader, load_cifar10
from qat_vit_tpu.models import ModelBundle, create_model
from qat_vit_tpu.parallel import (
    barrier,
    get_dist_info,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from qat_vit_tpu.quant import default_qat_qconfig
from qat_vit_tpu.serve.int8_detect import convert_detector, int8_detect_apply
from qat_vit_tpu.tracking import NullRun, make_tracker
from qat_vit_tpu.train.config import DEFAULT_HPARAMS, save_effective_hparams
from qat_vit_tpu.train.detect_steps import (
    detect_loss_hparams,
    make_detect_eval_step,
    make_detect_train_step,
)
from qat_vit_tpu.train.steps import (
    TrainState,
    init_quant_stats,
    make_optimizer,
    set_optimizer_hyperparams,
)
from qat_vit_tpu.utils.checkpoint import BestCheckpointer, save_checkpoint

logger = logging.getLogger(__name__)


def _unbox(tree):
    return nn.meta.unbox(tree)


class DetectKDTrainer:
    """Detection KD+QAT engine (same phase machine as KDQATTrainer)."""

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
        steps: Optional[Dict[str, Any]] = None,
        teacher_cache: Optional[tuple] = None,
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
        self.image_size = image_size
        self.text_dim = int(self.hp.get("text_dim", 512))
        self.num_queries = int(self.hp.get("num_queries", 4))

        data_size = self.mesh.shape.get("data", 1)
        for key in ("batch_size", "eval_batch_size"):
            b = int(self.hp.get(key, 64) if key == "eval_batch_size"
                    else self.hp[key])
            if b % data_size:
                self.hp[key] = -(-b // data_size) * data_size

        # ---- models: detector teacher (frozen) + detector student ----
        geo = {
            k: self.hp[k]
            for k in ("patch_size", "embed_dim", "depth", "num_heads",
                      "mlp_ratio")
            if k in self.hp
        }
        self.teacher = teacher if teacher is not None else create_model(
            "owlv2_base_detector", image_size=image_size,
            text_dim=self.text_dim, dtype=jnp.bfloat16, **geo,
        )
        base = student if student is not None else create_model(
            "owlv2_pruned_detector", image_size=image_size,
            text_dim=self.text_dim, **geo,
        )
        qconfig = default_qat_qconfig(self.hp.get("qat_backend", "qnnpack"))
        obs_stride = max(1, int(self.hp.get("observer_stride", 1)))
        if obs_stride > 1:
            qconfig = dataclasses.replace(
                qconfig,
                activation=dataclasses.replace(
                    qconfig.activation, observe_stride=obs_stride
                ),
            )
        from qat_vit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        model_size = self.mesh.shape.get(MODEL_AXIS, 1)
        if model_size != 1:
            raise ValueError("detection training supports pure-DP meshes only")
        self.use_shard_map = self.mesh.devices.size > 1
        if self.use_shard_map:
            qconfig = dataclasses.replace(
                qconfig,
                activation=dataclasses.replace(
                    qconfig.activation, axis_name=DATA_AXIS
                ),
            )
        qat_dtype = (
            jnp.bfloat16 if self.hp.get("qat_amp", False) else jnp.float32
        )
        fast = bool(self.hp.get("amp_fast_math", True))
        dtype = jnp.bfloat16 if self.hp.get("amp", True) else jnp.float32
        attn_kernel = self.mesh.devices.size == 1 or self.use_shard_map
        from qat_vit_tpu.models.owlv2_detect import Owlv2Detector

        self.student_qat_cfg = dataclasses.replace(
            base.cfg, quant=qconfig, qat_wrapper=True, dtype=qat_dtype,
            fast_math=fast and qat_dtype == jnp.bfloat16,
            attn_kernel=attn_kernel,
        )
        self.student_float_cfg = dataclasses.replace(
            base.cfg, quant=None, qat_wrapper=False, dtype=dtype,
            fast_math=fast and dtype == jnp.bfloat16,
            attn_kernel=attn_kernel,
        )
        self.student_float = Owlv2Detector(
            self.student_float_cfg, text_dim=self.text_dim
        )
        self.student_qat = Owlv2Detector(
            self.student_qat_cfg, text_dim=self.text_dim
        )

        # ---- parameters ----
        rng_t, rng_s, rng_q, self.rng = jax.random.split(self.rng, 4)
        repl = replicated_sharding(self.mesh)
        ex_x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        ex_q = jnp.zeros((1, self.num_queries, self.text_dim), jnp.float32)
        if teacher_params is None and self.hp.get("teacher_ckpt"):
            from qat_vit_tpu.utils.checkpoint import load_checkpoint

            teacher_params = load_checkpoint(self.hp["teacher_ckpt"])
            if "params" in teacher_params:
                teacher_params = teacher_params["params"]
            logger.info("loaded teacher detector from %s",
                        self.hp["teacher_ckpt"])
        if teacher_params is None:
            teacher_params = _unbox(
                self.teacher.module.init(rng_t, ex_x, ex_q, observe=False)
            )["params"]
            logger.warning(
                "teacher detector is randomly initialized (no teacher_ckpt; "
                "real deployments convert an HF Owlv2ForObjectDetection "
                "checkpoint via models.owlv2_detect.owlv2_detection_to_params)"
            )
        self.teacher_params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                         teacher_params),
            repl,
        )
        params = _unbox(
            self.student_float.init(rng_s, ex_x, ex_q, observe=False)
        )["params"]
        params = jax.device_put(params, repl)

        # fixed query embeddings for the run (unit-norm, seeded). query_seed
        # (optional) pins them independently of the trainer seed — the
        # search driver varies the student seed per trial but must keep ONE
        # query set so the shared teacher-output cache stays valid.
        if int(self.hp.get("query_seed", -1)) >= 0:
            rng_q = jax.random.key(int(self.hp["query_seed"]))
        q = jax.random.normal(
            rng_q, (self.num_queries, self.text_dim), jnp.float32
        )
        self.queries = np.asarray(q / jnp.linalg.norm(q, axis=-1, keepdims=True))

        # ---- optimizer + state ----
        self.tx = make_optimizer(
            float(self.hp["lr"]),
            float(self.hp["weight_decay"]),
            float(self.hp.get("grad_clip_norm", 1.0)),
        )
        opt_state = set_optimizer_hyperparams(
            self.tx.init(params),
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
        self.loss_hp = detect_loss_hparams(self.hp)

        # ---- compiled steps ----
        def teacher_apply(p, x, q):
            return self.teacher.module.apply({"params": p}, x, q,
                                             observe=False)

        self._teacher_apply = teacher_apply
        # teacher-output cache (default on, as in classification — the
        # single biggest classification throughput lever, worth more here:
        # the teacher detection forward is the full-resolution tower).
        # Mathematically identical: the teacher is frozen, the query set is
        # fixed per run, and the pipeline has no augmentation, so its
        # outputs per image are constants.
        self.cache_teacher = bool(self.hp.get("cache_teacher_logits", True))
        step_teacher = None if self.cache_teacher else teacher_apply
        step_mesh = self.mesh if self.use_shard_map else None
        shared = steps if steps is not None else {}
        self.train_step_float = shared.get("train_float") or make_detect_train_step(
            step_teacher, self.student_float.apply, self.tx,
            qat=False, image_size=image_size, mesh=step_mesh,
        )
        self.train_step_qat = shared.get("train_qat") or make_detect_train_step(
            step_teacher, self.student_qat.apply, self.tx,
            qat=True, image_size=image_size, mesh=step_mesh, qconfig=qconfig,
        )
        self.eval_step_float = shared.get("eval_float") or make_detect_eval_step(
            teacher_apply, self.student_float.apply,
            qat=False, image_size=image_size, mesh=step_mesh,
        )
        self.eval_step_qat = shared.get("eval_qat") or make_detect_eval_step(
            teacher_apply, self.student_qat.apply,
            qat=True, image_size=image_size, mesh=step_mesh,
        )
        # opt-in observer_interval (same contract as the classification
        # trainer): observe every k-th QAT step, fake-quant from frozen
        # stats in between — a SECOND compiled program selected per step in
        # Python, so each variant keeps full XLA fusion quality
        self.observer_interval = max(1, int(self.hp.get("observer_interval", 1)))
        self.train_step_qat_frozen = shared.get("train_qat_frozen") or (
            make_detect_train_step(
                step_teacher, self.student_qat.apply, self.tx,
                qat=True, image_size=image_size, observe=False,
                mesh=step_mesh, qconfig=qconfig,
            ) if self.observer_interval > 1 else None
        )
        self._qat_py_step = 0
        # cache arrays (lazy-allocated): per-image teacher outputs. A
        # ``teacher_cache`` tuple shares them BY REFERENCE across trainers
        # (the search driver's cross-trial reuse: rows filled in one trial
        # serve every later trial — same frozen teacher, same query seed).
        self._t_logits: Optional[np.ndarray] = None
        self._t_boxes: Optional[np.ndarray] = None
        self._t_obj: Optional[np.ndarray] = None
        self._teacher_mask: Optional[np.ndarray] = None
        if teacher_cache is not None:
            (self._t_logits, self._t_boxes, self._t_obj,
             self._teacher_mask) = teacher_cache
        self._teacher_fwd = None

        # ---- data: images only (teacher supplies the targets) ----
        if data is None:
            data, source = load_cifar10(self.hp.get("data_dir", "./data"))
            logger.info("detection image source: %s", source)
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
            batch_size=int(self.hp.get("eval_batch_size", 64)),
            shuffle=False, drop_last=False, prefetch=2,
        )

    # ------------------------------------------------------------------
    def shared_steps(self) -> Dict[str, Any]:
        """Hand these to the next trainer (same architecture) to reuse the
        compiled steps — zero recompiles across search trials."""
        return {
            "train_float": self.train_step_float,
            "eval_float": self.eval_step_float,
            "train_qat": self.train_step_qat,
            "eval_qat": self.eval_step_qat,
            "train_qat_frozen": self.train_step_qat_frozen,
        }

    def teacher_cache(self) -> Optional[tuple]:
        """The shareable (logits, boxes, obj, mask) cache arrays, or None if
        the cache was never allocated."""
        if self._teacher_mask is None:
            return None
        return (self._t_logits, self._t_boxes, self._t_obj,
                self._teacher_mask)

    # ------------------------------------------------------------------
    def enable_qat(self) -> None:
        """Same phase switch as KDQATTrainer.enable_qat (fresh observers,
        fresh moments at LR×qat_lr_scale, swap compiled steps)."""
        if self.qat_enabled:
            return
        repl = replicated_sharding(self.mesh)
        quant_stats = jax.device_put(
            init_quant_stats(self.student_qat, self.student_qat_cfg), repl
        )
        lr = float(self.hp["lr"]) * float(self.hp.get("qat_lr_scale", 0.5))
        opt_state = set_optimizer_hyperparams(
            self.tx.init(self.state.params),
            learning_rate=lr, weight_decay=float(self.hp["weight_decay"]),
        )
        self.state = TrainState(
            params=self.state.params,
            opt_state=jax.device_put(opt_state, repl),
            quant_stats=quant_stats,
            step=self.state.step,
        )
        self.qat_enabled = True
        self._qat_py_step = 0  # first QAT step must observe (±inf markers)
        logger.info("detection QAT enabled (lr -> %.3g)", lr)

    # ------------------------------------------------------------------
    def _get_teacher_fwd(self):
        """Jitted prep+teacher detection forward used to fill the cache.
        Returns float32 (logits, boxes, objectness) for an image chunk."""
        if self._teacher_fwd is None:
            from qat_vit_tpu.data.pipeline import preprocess_fn

            prep = preprocess_fn(self.image_size)
            apply = self._teacher_apply

            @jax.jit
            def fwd(p, imgs, q):
                out = apply(p, prep(imgs), q)
                return (out["logits"].astype(jnp.float32),
                        out["pred_boxes"].astype(jnp.float32),
                        out["objectness_logits"].astype(jnp.float32))

            self._teacher_fwd = fwd
        return self._teacher_fwd

    def _alloc_teacher_cache(self) -> None:
        """Allocate the per-image output arrays from the teacher's output
        shapes (eval_shape: no device work)."""
        n = len(self.data["train_images"])
        ex_x = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        ex_q = jnp.zeros((1, self.num_queries, self.text_dim), jnp.float32)
        shapes = jax.eval_shape(
            self._teacher_apply, self.teacher_params, ex_x, ex_q)
        p = shapes["pred_boxes"].shape[1]
        self._t_logits = np.zeros((n, p, self.num_queries), np.float32)
        self._t_boxes = np.zeros((n, p, 4), np.float32)
        self._t_obj = np.zeros((n, p), np.float32)
        self._teacher_mask = np.zeros(n, bool)

    def _ensure_teacher_outputs(self, lazy: bool = False) -> None:
        """Precompute the frozen teacher's detection outputs over the train
        images once (or allocate a lazily-filled cache for limited-batch
        runs — the classification trainer's contract, trainer.py).

        Cache size is P·(Q+5) floats per image (e.g. OWLv2-pruned at 768 px,
        Q=4: ~83 KB/image, ~4.2 GB for 50k images) — host RAM, never HBM."""
        if not self.cache_teacher or self._teacher_mask is not None:
            return
        self._alloc_teacher_cache()
        if lazy:
            logger.info(
                "teacher output cache: lazy (limited-batch run; rows fill as "
                "batches are visited)")
            return
        fwd = self._get_teacher_fwd()
        imgs = self.data["train_images"]
        bs = int(self.hp.get("eval_batch_size", 64))
        q = jnp.broadcast_to(
            jnp.asarray(self.queries)[None],
            (bs, self.num_queries, self.text_dim))
        t0 = time.perf_counter()
        for start in range(0, len(imgs), bs):
            chunk = imgs[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            lg, bx, ob = fwd(self.teacher_params, jnp.asarray(chunk), q)
            end = start + bs - pad
            self._t_logits[start:end] = np.asarray(lg)[: bs - pad]
            self._t_boxes[start:end] = np.asarray(bx)[: bs - pad]
            self._t_obj[start:end] = np.asarray(ob)[: bs - pad]
        self._teacher_mask[:] = True
        logger.info(
            "cached teacher detection outputs for %d images in %.1fs",
            len(imgs), time.perf_counter() - t0,
        )

    def _teacher_outputs_for(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Cached teacher outputs for one host batch, filling misses."""
        idx = batch["index"]
        if not self._teacher_mask[idx].all():
            b = len(batch["image"])
            q = jnp.broadcast_to(
                jnp.asarray(self.queries)[None],
                (b, self.num_queries, self.text_dim))
            lg, bx, ob = self._get_teacher_fwd()(
                self.teacher_params, jnp.asarray(batch["image"]), q)
            self._t_logits[idx] = np.asarray(lg)
            self._t_boxes[idx] = np.asarray(bx)
            self._t_obj[idx] = np.asarray(ob)
            self._teacher_mask[idx] = True
        return {"t_logits": self._t_logits[idx],
                "t_boxes": self._t_boxes[idx],
                "t_obj": self._t_obj[idx]}

    # ------------------------------------------------------------------
    def _with_queries(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        b = len(batch["image"])
        return {
            "image": batch["image"],
            "query_embeds": np.broadcast_to(
                self.queries[None], (b, self.num_queries, self.text_dim)
            ).copy(),
        }

    def train_epoch(self, epoch: int, limit_batches: int = 0) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        # lazy cache only when the run visits a small fraction of the data
        # (same reshuffle rationale as the classification trainer)
        lazy = False
        if limit_batches:
            planned = (
                limit_batches * int(self.hp["batch_size"])
                * self.dist.world_size
                * max(1, int(self.hp.get("epochs", 1)))
            )
            lazy = planned < len(self.data["train_images"]) // 2
        self._ensure_teacher_outputs(lazy=lazy)
        step_fn = self.train_step_qat if self.qat_enabled else self.train_step_float
        use_interval = (
            self.qat_enabled
            and self.observer_interval > 1
            and self.train_step_qat_frozen is not None
        )
        metrics_acc = []
        n_images = 0
        t0 = time.perf_counter()
        for i, batch in enumerate(self.train_loader):
            if limit_batches and i >= limit_batches:
                break
            host_batch = self._with_queries(batch)
            if self.cache_teacher:
                host_batch.update(self._teacher_outputs_for(batch))
            gbatch = shard_batch(host_batch, self.mesh)
            fn = step_fn
            if use_interval:
                if self._qat_py_step % self.observer_interval:
                    fn = self.train_step_qat_frozen
                self._qat_py_step += 1
            self.state, metrics = fn(
                self.state, self.teacher_params, gbatch, self.loss_hp
            )
            metrics_acc.append(metrics)
            n_images += int(self.hp["batch_size"]) * self.dist.world_size
        jax.block_until_ready(self.state.params)
        dt = time.perf_counter() - t0
        if not metrics_acc:
            return {"imgs_per_sec": 0.0, "epoch_seconds": dt}
        stacked = jax.device_get(metrics_acc)
        out = {k: float(np.mean([m[k] for m in stacked])) for k in stacked[0]}
        out["imgs_per_sec"] = n_images / max(dt, 1e-9)
        out["epoch_seconds"] = dt
        return out

    def _padded_eval_batches(self, limit_batches: int = 0):
        """Yield eval batches padded to the compiled eval batch size, with
        ``query_embeds`` attached and a ``valid`` row mask marking real
        images. ONE static batch shape for every eval path (evaluate and
        evaluate_int8): a short tail batch would otherwise trigger a fresh
        jit compile at a new shape — minutes over the TPU tunnel."""
        bs = int(self.hp.get("eval_batch_size", 64))
        for i, batch in enumerate(self.eval_loader):
            if limit_batches and i >= limit_batches:
                break
            n = len(batch["image"])
            if n < bs:
                pad = np.zeros(
                    (bs - n,) + batch["image"].shape[1:], batch["image"].dtype
                )
                batch = {"image": np.concatenate([batch["image"], pad])}
            else:
                batch = {"image": batch["image"]}
            b = self._with_queries(batch)
            b["valid"] = (np.arange(bs) < n).astype(np.float32)
            yield b

    def evaluate(self, limit_batches: int = 0) -> Dict[str, float]:
        """Teacher-relative detection metrics over the eval images."""
        step_fn = self.eval_step_qat if self.qat_enabled else self.eval_step_float
        sums = {"box_err_sum": 0.0, "agree_sum": 0.0, "n": 0.0}
        for b in self._padded_eval_batches(limit_batches):
            gbatch = shard_batch(b, self.mesh)
            out = jax.device_get(step_fn(
                self.state.params, self.state.quant_stats,
                self.teacher_params, gbatch,
            ))
            for k in sums:
                sums[k] += float(out[k])
        n = max(sums["n"], 1.0)
        return {"box_err": sums["box_err_sum"] / n,
                "teacher_agreement": sums["agree_sum"] / n}

    # ------------------------------------------------------------------
    # Mid-run resume: the detection TrainState has the exact same structure
    # as the classification one (params / opt_state / quant_stats / step),
    # and the phase switch is the same enable_qat contract — reuse the
    # classification trainer's crash-atomic resume implementation verbatim.
    from qat_vit_tpu.train.trainer import KDQATTrainer as _KDQATTrainer

    save_resume_state = _KDQATTrainer.save_resume_state
    load_resume_state = _KDQATTrainer.load_resume_state
    del _KDQATTrainer

    # ------------------------------------------------------------------
    def convert_int8(self) -> Dict[str, Any]:
        """Observer folding → int8 detection export (tower int8 + float heads)."""
        if not self.qat_enabled:
            raise RuntimeError("convert requires QAT to have run")
        return convert_detector(
            jax.device_get(self.state.params),
            jax.device_get(self.state.quant_stats),
            self.student_qat_cfg,
            per_channel_weights=bool(self.hp.get("per_channel_weights", False)),
        )

    def evaluate_int8(self, export=None, limit_batches: int = 0) -> Dict[str, float]:
        """Int8 detector vs the fake-quant detector it was converted from:
        mean |Δbox| and top-box agreement (the detection analog of the
        classification quant_acc row). Batches ride the same padded static
        shape as :meth:`evaluate` (one compile per eval path)."""
        export = export if export is not None else self.convert_int8()
        cfg = self.student_qat_cfg
        from qat_vit_tpu.data.pipeline import preprocess

        @jax.jit
        def cmp_step(params, qs, export, x, q, valid):
            fq = self.student_qat.apply(
                {"params": params, "quant_stats": qs}, x, q, observe=False)
            i8 = int8_detect_apply(export, x, cfg, q, text_dim=self.text_dim)
            box = jnp.sum(valid * jnp.mean(
                jnp.abs(fq["pred_boxes"] - i8["pred_boxes"]), axis=(1, 2)))
            agree = jnp.sum(valid * jnp.mean(
                (jnp.argmax(fq["logits"], axis=1)
                 == jnp.argmax(i8["logits"], axis=1)).astype(jnp.float32),
                axis=-1))
            return box, agree

        sums = {"box_err": 0.0, "agree": 0.0, "n": 0.0}
        for b in self._padded_eval_batches(limit_batches):
            x = preprocess(jnp.asarray(b["image"]), size=self.image_size)
            q = jnp.asarray(b["query_embeds"])
            box, agree = cmp_step(
                self.state.params, self.state.quant_stats, export, x, q,
                jnp.asarray(b["valid"]))
            sums["box_err"] += float(box)
            sums["agree"] += float(agree)
            sums["n"] += float(b["valid"].sum())
        n = max(sums["n"], 1.0)
        return {"int8_box_err": sums["box_err"] / n,
                "int8_top_box_agreement": sums["agree"] / n}


def detect_train_main(hp: Dict[str, Any]) -> Dict[str, Any]:
    """Final-training entry for --task detection (mirrors trainer.train_main)."""
    dist = get_dist_info()
    output_dir = hp["output_dir"]
    if dist.is_main_process:
        os.makedirs(output_dir, exist_ok=True)
        save_effective_hparams(hp, output_dir)
        tracker = make_tracker(hp["mlflow_uri"], hp["experiment"])
        run = tracker.start_run("final_train_detection")
        run.log_params(
            {k: hp[k] for k in DEFAULT_HPARAMS if not isinstance(hp[k], dict)}
        )
    else:
        run = NullRun()
    barrier("dataset")

    trainer = DetectKDTrainer(hp, run=run)
    best = BestCheckpointer(output_dir, "best_qat_detector")
    epochs = int(hp["epochs"])
    qat_start = int(hp["qat_start_epoch"])
    limit_train = int(hp.get("limit_train_batches", 0))
    limit_eval = int(hp.get("limit_eval_batches", 0))
    results = []
    int8_metrics: Dict[str, float] = {}
    start_epoch = 0
    if hp.get("resume"):
        start_epoch = trainer.load_resume_state(hp["resume"])
        logger.info("resumed from %s at epoch %d", hp["resume"], start_epoch)
    for epoch in range(start_epoch, epochs):
        if epoch >= qat_start:
            trainer.enable_qat()
        tm = trainer.train_epoch(epoch, limit_batches=limit_train)
        barrier("epoch")
        ev = trainer.evaluate(limit_batches=limit_eval)
        last = epoch == epochs - 1
        if last and trainer.qat_enabled:
            export = trainer.convert_int8()
            int8_metrics = trainer.evaluate_int8(export,
                                                 limit_batches=limit_eval)
            if dist.is_main_process:
                save_checkpoint(
                    os.path.join(output_dir, "best_converted_detector.msgpack"),
                    export,
                    {"epoch": epoch, "format": "int8-tower+float-heads",
                     **int8_metrics},
                )
        if dist.is_main_process:
            run.log_metrics(
                {**{k: tm.get(k, 0.0) for k in
                    ("train_loss", "train_loss_kd", "train_loss_box",
                     "train_loss_obj")},
                 **ev, "imgs_per_sec": tm["imgs_per_sec"],
                 "qat_enabled": float(trainer.qat_enabled)},
                step=epoch,
            )
            logger.info(
                "epoch %d/%d loss %.4f box_err %.4f agree %.3f (%.0f img/s)%s",
                epoch + 1, epochs, tm.get("train_loss", 0.0), ev["box_err"],
                ev["teacher_agreement"], tm["imgs_per_sec"],
                " [QAT]" if trainer.qat_enabled else "",
            )
            # best-model rule as in classification (BestCheckpointer): save
            # only when teacher agreement improves — the filename's promise.
            # NOTE (as for classification best_qat.msgpack): a pre-QAT float
            # epoch can win this metric (quantization noise usually lowers
            # agreement), in which case best_qat_detector.msgpack holds float
            # params and EMPTY quant_stats despite the name — consumers that
            # need calibrated observers must check the qat_enabled metadata
            # flag. This matches the reference's best-model rule
            # (qat_trainer.py:373-385: quant_acc aliases qat_acc).
            qs = trainer.state.quant_stats
            best.maybe_save(
                ev["teacher_agreement"],
                {"params": jax.device_get(trainer.state.params),
                 "quant_stats": jax.device_get(qs) if qs is not None else {}},
                {"epoch": epoch, **ev,
                 "qat_enabled": trainer.qat_enabled},
            )
        if dist.is_main_process and hp.get("save_resume_state", True):
            trainer.save_resume_state(
                os.path.join(output_dir, "resume_state.msgpack"), epoch
            )
        results.append({"epoch": epoch, **tm, **ev,
                        "qat_enabled": trainer.qat_enabled})
        barrier("epoch_end")

    if dist.is_main_process:
        for k, v in int8_metrics.items():
            run.log_metric(k, v)
        run.end("FINISHED")
    return {"results": results, "int8": int8_metrics,
            "output_dir": output_dir}
