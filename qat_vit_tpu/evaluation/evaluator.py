"""Standalone evaluation: full-test-set top-1 for any checkpoint kind.

Re-design of reference ``src/evaluation/evaluator.py`` — which, as shipped,
is truncated mid-string at line 109 and therefore a SyntaxError that breaks
the whole ``src.evaluation`` package and ``scripts/evaluate.sh`` (survey
§3.4). This one works, and evaluates all three model kinds:

- float params (``quant=None``),
- fake-quant QAT checkpoints (params + quant_stats, ``best_qat.msgpack``),
- true-int8 exports (``best_converted.msgpack``) via the serving path.
"""

from __future__ import annotations

import argparse
import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qat_vit_tpu.data import ArrayLoader, load_cifar10, preprocess
from qat_vit_tpu.models import ModelBundle, create_model
from qat_vit_tpu.serve.int8_vit import make_int8_forward
from qat_vit_tpu.train.losses import top1_correct
from qat_vit_tpu.utils.checkpoint import load_checkpoint, tolerant_merge

logger = logging.getLogger(__name__)


def build_cifar10_loader(
    data_dir: str = "./data", batch_size: int = 512, limit: int = 0
) -> ArrayLoader:
    """Test-set loader (reference build_cifar10_loaders, evaluator.py:21-41)."""
    data, source = load_cifar10(data_dir)
    logger.info("CIFAR-10 source: %s", source)
    images, labels = data["test_images"], data["test_labels"]
    if limit:
        images, labels = images[: limit * batch_size], labels[: limit * batch_size]
    return ArrayLoader(images, labels, batch_size=batch_size, shuffle=False,
                       drop_last=False, prefetch=2)


def evaluate_model(
    apply_fn, variables: Dict[str, Any], loader: ArrayLoader, image_size: int
) -> float:
    """Top-1 loop (reference evaluate_model, evaluator.py:44-56)."""

    @jax.jit
    def step(vs, images, labels):
        x = images
        logits = apply_fn(vs, x)
        return top1_correct(logits, labels)

    correct = total = 0
    bs = loader.batch_size
    for batch in loader:
        n = len(batch["label"])
        img = batch["image"]
        lab = batch["label"]
        if n < bs:  # pad to the compiled shape
            img = np.concatenate([img, np.zeros((bs - n,) + img.shape[1:], img.dtype)])
            lab = np.concatenate([lab, np.full((bs - n,), -1, lab.dtype)])
        x = preprocess(jnp.asarray(img), size=image_size)
        correct += int(step(variables, x, jnp.asarray(lab)))
        total += n
    return correct / max(total, 1)


def evaluate_checkpoint(
    model_name: str,
    ckpt_path: Optional[str] = None,
    *,
    qat_wrapper: bool = False,
    int8: bool = False,
    data_dir: str = "./data",
    batch_size: int = 512,
    limit_batches: int = 0,
    num_classes: int = 10,
    qat_backend: str = "qnnpack",
    serving: str = "exact",
    image_size: int = 0,
) -> float:
    """Create → load → evaluate (reference evaluate_checkpoint,
    evaluator.py:59-101), with tolerant loading via checkpoint templates.

    ``qat_backend`` must match the backend the checkpoint was TRAINED with
    (best_params.yaml / effective_hparams.yaml record it): the backends use
    different activation ranges (qnnpack [0,255], fbgemm [0,127]), and the
    loaded min/max stats would otherwise silently produce scales on the
    wrong grid.

    ``serving`` picks the int8 forward: ``"exact"`` (f32, the conservative
    parity path — the default everywhere accuracy is reported) or
    ``"preset"`` (:func:`~qat_vit_tpu.serve.int8_vit.serving_preset` — the
    measured-best kernel path, for accuracy-neutrality cross-checks of the
    production serving configuration, docs/BENCHMARKS.md).

    ``image_size`` overrides the registry default so checkpoints trained at
    reduced resolution (trainer ``--image-size``) remain evaluable; 0 keeps
    the model's native size.
    """
    quantized = qat_wrapper or int8
    from qat_vit_tpu.quant.qconfig import default_qat_qconfig

    bundle: ModelBundle = create_model(
        model_name, num_classes=num_classes, qat_wrapper=quantized,
        **({"quant": default_qat_qconfig(qat_backend)} if quantized else {}),
        **({"image_size": image_size} if image_size else {}),
    )
    cfg = bundle.cfg
    loader = build_cifar10_loader(data_dir, batch_size, limit_batches)

    if int8:
        if ckpt_path is None:
            raise ValueError("int8 evaluation requires --ckpt (best_converted)")
        qp = load_checkpoint(ckpt_path)
        qp = _restore_int8_types(qp)
        if serving not in ("exact", "preset"):
            raise ValueError(f"serving must be 'exact' or 'preset', got "
                             f"{serving!r}")
        opts = {}
        if serving == "preset":
            from qat_vit_tpu.serve.int8_vit import serving_preset

            opts = serving_preset(cfg)
        fwd = make_int8_forward(cfg, **opts)
        correct = total = 0
        bs = loader.batch_size
        for batch in loader:
            n = len(batch["label"])
            img, lab = batch["image"], batch["label"]
            if n < bs:
                img = np.concatenate(
                    [img, np.zeros((bs - n,) + img.shape[1:], img.dtype)])
            x = preprocess(jnp.asarray(img), size=cfg.image_size)
            pred = np.asarray(jnp.argmax(fwd(qp, x), axis=-1))
            correct += int((pred[:n] == lab).sum())
            total += n
        return correct / max(total, 1)

    import flax.linen as nn

    variables = nn.meta.unbox(bundle.init(jax.random.key(0)))
    if ckpt_path is not None:
        restored = load_checkpoint(ckpt_path)  # raw nested dicts
        variables, _, _ = tolerant_merge(dict(variables), restored)
    # one upload: tolerant_merge leaves host numpy arrays, and a host tree
    # passed to jit re-transfers the full ~88 MB parameter set every batch
    # (dominates eval wall-clock over the tunneled TPU link)
    variables = jax.device_put(variables)

    def apply_fn(vs, x):
        return bundle.module.apply(vs, x, observe=False)

    return evaluate_model(apply_fn, variables, loader, cfg.image_size)


def _restore_int8_types(qp):
    """msgpack restores arrays untyped-correctly (numpy keeps dtype), so this
    is a light fixup for anything that round-tripped as a generic list."""
    return jax.tree.map(lambda x: jnp.asarray(x), qp)


def main(argv=None) -> None:
    """The CLI the reference intended (its argparse is cut off mid-string,
    evaluator.py:104-109)."""
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="evaluate a checkpoint on CIFAR-10")
    p.add_argument("--model", default="vit_small_patch16_224_student")
    p.add_argument("--ckpt", default=None, help="best_qat/best_converted.msgpack")
    p.add_argument("--qat-wrapper", action="store_true",
                   help="checkpoint carries quant_stats (best_qat)")
    p.add_argument("--int8", action="store_true",
                   help="checkpoint is a true-int8 export (best_converted)")
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--limit-batches", type=int, default=0)
    p.add_argument("--qat-backend", default="qnnpack",
                   choices=("qnnpack", "fbgemm"),
                   help="backend the checkpoint was trained with "
                        "(see effective_hparams.yaml)")
    p.add_argument("--serving", default="exact", choices=("exact", "preset"),
                   help="int8 forward: exact f32 parity path or the "
                        "measured-best kernel preset (--int8 only)")
    p.add_argument("--image-size", type=int, default=0,
                   help="override the model's native resolution (match the "
                        "trainer's --image-size; 0 = native)")
    args = p.parse_args(argv)
    acc = evaluate_checkpoint(
        args.model, args.ckpt, qat_wrapper=args.qat_wrapper, int8=args.int8,
        data_dir=args.data_dir, batch_size=args.batch_size,
        limit_batches=args.limit_batches, qat_backend=args.qat_backend,
        serving=args.serving, image_size=args.image_size,
    )
    print(f"top1_acc={acc:.4f}")


if __name__ == "__main__":  # pragma: no cover
    main()
