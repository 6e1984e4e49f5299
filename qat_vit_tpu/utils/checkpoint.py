"""Checkpoint save/load for parameter, observer, and int8-export pytrees.

Replaces the reference's ``torch.save(state_dict)`` checkpoints
(``best_qat.pth`` on val improvement, ``best_converted.pth`` last epoch —
reference src/training/qat_trainer.py:382-388) with flax msgpack pytree
serialization plus a JSON sidecar of metadata. Orbax is used when available
for async/multi-host saves; the msgpack path is the portable default and is
what the evaluator/comparator consume.

Loading keeps the reference's defensive tolerance (unwrap/strict=False
equivalents) by restoring against a structure template and reporting — not
crashing on — missing/unexpected leaves.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any], metadata: Optional[dict] = None) -> str:
    """Serialize a pytree (params / quant_stats / int8 export) to msgpack.

    Both files are published atomically (tmp + os.replace), the msgpack
    first. The JSON sidecar is advisory — no ordering of two files can make
    the pair crash-atomic, so any state a LOADER depends on (resume epoch,
    qat_enabled) must live as leaves inside the msgpack tree itself
    (save_resume_state does this); the sidecar exists for humans and tools."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_numpy(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish
    if metadata is not None:
        meta_tmp = path + ".json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump(metadata, f, indent=2, default=str)
        os.replace(meta_tmp, path + ".json")
    return path


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a pytree. With a ``template`` the result has the template's
    exact structure (typed leaves); without, returns raw nested dicts."""
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def tolerant_merge(template: Dict[str, Any], restored: Dict[str, Any]) -> Tuple[Dict[str, Any], list, list]:
    """``strict=False``-style restore (the reference's defensive loaders,
    model_registry.py:244-257, evaluator.py:92-96): overwrite template leaves
    that exist in ``restored``, keep template values for missing keys, ignore
    unexpected keys. Returns (merged, missing_paths, unexpected_paths)."""
    missing: list = []
    unexpected: list = []

    def walk(tmpl, rest, path):
        if isinstance(tmpl, dict):
            rest = rest if isinstance(rest, dict) else {}
            for k in rest:
                if k not in tmpl:
                    unexpected.append(path + (k,))
            return {
                k: walk(v, rest.get(k, _MISSING), path + (k,)) for k, v in tmpl.items()
            }
        if rest is _MISSING:
            missing.append(path)
            return tmpl
        arr = np.asarray(rest)
        want = np.asarray(tmpl)
        if arr.shape != want.shape:
            missing.append(path)  # shape mismatch → treated as missing
            return tmpl
        return arr.astype(want.dtype)

    merged = walk(template, restored, ())
    if missing:
        logger.warning("checkpoint missing %d leaves (kept template values)", len(missing))
    if unexpected:
        logger.warning("checkpoint has %d unexpected leaves (ignored)", len(unexpected))
    return merged, missing, unexpected


class _Missing:
    pass


_MISSING = _Missing()


def load_metadata(path: str) -> dict:
    meta_path = path + ".json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def save_checkpoint_orbax(path: str, tree: Dict[str, Any]) -> str:
    """Optional Orbax backend (async/multi-host-aware saves for large runs).

    The default msgpack path is the portable format every tool here consumes;
    Orbax is offered for users scaling to slices where per-host sharded saves
    matter. Requires ``orbax-checkpoint`` (baked into TPU images)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_numpy(tree), force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path: str, template: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


class BestCheckpointer:
    """Best-model selection with the reference's rule (qat_trainer.py:373-388):
    save when the epoch's accuracy improves on the best so far."""

    def __init__(self, output_dir: str, name: str = "best_qat"):
        self.output_dir = output_dir
        self.name = name
        self.best_metric = float("-inf")
        self.best_path: Optional[str] = None

    def maybe_save(
        self, metric: float, tree: Dict[str, Any], metadata: Optional[dict] = None
    ) -> Tuple[bool, Optional[str]]:
        if metric <= self.best_metric:
            return False, self.best_path
        self.best_metric = metric
        meta = dict(metadata or {})
        meta["metric"] = metric
        path = os.path.join(self.output_dir, f"{self.name}.msgpack")
        self.best_path = save_checkpoint(path, tree, meta)
        logger.info("saved %s (metric=%.4f)", path, metric)
        return True, self.best_path
