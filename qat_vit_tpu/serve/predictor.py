"""Batched int8 serving: raw uint8 images in, logits/labels out.

The deployment surface for the int8 export (survey §7.7: "batched int8
serving path (quantize input → int8 graph → logits) for the images/sec/chip
metric"). Preprocessing (bicubic resize + normalize) runs on device, fused
into the same compiled program as the int8 network, so the host↔device
boundary carries raw uint8 pixels only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qat_vit_tpu.data.pipeline import preprocess_fn
from qat_vit_tpu.models.vit import ViTConfig
from qat_vit_tpu.serve.int8_vit import int8_apply
from qat_vit_tpu.utils.checkpoint import load_checkpoint


@dataclasses.dataclass
class Int8Predictor:
    """Compiled-once predictor over an int8 export.

    >>> pred = Int8Predictor.from_checkpoint("best_converted.msgpack", cfg)
    >>> labels = pred.predict(images_u8)          # any N, auto-batched
    """

    qparams: Dict[str, Any]
    cfg: ViTConfig
    batch_size: int = 256
    # None = auto (the preset's choice on TPU, bf16 otherwise); an explicit
    # dtype always wins over the preset — e.g. compute_dtype=jnp.float32 for
    # an accuracy cross-check keeps f32 even with preset=True.
    compute_dtype: Any = None
    attn_dtype: Any = None
    preset: bool = True  # measured-best serving options (serving_preset)
    # data-parallel serving over a device mesh: the batch is sharded over
    # the mesh's first axis, qparams replicated — XLA compiles one SPMD
    # program per chip with zero inter-chip collectives in the forward
    # (the TPU-native counterpart of replica-per-GPU serving). batch_size
    # must divide by the axis size.
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        from qat_vit_tpu.serve.int8_vit import serving_preset

        prep = preprocess_fn(self.cfg.image_size)
        cfg = self.cfg
        opts: Dict[str, Any] = {
            "attn_dtype": jnp.bfloat16, "compute_dtype": jnp.bfloat16,
        }
        if self.preset:
            opts.update(serving_preset(cfg))
        # explicit constructor dtypes override the preset (None = auto)
        if self.attn_dtype is not None:
            opts["attn_dtype"] = self.attn_dtype
        if self.compute_dtype is not None:
            opts["compute_dtype"] = self.compute_dtype

        def apply(qp, images_u8):
            x = prep(images_u8)
            return int8_apply(qp, x, cfg, **opts)

        if self.mesh is not None:
            axis = self.mesh.axis_names[0]
            n_dev = self.mesh.devices.size
            if self.batch_size % n_dev:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"{n_dev}-device serving mesh"
                )
            repl = NamedSharding(self.mesh, P())
            shard = NamedSharding(self.mesh, P(axis))
            # shard_map, not bare GSPMD jit: the preset's Pallas kernels are
            # opaque custom calls the SPMD partitioner cannot split — under
            # plain jit with a sharded batch they force replication
            # (all-gather) instead of data-parallel execution. Under
            # shard_map each device runs the unmodified per-device program
            # on its batch shard — params replicated, zero collectives.
            mapped = jax.shard_map(
                apply, mesh=self.mesh,
                in_specs=(P(), P(axis)), out_specs=P(axis),
                check_vma=False,
            )
            self._fwd = jax.jit(mapped, out_shardings=shard)
            self.qparams = jax.device_put(self.qparams, repl)
        else:
            self._fwd = jax.jit(apply)
            self.qparams = jax.device_put(self.qparams)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: ViTConfig, **kw) -> "Int8Predictor":
        qp = jax.tree.map(jnp.asarray, load_checkpoint(path))
        return cls(qparams=qp, cfg=cfg, **kw)

    def logits(self, images_u8: np.ndarray) -> np.ndarray:
        """[N, H0, W0, 3] uint8 → [N, classes] f32, padded static batches."""
        n = len(images_u8)
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            chunk = images_u8[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            out = self._fwd(self.qparams, jnp.asarray(chunk))
            outs.append(np.asarray(out)[: bs - pad])
        return np.concatenate(outs) if outs else np.zeros((0, self.cfg.num_classes))

    def predict(self, images_u8: np.ndarray) -> np.ndarray:
        """Top-1 labels."""
        return self.logits(images_u8).argmax(-1).astype(np.int32)

    def serve_stream(
        self, batches: Iterator[np.ndarray]
    ) -> Iterator[np.ndarray]:
        """Pipelined streaming inference: dispatch batch k+1 while k computes.

        Ragged batches are padded to ``batch_size`` (and the output sliced
        back) so every dispatch reuses the one compiled program — a partial
        final batch must not trigger a fresh multi-minute jit compile.
        """
        pending = None
        pending_n = 0
        for batch in batches:
            n = len(batch)
            if n > self.batch_size:
                # oversize batch: drain the pipeline and run it chunked via
                # logits() (same compiled program), one yield per input batch
                if pending is not None:
                    yield np.asarray(pending)[:pending_n]
                    pending = None
                yield self.logits(batch)
                continue
            pad = self.batch_size - n
            if pad > 0:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)]
                )
            out = self._fwd(self.qparams, jnp.asarray(batch))
            if pending is not None:
                yield np.asarray(pending)[:pending_n]
            pending, pending_n = out, n
        if pending is not None:
            yield np.asarray(pending)[:pending_n]
