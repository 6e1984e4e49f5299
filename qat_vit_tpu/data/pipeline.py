"""Input pipeline: per-host sharded sampling + on-device preprocessing.

Replaces the reference's torchvision transforms + DataLoader worker processes
+ DistributedSampler (reference src/training/qat_trainer.py:210-254). The
host side only shuffles indices and slices uint8 arrays; the expensive work
(bicubic 32→224 resize, normalize) runs *on device inside the jitted step* —
uint8 pixels cross PCIe (37x less traffic than shipping resized f32 tensors)
and the VPU does the resize.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qat_vit_tpu.data.cifar10 import CIFAR10_MEAN, CIFAR10_STD


# ---------------------------------------------------------------------------
# DistributedSampler-parity index sharding
# ---------------------------------------------------------------------------

def epoch_indices(
    n: int,
    *,
    epoch: int,
    seed: int = 0,
    shuffle: bool = True,
    rank: int = 0,
    world_size: int = 1,
    drop_last: bool = False,
) -> np.ndarray:
    """Per-epoch, per-host index shard with torch DistributedSampler semantics
    (reference qat_trainer.py:224-226, 296-297): epoch-seeded permutation,
    pad-by-wraparound to a common length, rank-strided slice.

    Shuffles with numpy's RNG on purpose (not native_loader.shuffle_indices):
    the permutation sequence must be identical with or without the optional
    native plane — only the index *gather* is offloaded to C++."""
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        indices = g.permutation(n)
    else:
        indices = np.arange(n)
    if drop_last:
        total = (n // world_size) * world_size
        indices = indices[:total]
    else:
        total = -(-n // world_size) * world_size
        if total > n:
            indices = np.concatenate([indices, indices[: total - n]])
    return indices[rank:total:world_size]


@dataclasses.dataclass
class ArrayLoader:
    """Minimal, fast loader over in-memory arrays with background prefetch.

    The analog of the reference's ``DataLoader(num_workers=8, pin_memory,
    prefetch_factor=4)`` — except the per-batch host work is a single numpy
    fancy-index (microseconds), so one prefetch thread saturates the device.
    """

    images: np.ndarray  # [N, 32, 32, 3] uint8
    labels: np.ndarray  # [N] int32
    batch_size: int
    shuffle: bool = True
    seed: int = 0
    rank: int = 0
    world_size: int = 1
    drop_last: bool = True
    prefetch: int = 4

    def __post_init__(self):
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Sampler reshuffle hook (reference sampler.set_epoch, :296-297)."""
        self._epoch = epoch

    def __len__(self) -> int:
        per_rank = len(
            epoch_indices(
                len(self.images),
                epoch=0,
                seed=self.seed,
                shuffle=False,
                rank=self.rank,
                world_size=self.world_size,
                drop_last=self.drop_last,
            )
        )
        if self.drop_last:
            return per_rank // self.batch_size
        return -(-per_rank // self.batch_size)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = epoch_indices(
            len(self.images),
            epoch=self._epoch,
            seed=self.seed,
            shuffle=self.shuffle,
            rank=self.rank,
            world_size=self.world_size,
            drop_last=self.drop_last,
        )
        from qat_vit_tpu.data.native_loader import gather_batch

        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            img, lab = gather_batch(self.images, self.labels, sel)
            yield {"image": img, "label": lab, "index": np.asarray(sel, np.int64)}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that aborts when the consumer abandoned iteration
            # (limit_batches early-break) — otherwise the producer blocks on a
            # full queue forever and the thread + its batch references leak.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self._batches():
                    if not put(item):
                        return
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # runs on normal exhaustion, early break (GeneratorExit), or error
            stop.set()
            while True:  # drain so the producer's pending put can't block
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)


# ---------------------------------------------------------------------------
# On-device preprocessing (jit-fusable)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("size", "antialias"))
def preprocess(
    images_u8: jnp.ndarray, size: int = 224, antialias: bool = False
) -> jnp.ndarray:
    """uint8 [B,32,32,3] → normalized f32 [B,size,size,3], all on device.

    Matches the reference transform stack (Resize(224, bicubic) → ToTensor →
    Normalize(ImageNet), qat_trainer.py:210-216). PIL and jax.image bicubic
    share the Keys α=-0.5 kernel; upscaling needs no antialias pre-filter.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(
            x, (b, size, size, c), method="bicubic", antialias=antialias
        )
    mean = jnp.asarray(CIFAR10_MEAN, jnp.float32)
    std = jnp.asarray(CIFAR10_STD, jnp.float32)
    return (x - mean) / std


def _resize_matrix(src: int, dst: int) -> jnp.ndarray:
    """[dst, src] bicubic interpolation matrix.

    Bicubic resize is linear in the input, so the exact ``jax.image.resize``
    operator restricted to one axis IS a matrix — extracted by resizing the
    identity. Applying it as two small GEMMs keeps the 32→224 upsample on the
    MXU; XLA's native lowering of ``jax.image.resize`` inside the train step
    was ~23 ms/step of convolution time on v5e (profiled), the GEMM form is
    noise.
    """
    eye = jnp.eye(src, dtype=jnp.float32)
    return jax.image.resize(eye, (dst, src), method="bicubic")


def preprocess_fn(size: int = 224):
    """Unjitted preprocess for fusing *inside* a larger jitted step."""

    def fn(images_u8: jnp.ndarray) -> jnp.ndarray:
        x = images_u8.astype(jnp.float32) / 255.0
        b, h, w, c = x.shape
        if (h, w) != (size, size):
            wh = _resize_matrix(h, size)
            ww = _resize_matrix(w, size)
            # separable bicubic as two GEMMs: [dst,h]@[b,h,w,c] then width
            x = jnp.einsum("Hh,bhwc->bHwc", wh, x)
            x = jnp.einsum("Ww,bHwc->bHWc", ww, x)
        mean = jnp.asarray(CIFAR10_MEAN, jnp.float32)
        std = jnp.asarray(CIFAR10_STD, jnp.float32)
        return (x - mean) / std

    return fn
