"""qat_vit_tpu — TPU-native knowledge-distillation + QAT framework for Vision Transformers.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``bdina9/qat-vit`` pipeline (frozen ViT-B/16 teacher distilling into an int8
fake-quant ViT-S/16 student on CIFAR-10, hyperparameter search, distributed
data-parallel final training, experiment tracking, and a true-int8 deployment
path).

Everything here is TPU-first:

- quantization is a pure ``jax.custom_vjp`` fake-quant op with observer state
  carried as Flax variables inside the jitted train step (the reference
  outsourced this to torch.ao C++/CUDA kernels),
- int8 inference runs through an MXU int8 GEMM (Pallas kernel with an XLA
  ``dot_general`` fallback) instead of QNNPACK,
- data parallelism is a sharded pure train step over a ``jax.sharding.Mesh``
  (``psum`` compiled into the step) instead of DDP/NCCL,
- checkpoints are Orbax/pytree-based, and the int8 export is a pytree of
  int8 weights + scales/zero-points that actually runs (the reference's
  eager-mode ``convert`` output did not).
"""

__version__ = "0.1.0"

from qat_vit_tpu import quant  # noqa: F401
