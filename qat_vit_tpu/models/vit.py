"""TPU-native Vision Transformer with first-class quantization support.

Geometry is timm-compatible (``vit_{tiny,small,base}_patch16_224``: patch 16,
cls token, learned position embeddings, pre-norm blocks, GELU MLP x4 — the
models the reference builds via ``timm.create_model``, reference
src/models/model_registry.py:167-172 and 228-233), but the implementation is
designed for the MXU/XLA:

- the 16x16 patch-embed convolution is expressed as patch-extraction +
  a single GEMM (conv-as-GEMM: one [B*196, 768] x [768, D] matmul instead of
  a conv XLA would have to rewrite anyway);
- qkv is one fused [D, 3D] GEMM; attention is plain batched dot-products that
  XLA fuses with the softmax on-chip (seq len 197 — no flash-attention tiling
  needed, the whole score matrix fits VMEM);
- all matmul weights carry logical sharding axes so the same module runs
  replicated (pure DP) or tensor-parallel over a ``model`` mesh axis;
- quantization is static configuration: ``quant=None`` builds the fp32/bf16
  model, ``quant=QConfig`` builds the fake-quant QAT model over the *same*
  parameter tree, with observer state in the ``quant_stats`` collection.
  Fake-quant placement replicates torch ``prepare_qat`` on a timm ViT
  (verified in the survey): weights of every Conv/Linear; activations at the
  input stub and after every Conv/Linear/LayerNorm output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.ad_checkpoint  # registers jax.ad_checkpoint (not auto-imported)
import jax.numpy as jnp
import numpy as np

from qat_vit_tpu.quant.modules import FakeQuantizer
from qat_vit_tpu.quant.qconfig import QConfig

Dtype = Any

# Logical axis names used for tensor-parallel sharding rules.
EMBED = "embed"  # never sharded (residual stream)
HIDDEN = "hidden"  # shardable over the `model` mesh axis (heads / mlp)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture + quantization configuration (hashable → jit key)."""

    num_classes: int = 10
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    layer_norm_eps: float = 1e-6
    # CLIP-style options (the OWLv2 vision tower is a CLIP ViT: LayerNorm
    # after the embeddings, quick-GELU MLP, bias-free patch projection —
    # HF Owlv2VisionModel geometry; ref model_registry.py:269-327).
    pre_norm: bool = False  # LN between embeddings and the first block
    act: str = "gelu"  # MLP activation: "gelu" (timm) or "quick_gelu" (CLIP)
    patch_bias: bool = True  # timm conv has bias; CLIP's does not
    # None → float model; QConfig → fake-quant QAT model.
    quant: Optional[QConfig] = None
    # Adds the input QuantStub fake-quant site (reference QATWrapper,
    # model_registry.py:99-124). Only meaningful when quant is set.
    qat_wrapper: bool = True
    # Computation dtype (params always fp32). bf16 pre-QAT, fp32 under QAT —
    # the reference's AMP phase gating (qat_trainer.py:320).
    dtype: Dtype = jnp.float32
    # bf16 softmax + tanh-approx GELU. The two measured-dominant non-GEMM
    # costs of the train step (scripts/op_grad_bench.py: attention fwd+bwd
    # 74.8→49.8 ms/step with bf16 softmax; exact-f32 GELU 25.1→3.9 ms with
    # the bf16 tanh approx). Enabled by the trainer for its bf16 phases
    # (amp_fast_math hparam); full-scale accuracy evidence in
    # docs/BENCHMARKS.md. Off → exact f32 softmax/erf-GELU (reference
    # numerics).
    fast_math: bool = False
    # Permit the fused Pallas attention kernel (used when fast_math is on
    # and shapes qualify). The trainer sets this False on a multi-device
    # mesh: a pallas_call is an opaque custom call the GSPMD partitioner
    # cannot split, so inside a sharded jit it would force the batch to be
    # all-gathered and replicate the attention work on every chip — the
    # XLA einsum form (which GSPMD shards exactly) is faster there.
    attn_kernel: bool = True
    # Per-block rematerialization (jax.checkpoint via nn.remat): trade HBM
    # activation traffic for recompute — the training step is bandwidth-
    # bound (GEMM chain ~20 ms of a ~102 ms QAT step), so recomputing cheap
    # elementwise intermediates in the backward can win wall-clock.
    # "none" (default) stores all residuals; "dots" saves matmul outputs and
    # recomputes elementwise chains (LN/GELU/fake-quant masks); "full"
    # recomputes the whole block from its input. Measured in
    # scripts/train_step_bench.py (docs/BENCHMARKS.md round 4).
    remat: str = "none"
    # Fuse the qkv output activation fake-quant INTO the Pallas attention
    # training kernel (ops/flash_attention_train.attention_train_fq): the
    # observer still updates in XLA, but the quantize-dequantize runs on
    # VMEM tiles inside the kernel and the backward applies the STE mask
    # in-kernel — removing the standalone fq pass, its saved mask, and the
    # post-kernel mask pass over the step's largest activation tensor.
    # Only active on the training trace (observe=True) when the slab kernel
    # qualifies; eval keeps the unfused path (identical numerics, and the
    # identity-until-observed select needs the XLA form). Measured in
    # scripts/train_step_bench.py (docs/BENCHMARKS.md round 4).
    fq_in_kernel: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + cls token

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        # round, not truncate: non-integer ratios from pruned geometries
        # (e.g. OWLv2 student 3072/576) must survive the float round-trip
        return int(round(self.embed_dim * self.mlp_ratio))


def apply_act(x: jnp.ndarray, act: str, fast: bool = False) -> jnp.ndarray:
    """MLP activation by name; float under QAT (torch leaves both unquantized).

    ``fast=True`` uses the tanh approximation in the compute dtype (the
    fast_math mode; error ~1e-3 of the activation range — far below both the
    int8 quantization grid and bf16 training noise)."""
    if act == "gelu":
        return nn.gelu(x, approximate=fast)
    if act == "quick_gelu":  # CLIP/OWLv2: x * sigmoid(1.702 x)
        return x * nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {act!r}")


VIT_TINY = dict(embed_dim=192, depth=12, num_heads=3)
VIT_SMALL = dict(embed_dim=384, depth=12, num_heads=6)
VIT_BASE = dict(embed_dim=768, depth=12, num_heads=12)
# Micro config for fast tests / dryruns.
VIT_MICRO = dict(embed_dim=128, depth=2, num_heads=2, image_size=32, patch_size=8)


def _trunc_normal(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class QuantDense(nn.Module):
    """Dense layer with optional weight fake-quant + output activation fake-quant.

    Mirrors torch ``torch.ao.nn.qat.Linear`` + its attached
    ``activation_post_process`` (the module pair ``prepare_qat`` creates for
    every nn.Linear, reference qat_trainer.py:307): the *weight* is
    fake-quantized (int8 symmetric), the matmul runs in float, and the
    *output* is fake-quantized (uint8 affine). ``quantize_output=False``
    supports sites where torch attaches no output observer.
    """

    features: int
    quant: Optional[QConfig]
    quantize_output: bool = True
    # Defer the output fake-quant to the caller: the observer updates and the
    # qparams derive exactly as usual, but the return value is
    # ``(y_raw, scale, zero_point)`` for a fused kernel to apply the fq on
    # VMEM tiles (Attention's fq_in_kernel path).
    defer_output_fq: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_axes: Tuple[str, str] = (EMBED, HIDDEN)
    kernel_init: Any = _trunc_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(self.kernel_init, self.kernel_axes),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros_init(), (self.kernel_axes[1],)
                ),
                (self.features,),
                jnp.float32,
            )
            if self.use_bias
            else None
        )
        if self.quant is not None:
            # Fake-quant math is always f32 (torch parity); the matmul runs in
            # the configured dtype — f32 by default (the reference disables
            # AMP under QAT), bf16 when the trainer's opt-in `qat_amp` is set.
            kernel = FakeQuantizer(self.quant.weight, name="weight_fq")(
                kernel, observe=observe
            )
            y = jnp.dot(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=self.dtype,
            )
            if bias is not None:
                y = y + bias.astype(self.dtype)
            if self.quantize_output:
                fq = FakeQuantizer(self.quant.activation, name="act_fq")
                if self.defer_output_fq:
                    return fq(y, observe=observe, apply_fq=False)
                y = fq(y, observe=observe)
            return y
        y = jnp.dot(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QuantLayerNorm(nn.Module):
    """LayerNorm (float params/compute) with optional output fake-quant.

    torch ``prepare_qat`` leaves LayerNorm weights float but attaches an
    activation observer to its output (survey-verified: 16 activation sites on
    a 2-block ViT include every LN output).
    """

    quant: Optional[QConfig]
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="ln",
        )(x)
        if self.quant is not None:
            y = FakeQuantizer(self.quant.activation, name="act_fq")(
                y, observe=observe
            )
        return y


class PatchEmbed(nn.Module):
    """16x16/s16 convolution as patch-extraction + one GEMM.

    Equivalent to timm's Conv2d patch embed (the only conv in the model,
    quantized by the reference via ``torch.ao.nn.qat.Conv2d``); expressed as a
    GEMM so the QAT/int8 path reuses the quantized-matmul kernel and the MXU
    sees one large [B*196, 768]x[768, D] contraction.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        B, H, W, C = x.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p
        # [B, gh, p, gw, p, C] -> [B, gh*gw, p*p*C]; row layout (ph, pw, c)
        # matches the torch converter in models/torch_convert.py.
        patches = x.reshape(B, gh, p, gw, p, C)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, gh * gw, p * p * C)
        return QuantDense(
            features=cfg.embed_dim,
            quant=cfg.quant,
            dtype=cfg.dtype,
            use_bias=cfg.patch_bias,
            kernel_axes=("patch", EMBED),
            name="proj",
        )(patches, observe=observe)


class Attention(nn.Module):
    """timm-geometry multi-head attention with quantizable qkv/proj GEMMs.

    The attention core (scores, softmax, weighted sum) runs in float on
    fake-quantized tensors, exactly like the reference under torch.ao eager
    QAT (survey: "LayerNorm/GELU/softmax/attention matmuls run in fp32").
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        B, N, D = x.shape
        h, hd = cfg.num_heads, cfg.head_dim

        from qat_vit_tpu.ops.flash_attention_train import (
            attention_train,
            attention_train_available,
            attention_train_fq,
            forced_interpret,
        )
        from qat_vit_tpu.ops.long_attention import (
            long_attention_train,
            long_attention_train_available,
        )

        slab_kernel_ok = (
            cfg.fast_math
            and cfg.attn_kernel
            and attention_train_available(h, hd, seq_len=N)
        )
        # fq_in_kernel: fold the qkv output fake-quant into the Pallas
        # attention kernel. Training trace only (observe=True; eval keeps
        # the unfused form — same numerics, plus the identity-until-observed
        # select). At init the observer stats are still ±inf, so the scale
        # would be garbage — route through the unfused path there (the
        # variable tree is identical either way).
        fuse_fq = (
            cfg.quant is not None
            and cfg.fq_in_kernel
            and observe
            and slab_kernel_ok
            and not self.is_initializing()
        )
        qkv_packed = QuantDense(
            features=3 * D,
            quant=cfg.quant,
            dtype=cfg.dtype,
            defer_output_fq=fuse_fq,
            kernel_axes=(EMBED, HIDDEN),
            name="qkv",
        )(x, observe=observe)

        if fuse_fq:
            qkv_raw, fq_scale, fq_zp = qkv_packed
            qs = jnp.stack(
                [fq_scale.astype(jnp.float32).reshape(()),
                 fq_zp.astype(jnp.float32).reshape(())]
            ).reshape(1, 2)
            out = attention_train_fq(
                qkv_raw, qs, h, hd,
                cfg.quant.activation.quant_min,
                cfg.quant.activation.quant_max,
                interpret=forced_interpret(),
            )
            out = jax.ad_checkpoint.checkpoint_name(out, "attn_kernel_out")
        elif slab_kernel_ok:
            # fused Pallas fwd + custom-VJP bwd: the [B,H,N,N] probability
            # tensor never exists in HBM in either direction (the dominant
            # activation traffic of the train step — train_step_bench.py)
            out = attention_train(qkv_packed, h, hd,
                                  interpret=forced_interpret())
            # saveable under remat="dots": recomputing the attention kernel
            # in the backward would double its cost for no traffic saving
            out = jax.ad_checkpoint.checkpoint_name(out, "attn_kernel_out")
        elif (
            cfg.fast_math
            and cfg.attn_kernel
            and long_attention_train_available(h, hd, seq_len=N)
        ):
            # geometries past the slab kernel's gates (long sequences,
            # non-lane-aligned widths — OWLv2 hits both): the q-tiled
            # long-sequence pair; XLA would store [B,H,N,N] probabilities
            # for the backward (~850 MB at OWLv2-pruned batch 8)
            out = long_attention_train(qkv_packed, h, hd,
                                       interpret=forced_interpret())
            out = jax.ad_checkpoint.checkpoint_name(out, "attn_kernel_out")
        else:
            qkv = qkv_packed.reshape(B, N, 3, h, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, hd]
            scale = hd**-0.5
            # transpose-free einsum forms: XLA folds the head-major layout
            # into the batched matmuls instead of materializing [B, h, N, hd]
            # copies (profiled on v5e: physical transposes were a top-3
            # cost). Scores stay in compute dtype — writing them f32 was
            # measured 10% slower end-to-end.
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            # fast_math: softmax in bf16 (max-subtraction keeps it stable;
            # measured 74.8→49.8 ms/step over the 12 layers fwd+bwd)
            sm_dt = q.dtype if cfg.fast_math else jnp.float32
            attn = nn.softmax(attn.astype(sm_dt), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            out = out.reshape(B, N, D)
        return QuantDense(
            features=D,
            quant=cfg.quant,
            dtype=cfg.dtype,
            kernel_axes=(HIDDEN, EMBED),
            name="proj",
        )(out, observe=observe)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        y = QuantDense(
            features=cfg.mlp_dim,
            quant=cfg.quant,
            dtype=cfg.dtype,
            kernel_axes=(EMBED, HIDDEN),
            name="fc1",
        )(x, observe=observe)
        # Activation stays float under QAT (torch leaves it unquantized).
        y = apply_act(y, cfg.act, fast=cfg.fast_math)
        return QuantDense(
            features=cfg.embed_dim,
            quant=cfg.quant,
            dtype=cfg.dtype,
            kernel_axes=(HIDDEN, EMBED),
            name="fc2",
        )(y, observe=observe)


class Block(nn.Module):
    """Pre-norm transformer block: x + Attn(LN(x)); x + MLP(LN(x)).

    ``observe`` is positional-or-keyword so the block composes with
    ``nn.remat`` (static_argnums cannot name keyword-only arguments)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, observe: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        y = QuantLayerNorm(
            quant=cfg.quant, eps=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1"
        )(x, observe=observe)
        x = x + Attention(cfg, name="attn")(y, observe=observe)
        y = QuantLayerNorm(
            quant=cfg.quant, eps=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2"
        )(x, observe=observe)
        x = x + Mlp(cfg, name="mlp")(y, observe=observe)
        return x


class VisionTransformer(nn.Module):
    """The flagship model: quantizable ViT for classification.

    Input: NHWC float images (preprocessed: resized to ``image_size``,
    ImageNet-normalized). Output: [B, num_classes] logits (fp32).
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, observe: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.quant is not None and cfg.qat_wrapper:
            # QuantStub: the input fake-quant site of the reference QATWrapper.
            x = FakeQuantizer(cfg.quant.activation, name="input_fq")(
                x, observe=observe
            )
        x = PatchEmbed(cfg, name="patch_embed")(x, observe=observe)
        B = x.shape[0]
        cls = self.param(
            "cls_token",
            nn.with_logical_partitioning(_trunc_normal(1e-6), (None, None, EMBED)),
            (1, 1, cfg.embed_dim),
            jnp.float32,
        )
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(_trunc_normal(), (None, "seq", EMBED)),
            (1, cfg.seq_len, cfg.embed_dim),
            jnp.float32,
        )
        dtype = cfg.dtype
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, cfg.embed_dim)), x], axis=1
        )
        x = x + pos.astype(x.dtype)
        x = x.astype(dtype)
        if cfg.pre_norm:
            # CLIP-style pre-encoder LayerNorm (OWLv2 vision tower)
            x = QuantLayerNorm(
                quant=cfg.quant, eps=cfg.layer_norm_eps, dtype=cfg.dtype,
                name="norm_pre",
            )(x, observe=observe)
        if cfg.remat == "none":
            for i in range(cfg.depth):
                x = Block(cfg, name=f"blocks_{i}")(x, observe=observe)
        else:
            # rematerialized blocks: the backward recomputes intermediates
            # instead of reading stored residuals from HBM (the QAT step is
            # bandwidth-bound, ~20 ms of MXU work in a ~102 ms step).
            # "dots": matmul outputs AND the Pallas attention kernel's
            # output (named below) stay saved — only the cheap elementwise
            # chains (LN, GELU, fake-quant masks) recompute. "full":
            # everything but the block input recomputes.
            if cfg.remat == "dots":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_kernel_out"
                    ),
                )
            elif cfg.remat == "full":
                policy = None  # nothing saveable
            else:
                raise ValueError(f"unknown remat mode {cfg.remat!r}")
            BlockR = nn.remat(Block, policy=policy, static_argnums=(2,))
            for i in range(cfg.depth):
                x = BlockR(cfg, name=f"blocks_{i}")(x, observe)
        x = QuantLayerNorm(
            quant=cfg.quant, eps=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm"
        )(x, observe=observe)
        if cfg.num_classes == 0:
            # feature-extractor mode (timm num_classes=0): the full normed
            # token sequence, for detection heads (models/owlv2_detect.py)
            return x.astype(jnp.float32)
        x = x[:, 0]  # cls-token pooling (timm global_pool='token')
        logits = QuantDense(
            features=cfg.num_classes,
            quant=cfg.quant,
            dtype=cfg.dtype,
            kernel_axes=(EMBED, "classes"),
            name="head",
        )(x, observe=observe)
        # DeQuantStub is the identity on fake-quant tensors; logits exit fp32.
        return logits.astype(jnp.float32)


def count_fake_quant_sites(cfg: ViTConfig) -> dict:
    """Expected observer sites — cross-checked against torch prepare_qat.

    On a 2-block ViT torch creates 10 weight + 16 activation fake-quants
    (survey-verified); the formula below reproduces that.
    """
    head = 1 if cfg.num_classes else 0  # num_classes=0: feature extractor
    weights = 1 + 4 * cfg.depth + head  # patch conv + (qkv,proj,fc1,fc2)/block + head
    acts = 1 + 4 * cfg.depth + head  # conv out + dense outs + head out
    acts += 2 * cfg.depth + 1  # ln1/ln2 per block + final norm
    if cfg.pre_norm:
        acts += 1  # CLIP-style pre-encoder LN output
    if cfg.qat_wrapper:
        acts += 1  # input QuantStub
    return {"weight": weights, "activation": acts}


def param_count(params) -> int:
    import jax

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
