"""True-int8 ViT inference: convert + a runnable serving forward.

This is the component the reference *intended* but never achieved: its eager
``convert`` output crashes on a ViT because float tensor ops (cls-token
concat, pos-embed add, residual adds, attention) cannot consume quantized
tensors (survey-verified; reference src/training/qat_trainer.py:376-388 saves
``best_converted.pth`` which is unloadable-for-inference). Working semantics
defined here:

- every GEMM (patch embed, qkv, attn proj, fc1, fc2, head) runs int8 on the
  MXU, its input quantized with *static* qparams from trained observers;
- ops between GEMMs (LayerNorm, GELU, softmax, residual adds) stay float —
  exactly the precision profile QAT trained the network for;
- two GEMM inputs have no direct observer (torch attaches none): the attn
  ``proj`` input reuses the qkv output observer (attention output is a convex
  combination of v rows, so the qkv range bounds it), and the ``fc2`` input
  uses a GELU-transformed image of the fc1 output range (see
  quant/convert.gelu_transform_qparams). Both divergences are deliberate and
  documented — the reference had no running behavior to match.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from qat_vit_tpu.models.vit import ViTConfig
from qat_vit_tpu.ops.quantized_matmul import (
    int8_matmul_xla,
    quantize_act_shifted,
    quantized_dense,
)
from qat_vit_tpu.quant.convert import (
    act_output_qparams,
    act_qparams,
    dense_int8,
    ln_params,
)
from qat_vit_tpu.quant.qconfig import default_qat_qconfig


def convert_vit(
    params: Dict[str, Any],
    quant_stats: Dict[str, Any],
    cfg: ViTConfig,
    per_channel_weights: bool = False,
) -> Dict[str, Any]:
    """Fold observers into an int8 export pytree (replaces best_converted.pth).

    The returned tree is plain arrays (int8 weights, f32 scales/bias) —
    checkpointable with utils.checkpoint and consumable by :func:`int8_apply`.
    ``per_channel_weights=True`` exports per-output-channel weight scales
    (accuracy upgrade over the reference's per-tensor scheme; serving cost
    unchanged — see quant/convert.dense_int8).
    """
    qcfg = cfg.quant or default_qat_qconfig()
    from functools import partial as _partial

    dense_int8_ = _partial(dense_int8, per_channel=per_channel_weights)
    out: Dict[str, Any] = {
        "cls_token": jnp.asarray(params["cls_token"], jnp.float32),
        "pos_embed": jnp.asarray(params["pos_embed"], jnp.float32),
        "patch_embed": dense_int8_(
            params["patch_embed"]["proj"], quant_stats["patch_embed"]["proj"], qcfg
        ),
        "norm": ln_params(params["norm"], quant_stats["norm"], qcfg),
    }
    if cfg.num_classes:
        out["head"] = dense_int8_(params["head"], quant_stats["head"], qcfg)
    # feature-extractor towers (num_classes=0, e.g. the OWLv2 detection
    # backbone) have no head; the final-LN qparams stay — int8_apply returns
    # the dequantized token stream for float detection heads (the int8
    # counterpart of the reference's detection QATWrapper, which quantizes
    # the backbone and dequantizes outputs.logits —
    # ref model_registry.py:99-124, 269-327)
    if cfg.qat_wrapper and "input_fq" in quant_stats:
        fq = quant_stats["input_fq"]
        out["input_q"] = act_qparams(fq["min_val"], fq["max_val"], qcfg)
    else:
        raise ValueError(
            "int8 conversion requires the input QuantStub observer "
            "(train with qat_wrapper=True, as the reference does)"
        )
    if cfg.pre_norm:  # CLIP-style pre-encoder LN (OWLv2 vision tower)
        out["norm_pre"] = ln_params(
            params["norm_pre"], quant_stats["norm_pre"], qcfg
        )
    # blocks keyed by str(i): survives msgpack serialization unchanged
    # (flax msgpack round-trips lists as string-keyed dicts).
    blocks = {}
    for i in range(cfg.depth):
        p, s = params[f"blocks_{i}"], quant_stats[f"blocks_{i}"]
        fc1 = dense_int8_(p["mlp"]["fc1"], s["mlp"]["fc1"], qcfg)
        blocks[str(i)] = (
            {
                "norm1": ln_params(p["norm1"], s["norm1"], qcfg),
                "qkv": dense_int8_(p["attn"]["qkv"], s["attn"]["qkv"], qcfg),
                "proj": dense_int8_(p["attn"]["proj"], s["attn"]["proj"], qcfg),
                "norm2": ln_params(p["norm2"], s["norm2"], qcfg),
                "fc1": fc1,
                # static qparams for the fc2 input, derived through the MLP
                # activation (exact GELU transform, or grid-bounded for
                # quick-GELU — see quant/convert.act_output_qparams)
                "gelu_q": act_output_qparams(
                    s["mlp"]["fc1"]["act_fq"]["min_val"],
                    s["mlp"]["fc1"]["act_fq"]["max_val"],
                    qcfg,
                    act=cfg.act,
                ),
                "fc2": dense_int8_(p["mlp"]["fc2"], s["mlp"]["fc2"], qcfg),
            }
        )
    out["blocks"] = blocks
    return out


def _layernorm(
    x: jnp.ndarray, ln: Dict[str, Any], eps: float, out_dtype=jnp.float32
) -> jnp.ndarray:
    """LayerNorm with f32 statistics; output in ``out_dtype``.

    The serving path is HBM-bound between GEMMs, so activations travel in
    bf16 by default (``compute_dtype``) — statistics stay f32 for accuracy,
    and the very next op is an int8 quantize whose grid (~scale/255) is far
    coarser than bf16 resolution, so bf16 storage costs no int8 accuracy.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * ln["scale"] + ln["bias"]).astype(out_dtype)


def _ln_quantize_xla(y: jnp.ndarray, ln: Dict[str, Any], out_q: Dict[str, Any],
                     eps: float) -> jnp.ndarray:
    """Float stream -> LN (f32 stats) -> int8, one XLA elementwise fusion.

    The single definition of the LN->quantize seam shared by the fused and
    megablock entry paths (the quantize grid is ~scale/255, far coarser than
    the bf16 stream, so storage dtype costs no int8 accuracy)."""
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    z = (y32 - mean) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]
    return quantize_act_shifted(
        z, out_q["scale"], out_q["zero_point"], out_q.get("quant_max", 255.0)
    )


def _dequantize_act(zq: jnp.ndarray, out_q: Dict[str, Any]) -> jnp.ndarray:
    """Shifted-int8 → f32 on the activation grid: (q_u8 − zp)·s, q_u8 = zq+128."""
    return (
        zq.astype(jnp.float32) + (128.0 - out_q["zero_point"])
    ) * out_q["scale"]


def _head_or_tokens(
    qp: Dict[str, Any], zq: jnp.ndarray, cfg: ViTConfig, n_valid: int
) -> jnp.ndarray:
    """Shared serving epilogue over the final-LN int8 stream ``zq``.

    Classification: head GEMM on the cls token (N=num_classes is
    lane-unaligned → XLA path). Feature mode (num_classes=0, detection
    towers): the dequantized [B, N, D] token stream — float heads
    (models/owlv2_detect.py) run on top, the int8 counterpart of the
    reference's detection QATWrapper (quantized backbone, float outputs;
    ref model_registry.py:99-124)."""
    if zq.shape[1] != n_valid:
        zq = zq[:, :n_valid]  # drop kernel padding rows
    if cfg.num_classes == 0:
        return _dequantize_act(zq, qp["norm"]["out_q"])
    hq = qp["norm"]["out_q"]
    logits = int8_matmul_xla(
        zq[:, 0],
        qp["head"]["w_int8"],
        x_scale=hq["scale"],
        x_zero_point=hq["zero_point"],
        w_scale=qp["head"]["w_scale"],
        w_colsum=qp["head"]["w_colsum"],
        bias=qp["head"].get("bias"),
        out_dtype=jnp.float32,
    )
    return logits.astype(jnp.float32)


def _extract_patches(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def int8_apply(
    qp: Dict[str, Any],
    images: jnp.ndarray,  # [B, H, W, 3] preprocessed (normalized f32)
    cfg: ViTConfig,
    *,
    attn_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    attn_impl: str = "xla",
    gelu_approx: bool = False,
    fused: str = "none",  # "none" | "mixed" | "pallas"
) -> jnp.ndarray:
    """Int8 serving forward → [B, num_classes] f32 logits. Jittable.

    ``compute_dtype`` is the storage dtype of the float residual stream
    between GEMMs (bf16 recommended for serving: the path is HBM-bound and
    the int8 quantization grid is far coarser than bf16 resolution; LN stats
    and softmax stay f32 internally).

    ``attn_impl``: "xla" (einsum attention, scores materialize in HBM) or
    "pallas" (fused kernel — scores/softmax stay in VMEM, the dominant HBM
    traffic of the block disappears; see ops/flash_attention.py).
    """
    h_heads, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    cdt = compute_dtype
    qd = partial(quantized_dense, use_pallas=use_pallas, out_dtype=cdt)

    patches = _extract_patches(images.astype(jnp.float32), cfg.patch_size)
    x = qd(patches, qp["patch_embed"], qp["input_q"])
    B = x.shape[0]
    cls = jnp.broadcast_to(qp["cls_token"].astype(cdt), (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + qp["pos_embed"].astype(cdt)
    if cfg.pre_norm:
        x = _layernorm(x, qp["norm_pre"], eps, cdt)

    if fused and fused != "none":
        return _fused_blocks(qp, x, cfg, attn_dtype=attn_dtype,
                             compute_dtype=cdt, attn_impl=attn_impl,
                             mode="pallas" if fused is True else fused)

    from qat_vit_tpu.ops.flash_attention import (
        flash_attention_qkv,
        fused_attention_qkv,
        xla_attention_qkv,
    )

    def attention(qkv):
        if attn_impl == "pallas_fused":
            return fused_attention_qkv(
                qkv.astype(attn_dtype), h_heads, hd
            ).astype(cdt)
        if attn_impl == "pallas_long":
            from qat_vit_tpu.ops.long_attention import long_attention_qkv

            return long_attention_qkv(
                qkv.astype(attn_dtype), h_heads, hd
            ).astype(cdt)
        if attn_impl == "pallas":
            return flash_attention_qkv(
                qkv.astype(attn_dtype), h_heads, hd
            ).astype(cdt)
        # transpose-free attention over the packed qkv layout (profiled: the
        # transposed form spends ~65% of the forward in softmax converts +
        # physical transpose copies; this form removes the copies and keeps
        # softmax in attn_dtype)
        return xla_attention_qkv(
            qkv.astype(attn_dtype), h_heads, hd, softmax_dtype=attn_dtype
        ).astype(cdt)

    for i in range(cfg.depth):
        blk = qp["blocks"][str(i)]
        y = _layernorm(x, blk["norm1"], eps, cdt)
        qkv = qd(y, blk["qkv"], blk["norm1"]["out_q"])
        o = attention(qkv)
        # proj input bounded by the qkv output range (convex combination of v)
        x = x + qd(o, blk["proj"], blk["qkv"]["out_q"])
        y = _layernorm(x, blk["norm2"], eps, cdt)
        f = qd(y, blk["fc1"], blk["norm2"]["out_q"])
        if cfg.act == "quick_gelu":
            f32 = f.astype(jnp.float32)
            f = (f32 * jax.nn.sigmoid(1.702 * f32)).astype(cdt)
        elif gelu_approx:
            # tanh-approx GELU in the compute dtype: its error (~1e-3 of the
            # activation range) is far below the int8 grid step of the very
            # next quantize (~1/255 of the range), and the exact erf in f32
            # was the single most expensive seam of the forward (serve_bench:
            # 13.8 ms of a 39 ms batch-256 forward).
            f = jax.nn.gelu(f, approximate=True)
        else:
            f = jax.nn.gelu(f.astype(jnp.float32), approximate=False).astype(cdt)
        x = x + qd(f, blk["fc2"], blk["gelu_q"])

    if cfg.num_classes != 0:
        # only the cls row feeds the head: LN is per-token, so slicing first
        # skips the final-LN+quantize pass over the other N-1 tokens
        x = x[:, :1]
    zq = _ln_quantize_xla(x, qp["norm"], qp["norm"]["out_q"], eps)
    return _head_or_tokens(qp, zq, cfg, x.shape[1])


def _fused_blocks(
    qp: Dict[str, Any],
    x: jnp.ndarray,  # [B, N, D] float residual stream after patch embed
    cfg: ViTConfig,
    *,
    attn_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    mode: str = "mixed",
) -> jnp.ndarray:
    """Fused-kernel transformer stack: activations cross op boundaries as int8.

    ``mode="pallas"``: every GEMM+epilogue is a Pallas kernel
    (ops/fused_serve.py) — each block's proj and fc2 GEMMs carry their
    residual add, the following LayerNorm, AND the next GEMM's input
    quantization in their epilogue: ln_q -> qkv -> attention ->
    proj(+res,+LN2,+q) -> fc1(+gelu,+q) -> fc2(+res,+LN-next,+q). The last
    fc2 fuses the FINAL LayerNorm, whose int8 output feeds the head GEMM.

    ``mode="mixed"`` (measured best, scripts/fused_op_bench.py): Pallas
    kernels only where they beat XLA — the K=384 GEMMs (qkv, proj, fc1+gelu)
    where Mosaic's int8 dot with a small-K panel outruns XLA's — while fc2
    (K=1536, where XLA's epilogue/MXU overlap wins) and the elementwise
    LN/residual/quantize chains stay XLA (which fuses them into single
    passes). GELU is the tanh approx in both modes (error far below the int8
    grid step; serve_bench rationale)."""
    from qat_vit_tpu.ops.flash_attention import (
        flash_attention_qkv,
        fused_attention_qkv,
        xla_attention_qkv,
    )
    from qat_vit_tpu.ops.fused_serve import (
        int8_dense,
        int8_dense_gelu_q,
        int8_dense_resid_ln_q,
        ln_quantize,
    )
    from qat_vit_tpu.ops.quantized_matmul import int8_matmul_xla

    if mode.startswith("megablock_long") or mode.startswith("megamodel_long"):
        # mega{block,model}_long[:TQ[:RC[:flags...]]] — flags: i8 (int8
        # score dots), suN / cuN (stripe / chunk unroll), bbN (images per
        # grid step: cross-image MXU/VPU pipelining); megamodel_long fuses
        # ALL blocks into one Pallas call (depth on the grid)
        parts = mode.split(":")
        tq = int(parts[1]) if len(parts) > 1 and parts[1] else 256
        rc = int(parts[2]) if len(parts) > 2 and parts[2] else 256
        flags = parts[3:]
        su = next((int(f[2:]) for f in flags if f.startswith("su")), 1)
        cu = next((int(f[2:]) for f in flags if f.startswith("cu")), 1)
        bb = next((int(f[2:]) for f in flags if f.startswith("bb")), 1)
        return _megablock_long_stack(
            qp, x, cfg, compute_dtype=compute_dtype, q_tile=tq, row_chunk=rc,
            int8_scores="i8" in flags, stripe_unroll=su, chunk_unroll=cu,
            block_b=bb,
            whole_model=mode.startswith("megamodel_long"),
        )
    if mode.startswith("megamodel") or mode.startswith("megablock"):
        # megamodel: ALL blocks in one Pallas call (ops/block_kernel.py
        # model_forward — depth on the grid, weights streamed/double-
        # buffered, activations resident); megamodel_res: same, but weights
        # pinned whole in VMEM (no per-tile refetch; model must fit);
        # megablock: one call per block
        parts = mode.split(":")
        bb = int(parts[1]) if len(parts) > 1 and parts[1] else 4
        tight = len(parts) > 2 and parts[2] == "tight"
        return _megablock_stack(
            qp, x, cfg, compute_dtype=compute_dtype, block_b=bb,
            pad_multiple=32 if tight else 128,
            whole_model=mode.startswith("megamodel"),
            resident=mode.startswith("megamodel_res"),
        )
    _MODES = ("pallas", "mixed", "mixed_qkv", "mixed_fc1", "mixed_none")
    if mode not in _MODES:
        raise ValueError(
            f"unknown fused mode {mode!r}; expected one of {_MODES}, "
            "'megablock[:BLOCK_B[:tight]]', or 'megablock_long[:TQ[:RC]]'"
        )

    h_heads, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    cdt = compute_dtype
    # the activation grid top (255 qnnpack / 127 fbgemm reduced-range) is
    # static config; every Pallas quantize epilogue takes it as a compile-
    # time constant, so reduced-range exports ride the SAME fast rungs
    qmax = float(cfg.quant.activation.quant_max) if cfg.quant else 255.0
    mixed = mode.startswith("mixed")
    pallas_qkv = mode in ("mixed", "mixed_qkv")
    pallas_fc1 = mode in ("mixed", "mixed_fc1")
    if cfg.act not in ("gelu", "quick_gelu") and (pallas_fc1 or not mixed):
        # the Pallas fc1 epilogue computes tanh-GELU or exact quick-GELU
        # in-kernel; any other activation must stay in XLA.
        raise NotImplementedError(
            f"fused mode {mode!r} computes the activation in-kernel; "
            f"act={cfg.act!r} models need 'mixed_none'/'mixed_qkv' (or the "
            "exact path)"
        )

    def xla_dense(x_q, layer, in_q, out_dtype=cdt):
        return int8_matmul_xla(
            x_q, layer["w_int8"], x_scale=in_q["scale"],
            x_zero_point=in_q["zero_point"], w_scale=layer["w_scale"],
            w_colsum=layer["w_colsum"], bias=layer.get("bias"),
            out_dtype=out_dtype,
        )

    def xla_ln_q(y, ln, out_q):
        return _ln_quantize_xla(y, ln, out_q, eps)

    blk0 = qp["blocks"]["0"]
    if mixed:
        zq = xla_ln_q(x, blk0["norm1"], blk0["norm1"]["out_q"])
    else:
        zq = ln_quantize(x, blk0["norm1"], blk0["norm1"]["out_q"], eps=eps,
                         quant_max=qmax)
    for i in range(cfg.depth):
        blk = qp["blocks"][str(i)]
        if mixed and not pallas_qkv:
            qkv = xla_dense(zq, blk["qkv"], blk["norm1"]["out_q"])
        else:
            qkv = int8_dense(zq, blk["qkv"], blk["norm1"]["out_q"],
                             out_dtype=cdt)
        # proj input bounded by the qkv output range (convex combination of v)
        if attn_impl == "pallas_fused":
            # attention + proj-input quantize in one kernel epilogue
            o_q = fused_attention_qkv(
                qkv.astype(attn_dtype), h_heads, hd,
                out_q=blk["qkv"]["out_q"], quant_max=qmax,
            )
        else:
            if attn_impl == "pallas_long":
                from qat_vit_tpu.ops.long_attention import long_attention_qkv

                o = long_attention_qkv(
                    qkv.astype(attn_dtype), h_heads, hd
                ).astype(cdt)
            elif attn_impl == "pallas":
                o = flash_attention_qkv(
                    qkv.astype(attn_dtype), h_heads, hd
                ).astype(cdt)
            else:
                o = xla_attention_qkv(
                    qkv.astype(attn_dtype), h_heads, hd,
                    softmax_dtype=attn_dtype,
                ).astype(cdt)
            o_q = quantize_act_shifted(
                o, blk["qkv"]["out_q"]["scale"],
                blk["qkv"]["out_q"]["zero_point"],
                blk["qkv"]["out_q"].get("quant_max", 255.0),
            )
        nxt = (
            qp["blocks"][str(i + 1)]["norm1"]
            if i + 1 < cfg.depth
            else qp["norm"]
        )
        if mixed:
            if pallas_qkv:
                p = int8_dense(o_q, blk["proj"], blk["qkv"]["out_q"],
                               out_dtype=cdt)
            else:
                p = xla_dense(o_q, blk["proj"], blk["qkv"]["out_q"])
            x = x + p
            zq2 = xla_ln_q(x, blk["norm2"], blk["norm2"]["out_q"])
            if pallas_fc1:
                g_q = int8_dense_gelu_q(
                    zq2, blk["fc1"], blk["norm2"]["out_q"], blk["gelu_q"],
                    act=cfg.act, quant_max=qmax,
                )
            else:
                f1 = xla_dense(zq2, blk["fc1"], blk["norm2"]["out_q"])
                if cfg.act == "quick_gelu":
                    # the activation the model was trained/converted with
                    # (x*sigmoid(1.702x)); tanh-GELU differs by up to ~0.02
                    # here — on the order of the int8 grid step that follows
                    f32 = f1.astype(jnp.float32)
                    g = (f32 * jax.nn.sigmoid(1.702 * f32)).astype(f1.dtype)
                else:
                    g = jax.nn.gelu(f1, approximate=True)
                g_q = quantize_act_shifted(
                    g, blk["gelu_q"]["scale"], blk["gelu_q"]["zero_point"],
                    blk["gelu_q"].get("quant_max", 255.0),
                )
            f = xla_dense(g_q, blk["fc2"], blk["gelu_q"], out_dtype=cdt)
            x = x + f
            if i + 1 == cfg.depth and cfg.num_classes != 0:
                # classification: only the cls row feeds the head, and LN is
                # per-token — slice before the FINAL LN+quantize so it runs
                # over 1 token, not N (the exact path's [:, :1] slice). Not
                # applicable to mode="pallas"/megablock/megamodel: there the
                # final LN+quantize is fused into the last fc2 kernel's
                # epilogue, which already writes it in the residual pass.
                x = x[:, :1]
            zq = xla_ln_q(x, nxt, nxt["out_q"])
        else:
            x, zq2 = int8_dense_resid_ln_q(
                o_q, blk["proj"], blk["qkv"]["out_q"], x,
                blk["norm2"], blk["norm2"]["out_q"], eps=eps, out_dtype=cdt,
                quant_max=qmax,
            )
            g_q = int8_dense_gelu_q(
                zq2, blk["fc1"], blk["norm2"]["out_q"], blk["gelu_q"],
                act=cfg.act, quant_max=qmax,
            )
            # the fc2 epilogue carries the NEXT LayerNorm (block i+1's
            # norm1, or the final norm on the last block) and its input
            # quantization
            x, zq = int8_dense_resid_ln_q(
                g_q, blk["fc2"], blk["gelu_q"], x,
                nxt, nxt["out_q"], eps=eps, out_dtype=cdt, quant_max=qmax,
            )

    return _head_or_tokens(qp, zq, cfg, x.shape[1])


def _megablock_stack(
    qp: Dict[str, Any],
    x: jnp.ndarray,  # [B, N, D] float residual stream after patch embed
    cfg: ViTConfig,
    *,
    compute_dtype=jnp.bfloat16,
    block_b: int = 4,
    pad_multiple: int = 128,
    interpret: bool = False,
    whole_model: bool = False,
    resident: bool = False,
) -> jnp.ndarray:
    """Whole-block Pallas kernels chained custom-call→custom-call.

    Each of the 12 blocks is ONE kernel (ops/block_kernel.py): qkv GEMM →
    attention → proj(+residual+LN2+quantize) → fc1(+GELU+quantize) →
    fc2(+residual+next-LN+quantize). Between blocks only (x bf16, zq int8)
    cross HBM, and no XLA ops sit between the calls, so there are no layout
    conversions at the boundaries. Sequence padded to the lane multiple once.

    ``whole_model=True`` fuses further: the ENTIRE stack becomes ONE Pallas
    call (block_kernel.model_forward) — per forward the activations cross
    HBM once each way and the per-block weight panels stream depth-indexed
    through the grid pipeline (prefetched during the previous block's
    compute). Bit-identical to the chained form by construction (same tile
    body).
    """
    from qat_vit_tpu.ops.block_kernel import block_forward, model_forward
    from qat_vit_tpu.ops.quantized_matmul import int8_matmul_xla

    if cfg.act != "gelu":
        raise NotImplementedError(
            f"megablock kernel supports act='gelu' only (got {cfg.act!r}); "
            "use fused='mixed_none' for quick-GELU models (OWLv2)"
        )
    eps = cfg.layer_norm_eps
    qmax = float(cfg.quant.activation.quant_max) if cfg.quant else 255.0
    b, n, d = x.shape
    m = pad_multiple
    n_pad = max(m, -(-n // m) * m)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    x = x.astype(compute_dtype)

    blk0 = qp["blocks"]["0"]
    zq = _ln_quantize_xla(x, blk0["norm1"], blk0["norm1"]["out_q"], eps)

    if whole_model:
        x, zq = model_forward(
            zq, x, qp["blocks"], qp["norm"],
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, depth=cfg.depth,
            eps=eps, n_valid=n, block_b=block_b, quant_max=qmax,
            interpret=interpret, resident=resident,
        )
    else:
        for i in range(cfg.depth):
            blk = qp["blocks"][str(i)]
            nxt = (
                qp["blocks"][str(i + 1)]["norm1"]
                if i + 1 < cfg.depth
                else qp["norm"]
            )
            x, zq = block_forward(
                zq, x, blk, nxt,
                num_heads=cfg.num_heads, head_dim=cfg.head_dim, eps=eps,
                n_valid=n, block_b=block_b, quant_max=qmax,
                interpret=interpret,
            )

    return _head_or_tokens(qp, zq, cfg, n)


def _megablock_long_stack(
    qp: Dict[str, Any],
    x: jnp.ndarray,  # [B, N, D] float residual stream after patch embed
    cfg: ViTConfig,
    *,
    compute_dtype=jnp.bfloat16,
    q_tile: int = 256,
    row_chunk: int = 256,
    interpret: bool = False,
    int8_scores: bool = False,
    stripe_unroll: int = 1,
    chunk_unroll: int = 1,
    block_b: int = 1,
    whole_model: bool = False,
) -> jnp.ndarray:
    """Long-sequence whole-block Pallas kernels chained call→call.

    The long-sequence counterpart of :func:`_megablock_stack`
    (ops/long_block_kernel.py): grid over images, q-striped attention, row-
    chunked GEMM phases — for geometries whose scores can't sit whole in VMEM
    (OWLv2's 2305 tokens) or whose width isn't slab-alignable (9 heads x 64).
    In-kernel activation is exact quick-GELU or tanh-GELU.
    ``whole_model=True``: the whole stack in ONE Pallas call
    (long_model_forward) — depth on the grid, weights streamed/prefetched,
    activations resident; bit-identical to the chained form."""
    from qat_vit_tpu.ops.long_block_kernel import (
        long_block_forward,
        long_megablock_pad,
        long_model_forward,
    )
    from qat_vit_tpu.ops.quantized_matmul import int8_matmul_xla

    if cfg.act not in ("gelu", "quick_gelu"):
        raise NotImplementedError(
            f"megablock_long computes the activation in-kernel; act="
            f"{cfg.act!r} models need the exact path"
        )
    eps = cfg.layer_norm_eps
    qmax = float(cfg.quant.activation.quant_max) if cfg.quant else 255.0
    b, n, d = x.shape
    n_pad = long_megablock_pad(n, q_tile, row_chunk)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    x = x.astype(compute_dtype)

    blk0 = qp["blocks"]["0"]
    zq = _ln_quantize_xla(x, blk0["norm1"], blk0["norm1"]["out_q"], eps)

    if whole_model:
        x, zq = long_model_forward(
            zq, x, qp["blocks"], qp["norm"],
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, depth=cfg.depth,
            act=cfg.act, eps=eps, n_valid=n, q_tile=q_tile,
            row_chunk=row_chunk, interpret=interpret,
            int8_scores=int8_scores, stripe_unroll=stripe_unroll,
            chunk_unroll=chunk_unroll, block_b=block_b, quant_max=qmax,
        )
    else:
        for i in range(cfg.depth):
            blk = qp["blocks"][str(i)]
            nxt = (
                qp["blocks"][str(i + 1)]["norm1"]
                if i + 1 < cfg.depth
                else qp["norm"]
            )
            x, zq = long_block_forward(
                zq, x, blk, nxt,
                num_heads=cfg.num_heads, head_dim=cfg.head_dim, act=cfg.act,
                eps=eps, n_valid=n, q_tile=q_tile, row_chunk=row_chunk,
                interpret=interpret, int8_scores=int8_scores,
                stripe_unroll=stripe_unroll, chunk_unroll=chunk_unroll,
                block_b=block_b, quant_max=qmax,
            )

    return _head_or_tokens(qp, zq, cfg, n)


def _preset_kernel_opts(cfg: ViTConfig) -> Dict[str, Any]:
    """Kernel-path selection for :func:`serving_preset`, gated on the Pallas
    kernels' shape preconditions (backend-independent — testable on CPU).

    Falls back one rung at a time: megablock (gelu, lane-aligned width) →
    mixed chain with the fused attention kernel (same head-slab geometry) →
    plain XLA int8 path (the bf16 + tanh-GELU variant, shape-safe for any
    geometry)."""
    from qat_vit_tpu.ops import _tiling as tiling
    from qat_vit_tpu.ops.block_kernel import megablock_shapes_ok

    # every Pallas quantize epilogue takes the activation grid top as a
    # static constant (quant_max threading, round 5), so reduced-range
    # (fbgemm) exports ride the same rungs as qnnpack ones
    d = cfg.num_heads * cfg.head_dim
    # the fused attention kernel tiles heads into 128-lane slabs with the
    # same divisibility requirements as the megablock kernel
    attn_ok = megablock_shapes_ok(cfg.num_heads, cfg.head_dim)
    # the batched softmax stacks block_b*heads [n_pad, n_pad] f32 score
    # tiles in VMEM — long sequences (OWLv2-base: 2305 tokens) don't fit
    # and must stay on the XLA attention forms
    n_tight = -(-cfg.seq_len // 32) * 32  # megablock's 32-sublane padding
    n_lane = -(-cfg.seq_len // 128) * 128  # fused attention pads to 128
    if cfg.act == "gelu" and attn_ok and tiling.batched_softmax_fits(
        cfg.num_heads, n_tight
    ):
        # geometry-aware batch tile: the largest block_b whose stacked
        # score tensor stays ≤ 5 MB — the measured sweet spot on both
        # ViT-S (picks 4: 21.7 ms < bb2 22.4 < bb8 26.3) and ViT-B
        # (picks 2: 5,158 img/s vs bb4 4,607, bb8 4,845); beyond it VMEM
        # pressure defeats Mosaic's pipelining (docs/BENCHMARKS.md).
        # megamodel (round 3): the whole stack in ONE Pallas call, weight
        # panels streamed on the depth grid axis — bit-identical to the
        # chained megablocks and measured ≥ them in every session on both
        # geometries (ViT-S 19.28 vs 19.39 ms, ViT-B 49.45 vs 49.63;
        # docs/BENCHMARKS.md round 3)
        bb = next(
            (b for b in (8, 4, 2)
             if b * cfg.num_heads * n_tight * n_tight * 4 <= 5 * 1024 * 1024),
            1,
        )
        return {"fused": f"megamodel:{bb}:tight"}
    if attn_ok and tiling.batched_softmax_fits(
        cfg.num_heads, n_lane
    ):
        # quick-GELU models keep fc1's activation in XLA (mixed_none computes
        # the exact trained activation there); the Pallas GEMM epilogues bake
        # in tanh-GELU, so they are gelu-only
        return {"fused": "mixed_none", "attn_impl": "pallas_fused"}
    from qat_vit_tpu.ops.long_attention import long_attention_shapes_ok
    from qat_vit_tpu.ops.long_block_kernel import (
        long_megablock_pad,
        long_megablock_shapes_ok,
    )

    if (
        cfg.act in ("gelu", "quick_gelu")
        and long_megablock_shapes_ok(cfg.num_heads, cfg.head_dim)
        and cfg.seq_len >= 1536
    ):
        # genuinely long sequences (OWLv2's 2305 tokens): the whole-model
        # q-striped kernel (ops/long_block_kernel.long_model_forward) —
        # depth on the grid, weights prefetched, scores never in HBM, full
        # stripe unroll so stripe i's softmax (VPU) overlaps stripe i+1's
        # score dot (MXU). Measured 25.6/25.7 ms vs 32.4 for the
        # mixed_none+pallas_long rung at OWLv2-pruned batch 8 (+27%;
        # docs/BENCHMARKS.md round 3). q_tile 512 measured best of
        # {128, 256, 512}; the ≥1536 gate keeps the ≤2×q_tile padding
        # regime for shorter sequences on the rung below. stripe_unroll is
        # capped by a VMEM estimate (long_megablock_vmem_bytes) so larger
        # geometries (owlv2_base at 960 px: n_pad 4096, d 768) don't select
        # a configuration that blows the kernel's vmem_limit_bytes; if even
        # unroll=1 doesn't fit, fall through to the mixed_none rung.
        from qat_vit_tpu.ops.long_block_kernel import (
            long_megablock_pick_unroll,
        )

        n_pad = long_megablock_pad(cfg.seq_len, 512, 256)
        su = long_megablock_pick_unroll(n_pad, d, cfg.mlp_dim, 512)
        if su:
            return {"fused": f"megamodel_long:512:256:su{su}"}
    if long_attention_shapes_ok(cfg.num_heads, cfg.head_dim):
        # geometries past the slab kernels' gates (long sequences whose
        # stacked scores overflow VMEM, non-lane-aligned widths — OWLv2's
        # 2305 tokens x 9 heads hits both): the q-tiled long-sequence kernel
        # keeps scores out of HBM, which the seam ablation measured at ~50%
        # of the XLA forward there (ops/long_attention.py)
        return {"fused": "mixed_none", "attn_impl": "pallas_long"}
    return {}


def serving_preset(cfg: ViTConfig) -> Dict[str, Any]:
    """Measured-best serving options for the current backend.

    On TPU (scripts/serve_bench.py, batch 256 ViT-S): the megamodel path —
    the ENTIRE transformer stack in one Pallas call (ops/block_kernel.py
    model_forward, weights streamed on the depth grid axis) with the
    sequence padded only to the 32-sublane multiple (197→224) — 6,557
    (round 1) → 12,744 (round-2 megablock) → **13,277 img/s**. Long
    sequences (OWLv2's 2305 tokens) get the q-striped whole-model kernel
    (ops/long_block_kernel.py, 32.4 → 25.6 ms at batch 8); short-sequence
    quick-GELU models use the mixed int8-handoff chain + fused Pallas
    attention (the slab epilogues bake tanh-GELU); geometries the Pallas
    kernels' shape gates reject fall back to the plain XLA int8 path in
    bf16. Elsewhere (CPU tests, interpret mode): the exact defaults.
    Accuracy: every option is validated against the exact path (argmax
    agreement on micro models in tests/test_fused_serve.py; full-scale int8
    top-1 cross-check in scripts/accuracy_loop.py).
    """
    if jax.default_backend() != "tpu":
        return {}
    opts: Dict[str, Any] = {
        "attn_dtype": jnp.bfloat16,
        "compute_dtype": jnp.bfloat16,
        "gelu_approx": True,
    }
    opts.update(_preset_kernel_opts(cfg))
    return opts


def make_int8_forward(
    cfg: ViTConfig, *, attn_dtype=jnp.float32, compute_dtype=jnp.float32,
    use_pallas=None, attn_impl: str = "xla", gelu_approx: bool = False,
    fused: bool = False,
):
    """Jitted serving closure: (qparams, normalized images) → logits."""

    @jax.jit
    def fwd(qp, images):
        return int8_apply(
            qp, images, cfg, attn_dtype=attn_dtype,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
            attn_impl=attn_impl, gelu_approx=gelu_approx, fused=fused,
        )

    return fwd
