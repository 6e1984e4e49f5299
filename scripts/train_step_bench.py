"""Train-step ablation bench: where do the QAT step's milliseconds go?

Round-2 observation: the bf16 QAT step (the default) runs ~145 ms at batch
256 while its matmul-only roofline is ~18 ms — the step is dominated by
non-GEMM work. This bench isolates the components with the scan-inside-jit
methodology (bench.py docstring):

    float_fwd          bf16 student forward + loss only
    float_step         + backward + clip + AdamW        (the AMP phase)
    float_step_prex    float_step with preprocessing hoisted out
    qat_fwd            fake-quant forward + loss (observers frozen)
    qat_fwd_observe    fake-quant forward with observer EMA updates
    qat_step           the full default step (observe + bwd + AdamW)
    qat_step_f32       same in f32 (strict reference parity mode)

Run: python scripts/train_step_bench.py [variant...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qat_vit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

BATCH = int(os.environ.get("QVT_BATCH", "256"))
STEPS = 20
REPEATS = 3


def _timeit(fn) -> float:
    float(fn())
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    only = set(sys.argv[1:])
    from qat_vit_tpu.data.pipeline import preprocess_fn
    from qat_vit_tpu.models import ModelBundle, create_student
    from qat_vit_tpu.models.vit import VisionTransformer
    from qat_vit_tpu.train.losses import kd_loss
    from qat_vit_tpu.train.steps import (
        TrainState,
        init_quant_stats,
        make_optimizer,
    )
    import dataclasses

    @jax.jit
    def trivial(x):
        return x + 1.0

    # best-of-3 like every other bench: one jittery tunnel round-trip would
    # bias every variant's reported ms/step by the same error
    from qat_vit_tpu.utils.benchmarking import time_scalar
    oh = time_scalar(lambda: trivial(jnp.zeros(())))
    print(f"backend={jax.default_backend()} batch={BATCH} steps={STEPS} "
          f"dispatch_overhead={oh * 1e3:.1f}ms")

    def build(dtype, quant=True, fast=None, attn_kernel=True, remat="none",
              fq_in_kernel=False, obs_stride=1):
        # QVT_MODEL selects the geometry (default ViT-S student; e.g.
        # QVT_MODEL=vit_base_patch16_224_teacher measures the QAT step on
        # ViT-B — the training kernels are geometry-generic)
        model_name = os.environ.get("QVT_MODEL", "")
        if model_name:
            from qat_vit_tpu.models import create_model

            student = create_model(model_name, qat_wrapper=True)
        else:
            student = create_student("vit")
        fast = (dtype == jnp.bfloat16) if fast is None else fast
        cfg = dataclasses.replace(student.cfg, dtype=dtype, fast_math=fast,
                                  attn_kernel=attn_kernel, remat=remat,
                                  fq_in_kernel=fq_in_kernel)
        if not quant:  # the float-phase module (no fake-quant sites)
            cfg = dataclasses.replace(cfg, quant=None, qat_wrapper=False)
        if obs_stride > 1 and cfg.quant is not None:
            # opt-in batch-subsample observation (hparam observer_stride)
            cfg = dataclasses.replace(cfg, quant=dataclasses.replace(
                cfg.quant, activation=dataclasses.replace(
                    cfg.quant.activation, observe_stride=obs_stride)))
        return ModelBundle(student.name, VisionTransformer(cfg), cfg)

    # image size follows the selected model's geometry (768 for OWLv2)
    _env_model = os.environ.get("QVT_MODEL", "")
    if _env_model:
        from qat_vit_tpu.models import create_model as _create_model

        _img_size = _create_model(_env_model, qat_wrapper=True).cfg.image_size
    else:
        _img_size = create_student("vit").cfg.image_size
    prep = preprocess_fn(_img_size)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 10, BATCH).astype(np.int32))
    t_logits = jnp.asarray(
        rng.normal(size=(BATCH, 10)).astype(np.float32))  # cached-teacher

    def bench(name, make_scan):
        if only and name not in only:
            return
        run = make_scan()
        dt = _timeit(run) - oh
        ms = dt / STEPS * 1e3
        print(f"{name:18s} {ms:8.1f} ms/step  {BATCH * STEPS / dt:8.0f} img/s")

    def fwd_only(bundle, qat, observe, pre_extracted=False):
        qs0 = init_quant_stats(bundle.module, bundle.cfg) if qat else None
        params = nn.meta.unbox(
            bundle.module.init(jax.random.key(1), bundle.example_input(1),
                               observe=False))["params"]
        if qat:  # calibrate observers so fake-quant takes the active path
            _, mut = bundle.module.apply(
                {"params": params, "quant_stats": qs0}, prep(images),
                observe=True, mutable=["quant_stats"])
            qs0 = mut["quant_stats"]

        carry_x = prep(images) if pre_extracted else None

        # params/stats as ARGUMENTS, not closures: closed-over pytrees are
        # serialized into the remote-compile request, and ViT-B's 86M params
        # blow the tunnel's request-size cap (HTTP 413; CLAUDE.md)
        @jax.jit
        def run(params, qs0, carry_x):
            def one(carry, i):
                x = carry_x if pre_extracted else prep(images)
                variables = {"params": params}
                if qat:
                    variables["quant_stats"] = qs0
                if qat and observe:
                    logits, _ = bundle.module.apply(
                        variables, x, observe=True, mutable=["quant_stats"])
                else:
                    logits = bundle.module.apply(variables, x, observe=False)
                loss, _ = kd_loss(logits, t_logits, labels, alpha=0.5,
                                  temperature=4.0, label_smoothing=0.1)
                return carry + loss, None

            out, _ = jax.lax.scan(one, jnp.zeros(()), jnp.arange(STEPS))
            return out

        return lambda: run(params, qs0, carry_x)

    def full_step(bundle, qat, pre_extracted=False, observe=True):
        tx = make_optimizer(1.5e-4, 1e-3)
        params = nn.meta.unbox(
            bundle.module.init(jax.random.key(1), bundle.example_input(1),
                               observe=False))["params"]
        state = TrainState(
            params=params, opt_state=tx.init(params),
            quant_stats=init_quant_stats(bundle.module, bundle.cfg)
            if qat else None,
            step=jnp.zeros((), jnp.int32),
        )
        carry_x = prep(images) if pre_extracted else None

        # state/carry_x as jit ARGUMENTS (closure pytrees go into the
        # remote-compile request; ViT-B blows the cap — see fwd_only)
        @jax.jit
        def run(state, carry_x):
            def one(st, i):
                x = carry_x if pre_extracted else prep(images)

                def loss_fn(params):
                    variables = {"params": params}
                    if qat and observe:
                        variables["quant_stats"] = st.quant_stats
                        logits, mut = bundle.module.apply(
                            variables, x, observe=True,
                            mutable=["quant_stats"])
                        new_qs = mut["quant_stats"]
                    elif qat:
                        # observer-free QAT step: fake-quant from frozen
                        # stats — the shape of an observer_interval skip step
                        variables["quant_stats"] = st.quant_stats
                        logits = bundle.module.apply(variables, x,
                                                     observe=False)
                        new_qs = st.quant_stats
                    else:
                        logits = bundle.module.apply(variables, x,
                                                     observe=False)
                        new_qs = st.quant_stats
                    loss, _ = kd_loss(logits, t_logits, labels, alpha=0.5,
                                      temperature=4.0, label_smoothing=0.1)
                    return loss, new_qs

                grads, new_qs = jax.grad(loss_fn, has_aux=True)(st.params)
                updates, new_opt = tx.update(grads, st.opt_state, st.params)
                return TrainState(optax.apply_updates(st.params, updates),
                                  new_opt, new_qs, st.step + 1), None

            final, _ = jax.lax.scan(one, state, jnp.arange(STEPS))
            return jax.tree.leaves(final.params)[0].sum()

        return lambda: run(state, carry_x)

    def mm_proxy():
        """Matmul-only proxy of the ViT-S forward: the XLA-achievable floor
        for the GEMM work at these shapes (no LN/GELU/softmax/attention)."""
        rngk = jax.random.key(0)
        x0 = jax.random.normal(rngk, (BATCH * 197, 384), jnp.bfloat16)
        ws = []
        for i in range(12):
            k = jax.random.fold_in(rngk, i)
            ws.append((
                jax.random.normal(k, (384, 1152), jnp.bfloat16),
                jax.random.normal(k, (384, 384), jnp.bfloat16),
                jax.random.normal(k, (384, 1536), jnp.bfloat16),
                jax.random.normal(k, (1536, 384), jnp.bfloat16),
            ))

        def fwd(x, ws):
            for wqkv, wproj, wfc1, wfc2 in ws:
                q = x @ wqkv
                # relu: x-dependent grads so nothing is loop-invariant
                x = jnp.maximum(q[:, :384], 0) @ wproj + x
                h = jnp.maximum(x @ wfc1, 0)
                x = h @ wfc2 + x
            return (x * x).sum()

        @jax.jit  # weights as ARGUMENTS (closures would bake 42 MB of
        def run(x0, ws):  # constants into the module; see CLAUDE.md 413 note)
            def one(carry, i):
                g = jax.grad(lambda x: fwd(x + carry * 1e-9, ws))(x0)
                return carry + g[0, 0], None

            out, _ = jax.lax.scan(one, jnp.zeros((), jnp.bfloat16),
                                  jnp.arange(STEPS))
            return out.astype(jnp.float32)

        return lambda: run(x0, ws)

    def full_step_remat(bundle, qat):
        """full_step with the whole student fwd rematerialized in bwd."""
        base = full_step  # noqa: F841 - doc pointer
        tx = make_optimizer(1.5e-4, 1e-3)
        params = nn.meta.unbox(
            bundle.module.init(jax.random.key(1), bundle.example_input(1),
                               observe=False))["params"]
        state = TrainState(
            params=params, opt_state=tx.init(params),
            quant_stats=init_quant_stats(bundle.module, bundle.cfg)
            if qat else None,
            step=jnp.zeros((), jnp.int32),
        )

        @jax.jit
        def run(state):
            def one(st, i):
                x = prep(images)

                @jax.checkpoint
                def fwd_loss(params, x):
                    variables = {"params": params}
                    if qat:
                        variables["quant_stats"] = st.quant_stats
                        logits, mut = bundle.module.apply(
                            variables, x, observe=True,
                            mutable=["quant_stats"])
                        new_qs = mut["quant_stats"]
                    else:
                        logits = bundle.module.apply(variables, x,
                                                     observe=False)
                        new_qs = st.quant_stats
                    loss, _ = kd_loss(logits, t_logits, labels, alpha=0.5,
                                      temperature=4.0, label_smoothing=0.1)
                    return loss, new_qs

                grads, new_qs = jax.grad(
                    lambda p: fwd_loss(p, x), has_aux=True)(st.params)
                updates, new_opt = tx.update(grads, st.opt_state, st.params)
                return TrainState(optax.apply_updates(st.params, updates),
                                  new_opt, new_qs, st.step + 1), None

            final, _ = jax.lax.scan(one, state, jnp.arange(STEPS))
            return jax.tree.leaves(final.params)[0].sum()

        return lambda: run(state)

    bf16f = build(jnp.bfloat16, quant=False)
    bf16 = build(jnp.bfloat16)
    bf16_slow = build(jnp.bfloat16, fast=False)
    f32 = build(jnp.float32)
    bench("mm_proxy_step", mm_proxy)
    bench("float_step_remat", lambda: full_step_remat(bf16f, qat=False))
    bench("qat_step_remat", lambda: full_step_remat(bf16, qat=True))
    bench("qat_step_slowmath", lambda: full_step(bf16_slow, qat=True))
    # same numerics-mode config with the Pallas attention pair disabled —
    # isolates the training attention kernel's step-level effect
    bf16_noak = build(jnp.bfloat16, attn_kernel=False)
    bench("qat_step_xla_attn", lambda: full_step(bf16_noak, qat=True))

    def qat_step_inline_fq():
        """TIMING PROBE (wrong grads): fake_quantize without the custom_vjp
        boundary or mask storage (plain STE via stop_gradient). Bounds how
        much of the QAT-over-float delta is the custom-call boundary +
        mask traffic vs the fq math itself."""
        import qat_vit_tpu.quant.fake_quant as fqm

        orig = fqm.fake_quantize

        def inline_fq(x, scale, zero_point, quant_min, quant_max):
            compute = x.astype(jnp.float32)
            q = jnp.round(compute / scale + zero_point)
            out = ((jnp.clip(q, quant_min, quant_max) - zero_point)
                   * scale).astype(x.dtype)
            return x + jax.lax.stop_gradient(out - x)

        runner = full_step(bf16, qat=True)

        def wrapped():  # patch must be live at trace time (first call)
            fqm.fake_quantize = inline_fq
            try:
                return runner()
            finally:
                fqm.fake_quantize = orig

        return wrapped

    bench("qat_step_inline_fq", qat_step_inline_fq)
    bench("float_fwd", lambda: fwd_only(bf16f, qat=False, observe=False))
    bench("float_step", lambda: full_step(bf16f, qat=False))
    bench("float_step_prex", lambda: full_step(bf16f, qat=False,
                                               pre_extracted=True))
    bench("qat_fwd", lambda: fwd_only(bf16, qat=True, observe=False))
    bench("qat_fwd_observe", lambda: fwd_only(bf16, qat=True, observe=True))
    bench("qat_step", lambda: full_step(bf16, qat=True))
    bench("qat_step_noobserve", lambda: full_step(bf16, qat=True,
                                                  observe=False))
    # per-block rematerialization (models/vit.py cfg.remat): trade stored
    # residual traffic for recompute — bit-identical grads/observer stats
    # (tests/test_vit_model.py)
    bench("qat_step_remat_dots",
          lambda: full_step(build(jnp.bfloat16, remat="dots"), qat=True))
    bench("qat_step_remat_full",
          lambda: full_step(build(jnp.bfloat16, remat="full"), qat=True))
    bench("float_step_remat_dots",
          lambda: full_step(build(jnp.bfloat16, quant=False, remat="dots"),
                            qat=False))
    # qkv fake-quant fused into the Pallas attention kernel (models/vit.py
    # cfg.fq_in_kernel): removes the standalone fq pass + STE-mask traffic
    # on the largest activation tensor — bit-identical grads/observer stats
    # (tests/test_attention_fq.py)
    bench("qat_step_fqk",
          lambda: full_step(build(jnp.bfloat16, fq_in_kernel=True), qat=True))
    bench("qat_step_fqk_remat_dots",
          lambda: full_step(build(jnp.bfloat16, fq_in_kernel=True,
                                  remat="dots"), qat=True))

    def full_step_dispatch(bundle, interval):
        """The trainer's observer_interval pattern EXACTLY: two separately
        jitted steps (observe / frozen) selected per step in Python, chained
        donated states. Python-dispatched (not scan-inside-jit) — dispatches
        pipeline on the device queue, so with STEPS x ~80 ms of compute the
        per-dispatch RPC hides; compare against qat_step_dispatch (same
        dispatch pattern, interval=1) rather than the scan variants."""
        tx = make_optimizer(1.5e-4, 1e-3)
        params = nn.meta.unbox(
            bundle.module.init(jax.random.key(1), bundle.example_input(1),
                               observe=False))["params"]
        state0 = TrainState(
            params=params, opt_state=tx.init(params),
            quant_stats=init_quant_stats(bundle.module, bundle.cfg),
            step=jnp.zeros((), jnp.int32),
        )

        def make_one(observe):
            def one(st):
                x = prep(images)

                def loss_fn(params):
                    variables = {"params": params,
                                 "quant_stats": st.quant_stats}
                    if observe:
                        logits, mut = bundle.module.apply(
                            variables, x, observe=True,
                            mutable=["quant_stats"])
                        new_qs = mut["quant_stats"]
                    else:
                        logits = bundle.module.apply(variables, x,
                                                     observe=False)
                        new_qs = st.quant_stats
                    loss, _ = kd_loss(logits, t_logits, labels, alpha=0.5,
                                      temperature=4.0, label_smoothing=0.1)
                    return loss, new_qs

                grads, new_qs = jax.grad(loss_fn, has_aux=True)(st.params)
                updates, new_opt = tx.update(grads, st.opt_state, st.params)
                return TrainState(optax.apply_updates(st.params, updates),
                                  new_opt, new_qs, st.step + 1)

            return jax.jit(one, donate_argnums=(0,))

        step_obs = make_one(True)
        step_frz = make_one(False) if interval > 1 else None
        carry = {"st": state0}

        def run():
            st = carry["st"]
            for i in range(STEPS):
                fn = step_obs if i % interval == 0 else step_frz
                st = fn(st)
            out = jax.tree.leaves(st.params)[0].sum()
            carry["st"] = st
            return out

        return run

    bench("qat_step_dispatch", lambda: full_step_dispatch(bf16, 1))
    bench("qat_step_obs4_dispatch", lambda: full_step_dispatch(bf16, 4))
    # observer_stride A/B (round 5): every-step observation, but activation
    # observers read only the first 1/k of the batch (contiguous prefix)
    bench("qat_step_stride4_dispatch",
          lambda: full_step_dispatch(build(jnp.bfloat16, obs_stride=4), 1))
    bench("qat_step_stride8_dispatch",
          lambda: full_step_dispatch(build(jnp.bfloat16, obs_stride=8), 1))

    def full_step_obs_cond(bundle, interval):
        """observer_interval as ONE executable: lax.cond(step %% k) between
        the observe and frozen step bodies — no executable-boundary layout
        conversions (the two-executable dispatch pattern loses ~19 ms of the
        frozen step's win to them), at the cost of compiling both branches
        into one program."""
        tx = make_optimizer(1.5e-4, 1e-3)
        params = nn.meta.unbox(
            bundle.module.init(jax.random.key(1), bundle.example_input(1),
                               observe=False))["params"]
        state0 = TrainState(
            params=params, opt_state=tx.init(params),
            quant_stats=init_quant_stats(bundle.module, bundle.cfg),
            step=jnp.zeros((), jnp.int32),
        )

        def body(st, observe):
            x = prep(images)

            def loss_fn(params):
                variables = {"params": params, "quant_stats": st.quant_stats}
                if observe:
                    logits, mut = bundle.module.apply(
                        variables, x, observe=True, mutable=["quant_stats"])
                    new_qs = mut["quant_stats"]
                else:
                    logits = bundle.module.apply(variables, x, observe=False)
                    new_qs = st.quant_stats
                loss, _ = kd_loss(logits, t_logits, labels, alpha=0.5,
                                  temperature=4.0, label_smoothing=0.1)
                return loss, new_qs

            grads, new_qs = jax.grad(loss_fn, has_aux=True)(st.params)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, updates),
                              new_opt, new_qs, st.step + 1)

        def one(st, i):
            return jax.lax.cond(
                st.step % interval == 0,
                lambda s: body(s, True),
                lambda s: body(s, False),
                st,
            ), None

        @jax.jit
        def run(state0):
            final, _ = jax.lax.scan(one, state0, jnp.arange(STEPS))
            return jax.tree.leaves(final.params)[0].sum()

        return lambda: run(state0)

    bench("qat_step_obs4_cond", lambda: full_step_obs_cond(bf16, 4))
    bench("qat_step_obs8_dispatch", lambda: full_step_dispatch(bf16, 8))
    bench("qat_step_f32", lambda: full_step(f32, qat=True))


if __name__ == "__main__":
    main()
