"""Benchmark: QAT training throughput + int8 inference throughput, one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: fake-quant QAT **training** images/sec on one chip — the
only throughput the reference actually measured (413 img/s under QAT on its
GPU study, derived from mlflow.db metric timestamps; see BASELINE.md). The
int8 serving throughput (the reference's intended-but-broken deployment path)
rides along in the extras.

Measurement methodology (important on a tunneled TPU where per-dispatch
timing is unreliable and ``block_until_ready`` does not round-trip): the step
loop runs INSIDE one compiled program (``lax.scan``/``fori_loop``), the
program returns a scalar, and the wall time of ``float(result)`` — which
forces a real device round-trip — is measured. Dispatch overhead (~25 ms) is
measured separately with a trivial program and subtracted.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference baseline: search-epoch throughput under QAT fake-quant (BASELINE.md).
BASELINE_QAT_TRAIN_IMGS_PER_SEC = 413.0

TRAIN_BATCH = 256
TRAIN_STEPS = 20
INFER_BATCH = 256
INFER_STEPS = 50
REPEATS = 3


def _timeit(fn) -> tuple:
    """(min, median) over REPEATS. min is the standard noise filter on a
    tunneled device; the median rides along so headline configs can report
    both (min can flatter when the tunnel hiccups the other repeats)."""
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def _dispatch_overhead() -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return x + 1.0

    x = jnp.zeros(())
    float(trivial(x))  # compile
    return _timeit(lambda: float(trivial(x)))[0]


def bench_qat_train(cache_teacher: bool = True, qat_dtype=None) -> float:
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from qat_vit_tpu.data.pipeline import preprocess_fn
    from qat_vit_tpu.models import create_student, create_teacher
    from qat_vit_tpu.train.losses import kd_loss
    from qat_vit_tpu.train.steps import TrainState, init_quant_stats, make_optimizer
    import optax

    teacher = create_teacher("vit", dtype=jnp.bfloat16)
    student = create_student("vit")  # QAT-wrapped ViT-S/16
    if qat_dtype is not None:  # opt-in qat_amp measurement
        import dataclasses

        from qat_vit_tpu.models import ModelBundle
        from qat_vit_tpu.models.vit import VisionTransformer

        from qat_vit_tpu.train.config import DEFAULT_HPARAMS

        cfg = dataclasses.replace(
            student.cfg, dtype=qat_dtype,
            fast_math=qat_dtype == jnp.bfloat16,  # trainer's amp_fast_math
            # production default (trainer hparams): qkv fq fused into the
            # Pallas attention kernel (bit-identical; +3.3% measured)
            fq_in_kernel=bool(DEFAULT_HPARAMS["fq_in_kernel"]),
        )
        student = ModelBundle(student.name, VisionTransformer(cfg), cfg)

    t_params = nn.meta.unbox(
        teacher.module.init(jax.random.key(0), teacher.example_input(1),
                            observe=False))["params"]
    t_params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), t_params)
    s_vars = nn.meta.unbox(
        student.module.init(jax.random.key(1), student.example_input(1),
                            observe=False))
    tx = make_optimizer(1.5e-4, 1e-3)
    state = TrainState(
        params=s_vars["params"],
        opt_state=tx.init(s_vars["params"]),
        quant_stats=init_quant_stats(student.module, student.cfg),
        step=jnp.zeros((), jnp.int32),
    )
    prep = preprocess_fn(224)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (TRAIN_BATCH, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 10, TRAIN_BATCH).astype(np.int32))

    cached_logits = None
    if cache_teacher:
        # the frozen teacher's logits are per-image constants (no
        # augmentation): computed once, off the hot loop — the trainer's
        # default (train/config.py cache_teacher_logits)
        cached_logits = jax.jit(
            lambda p, im: teacher.module.apply(
                {"params": p}, prep(im), observe=False).astype(jnp.float32)
        )(t_params, images)

    def one_step(state):
        x = prep(images)
        if cache_teacher:
            t_logits = cached_logits
        else:
            t_logits = jax.lax.stop_gradient(
                teacher.module.apply({"params": t_params}, x, observe=False))

        def loss_fn(params):
            s_logits, mut = student.module.apply(
                {"params": params, "quant_stats": state.quant_stats}, x,
                observe=True, mutable=["quant_stats"])
            loss, _ = kd_loss(s_logits, t_logits, labels, alpha=0.5,
                              temperature=4.0, label_smoothing=0.1)
            return loss, mut["quant_stats"]

        grads, new_qs = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, new_qs, state.step + 1)

    @jax.jit
    def run_n(state):
        final = jax.lax.fori_loop(0, TRAIN_STEPS, lambda i, st: one_step(st), state)
        return final, jax.tree.leaves(final.params)[0].sum()

    new_state, s = run_n(state)
    float(s)  # compile + first run
    state = new_state

    def go():
        nonlocal state
        st, s = run_n(state)
        float(s)
        state = st

    dt, dt_med = _timeit(go)
    oh = _dispatch_overhead()
    return (
        TRAIN_BATCH * TRAIN_STEPS / (dt - oh),
        TRAIN_BATCH * TRAIN_STEPS / (dt_med - oh),
    )


def bench_int8_infer(preset: bool = True) -> float:
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from qat_vit_tpu.data.pipeline import preprocess
    from qat_vit_tpu.models import create_student
    from qat_vit_tpu.serve.int8_vit import (
        convert_vit,
        int8_apply,
        serving_preset,
    )

    student = create_student("vit")
    variables = nn.meta.unbox(
        student.module.init(jax.random.key(0), student.example_input(1),
                            observe=False))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    _, mut = student.module.apply(
        {"params": variables["params"], "quant_stats": variables["quant_stats"]},
        x0, observe=True, mutable=["quant_stats"],
    )
    qp = convert_vit(variables["params"], mut["quant_stats"], student.cfg)
    imgs = rng.integers(0, 256, (INFER_BATCH, 32, 32, 3), dtype=np.uint8)
    x = preprocess(jnp.asarray(imgs), size=224)
    cfg = student.cfg

    opts = {"attn_dtype": jnp.bfloat16, "compute_dtype": jnp.bfloat16}
    if preset:
        opts.update(serving_preset(cfg))

    @jax.jit
    def run_n(qp, x):
        def body(i, acc):
            # i-dependent perturbation so the loop body is not hoistable
            logits = int8_apply(qp, x + jnp.float32(i) * 1e-9, cfg, **opts)
            return acc + logits.sum()
        return jax.lax.fori_loop(0, INFER_STEPS, body, jnp.zeros((), jnp.float32))

    float(run_n(qp, x))  # compile
    dt, dt_med = _timeit(lambda: float(run_n(qp, x)))
    oh = _dispatch_overhead()
    return (
        INFER_BATCH * INFER_STEPS / (dt - oh),
        INFER_BATCH * INFER_STEPS / (dt_med - oh),
    )


DETECT_BATCH = 8
DETECT_ITERS = 20


def bench_int8_detect():
    """Batch-8 OWLv2-pruned FULL int8 detection forward (int8 tower through
    the serving preset's long-sequence whole-model Pallas kernel + float
    box/class/objectness heads) — the detection serving headline
    (VERDICT r4 directive 1a). Returns (ms_per_batch_min, ms_median)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from qat_vit_tpu.models.owlv2_detect import create_detector
    from qat_vit_tpu.serve.int8_detect import convert_detector, int8_detect_apply
    from qat_vit_tpu.serve.int8_vit import serving_preset

    det, cfg = create_detector(pruned=True, qat_wrapper=True)
    rng = np.random.default_rng(0)
    # export built on the HOST CPU: init/observe/convert of the full QAT
    # detector graph is a huge remote-compile surface (it once wedged the
    # tunnel for 30+ min); only the serving program compiles remotely
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.asarray(
            rng.normal(size=(2, cfg.image_size, cfg.image_size, 3))
            .astype(np.float32))
        v = det.init(jax.random.key(0), x0, observe=False)
        _, mut = det.apply(
            {"params": v["params"], "quant_stats": v["quant_stats"]}, x0,
            observe=True, mutable=["quant_stats"],
        )
        export = convert_detector(
            nn.meta.unbox(v["params"]), mut["quant_stats"], cfg)
    export = jax.device_put(jax.device_get(export))
    pixels = jnp.asarray(
        rng.normal(size=(DETECT_BATCH, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(DETECT_BATCH, 4, 512))
                          .astype(np.float32))
    opts = tuple(sorted(serving_preset(cfg).items()))

    @jax.jit
    def run(export, pixels, queries):
        def body(i, acc):
            # i-dependent input so the body is not loop-invariant-hoistable
            out = int8_detect_apply(export, pixels + jnp.float32(i) * 1e-9,
                                    cfg, queries, **dict(opts))
            return (acc + jnp.sum(out["pred_boxes"])
                    + jnp.sum(out["objectness_logits"])
                    + jnp.sum(out["logits"]))

        return jax.lax.fori_loop(0, DETECT_ITERS, body, jnp.zeros(()))

    float(run(export, pixels, queries))  # compile
    dt, dt_med = _timeit(lambda: float(run(export, pixels, queries)))
    oh = _dispatch_overhead()
    return ((dt - oh) / DETECT_ITERS * 1e3, (dt_med - oh) / DETECT_ITERS * 1e3)


def _watchdog_main() -> None:
    """Re-run the bench in a child process, guarding against the tunnel's
    client-turnover wedge (CLAUDE.md): a client that registers seconds after
    the previous one disconnects can block forever on its FIRST device RPC.
    The child proves tunnel liveness with a trivial device op ("device up"
    on stderr); if that line doesn't appear in time the attempt is wedged —
    kill, cool down, retry. Compiles persist (compile cache), so a timed-out
    healthy attempt makes the retry fast."""
    import os
    import subprocess
    import sys

    first_op_timeout = 420.0  # wedge detector: trivial op must finish by now
    attempt_timeout = 2700.0
    for attempt in range(3):
        env = dict(os.environ, QVT_BENCH_CHILD="1")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        import threading

        state = {"device_up": False, "err_tail": []}

        def drain(proc=child, st=state):
            for raw in proc.stderr:
                line = raw.decode(errors="replace")
                st["err_tail"] = (st["err_tail"] + [line])[-20:]
                if "[bench] device up" in line:
                    st["device_up"] = True
                sys.stderr.write(line)

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        deadline = time.monotonic() + first_op_timeout
        wedged = False
        while child.poll() is None and time.monotonic() < deadline:
            if state["device_up"]:
                break
            time.sleep(5)
        if child.poll() is None and not state["device_up"]:
            wedged = True
            print(
                f"[bench] attempt {attempt}: no device RPC in "
                f"{first_op_timeout:.0f}s - tunnel wedge, restarting",
                file=sys.stderr,
            )
            child.kill()
            child.wait()  # reap — a zombie holds the pipe and (briefly)
            # the tunnel session the next attempt needs released
        else:
            # stderr is owned by the drain thread; stdout is one JSON line
            # emitted at the end (fits the pipe buffer), read after exit
            end = time.monotonic() + attempt_timeout
            while child.poll() is None and time.monotonic() < end:
                time.sleep(5)
            if child.poll() is None:
                child.kill()
                child.wait()
            out = child.stdout.read()
            t.join(timeout=10)
            if child.returncode == 0 and out.strip():
                sys.stdout.buffer.write(out)
                return
            print(
                f"[bench] attempt {attempt} rc={child.returncode}",
                file=sys.stderr,
            )
        # ~60s either way: a client that registers within seconds of the
        # previous one's disconnect wedges on its first RPC (CLAUDE.md) —
        # a crashed attempt held a registered session just like a wedged one
        time.sleep(65)
    raise SystemExit("bench: all attempts failed")


def main() -> None:
    from qat_vit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    backend = jax.default_backend()
    import jax.numpy as _jnp
    import sys

    float(jax.jit(lambda x: x + 1.0)(_jnp.zeros(())))  # tunnel liveness probe
    print("[bench] device up", file=sys.stderr, flush=True)

    def spread(pair):
        # {min, median, n} per metric (min is the tunnel-noise filter and the
        # headline; median guards against min flattering a hiccupy tunnel)
        mn, med = pair
        return {"min": round(mn, 1), "median": round(med, 1), "n": REPEATS}

    train_f32 = bench_qat_train(cache_teacher=True)
    train_full = bench_qat_train(cache_teacher=False)
    # the DEFAULT config since round 2: qat_amp bf16 (full-scale evidence in
    # docs/BENCHMARKS.md — equal accuracy, int8 within 0.01% of QAT)
    train = bench_qat_train(cache_teacher=True, qat_dtype=_jnp.bfloat16)
    train_ips = train[0]
    try:
        infer = bench_int8_infer()
        infer_ips = infer[0]
    except Exception as e:  # int8 extras must not sink the headline number
        infer = infer_ips = None

        print(f"int8 bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        detect_ms = bench_int8_detect()
    except Exception as e:  # detection extra must not sink the headline
        detect_ms = None
        print(f"int8 detect bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    result = {
        "metric": "qat_train_imgs_per_sec_per_chip",
        "value": round(train_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(train_ips / BASELINE_QAT_TRAIN_IMGS_PER_SEC, 2),
        "extras": {
            "int8_infer_imgs_per_sec": round(infer_ips, 1) if infer_ips else None,
            "int8_detect_ms_per_batch8": (
                round(detect_ms[0], 2) if detect_ms else None),
            "int8_detect_imgs_per_sec": (
                round(DETECT_BATCH / (detect_ms[0] / 1e3), 1)
                if detect_ms else None),
            "int8_detect_spread_ms": (
                {"min": round(detect_ms[0], 2),
                 "median": round(detect_ms[1], 2), "n": REPEATS}
                if detect_ms else None),
            "qat_train_spread": spread(train),
            "int8_infer_spread": spread(infer) if infer else None,
            "teacher_every_step_spread": spread(train_full),
            "f32_strict_parity_spread": spread(train_f32),
            "qat_train_imgs_per_sec_teacher_every_step": round(train_full[0], 1),
            "qat_train_imgs_per_sec_f32_strict_parity": round(train_f32[0], 1),
            "train_batch": TRAIN_BATCH,
            "infer_batch": INFER_BATCH,
            "train_steps_timed": TRAIN_STEPS,
            "backend": backend,
            "baseline": "reference QAT-phase search-epoch throughput, 413 img/s "
                        "(mlflow.db-derived; see BASELINE.md)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import os

    if os.environ.get("QVT_BENCH_CHILD") == "1":
        main()
    else:
        _watchdog_main()
