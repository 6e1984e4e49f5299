"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; every sharding/collective test
runs against ``--xla_force_host_platform_device_count=8`` on the CPU backend,
which exercises the identical SPMD partitioner paths XLA uses on a real TPU
slice. Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test compiles fast and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The TPU-tunnel sitecustomize (when present) force-selects its backend via
# jax.config.update("jax_platforms", ...) at interpreter start, overriding the
# env var above. Re-force CPU before any backend initializes so tests get the
# fast local CPU compiler and the 8-device virtual mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

# Deadlock fix (diagnosed by the hang watchdog below, 2026-08-20 dump): the
# Mosaic-TPU interpreter that executes our ``interpret=True`` Pallas kernels
# on CPU runs io_callbacks on a runtime thread, and those callbacks dispatch
# jnp ops themselves (interpret/shared_memory.py update_clocks...). With
# CPU async dispatch on, the MAIN thread is concurrently inside eager
# ``apply_primitive`` for the next op (e.g. the jnp.stack in
# ops/fused_serve._qscales) — the two dispatches interleave on JAX's
# dispatch internals and every thread parks in futex wait, permanently.
# Synchronous CPU dispatch serializes them; the race (it struck ~1 in 3 full
# suite runs, always in interpret-mode kernel tests) is gone and the suite
# cost is noise (dispatch pipelining only ever overlapped host-side work).
jax.config.update("jax_cpu_enable_async_dispatch", False)

# ---------------------------------------------------------------------------
# Per-test hang watchdog. The suite once wedged at ~42% with every thread in
# futex wait (zero CPU, no output) — a state SIGALRM-style timeouts can't
# interrupt because the main thread never re-enters the interpreter.
# ``faulthandler.dump_traceback_later`` runs on its own C watchdog thread, so
# it fires regardless: after TIMEOUT seconds in ONE test it dumps every
# thread's stack to stderr and exits the process — a diagnosable failure
# instead of an indefinite hang. Generous default (the multihost test runs
# ~3 min; heavy interpret-mode kernel tests a few more); override per test
# with @pytest.mark.timeout_s(N) or the QVT_TEST_TIMEOUT env var.
# ---------------------------------------------------------------------------
import faulthandler  # noqa: E402
import tempfile  # noqa: E402

import pytest  # noqa: E402

_DEFAULT_TEST_TIMEOUT = float(os.environ.get("QVT_TEST_TIMEOUT", 900))
# pytest's fd-level capture swallows anything written to fd 2 during a test
# (and discards it when faulthandler _exit()s), so the dump goes to a stable
# on-disk file announced in the session header.
_WATCHDOG_DUMP = os.path.join(
    tempfile.gettempdir(), f"qvt_test_watchdog_{os.getpid()}.dump"
)
_watchdog_file = open(_WATCHDOG_DUMP, "w")


def pytest_report_header(config):
    return (
        f"hang watchdog: per-test cap {_DEFAULT_TEST_TIMEOUT:.0f}s "
        f"(QVT_TEST_TIMEOUT / @pytest.mark.timeout_s); on expiry all thread "
        f"stacks dump to {_WATCHDOG_DUMP} and the run exits"
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout_s(seconds): per-test hang-watchdog override "
        "(default 900s; dumps all stacks and exits on expiry)",
    )
    config.addinivalue_line(
        "markers",
        "slow: end-to-end / interpret-mode-heavy tests (>=~20s each). "
        "Fast lane: `pytest -m 'not slow'` (~10 min); the FULL suite "
        "(`pytest tests/ -q`, ~35 min) is the merge gate.",
    )


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    # Wrap the WHOLE protocol (fixture setup + call + teardown), not just the
    # call phase: the futex-wait wedge above can strike inside a
    # module-scoped fixture building/converting a model, and a watchdog armed
    # only around the call body would sleep through it.
    marker = item.get_closest_marker("timeout_s")
    timeout = float(marker.args[0]) if marker else _DEFAULT_TEST_TIMEOUT
    _watchdog_file.write(f"== watchdog armed: {item.nodeid} ({timeout:.0f}s)\n")
    _watchdog_file.flush()
    faulthandler.dump_traceback_later(timeout, exit=True, file=_watchdog_file)
    try:
        yield
    finally:
        faulthandler.cancel_dump_traceback_later()
