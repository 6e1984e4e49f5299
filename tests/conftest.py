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
