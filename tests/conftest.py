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
