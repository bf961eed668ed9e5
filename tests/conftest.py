"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
XLA's host-platform device-count override, which gives 8 independent
CPU "devices" that exercise the same jax.sharding/Mesh/collective code
paths a real slice would.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import rkmh_tpu  # noqa: F401,E402  (enables x64 before tests import jax)
