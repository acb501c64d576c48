"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP over the ``data`` axis) is exercised without TPU
hardware by forcing the host platform to expose 8 devices, per the project
test strategy (SURVEY.md section 4).

The TPU platform plugin in this environment registers itself from a ``.pth``
hook before any conftest runs, so the platform must be overridden through
``jax.config`` (the JAX_PLATFORMS env var is already consumed by then).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
