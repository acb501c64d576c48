"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP over the ``data`` axis) is exercised without TPU
hardware by forcing the host platform to expose 8 devices, per the project
test strategy (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
