"""Test configuration: force an 8-device virtual CPU mesh.

Must run before anything imports jax: tests exercise multi-chip sharding on
a fake 8-device CPU platform (the standard JAX substitute for a TPU pod in
unit tests — SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
