"""Test configuration: force an 8-device virtual CPU mesh.

Runs before anything imports jax: tests exercise multi-chip sharding on a
fake 8-device CPU platform (the standard JAX substitute for a TPU pod in
unit tests — SURVEY.md section 4).

Note: in the TPU container the axon PJRT plugin registers itself at
interpreter start (sitecustomize) and forces itself as the default
platform, overriding the JAX_PLATFORMS env var — so the platform must
also be forced back to CPU through jax.config before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
