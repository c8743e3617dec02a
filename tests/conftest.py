"""Test config: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip sharding without hardware
(SURVEY.md §4). Must run before jax initializes its backends.

IMPORTANT: this machine's sitecustomize registers a remote TPU (axon) PJRT
plugin at interpreter start; initializing it costs ~2.5 minutes and grabs
the real chip. `jax.config.update("jax_platforms", "cpu")` below keeps the
whole test suite off the TPU (the env var alone is not sufficient because
the plugin registration overrides it).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
