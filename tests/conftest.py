"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding tests need a multi-device mesh; real hardware has one TPU chip, so
tests force the CPU backend with 8 virtual devices (SURVEY.md §7 step 9).

Gotcha: the host image's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (the TPU tunnel), so jax.config has already
snapshotted the env by the time this file runs — we must update jax.config
directly, not just os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
