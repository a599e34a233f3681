"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding tests need a multi-device mesh; real hardware has one TPU chip, so
tests force the CPU backend with 8 virtual devices (SURVEY.md §7 step 9).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
