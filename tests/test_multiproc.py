"""Multi-process (multi-host) harness wired into the suite (VERDICT r3
next-round #3): 2 processes x 4 virtual CPU devices each must produce
bit-identical loss + gradients to one process over the same 8-device
global ray set. The heavy lifting lives in benchmarks/multiproc_harness.py
(the same entry the SCALING.md numbers come from)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multiproc_grads_bit_identical():
    env = dict(os.environ)
    # workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub the pytest
    # conftest's 8-device forcing so the launcher's children control it
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "benchmarks", "multiproc_harness.py"),
         "launch", "--nproc", "2", "--local", "4"],
        capture_output=True, text=True, timeout=900, cwd=ROOT, env=env)
    assert out.returncode == 0, f"harness failed:\n{out.stdout}\n{out.stderr}"
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["ok"] is True, res
    assert res["max|dbeta_m|"] == 0.0, res
    assert res["max|dsigma_a|"] == 0.0, res
