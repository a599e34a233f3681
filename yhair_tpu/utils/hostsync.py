"""Device-to-host completion barrier for the tunneled (axon) TPU runtime.

`jax.block_until_ready` on this runtime is UNRELIABLE: it can return
before device completion (measured: 20 enqueued 4096^3 matmuls
"completed" in 0.6 ms — 22x the chip's peak; benchmarks/_timing.py) and
has been observed to raise spurious INVALID_ARGUMENT runtime errors on
programs that re-run fine. The one reliable completion signal is a
device-to-host transfer of (a slice of) the result.

EVERY timing loop and progressive-render sync in this repo must go
through these helpers instead of block_until_ready
(tests/test_hostsync.py enforces it with a source scan).
"""

from __future__ import annotations

import jax
import numpy as np


def sync(out) -> None:
    """Block until `out` (any pytree of arrays) has finished computing,
    by reading one element of its first leaf back to the host."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def fetch(x) -> np.ndarray:
    """Full D2H transfer of one array; doubles as the completion barrier
    (np.asarray on a jax.Array performs the device read)."""
    return np.asarray(x)
