"""Truthful timing on the tunneled (axon) TPU runtime.

`jax.block_until_ready` on this runtime can return WITHOUT waiting for
device completion (measured: 20 enqueued 4096^3 matmuls "completed" in
0.6 ms — 4463 TFLOP/s, 22x the chip's peak). The only reliable completion
signal is a device-to-host transfer of (a slice of) the result. Costs are
therefore measured as the MARGINAL time of extra enqueued reps between two
D2H syncs:

    t = (time(N reps + D2H) - time(1 rep + D2H)) / (N - 1)

which cancels the ~25 ms sync floor and any fixed dispatch overhead.
Validated: the same harness reads 169 TFLOP/s for the bf16 matmul
(86% of v5e peak) and reproduces whole-frame render times.
"""

from __future__ import annotations

import time

from yhair_tpu.utils.hostsync import sync as _sync


def timeit(fn, *args, reps=10, args_list=None):
    """Marginal per-rep seconds of fn(*args). If args_list is given, it
    must hold >= reps argument tuples (cycled) so each rep sees distinct
    inputs; otherwise the same args are reused."""
    def call(i):
        if args_list is not None:
            return fn(*args_list[i % len(args_list)])
        return fn(*args)

    out = call(0)
    _sync(out)  # compile + settle

    t0 = time.time()
    out = call(0)
    _sync(out)
    t_one = time.time() - t0

    t0 = time.time()
    for i in range(reps):
        out = call(i)
    _sync(out)
    t_many = time.time() - t0
    return max(t_many - t_one, 1e-9) / max(reps - 1, 1), out
