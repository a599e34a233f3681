"""Ablation profile of the full forward trace: which feature costs what.

profile_stages.py times isolated kernels on camera rays; this times the
WHOLE jitted trace under feature ablations so the fwd-ms budget is
attributable:

  full           : trace() exactly as bench.py runs it
  no_sort        : sort_rays=False (cost of the per-bounce argsort+gathers)
  depth=1..4     : bounce-count scaling (per-bounce marginal cost)
  naive          : no NEE (no shadow rays at all)
  depth1_naive   : camera-ray nearest + shading only

Run: python benchmarks/profile_ablate.py [n_strands] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

import jax
import jax.numpy as jnp
import numpy as np

from yhair_tpu.utils import compile_cache

compile_cache.enable()


from benchmarks._timing import timeit as _timeit


def timeit(fn, *args, reps=5):
    t, _ = _timeit(fn, *args, reps=reps)
    return t


def main():
    n_strands = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536
    width = height = 512
    max_depth = 4

    from scenes.generators import curly_hairball
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.core.camera import camera_rays
    from yhair_tpu.integrator import path as jpath
    from yhair_tpu.ops import build_scene_clusters
    from yhair_tpu.parallel import mesh as pmesh

    scene_d, cam_d = curly_hairball(n_strands=n_strands, n_seg=12)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc, cl, _ = build_scene_clusters(sc)

    perm, _ = pmesh.tile_pixel_permutation(width, height)
    pid = jnp.asarray(perm[:batch].astype(np.int32))
    sid = jnp.zeros((batch,), jnp.int32)
    key = jax.random.key(0)

    def make(md, sampler="path", sort=None):
        @jax.jit
        def fwd(scene, pid, sid, key):
            u = pmesh._ray_uniforms(key, pid, sid, md, jnp.float32)
            i = (pid % width).astype(jnp.float32)
            j = (pid // width).astype(jnp.float32)
            o, d = camera_rays(cam, width, height, i, j, u[:, :4])
            return jpath.trace(scene, o, d, u, max_depth=md,
                               sampler=sampler, sort_rays=sort)
        return fwd

    import json
    sel = (sys.argv[3].split(",") if len(sys.argv) > 3
           else ["full d4", "no_sort d4", "naive d4", "full d1"])
    cases = {
        "full d4": lambda: make(4),
        "no_sort d4": lambda: make(4, sort=False),
        "naive d4": lambda: make(4, sampler="naive"),
        "full d1": lambda: make(1),
        "full d2": lambda: make(2),
        "full d3": lambda: make(3),
        "naive d1": lambda: make(1, sampler="naive"),
    }
    for name in sel:
        t = timeit(cases[name](), sc, pid, sid, key)
        print(f"{name:14s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
