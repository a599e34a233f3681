"""Micro-benchmarks for the traversal kernel cost model.

  A. per-grid-step overhead: tiny cluster set (every block visits all C
     clusters) timed at block 128/64/32 -> isolates fixed cost per step.
  B. phase-1 breakdown: slab+reduce vs the front-to-back argsort.
  C. kernel throughput: synthetic uniform lists, Gtests/s.

Run: python benchmarks/profile_micro.py
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


from benchmarks._timing import timeit  # noqa: E402  (truthful D2H timing)


def main():
    from yhair_tpu.ops import clusters as cmod
    from yhair_tpu.ops import intersect_kernel as ik

    n = 65536
    rng = np.random.default_rng(0)

    # A: tiny scene, C=64 clusters of 128 segs = 8192 segments
    for c_target, label in ((64, "A"), ):
        s = c_target * 128
        p0 = rng.random((s, 3)).astype(np.float32)
        p1 = (p0 + 0.01 * rng.standard_normal((s, 3))).astype(np.float32)
        r = np.full(s, 1e-3, np.float32)
        cl = cmod.build(p0, p1, r, r, use_native=False)
        print(f"# {label}: n_clusters={cl.n_clusters}")
        o = rng.random((n, 3)).astype(np.float32) * 0.5
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j, d_j = jnp.asarray(o), jnp.asarray(d)
        for blk in (128, 64, 32, 16):
            try:
                t, _ = timeit(jax.jit(
                    lambda o, d, blk=blk: ik.nearest_hit(o, d, cl,
                                                         block=blk)),
                    o_j, d_j, reps=20)
                steps = n // blk
                print(f"{label} block={blk:4d}: {t*1e3:8.2f} ms "
                      f"({steps} steps, {t/steps*1e6:.2f} us/step incl "
                      f"work)")
            except Exception as e:
                print(f"{label} block={blk:4d}: FAIL "
                      f"{str(e).splitlines()[-1][:200]}")

    # B: phase-1 breakdown on the hairball
    from scenes.generators import curly_hairball
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.ops import build_scene_clusters

    scene_d, cam_d = curly_hairball(n_strands=10_000, n_seg=12)
    sc = jscene.from_dict(scene_d)
    sc, clh, _ = build_scene_clusters(sc)
    o = rng.random((n, 3)).astype(np.float32) * 0.2
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    def phase1_nosort(o, d):
        # replicate _block_cluster_lists up to (but not incl.) argsort
        import math
        block = 128
        c = clh.n_clusters
        nb = n // block
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                              jnp.where(d < 0, -1e-12, 1e-12), d)
        tn = jnp.full((n, c), jnp.float32(1e-4))
        tf = jnp.full((n, c), jnp.float32(1e30))
        for ax in range(3):
            t0 = (clh.cmin[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
            t1 = (clh.cmax[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = tn <= tf
        hb = hit.reshape(nb, block, c).any(axis=1)
        tb = jnp.where(hit, tn, 1e30).reshape(nb, block, c).min(axis=1)
        return hb, tb

    t_ns, (hb, tb) = timeit(jax.jit(phase1_nosort), o_j, d_j, reps=20)
    print(f"phase1 slab+reduce       : {t_ns*1e3:8.2f} ms")

    t_full, _ = timeit(jax.jit(
        lambda o, d: ik._block_cluster_lists(o, d, clh, 128)),
        o_j, d_j, reps=20)
    print(f"phase1 full (with argsort): {t_full*1e3:8.2f} ms")

    key = jnp.where(hb, tb, 1e30)
    t_srt, _ = timeit(jax.jit(
        lambda k: jnp.argsort(k, axis=1).astype(jnp.int32)), key, reps=20)
    print(f"argsort (nb, C) alone     : {t_srt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
