"""Per-bounce traversal profile: where do the non-camera-ray ms go?

profile_stages.py times nearest/anyhit on CAMERA rays (coherent, ~22
clusters/block). This script extracts the ACTUAL wavefront at each bounce
(positions + sampled directions after the integrator's Morton re-sort)
and times the same kernels there, printing clusters/block so the
depth-dependent cost structure is visible.

Run: python benchmarks/profile_bounce.py [n_strands] [batch]
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
    n_strands = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536
    width = height = 512
    max_depth = 4

    from scenes.generators import curly_hairball
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.core.camera import camera_rays
    from yhair_tpu.integrator import path as jpath
    from yhair_tpu.ops import build_scene_clusters
    from yhair_tpu.ops import intersect_kernel as ik
    from yhair_tpu.parallel import mesh as pmesh
    from yhair_tpu.bsdf import hair as jh

    scene_d, cam_d = curly_hairball(n_strands=n_strands, n_seg=12)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc, cl, _ = build_scene_clusters(sc)

    perm, _ = pmesh.tile_pixel_permutation(width, height)
    pid = jnp.asarray(perm[:batch].astype(np.int32))
    sid = jnp.zeros((batch,), jnp.int32)
    key = jax.random.key(0)
    u = pmesh._ray_uniforms(key, pid, sid, max_depth, jnp.float32)
    i = (pid % width).astype(jnp.float32)
    j = (pid // width).astype(jnp.float32)
    o, d = camera_rays(cam, width, height, i, j, u[:, :4])

    # replicate the integrator's bounce evolution: intersect, sample a new
    # direction, advance, re-sort — capturing (o, d, alive) per depth
    p0 = sc.segments.p0
    p1 = sc.segments.p1
    lo = jnp.minimum(p0.min(0), p1.min(0))
    inv_ext = 1.0 / jnp.maximum(jnp.maximum(p0.max(0), p1.max(0)) - lo,
                                1e-6)

    @jax.jit
    def one_bounce(o, d, alive, ub):
        o_int = jnp.where(alive[:, None], o, 1e8)
        hs = jpath.intersect_scene(sc, o_int, d)
        alive = alive & hs.hit
        wo = jpath._to_local(-d, hs.tangent, hs.frame_y, hs.frame_z)
        hctx = jh.hair_ctx(jpath._hair_mat_at(sc, hs.hair_mid), hs.h, wo)
        wi = jh.hair_sample_wi(hctx, ub[:, :4])
        d_new = jpath._to_world(wi, hs.tangent, hs.frame_y, hs.frame_z)
        d_new = d_new / jnp.maximum(
            jnp.linalg.norm(d_new, axis=-1, keepdims=True), 1e-12)
        o_new = hs.position + d_new * (2.0 * hs.radius)[:, None]
        perm = jpath._ray_sort_perm(o_new, d_new, alive, lo, inv_ext)
        return (jnp.take(o_new, perm, 0), jnp.take(d_new, perm, 0),
                jnp.take(alive, perm, 0))

    from yhair_tpu.core.rng import D_PIXEL, D_BOUNCE
    alive = jnp.ones((batch,), bool)
    for depth in range(max_depth):
        # time on the integrator's ACTUAL kernel input: dead lanes
        # masked to far-away origins (their d is garbage post-miss —
        # unmasked they poison the cluster lists and inflate timings
        # ~20x, which is what the r3 bounce numbers did)
        o = jnp.where(alive[:, None], o, 1e8)
        ids, counts = jax.jit(
            lambda o, d: ik._block_cluster_lists(o, d, cl, 128))(o, d)
        cn = np.asarray(counts)
        # DISTINCT inputs per rep: the tunnel runtime can dedup
        # identical enqueued programs, silently under-reporting
        jn = jax.jit(lambda o, d: ik.nearest_hit(o, d, cl))
        variants = [(o + 1e-6 * (k + 1), d) for k in range(8)]
        t_n1, (tt, idx, hit) = timeit(jn, o, d, args_list=variants,
                                      reps=8)
        t_n = t_n1
        # shadow rays from the hit points toward light 0
        hs = jax.jit(lambda o, d: jpath.intersect_scene(sc, o, d))(o, d)
        lp = sc.light_pos[0]
        to_l = lp - hs.position
        dist = jnp.linalg.norm(to_l, axis=-1)
        wi_w = to_l / jnp.maximum(dist[:, None], 1e-12)
        sh_o = hs.position + wi_w * (2.0 * hs.radius + 1e-4)[:, None]
        ja = jax.jit(lambda o, d, tm: ik.any_hit(o, d, tm, cl))
        va = [(sh_o + 1e-6 * (k + 1), wi_w, dist) for k in range(8)]
        t_a1, occ = timeit(ja, sh_o, wi_w, dist, args_list=va, reps=8)
        t_a = t_a1
        ids_s, counts_s = jax.jit(
            lambda o, d, tm: ik._block_cluster_lists(o, d, cl, 128,
                                                     t_max=tm))(
            sh_o, wi_w, dist)
        cs = np.asarray(counts_s)
        print(f"depth {depth}: alive={float(jnp.mean(alive)):.3f} "
              f"nearest {t_n1*1e3:7.2f} ms "
              f"(cl/blk mean={cn.mean():5.1f} max={cn.max():4d})  "
              f"anyhit {t_a1*1e3:7.2f} ms "
              f"occ={float(jnp.mean(occ)):.3f}", flush=True)
        ub = u[:, D_PIXEL + D_BOUNCE * depth:D_PIXEL + D_BOUNCE * (depth + 1)]
        o, d, alive = one_bounce(o, d, alive, ub)


if __name__ == "__main__":
    main()
