"""Sweep (block size, cluster size) against real bounce wavefronts.

The Pallas kernel tests each ray BLOCK against the union of clusters any
of its rays touches; total kernel work = sum_blocks union * block * k.
This script extracts the integrator's actual sorted wavefront at each
depth and reports that work integral for candidate block/cluster sizes,
plus measured nearest_hit times for the promising ones.

Run: python benchmarks/profile_blocksweep.py [n_strands] [batch]
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
    from yhair_tpu.ops import clusters as cmod
    from yhair_tpu.ops import intersect_kernel as ik
    from yhair_tpu.parallel import mesh as pmesh
    from yhair_tpu.bsdf import hair as jh

    scene_d, cam_d = curly_hairball(n_strands=n_strands, n_seg=12)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc, cl128, _ = build_scene_clusters(sc)
    segs = sc.segments

    # alternative cluster sizes from the same geometry
    r0 = segs.p0[:, 0] * 0  # placeholder removed below
    p0 = np.asarray(segs.p0)
    p1 = np.asarray(segs.p1)
    rr0 = np.asarray(segs.r0)
    rr1 = np.asarray(segs.r1)
    cls = {128: cl128}
    for k in (32, 64):
        cls[k] = cmod.build(p0, p1, rr0, rr1, cluster_size=k)
        print(f"# cluster_size={k}: n_clusters={cls[k].n_clusters} "
              f"tiles={cls[k].tc.nbytes/1e6:.1f}MB")

    perm, _ = pmesh.tile_pixel_permutation(width, height)
    pid = jnp.asarray(perm[:batch].astype(np.int32))
    sid = jnp.zeros((batch,), jnp.int32)
    key = jax.random.key(0)
    u = pmesh._ray_uniforms(key, pid, sid, max_depth, jnp.float32)
    i = (pid % width).astype(jnp.float32)
    j = (pid // width).astype(jnp.float32)
    o, d = camera_rays(cam, width, height, i, j, u[:, :4])

    sp0, sp1 = sc.segments.p0, sc.segments.p1
    lo = jnp.minimum(sp0.min(0), sp1.min(0))
    inv_ext = 1.0 / jnp.maximum(jnp.maximum(sp0.max(0), sp1.max(0)) - lo,
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

    # collect wavefronts
    waves = []
    alive = jnp.ones((batch,), bool)
    oo, dd = o, d
    for depth in range(max_depth):
        waves.append((oo, dd, alive))
        ub = u[:, D_PIXEL + D_BOUNCE * depth:D_PIXEL + D_BOUNCE * (depth + 1)]
        oo, dd, alive = one_bounce(oo, dd, alive, ub)

    # work integral: sum_blocks union * block * k  (tests per traversal)
    for depth, (o_, d_, al) in enumerate(waves):
        o_int = jnp.where(al[:, None], o_, 1e8)
        line = f"depth {depth}:"
        for csz in (128, 64, 32):
            cl = cls[csz]
            for blk in (128, 64, 32, 16, 8):
                _, counts = jax.jit(
                    lambda o, d, cl=cl, blk=blk:
                    ik._block_cluster_lists(o, d, cl, blk))(o_int, d_)
                cn = np.asarray(counts)
                work = cn.sum() * blk * csz / 1e6  # M segment tests
                line += f"  c{csz}b{blk}:{work:7.1f}M"
            line += " |"
        print(line)

    # measured kernel times for promising configs at depth 2 wavefront
    o_, d_, al = waves[2]
    o_int = jnp.where(al[:, None], o_, 1e8)
    for csz in (128, 64, 32):
        for blk in (128, 64, 32):
            cl = cls[csz]
            try:
                t, _ = timeit(jax.jit(
                    lambda o, d, cl=cl, blk=blk:
                    ik.nearest_hit(o, d, cl, block=blk)), o_int, d_, reps=5)
                print(f"nearest d2 c{csz} b{blk}: {t*1e3:8.2f} ms")
            except Exception as e:
                print(f"nearest d2 c{csz} b{blk}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
