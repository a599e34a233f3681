"""Per-stage wall-clock profile of the hairball render (VERDICT r1 #2).

Times each pipeline stage in isolation on the bench scene so optimization
targets the real top cost instead of guesses:
  phase1   : dense ray x cluster-AABB cull + per-block list build
  nearest  : full closest-hit (phase1 + Pallas kernel)
  anyhit   : occlusion kernel with per-ray t_max
  hair_f   : one batched hair BSDF eval
  hair_smp : hair_sample (includes f + pdf re-eval)
  fwd      : full path trace forward
  fwd+bwd  : value_and_grad wrt (beta_m, beta_n, sigma_a)

Run: python benchmarks/profile_stages.py [n_strands] [batch]
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
    # usage: profile_stages.py [n_strands] [batch] [--trace DIR]
    trace_dir = None
    argv = sys.argv[1:]
    if "--trace" in argv:
        i = argv.index("--trace")
        trace_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    n_strands = int(argv[0]) if len(argv) > 0 else 10_000
    batch = int(argv[1]) if len(argv) > 1 else 65_536
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
    print(f"# segments={cl.s0.shape[0]} clusters={cl.n_clusters} "
          f"tiles={cl.tc.nbytes/1e6:.1f}MB")

    perm, _ = pmesh.tile_pixel_permutation(width, height)
    pid = jnp.asarray(perm[:batch].astype(np.int32))
    sid = jnp.zeros((batch,), jnp.int32)
    key = jax.random.key(0)
    u = pmesh._ray_uniforms(key, pid, sid, max_depth, jnp.float32)
    i = (pid % width).astype(jnp.float32)
    j = (pid // width).astype(jnp.float32)
    o, d = camera_rays(cam, width, height, i, j, u[:, :4])
    from yhair_tpu.utils.hostsync import sync as _hs_sync
    _hs_sync(o)

    # stats: clusters per block
    ids, counts = jax.jit(
        lambda o, d: ik._block_cluster_lists(o, d, cl, 128))(o, d)
    cn = np.asarray(counts)
    print(f"# clusters/block: mean={cn.mean():.1f} p50={np.median(cn):.0f} "
          f"max={cn.max()} blocks={cn.shape[0]}")

    t1, _ = timeit(jax.jit(
        lambda o, d: ik._block_cluster_lists(o, d, cl, 128)), o, d,
        reps=20)
    print(f"phase1    {t1*1e3:8.2f} ms")

    t2, (tt, idx, hit) = timeit(jax.jit(
        lambda o, d: ik.nearest_hit(o, d, cl)), o, d, reps=20)
    print(f"nearest   {t2*1e3:8.2f} ms  (kernel ~{(t2-t1)*1e3:.2f} ms) "
          f"hitrate={float(hit.mean()):.3f}")

    tmax = jnp.full((batch,), 10.0)
    t3, _ = timeit(jax.jit(
        lambda o, d, tm: ik.any_hit(o, d, tm, cl)), o, d, tmax, reps=20)
    print(f"anyhit    {t3*1e3:8.2f} ms  (kernel ~{(t3-t1)*1e3:.2f} ms)")

    h = jnp.clip(u[:, 4] * 2 - 1, -0.99, 0.99)
    wo = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wi = jnp.roll(wo, 1, axis=0)
    t4, _ = timeit(jax.jit(lambda h, a, b: jh.hair_f(sc.hair, h, a, b)),
                   h, wo, wi, reps=20)
    print(f"hair_f    {t4*1e3:8.2f} ms")

    t5, _ = timeit(jax.jit(
        lambda h, a, uu: jh.hair_sample(sc.hair, h, a, uu)),
        h, wo, u[:, :4], reps=20)
    print(f"hair_smp  {t5*1e3:8.2f} ms")

    def fwd(scene, pid, sid, key):
        uu = pmesh._ray_uniforms(key, pid, sid, max_depth, jnp.float32)
        i = (pid % width).astype(jnp.float32)
        j = (pid // width).astype(jnp.float32)
        oo, dd = camera_rays(cam, width, height, i, j, uu[:, :4])
        return jpath.trace(scene, oo, dd, uu, max_depth=max_depth)

    t6, _ = timeit(jax.jit(fwd), sc, pid, sid, key)
    print(f"fwd       {t6*1e3:8.2f} ms")

    params = {"beta_m": sc.hair.beta_m, "beta_n": sc.hair.beta_n,
              "sigma_a": sc.hair.sigma_a}

    def fwdbwd(p, pid, sid, key):
        def loss(p):
            s2 = sc._replace(hair=sc.hair._replace(**p))
            return fwd(s2, pid, sid, key).mean()
        return jax.value_and_grad(loss)(p)

    tc0 = time.time()
    if trace_dir:
        # jax.profiler trace of one compiled fwd+bwd step (device +
        # host timelines; open with TensorBoard's profile plugin)
        out = jax.jit(fwdbwd)(params, pid, sid, key)
        _hs_sync(out)
        jax.profiler.start_trace(trace_dir)
        out = jax.jit(fwdbwd)(params, pid, sid, key)
        _hs_sync(out)
        jax.profiler.stop_trace()
        print(f"# wrote profiler trace to {trace_dir}")
    t7, _ = timeit(jax.jit(fwdbwd), params, pid, sid, key)
    print(f"fwd+bwd   {t7*1e3:8.2f} ms  (compile+first {time.time()-tc0-4*t7:.1f}s)")

    n_lights = sc.n_lights
    rays = batch * max_depth * (1 + n_lights)
    print(f"# fwd+bwd -> {rays/t7/1e6:.2f} Mrays/s "
          f"({max_depth}x(1+{n_lights}) rays/camera-ray)")
    # per-bounce traversal counts: 1 nearest + n_lights anyhit per depth
    est = max_depth * (t2 + n_lights * t3)
    print(f"# traversal-only estimate for fwd: {est*1e3:.1f} ms "
          f"({est/t6*100:.0f}% of fwd)")


if __name__ == "__main__":
    main()
