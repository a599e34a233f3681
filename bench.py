"""Headline benchmark: Mrays/s/chip, forward+backward, hairball 512x512.

BASELINE.json:2 — "Mrays/s/chip fwd+bwd on hairball 512x512; pixel-grad
allclose; 1->N host scaling". The reference publishes no numbers
(BASELINE.md), so vs_baseline reports the speedup over the float64 numpy
oracle's rays/s on the same scene (the stand-in for the missing C++
reference, measured live on a subset each run).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

Ray accounting: every acceleration-structure traversal actually launched —
camera/bounce rays plus one shadow ray per light per bounce, all lanes
(SIMD lanes do the work whether or not a lane is still alive).
"""

import json
import sys
import time

import numpy as np


def _log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.time()
    print(f"# [{time.time() - _t0[0]:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import os

    # the remote Mosaic (Pallas) compiler needs the accelerator type
    os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

    from yhair_tpu.utils import compile_cache
    compile_cache.enable()

    from scenes.generators import curly_hairball
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.ops import build_scene_clusters

    width = height = 512
    spp = 1
    max_depth = 4
    n_strands = 10_000
    batch = 65_536

    scene_d, cam_d = curly_hairball(n_strands=n_strands, n_seg=12)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc2, _cl, _ = build_scene_clusters(sc)
    n_lights = sc2.n_lights
    rays_per_camera_ray = max_depth * (1 + n_lights)

    from yhair_tpu.core.camera import camera_rays
    from yhair_tpu.integrator import path as jpath
    from yhair_tpu.parallel import mesh as pmesh

    n_rays = width * height * spp

    def trace_batch(scene, pixel_ids, sample_ids, key):
        u = pmesh._ray_uniforms(key, pixel_ids, sample_ids, max_depth,
                                jnp.float32)
        i = (pixel_ids % width).astype(jnp.float32)
        j = (pixel_ids // width).astype(jnp.float32)
        o, d = camera_rays(cam, width, height, i, j, u[:, :4])
        return jpath.trace(scene, o, d, u, max_depth=max_depth)

    def fwd_bwd_batch(params, pixel_ids, sample_ids, key):
        def loss(p):
            scene = sc2._replace(hair=sc2.hair._replace(**p))
            L = trace_batch(scene, pixel_ids, sample_ids, key)
            return L.mean()
        return jax.value_and_grad(loss)(params)

    jit_fwd = jax.jit(trace_batch)
    jit_fwdbwd = jax.jit(fwd_bwd_batch)

    params = {"beta_m": sc2.hair.beta_m, "beta_n": sc2.hair.beta_n,
              "sigma_a": sc2.hair.sigma_a}
    key = jax.random.key(0)
    perm, _inv = pmesh.tile_pixel_permutation(width, height)
    # pre-staged ON DEVICE: a host->device upload per batch serializes
    # the dispatch stream on the tunneled runtime
    pid_all = jnp.asarray(np.repeat(perm, spp).astype(np.int32))
    sid_all = jnp.asarray(np.tile(np.arange(spp, dtype=np.int32),
                                  width * height))

    from yhair_tpu.utils.hostsync import sync as host_sync

    def run(fn, args_builder, n_batches):
        # completion is signalled by a device-to-host read of the LAST
        # output (programs execute in order): jax.block_until_ready is
        # unreliable on this tunneled runtime (yhair_tpu/utils/hostsync.py)
        out = None
        for bi in range(n_batches):
            s = slice(bi * batch, (bi + 1) * batch)
            out = fn(*args_builder(s))
        host_sync(out)
        return out

    n_batches = n_rays // batch

    # warm up / compile
    _log("compiling forward")
    run(jit_fwd, lambda s: (sc2, pid_all[s], sid_all[s], key), 1)
    _log("compiling forward+backward")
    run(jit_fwdbwd, lambda s: (params, pid_all[s], sid_all[s], key), 1)
    _log("timing")

    t0 = time.time()
    run(jit_fwdbwd, lambda s: (params, pid_all[s], sid_all[s], key),
        n_batches)
    t_fwdbwd = time.time() - t0

    total_rays = n_rays * rays_per_camera_ray
    mrays = total_rays / t_fwdbwd / 1e6

    # ALIVE-ray throughput alongside the all-lane headline: lanes run the
    # traversal whether or not they still carry a live path, so the
    # all-lane number is the hardware rate while the alive-ray number is
    # the useful-work rate (VERDICT r4 missing #6). One instrumented
    # (untimed) batch gives the alive fraction.
    def alive_batch(scene, pixel_ids, sample_ids, key):
        u = pmesh._ray_uniforms(key, pixel_ids, sample_ids, max_depth,
                                jnp.float32)
        i = (pixel_ids % width).astype(jnp.float32)
        j = (pixel_ids // width).astype(jnp.float32)
        o, dvec = camera_rays(cam, width, height, i, j, u[:, :4])
        _, aux = jpath.trace(scene, o, dvec, u, max_depth=max_depth,
                             return_alive=True)
        return aux
    a_in, a_sh = jax.jit(alive_batch)(
        sc2, jnp.asarray(pid_all[:batch]), jnp.asarray(sid_all[:batch]),
        key)
    alive_rays = float(np.asarray(a_in).sum() + np.asarray(a_sh).sum())
    alive_frac = alive_rays / (batch * rays_per_camera_ray)
    alive_mrays = mrays * alive_frac

    _log(f"fwd+bwd timed: {t_fwdbwd:.2f}s; running oracle baseline")
    # --- oracle baseline (numpy float64) on a small slice of the same
    # scene. Oracle cost is linear in rays x segments (dense brute-force
    # intersects), so a tiny ray subset gives the same Mrays/s estimate —
    # 24x24 took >1 h of numpy on the 120k-segment hairball
    from oracle.pathtrace import render as oracle_render, n_uniform_dims as ond
    sub = 8
    rng = np.random.default_rng(0)
    u_o = rng.random((sub, sub, 1, ond(max_depth)))
    t0 = time.time()
    oracle_render(scene_d, dict(cam_d, width=sub, height=sub), u_o,
                  max_depth=max_depth)
    t_oracle = time.time() - t0
    oracle_mrays = (sub * sub * rays_per_camera_ray) / t_oracle / 1e6

    print(json.dumps({
        "metric": "hairball_512x512_1spp_fwd+bwd",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / max(oracle_mrays, 1e-9), 1),
        "alive_mrays": round(alive_mrays, 3),
        "alive_frac": round(alive_frac, 4),
    }))
    print(f"# fwd+bwd: {t_fwdbwd:.2f}s for {total_rays/1e6:.1f}M rays; "
          f"alive-ray rate {alive_mrays:.3f} Mrays/s "
          f"(alive fraction {alive_frac:.3f}); "
          f"oracle {oracle_mrays:.4f} Mrays/s", file=sys.stderr)


if __name__ == "__main__":
    main()
