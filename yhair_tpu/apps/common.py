"""Shared app plumbing: scene loading, progressive renderer, platform."""

from __future__ import annotations

import os
import sys
import time


def force_platform(platform):
    """Mirror a platform request into jax.config BEFORE backends init
    (this image's sitecustomize pins jax_platforms to the axon TPU)."""
    if not platform:
        return
    import jax
    jax.config.update("jax_platforms", platform)


def load_scene(args):
    """-> (scene_dict, cam_dict) from --scene json or --config N."""
    if getattr(args, "scene", None):
        from ..io import scene_json
        return scene_json.load(args.scene)
    from scenes.generators import CONFIGS
    cfg = CONFIGS[int(args.config)]
    scene, cam = cfg["fn"]()
    return scene, cam


def build_device_scene(scene_d, cam_d, use_bvh=True, leaf_size=4,
                       accel="auto"):
    """accel: 'cluster' (Pallas kernel), 'bvh' (skip-pointer walk),
    'brute' (chunked scan), or 'auto' (cluster on TPU, bvh on CPU)."""
    import jax

    from ..accel import build_scene_bvh
    from ..core import scene as jscene
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    if not use_bvh or sc.segments.p0.shape[0] <= 64:
        return sc, cam, None
    if accel == "auto":
        platform = jax.devices()[0].platform
        accel = "bvh" if platform == "cpu" else "cluster"
    if accel == "cluster":
        from ..ops import build_scene_clusters
        sc, _cl, _ = build_scene_clusters(sc)
    elif accel == "bvh":
        sc, _bvh, _ = build_scene_bvh(sc, leaf_size=leaf_size)
    # the acceleration structure rides in scene.accel (a traced jit
    # argument); returning None here keeps callers from closing over it
    return sc, cam, None


def progressive_render(sc, cam, nearest, width, height, spp, max_depth,
                       seed=0, sampler="path", checkpoint=None,
                       checkpoint_every=8, log=print, spp_per_pass=1,
                       max_rays_per_call=65536):
    """Render spp samples in passes of spp_per_pass, accumulating on host.

    One jitted strip function is reused for every call (sample index and
    ray ids are traced arguments), so compile happens once. Returns
    (H, W, 3) image. Resumable via utils.checkpoint when `checkpoint` is
    given.

    max_rays_per_call bounds the traced batch: per-ray scan intermediates
    scale with N x chunk (the 1024^2 BASELINE config 5 at one pass
    needed 24.45 GB of HBM — measured compile OOM on v5e — dominated by
    (N, 2048, 3) scan workspaces), so big frames render as several equal
    tile-aligned strips of the tile-permuted pixel order. 65536 matches
    bench.py's proven batch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import mesh as pmesh
    from ..utils import checkpoint as ckpt
    from ..utils import hostsync

    accum = np.zeros((height, width, 3), np.float64)
    start_sample = 0
    if checkpoint and os.path.exists(checkpoint):
        st = ckpt.load_render_state(checkpoint)
        accum = st["accum"]
        start_sample = st["next_sample"]
        assert st["seed"] == seed, "checkpoint was rendered with another seed"
        log(f"resumed at sample {start_sample}")

    n_rays = width * height * spp_per_pass
    n_strips = max(1, -(-n_rays // max_rays_per_call))
    while n_rays % n_strips:
        n_strips += 1
    strip = n_rays // n_strips
    base = jax.random.key(seed)
    perm, inv = pmesh.tile_pixel_permutation(width, height)
    pid_all = np.repeat(perm, spp_per_pass).astype(np.int32)
    sid_all = np.tile(np.arange(spp_per_pass, dtype=np.int32),
                      width * height)

    def render_strip(scene, camera, sample0, pid, sid):
        return pmesh._trace_pixels(scene, camera, width, height, pid,
                                   sample0 + sid, base, max_depth, 2048,
                                   nearest, sampler)

    jstrip = jax.jit(render_strip)
    t0 = time.time()
    s = start_sample
    while s < spp:
        flat = np.empty((n_rays, 3), np.float64)
        for b in range(n_strips):
            sl = slice(b * strip, (b + 1) * strip)
            # hostsync.fetch, NOT block_until_ready: the latter is
            # unreliable on the tunneled TPU runtime (utils/hostsync.py)
            flat[sl] = hostsync.fetch(jstrip(
                sc, cam, jnp.int32(s), jnp.asarray(pid_all[sl]),
                jnp.asarray(sid_all[sl])))
        pix = flat.reshape(-1, spp_per_pass, 3).sum(1)
        accum += pix[inv].reshape(height, width, 3)
        s += spp_per_pass
        if checkpoint and (s // spp_per_pass) % checkpoint_every == 0:
            ckpt.save_render_state(checkpoint, accum, s, seed)
        done = s - start_sample
        rate = done * width * height / max(time.time() - t0, 1e-9) / 1e6
        log(f"  sample {s}/{spp}  ({rate:.2f} Mcam-rays/s)")
    if checkpoint:
        ckpt.save_render_state(checkpoint, accum, s, seed)
    return accum / max(s, 1)
