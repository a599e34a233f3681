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
                       checkpoint_every=8, log=print, spp_per_pass=1):
    """Render spp samples in passes of spp_per_pass, accumulating on host.

    One jitted pass function is reused for every pass (sample index is a
    traced argument), so compile happens once. Returns (H, W, 3) image.
    Resumable via utils.checkpoint when `checkpoint` path is given.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel import mesh as pmesh
    from ..utils import checkpoint as ckpt

    accum = np.zeros((height, width, 3), np.float64)
    start_sample = 0
    if checkpoint and os.path.exists(checkpoint):
        st = ckpt.load_render_state(checkpoint)
        accum = st["accum"]
        start_sample = st["next_sample"]
        assert st["seed"] == seed, "checkpoint was rendered with another seed"
        log(f"resumed at sample {start_sample}")

    n_rays = width * height * spp_per_pass
    base = jax.random.key(seed)
    perm, inv = pmesh.tile_pixel_permutation(width, height)

    def render_pass(scene, camera, sample0):
        pid = jnp.asarray(np.repeat(perm, spp_per_pass).astype(np.int32))
        sid = sample0 + jnp.asarray(
            np.tile(np.arange(spp_per_pass, dtype=np.int32),
                    width * height))
        L = pmesh._trace_pixels(scene, camera, width, height, pid, sid,
                                base, max_depth, 2048, nearest, sampler)
        pix = L.reshape(-1, spp_per_pass, 3).sum(1)
        return pix[jnp.asarray(inv)].reshape(height, width, 3)

    jpass = jax.jit(render_pass)
    t0 = time.time()
    s = start_sample
    while s < spp:
        out = np.asarray(jax.block_until_ready(
            jpass(sc, cam, jnp.int32(s))))
        accum += out
        s += spp_per_pass
        if checkpoint and (s // spp_per_pass) % checkpoint_every == 0:
            ckpt.save_render_state(checkpoint, accum, s, seed)
        done = s - start_sample
        rate = done * width * height / max(time.time() - t0, 1e-9) / 1e6
        log(f"  sample {s}/{spp}  ({rate:.2f} Mcam-rays/s)")
    if checkpoint:
        ckpt.save_render_state(checkpoint, accum, s, seed)
    return accum / max(s, 1)
