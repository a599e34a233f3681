"""Interactive progressive viewer — the reference's `yscnitrace` analogue
[U:apps/yscnitrace/] (SURVEY.md §2.10, VERDICT r1 missing #3).

The reference renders progressively into an OpenGL texture and restarts
accumulation when an ImGui slider edits the camera or a hair material.
The TPU-idiomatic analogue keeps the same loop without a GL stack: render
one pass per iteration, write the tonemapped preview PNG after every
pass, and WATCH AN EDITS FILE — a small JSON of camera / hair-material /
tonemap overrides. Any saved change is picked up at the next pass
boundary and restarts accumulation, exactly like the reference's
edit-restart loop (edited values ride through jit as traced scene/camera
leaves, so edits never recompile).

  python -m yhair_tpu.apps.view --config 3 --resolution 256 \
      --output /tmp/view.png --edits /tmp/edits.json

  # in another shell, live-edit:
  echo '{"beta_m": 0.1, "sigma_a": [0.2, 0.4, 0.9], "exposure": 1.0}' \
      > /tmp/edits.json

Supported edit keys: beta_m, beta_n, alpha, eta, sigma_a ([3]),
color ([3], converted via sigma_a_from_reflectance), melanin ([ce, cp]),
cam_from ([3]), cam_to ([3]), fov (deg), aperture, exposure, filmic.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(prog="yhair-view", description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON path")
    src.add_argument("--config", type=int, choices=range(1, 6))
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--sampler", choices=["path", "naive", "eyelight"],
                   default="path")
    p.add_argument("--output", default="view.png",
                   help="preview PNG, rewritten after every pass")
    p.add_argument("--edits", default=None,
                   help="JSON file watched for live parameter edits")
    p.add_argument("--spp-per-pass", type=int, default=1)
    p.add_argument("--max-spp", type=int, default=0,
                   help="stop after this many samples (0 = run forever)")
    p.add_argument("--max-passes", type=int, default=0,
                   help="stop after this many passes (0 = unlimited)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--accel", choices=["auto", "cluster", "bvh", "brute"],
                   default="auto")
    p.add_argument("--platform", default=None)
    return p


def _apply_edits(edits, sc, cam_d, tonemap):
    """Apply an edits dict -> (scene, cam_dict, tonemap). Unknown keys
    are reported, not fatal (a typo shouldn't kill the viewer)."""
    import jax.numpy as jnp

    from ..bsdf import hair as jh
    from ..core import scene as jscene

    hair = sc.hair
    cam_d = dict(cam_d)
    for k, v in edits.items():
        if k in ("beta_m", "beta_n", "alpha", "eta"):
            hair = hair._replace(**{k: jnp.float32(v)})
        elif k == "sigma_a":
            hair = hair._replace(sigma_a=jnp.asarray(v, jnp.float32))
        elif k == "color":
            hair = hair._replace(sigma_a=jh.sigma_a_from_reflectance(
                jnp.asarray(v, jnp.float32), hair.beta_n))
        elif k == "melanin":
            hair = hair._replace(sigma_a=jh.sigma_a_from_concentration(
                jnp.float32(v[0]), jnp.float32(v[1])))
        elif k == "cam_from":
            cam_d["position"] = list(map(float, v))
        elif k == "cam_to":
            cam_d["look_at"] = list(map(float, v))
        elif k == "fov":
            cam_d["vfov_deg"] = float(v)
        elif k == "aperture":
            cam_d["aperture"] = float(v)
        elif k == "exposure":
            tonemap["exposure"] = float(v)
        elif k == "filmic":
            tonemap["filmic"] = bool(v)
        else:
            print(f"  (ignoring unknown edit key {k!r})")
    return (sc._replace(hair=hair), cam_d,
            jscene.camera_from_dict(cam_d), tonemap)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import build_device_scene, force_platform, load_scene
    force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..io import image as img_io
    from ..parallel import mesh as pmesh
    from ..utils import compile_cache

    compile_cache.enable()
    scene_d, cam_d = load_scene(args)
    res = args.resolution
    sc, cam, nearest = build_device_scene(scene_d, cam_d, accel=args.accel)
    print(f"viewer: {sc.segments.p0.shape[0]} segments, {res}x{res}; "
          f"preview -> {args.output}"
          + (f", edits <- {args.edits}" if args.edits else ""))

    width = height = res
    perm, inv = pmesh.tile_pixel_permutation(width, height)
    base = jax.random.key(args.seed)
    spp_pp = args.spp_per_pass

    def render_pass(scene, camera, sample0):
        pid = jnp.asarray(np.repeat(perm, spp_pp).astype(np.int32))
        sid = sample0 + jnp.asarray(
            np.tile(np.arange(spp_pp, dtype=np.int32), width * height))
        L = pmesh._trace_pixels(scene, camera, width, height, pid, sid,
                                base, args.bounces, 2048, nearest,
                                args.sampler)
        pix = L.reshape(-1, spp_pp, 3).sum(1)
        return pix[jnp.asarray(inv)].reshape(height, width, 3)

    jpass = jax.jit(render_pass)
    tonemap = {"exposure": 0.0, "filmic": False}
    accum = np.zeros((height, width, 3), np.float64)
    s = 0
    n_pass = 0
    edits_mtime = None
    t0 = time.time()
    try:
        while True:
            # pick up edits at pass boundaries (the reference restarts
            # accumulation on any ImGui edit)
            if args.edits and os.path.exists(args.edits):
                m = os.path.getmtime(args.edits)
                if m != edits_mtime:
                    edits_mtime = m
                    try:
                        with open(args.edits) as f:
                            edits = json.load(f)
                    except (OSError, json.JSONDecodeError) as e:
                        print(f"  (edits unreadable: {e})")
                        edits = None
                    if edits is not None and n_pass > 0:
                        sc, cam_d, cam, tonemap = _apply_edits(
                            edits, sc, cam_d, tonemap)
                        accum[:] = 0.0
                        s = 0
                        t0 = time.time()
                        print(f"  edits applied: {sorted(edits)} — "
                              "accumulation restarted")
                    elif edits is not None:
                        sc, cam_d, cam, tonemap = _apply_edits(
                            edits, sc, cam_d, tonemap)

            from ..utils import hostsync
            out = hostsync.fetch(jpass(sc, cam, jnp.int32(s)))
            accum += out
            s += spp_pp
            n_pass += 1
            img = accum / max(s, 1)
            img_io.save_png(args.output, img,
                            exposure=tonemap["exposure"],
                            filmic=tonemap["filmic"])
            rate = s * width * height / max(time.time() - t0, 1e-9) / 1e6
            print(f"  pass {n_pass}: {s} spp ({rate:.2f} Mcam-rays/s)")
            if args.max_spp and s >= args.max_spp:
                break
            if args.max_passes and n_pass >= args.max_passes:
                break
    except KeyboardInterrupt:
        print("\nstopped")
    print(f"final preview: {args.output} ({s} spp)")


if __name__ == "__main__":
    main()
