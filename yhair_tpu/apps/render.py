"""Offline render CLI — the reference's `yscntrace` analogue
[U:apps/yscntrace/yscntrace.cpp] (SURVEY.md §2.9, §3.1).

  python -m yhair_tpu.apps.render --config 3 --resolution 256 --spp 16 \\
      --output out.png [--hdr out.pfm] [--sampler path|naive|eyelight] \\
      [--bounces 6] [--checkpoint render.ckpt] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(prog="yhair-render", description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON path")
    src.add_argument("--config", type=int, choices=range(1, 6),
                     help="builtin BASELINE ladder config 1-5")
    p.add_argument("--resolution", type=int, default=None,
                   help="square image size (default: config's)")
    p.add_argument("--samples", "--spp", dest="spp", type=int, default=None)
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--sampler", choices=["path", "naive", "eyelight"],
                   default="path")
    p.add_argument("--output", default="out.png")
    p.add_argument("--hdr", default=None, help="also save HDR (.pfm/.npy)")
    p.add_argument("--exposure", type=float, default=0.0)
    p.add_argument("--filmic", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--spp-per-pass", type=int, default=1)
    p.add_argument("--no-bvh", action="store_true")
    p.add_argument("--accel", choices=["auto", "cluster", "bvh", "brute"],
                   default="auto", help="intersection backend")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise at the first NaN-producing op "
                        "(utils/debug.py)")
    p.add_argument("--platform", default=None,
                   help="force jax platform (e.g. cpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import (build_device_scene, force_platform, load_scene,
                         progressive_render)
    force_platform(args.platform)
    if args.debug_nans:
        from ..utils.debug import enable_debug_nans
        enable_debug_nans()

    from ..io import image as img_io

    scene_d, cam_d = load_scene(args)
    if args.config is not None:
        from scenes.generators import CONFIGS
        cfg = CONFIGS[args.config]
        res = args.resolution or cfg["res"]
        spp = args.spp or cfg["spp"]
        depth = args.bounces or cfg["depth"]
    else:
        res = args.resolution or 256
        spp = args.spp or 16
        depth = args.bounces or 6

    t0 = time.time()
    sc, cam, nearest = build_device_scene(scene_d, cam_d,
                                          use_bvh=not args.no_bvh,
                                          accel=args.accel)
    print(f"scene: {sc.segments.p0.shape[0]} segments, "
          f"{sc.n_lights} lights; bvh={'on' if nearest else 'off'} "
          f"({time.time()-t0:.1f}s)")

    img = progressive_render(sc, cam, nearest, res, res, spp, depth,
                             seed=args.seed, sampler=args.sampler,
                             checkpoint=args.checkpoint,
                             spp_per_pass=args.spp_per_pass)
    img_io.save_png(args.output, img, exposure=args.exposure,
                    filmic=args.filmic)
    print(f"wrote {args.output} ({res}x{res}, {spp}spp, "
          f"{time.time()-t0:.1f}s total)")
    if args.hdr:
        img_io.save_hdr(args.hdr, img)
        print(f"wrote {args.hdr}")


if __name__ == "__main__":
    main()
