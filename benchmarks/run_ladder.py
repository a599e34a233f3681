"""Run the BASELINE correctness ladder at spec and record golden artifacts.

BASELINE.md configs:
  1: single strand      64x64    4 spp  depth 2
  2: hair patch        128x128   8 spp  depth 2
  3: curly hairball    256x256  16 spp  depth 6
  4: scalp model       512x512  32 spp  depth 6
  5: furry bunny      1024x1024 64 spp  depth 6  + inverse rendering

For each rendered config this stores under goldens/:
  config{N}.pfm        full-res HDR (configs 1-4; config 5 stores a
                       256x256 box-downsample, the full render is 12 MB)
  config{N}_stats.json resolution/spp/depth, luminance stats, wall time,
                       camera-ray throughput, git revision

Config 5 additionally runs the inverse-rendering recovery at spec
resolution (stochastic 8192-pixel tile minibatches per step — see
parallel/mesh.py:train_step_fn) and stores recovered_params.json.

Run on the bench chip:   python benchmarks/run_ladder.py [configs...]
(defaults to 1 2 3 4 5; config 5 takes ~tens of minutes).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

GOLD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens")


def _stats(img):
    import numpy as np
    lum = img.mean(axis=-1)
    return {
        "mean": float(img.mean()),
        "max": float(img.max()),
        "p50_lum": float(np.percentile(lum, 50)),
        "p99_lum": float(np.percentile(lum, 99)),
        "nonzero_frac": float((lum > 1e-6).mean()),
        "finite": bool(np.isfinite(img).all()),
    }


def _git_rev():
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=os.path.dirname(GOLD)).stdout.strip()
    except Exception:
        return "unknown"


def render_config(n):
    import numpy as np

    from scenes.generators import CONFIGS
    from yhair_tpu.apps.common import build_device_scene, progressive_render
    from yhair_tpu.io import image as img_io
    from yhair_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = CONFIGS[n]
    scene_d, cam_d = cfg["fn"]()
    res, spp, depth = cfg["res"], cfg["spp"], cfg["depth"]
    print(f"== config {n}: {res}x{res} {spp}spp depth {depth}", flush=True)
    os.makedirs(GOLD, exist_ok=True)
    t0 = time.time()
    sc, cam, nearest = build_device_scene(scene_d, cam_d)
    print(f"   scene: {sc.segments.p0.shape[0]} segments "
          f"({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    img = progressive_render(
        sc, cam, nearest, res, res, spp, depth, seed=0,
        checkpoint=os.path.join(GOLD, f"config{n}.ckpt"),
        log=lambda m: print("  " + m, flush=True))
    dt = time.time() - t0
    img = np.asarray(img, np.float32)

    os.makedirs(GOLD, exist_ok=True)
    out = img
    if res > 512:
        f = res // 256
        out = img.reshape(256, f, 256, f, 3).mean((1, 3))
        # full-res HDR kept OUT of git (12 MB); the inverse run reads it
        img_io.save_pfm(os.path.join(GOLD, f"config{n}_full.pfm"), img)
    img_io.save_pfm(os.path.join(GOLD, f"config{n}.pfm"), out)
    img_io.save_png(os.path.join(GOLD, f"config{n}.png"), img)
    stats = {
        "config": n, "res": res, "spp": spp, "depth": depth,
        "stored_res": out.shape[0],
        "seconds": round(dt, 1),
        "mcam_rays_s": round(res * res * spp / dt / 1e6, 3),
        "git": _git_rev(),
        **_stats(img),
    }
    with open(os.path.join(GOLD, f"config{n}_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    ck = os.path.join(GOLD, f"config{n}.ckpt")
    if os.path.exists(ck):
        os.remove(ck)
    print(f"   done in {dt:.1f}s -> goldens/config{n}.pfm", flush=True)
    return img


def invert_config5():
    """Inverse rendering at config-5 spec: recover beta_m/beta_n/sigma_a
    of the bunny fur from the spec-resolution target."""
    from yhair_tpu.apps import invert

    target = os.path.join(GOLD, "config5_full.pfm")
    argv = ["--config", "5", "--resolution", "1024", "--spp", "64",
            "--bounces", "6", "--steps", "120", "--lr", "5e-2",
            "--pixel-batch", "2048",
            "--params", "beta_m,beta_n,sigma_a",
            "--target", target,
            "--out", os.path.join(GOLD, "config5_recovered.json"),
            "--checkpoint", os.path.join(GOLD, "config5_invert.ckpt")]
    print("== config 5 inverse:", " ".join(argv), flush=True)
    invert.main(argv)


def _with_retries(fn, *args, tries=3):
    """The tunneled TPU runtime occasionally raises transient
    INVALID_ARGUMENT runtime errors mid-render (utils/hostsync.py);
    renders checkpoint every few passes, so a retry resumes cheaply."""
    for k in range(tries):
        try:
            return fn(*args)
        except Exception as e:
            if k == tries - 1:
                raise
            print(f"!! attempt {k + 1} failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); retrying from checkpoint",
                  flush=True)
            time.sleep(10)


def main():
    which = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5]
    for n in which:
        if n <= 5:
            _with_retries(render_config, n)
    if 5 in which:
        _with_retries(invert_config5)


if __name__ == "__main__":
    main()
