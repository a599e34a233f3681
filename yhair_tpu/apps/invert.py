"""Inverse-rendering CLI — recover hair parameters from a target image
(BASELINE config 5: optimize beta_m / beta_n / sigma_a by gradient descent
through the differentiable renderer; SURVEY.md §7 step 10).

  python -m yhair_tpu.apps.invert --config 3 --resolution 64 --spp 4 \\
      --steps 60 --params beta_m,beta_n,sigma_a \\
      [--target target.pfm] [--true-render] [--checkpoint invert.ckpt]

Without --target, the target image is rendered from the scene's true
parameters and the optimization starts from perturbed ones (the standard
synthetic-recovery benchmark).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(prog="yhair-invert", description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON path")
    src.add_argument("--config", type=int, choices=range(1, 6))
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--params", default="beta_m,beta_n,sigma_a",
                   help="comma list of hair params to optimize")
    p.add_argument("--target", default=None,
                   help="target HDR image (.pfm/.npy); default: self-render")
    p.add_argument("--pixel-batch", type=int, default=None,
                   help="stochastic minibatch: pixels sampled per step "
                        "(whole 128-pixel tiles; default: full image)")
    p.add_argument("--edge-softness", type=float, default=0.0,
                   help="soft strand silhouettes: enables the boundary "
                        "term of geometry gradients (try 0.3)")
    p.add_argument("--init-scale", type=float, default=1.8,
                   help="multiplicative perturbation of the initial params")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="recovered_params.json")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tb-logdir", default=None,
                   help="write TensorBoard scalars (loss, grad norms, "
                        "param trajectories, it/s) to this directory")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 2-4 "
                        "into this directory (view with TensorBoard)")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise at the first NaN-producing op "
                        "(utils/debug.py)")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import build_device_scene, force_platform, load_scene
    force_platform(args.platform)
    if args.debug_nans:
        from ..utils.debug import enable_debug_nans
        enable_debug_nans()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..io import image as img_io
    from ..parallel import mesh as pmesh
    from ..utils import checkpoint as ckpt

    scene_d, cam_d = load_scene(args)
    sc, cam, nearest = build_device_scene(scene_d, cam_d)
    res, spp, depth = args.resolution, args.spp, args.bounces

    # the synthetic target renders with the SAME edge_softness as the
    # optimization steps: a hard-edged target under a soft-edged forward
    # model biases recovered params at strand silhouettes (ADVICE r4)
    render = jax.jit(pmesh.render_fn(width=res, height=res, spp=spp,
                                     max_depth=depth,
                                     nearest_segments=nearest,
                                     edge_softness=args.edge_softness))
    if args.target:
        target = jnp.asarray(img_io.load_hdr(args.target), jnp.float32)
        assert target.shape == (res, res, 3), "target size mismatch"
    else:
        target = render(sc, cam, jax.random.key(args.seed))
        print("rendered synthetic target from true parameters")

    names = [s.strip() for s in args.params.split(",") if s.strip()]
    true_vals = {k: np.asarray(getattr(sc.hair, k)) for k in names}
    params = {k: jnp.asarray(true_vals[k] * args.init_scale, jnp.float32)
              for k in names}

    opt = optax.adam(args.lr)
    step = jax.jit(pmesh.train_step_fn(width=res, height=res, spp=spp,
                                       max_depth=depth,
                                       nearest_segments=nearest,
                                       optimizer=opt,
                                       pixel_batch=args.pixel_batch,
                                       edge_softness=args.edge_softness))
    opt_state = opt.init(params)
    start = 0
    if args.checkpoint and __import__("os").path.exists(args.checkpoint):
        params, opt_state, start, _seed = ckpt.load_train_state(
            args.checkpoint, params, opt_state)
        print(f"resumed at step {start}")

    tb = None
    if args.tb_logdir:
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(args.tb_logdir)

    t0 = time.time()
    for it in range(start, args.steps):
        if args.profile_dir and it == start + 2:
            jax.profiler.start_trace(args.profile_dir)
        key = jax.random.fold_in(jax.random.key(args.seed + 1), it)
        params, opt_state, loss, grads = step(params, opt_state, sc, cam,
                                              target, key)
        if args.profile_dir and it == start + 4:
            from ..utils import hostsync
            hostsync.sync(loss)
            jax.profiler.stop_trace()
            print(f"wrote profiler trace to {args.profile_dir}")
        if tb is not None:
            tb.add_scalar("loss", float(loss), it)
            tb.add_scalar("it_per_s",
                          (it - start + 1) / (time.time() - t0), it)
            for k, g in grads.items():
                tb.add_scalar(f"grad_norm/{k}",
                              float(jnp.linalg.norm(jnp.atleast_1d(g))),
                              it)
            for k, v in params.items():
                v = np.atleast_1d(np.asarray(v))
                for ci, vv in enumerate(v.reshape(-1)[:3]):
                    tb.add_scalar(f"param/{k}/{ci}", float(vv), it)
        if it % 10 == 0 or it == args.steps - 1:
            vals = {k: np.asarray(v).tolist() for k, v in params.items()}
            print(f"step {it:4d} loss {float(loss):.6f} "
                  f"({(it - start + 1) / (time.time() - t0):.2f} it/s) "
                  f"{json.dumps(vals)}")
        if args.checkpoint and it % 20 == 19:
            ckpt.save_train_state(args.checkpoint, params, opt_state, it + 1,
                                  args.seed)
    if tb is not None:
        tb.flush()
        tb.close()

    result = {
        "recovered": {k: np.asarray(v).tolist() for k, v in params.items()},
        "true": {k: true_vals[k].tolist() for k in names},
        "final_loss": float(loss),
        "steps": args.steps,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    for k in names:
        print(f"  {k}: true={true_vals[k]} recovered={np.asarray(params[k])}")


if __name__ == "__main__":
    main()
