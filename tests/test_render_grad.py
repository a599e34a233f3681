"""Pixel-gradient validation vs oracle finite differences.

The BASELINE headline gate: render + differentiate w.r.t. hair parameters
(beta_m, beta_n, sigma_a), `allclose` to the oracle (BASELINE.json:5).

Estimator note: the integrator uses detached sampling — gradients flow
through BSDF *evaluation* but not through sampled directions. For direct
lighting (light directions fixed) the detached and reparameterized
estimators coincide per-sample, so depth-1 pixel gradients must match
oracle finite differences tightly. For full paths both are unbiased for
the expectation but differ per-sample, so the multi-bounce check compares
scalar-loss gradients at an expectation level.
"""

import numpy as np
import jax
import jax.numpy as jnp

from oracle import pathtrace as opt
from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.integrator import path as jpath
import pytest


def _jax_grad_image(scene_dict, cam_dict, u, depth, wrt):
    sc = jscene.from_dict(scene_dict)
    cam = jscene.camera_from_dict(cam_dict)
    uu = jnp.asarray(u, jnp.float32)

    def loss_img(theta):
        hair = sc.hair._replace(**{wrt: theta})
        img = jpath.render(sc._replace(hair=hair), cam, uu, max_depth=depth,
                           chunk=256)
        return img

    theta0 = getattr(sc.hair, wrt)
    # full Jacobian d(img)/d(theta) via vjp on sum with per-pixel probes is
    # expensive; for scalar params use jacfwd
    return np.asarray(jax.jacfwd(loss_img)(theta0))


def _oracle_fd_image(scene_dict, cam_dict, u, depth, wrt, eps):
    def render_with(delta):
        m = dict(scene_dict["hair_material"])
        m[wrt] = m[wrt] + delta
        sc = dict(scene_dict, hair_material=m)
        return opt.render(sc, cam_dict, u, max_depth=depth)

    return (render_with(eps) - render_with(-eps)) / (2 * eps)


@pytest.mark.slow
def test_pixel_grads_direct_lighting():
    """Depth-1 (direct only): per-pixel d(img)/d(beta_m, beta_n) allclose."""
    scene, cam = gen.single_strand()
    rng = np.random.default_rng(0)
    res, spp, depth = 32, 2, 1
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))

    for wrt, eps in (("beta_m", 1e-3), ("beta_n", 1e-3)):
        g_jax = _jax_grad_image(scene, cam, u, depth, wrt)
        g_fd = _oracle_fd_image(scene, cam, u, depth, wrt, eps)
        scale = np.abs(g_fd).max() + 1e-6
        np.testing.assert_allclose(g_jax / scale, g_fd / scale, atol=2e-3,
                                   err_msg=wrt)
        # gradient must actually be nonzero on the strand
        assert np.abs(g_fd).max() > 1e-3


@pytest.mark.slow
def test_pixel_grads_sigma_a_direct():
    scene, cam = gen.single_strand()
    rng = np.random.default_rng(1)
    res, spp, depth = 24, 2, 1
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    uu = jnp.asarray(u, jnp.float32)

    def img_fn(sig):
        return jpath.render(sc._replace(hair=sc.hair._replace(sigma_a=sig)),
                            cam_j, uu, max_depth=depth, chunk=256)

    jac = np.asarray(jax.jacfwd(img_fn)(sc.hair.sigma_a))  # (H, W, 3, 3)
    for c in range(3):
        m = dict(scene["hair_material"])
        eps = 1e-3
        sp = np.array(m["sigma_a"], np.float64).copy()
        sm = sp.copy()
        sp[c] += eps
        sm[c] -= eps
        up = opt.render(dict(scene, hair_material=dict(m, sigma_a=sp)), cam,
                        u, max_depth=depth)
        dn = opt.render(dict(scene, hair_material=dict(m, sigma_a=sm)), cam,
                        u, max_depth=depth)
        fd = (up - dn) / (2 * eps)
        scale = np.abs(fd).max() + 1e-6
        np.testing.assert_allclose(jac[..., c] / scale, fd / scale,
                                   atol=2e-3)


@pytest.mark.slow
def test_pixel_grads_multibounce_detached():
    """Full path (depth 4, RR active): per-pixel d(img)/d(beta_m) vs the
    oracle's split-material finite differences (sampling frozen at base
    params == the detached estimator the integrator computes)."""
    scene, cam = gen.single_strand()
    rng = np.random.default_rng(2)
    res, spp, depth = 24, 4, 4
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    uu = jnp.asarray(u, jnp.float32)

    def img_fn(bm):
        return jpath.render(sc._replace(hair=sc.hair._replace(beta_m=bm)),
                            cam_j, uu, max_depth=depth, chunk=256)

    g_jax = np.asarray(jax.jacfwd(img_fn)(sc.hair.beta_m))

    eps = 1e-3
    m = dict(scene["hair_material"])

    def render_eval(delta):
        s = dict(scene,
                 hair_material_eval=dict(m, beta_m=m["beta_m"] + delta))
        return opt.render(s, cam, u, max_depth=depth)

    g_fd = (render_eval(eps) - render_eval(-eps)) / (2 * eps)
    scale = np.abs(g_fd).max() + 1e-6
    assert np.abs(g_fd).max() > 1e-3
    np.testing.assert_allclose(g_jax / scale, g_fd / scale, atol=5e-3)


@pytest.mark.slow
def test_pixel_grads_geometry_endpoints():
    """Geometry gradients (VERDICT r1 missing #1): d(img)/d(strand
    translation) vs oracle finite differences.

    The autodiff estimator carries only the interior term (the hit/miss
    indicator is detached), so the comparison masks out silhouette pixels,
    detected non-circularly by FD self-consistency: pixels where FD at eps
    and eps/2 disagree are dominated by the O(1/eps) visibility jump and
    are excluded. Interior pixels must match tightly and be nonzero.
    """
    scene, cam = gen.single_strand()
    rng = np.random.default_rng(3)
    res, spp, depth = 24, 2, 1
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    v = np.array([0.4, 0.2, 0.6])
    v /= np.linalg.norm(v)

    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    uu = jnp.asarray(u, jnp.float32)
    vj = jnp.asarray(v, jnp.float32)

    def img_fn(theta):
        segs = sc.segments._replace(p0=sc.segments.p0 + theta * vj,
                                    p1=sc.segments.p1 + theta * vj)
        return jpath.render(sc._replace(segments=segs), cam_j, uu,
                            max_depth=depth, chunk=256)

    g_jax = np.asarray(jax.jacfwd(img_fn)(jnp.float32(0.0)))

    def fd(eps):
        def render_with(delta):
            p0, p1, r0, r1 = scene["segments"]
            s = dict(scene, segments=(p0 + delta * v, p1 + delta * v,
                                      r0, r1))
            return opt.render(s, cam, u, max_depth=depth)
        return (render_with(eps) - render_with(-eps)) / (2 * eps)

    g1 = fd(2e-4)
    g2 = fd(1e-4)
    # silhouette mask: FD stable across eps halving (per-pixel, rel 5%)
    denom = np.maximum(np.abs(g1), np.abs(g2)).max(-1, keepdims=True)
    interior = (np.abs(g1 - g2).max(-1, keepdims=True)
                <= 0.05 * denom + 1e-3)
    interior = np.broadcast_to(interior, g1.shape)
    assert interior.mean() > 0.5, "mask degenerate"
    scale = np.abs(g2[interior]).max() + 1e-6
    assert np.abs(g2[interior]).max() > 1e-2, "geometry grad ~ 0"
    np.testing.assert_allclose(g_jax[interior] / scale,
                               g2[interior] / scale, atol=5e-3)


@pytest.mark.slow
def test_geometry_grads_cluster_kernel_path():
    """The Pallas cluster path must carry the same geometry gradients as
    the brute-force path (recompute-based backward: the kernel's discrete
    search is detached, t re-derived differentiably)."""
    from yhair_tpu.ops import build_scene_clusters

    scene, cam = gen.single_strand()
    rng = np.random.default_rng(4)
    res, spp, depth = 16, 2, 1
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    sc = jscene.from_dict(scene)
    cam_j = jscene.camera_from_dict(cam)
    uu = jnp.asarray(u, jnp.float32)
    v = jnp.asarray([0.4, 0.2, 0.6], jnp.float32)

    def grad_with(sc_used, nearest):
        def img_fn(theta):
            segs = sc_used.segments._replace(
                p0=sc_used.segments.p0 + theta * v,
                p1=sc_used.segments.p1 + theta * v)
            img = jpath.render(sc_used._replace(segments=segs), cam_j, uu,
                               max_depth=depth, chunk=256,
                               nearest_segments=nearest)
            return img
        return np.asarray(jax.jacfwd(img_fn)(jnp.float32(0.0)))

    g_brute = grad_with(sc, None)
    sc_cl, _cl, fn = build_scene_clusters(sc, interpret=True)
    g_kernel = grad_with(sc_cl, fn)
    assert np.abs(g_brute).max() > 1e-3
    np.testing.assert_allclose(g_kernel, g_brute, atol=1e-4)
