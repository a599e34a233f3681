"""Area lights: emissive spheres / mesh triangles sampled by NEE with MIS
(the reference's init_lights element CDFs + sample_lights + MIS power
heuristic, SURVEY.md §2.7 [U:libs/yocto/yocto_trace.cpp])."""

import numpy as np
import jax
import jax.numpy as jnp

from oracle import pathtrace as opt
from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.integrator import path as jpath
import pytest


def _quad_mesh(p, ex, ey, material):
    """Rectangle light: 2 triangles spanning p + [0,ex] x [0,ey]."""
    p = np.asarray(p, np.float64)
    pos = np.stack([p, p + ex, p + ex + ey, p + ey])
    return {"positions": pos,
            "triangles": np.array([[0, 1, 2], [0, 2, 3]], np.int64),
            "material": material}


def _light_scene():
    scene, cam = gen.single_strand()
    scene = dict(
        scene,
        point_lights=[],
        environment=np.zeros(3),
        meshes=[_quad_mesh([-0.3, 0.45, -0.3],
                           np.array([0.6, 0.0, 0.0]),
                           np.array([0.0, 0.0, 0.6]),
                           {"emission": [6.0, 5.0, 4.0],
                            "color": [0, 0, 0]})],
        spheres=[{"center": [0.35, 0.0, 0.0], "radius": 0.06,
                  "material": {"emission": [3.0, 6.0, 9.0],
                               "color": [0, 0, 0]}}],
        planes=[{"point": [0, -0.4, 0], "normal": [0, 1, 0],
                 "albedo": [0.6, 0.55, 0.5]}])
    return scene, cam


def test_light_table():
    scene, _ = _light_scene()
    al = opt.scene_area_lights(scene)
    assert al is not None
    assert len(al["kind"]) == 3                 # 1 sphere + 2 triangles
    assert (al["kind"] == 1).sum() == 1
    np.testing.assert_allclose(al["cdf"][-1], 1.0)
    np.testing.assert_allclose(al["area"][al["kind"] == 0], 0.18)
    assert al["sph_light_id"][0] == 0
    np.testing.assert_array_equal(al["tri_light_id"], [1, 2])


def test_area_light_parity():
    """Oracle and JAX agree on an area-light-only scene."""
    scene, cam = _light_scene()
    rng = np.random.default_rng(3)
    u = rng.random((40, 40, 2, opt.n_uniform_dims(3)))
    img_o = opt.render(scene, cam, u, max_depth=3)
    sc = jscene.from_dict(scene)
    c = jscene.camera_from_dict(cam)
    img_j = np.asarray(jax.jit(
        lambda s, cc, uu: jpath.render(s, cc, uu, max_depth=3, chunk=256)
    )(sc, c, jnp.asarray(u, jnp.float32)))
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 2e-2
    assert diff.mean() < 3e-3
    # the lights actually illuminate the floor
    assert img_o[30:, :, :].mean() > 0.05


@pytest.mark.slow
def test_nee_matches_naive():
    """NEE + MIS must estimate the same image as naive BSDF-only sampling
    (unbiasedness of the light-sampling + MIS weights), with NEE far less
    noisy on the floor."""
    scene, cam = _light_scene()
    sc = jscene.from_dict(scene)
    c = jscene.camera_from_dict(cam)
    res, spp, depth = 24, 196, 2
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.random((res, res, spp, opt.n_uniform_dims(depth))),
                    jnp.float32)
    fn = jax.jit(lambda s, cc, uu, smp: jpath.render(
        s, cc, uu, max_depth=depth, chunk=256, sampler=smp),
        static_argnames="smp")
    img_path = np.asarray(fn(sc, c, u, "path"))
    img_naive = np.asarray(fn(sc, c, u, "naive"))
    # compare mean illumination over the diffuse floor region
    a = img_path[16:, :, :].mean()
    b = img_naive[16:, :, :].mean()
    assert abs(a - b) / max(a, b) < 0.15
    # and overall image means agree
    assert abs(img_path.mean() - img_naive.mean()) \
        / max(img_path.mean(), 1e-9) < 0.15


def test_textured_emission_nee_parity():
    """Emission textures on area lights: NEE must evaluate the emission
    texture at the SAMPLED light point (ADVICE r3 medium — it used to use
    the untextured constant, so 'path' and 'naive' converged to different
    images). Checks (a) oracle/JAX parity on a textured-emission scene
    and (b) a constant 0.5 texture exactly halves the NEE contribution."""
    from oracle.texture import uv_gradient

    scene, cam = _light_scene()
    quad = scene["meshes"][0]
    # give the quad texcoords + a smooth emission texture
    quad = dict(quad, texcoords=np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]))
    quad["material"] = dict(quad["material"], emission_tex=0)
    scene_tex = dict(scene, meshes=[quad],
                     textures=[{"data": uv_gradient(16, 16)}])

    rng = np.random.default_rng(7)
    u = rng.random((24, 24, 2, opt.n_uniform_dims(2)))
    img_o = opt.render(scene_tex, cam, u, max_depth=2)
    sc = jscene.from_dict(scene_tex)
    c = jscene.camera_from_dict(cam)
    img_j = np.asarray(jax.jit(
        lambda s, cc, uu: jpath.render(s, cc, uu, max_depth=2, chunk=256)
    )(sc, c, jnp.asarray(u, jnp.float32)))
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 2e-2

    # constant half-gray texture == halved constant emission, exactly.
    # Quad-only light (the sphere's RELATIVE power would change the
    # element-selection pmf between the two scenes otherwise).
    base = dict(scene, spheres=[])
    half = dict(base, meshes=[quad],
                textures=[{"data": np.full((4, 4, 3), 0.5)}])
    halved_quad = dict(quad)
    halved_quad["material"] = dict(quad["material"],
                                   emission=[3.0, 2.5, 2.0])
    halved_quad["material"].pop("emission_tex")
    img_tex = opt.render(half, cam, u, max_depth=2)
    img_half = opt.render(dict(base, meshes=[halved_quad]), cam, u,
                          max_depth=2)
    np.testing.assert_allclose(img_tex, img_half, atol=1e-9)
