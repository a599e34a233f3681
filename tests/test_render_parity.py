"""End-to-end render parity: JAX integrator vs the float64 oracle.

Both renderers consume the SAME uniforms tensor, so images must agree up to
f32 accumulation error plus rare sample-path divergences where a discrete
decision (lobe pick, RR) falls within f32 epsilon of its threshold.
This is BASELINE config-1 style: single strand, direct lighting + one
bounce (SURVEY.md §7 step 5 gate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle import pathtrace as opt
from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.integrator import path as jpath


def _render_pair(scene_dict, cam_dict, res, spp, depth, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random((res, res, spp, opt.n_uniform_dims(depth)))
    img_o = opt.render(scene_dict, cam_dict, u, max_depth=depth)
    sc = jscene.from_dict(scene_dict)
    cam = jscene.camera_from_dict(cam_dict)
    img_j = jax.jit(
        lambda s, c, uu: jpath.render(s, c, uu, max_depth=depth, chunk=256)
    )(sc, cam, jnp.asarray(u, jnp.float32))
    return img_o, np.asarray(img_j)


def test_single_strand_direct():
    scene, cam = gen.single_strand()
    img_o, img_j = _render_pair(scene, cam, res=48, spp=2, depth=2)
    diff = np.abs(img_o - img_j)
    # almost all pixels must match tightly; allow a tiny fraction of
    # sample-path divergences
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.995) < 5e-3
    assert diff.mean() < 5e-4


@pytest.mark.slow
def test_patch_with_plane_and_bounce():
    scene, cam = gen.hair_patch(n_strands=60)
    img_o, img_j = _render_pair(scene, cam, res=40, spp=2, depth=3, seed=1)
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 1e-2
    assert diff.mean() < 2e-3


def test_sphere_scene():
    scene, cam = gen.curly_hairball(n_strands=40, n_seg=6)
    img_o, img_j = _render_pair(scene, cam, res=32, spp=2, depth=4, seed=2)
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 2e-2
    assert diff.mean() < 3e-3


def test_thin_lens_dof_parity():
    """Aperture > 0: oracle and JAX must produce the same defocused image,
    and it must differ from the pinhole render."""
    scene, cam = gen.single_strand()
    cam_dof = dict(cam, aperture=0.12, focus_dist=2.2)
    img_o, img_j = _render_pair(scene, cam_dof, res=32, spp=2, depth=1,
                                seed=5)
    diff = np.abs(img_o - img_j)
    assert np.quantile(diff, 0.995) < 5e-3
    img_o_pin, _ = _render_pair(scene, cam, res=32, spp=2, depth=1, seed=5)
    assert np.abs(img_o - img_o_pin).max() > 1e-3


def test_surface_materials_parity():
    """Glossy + metal + emissive + thin-glass prims render identically in
    oracle and JAX (full material->BSDF lowering, SURVEY.md §2.7)."""
    scene, cam = gen.single_strand()
    scene = dict(
        scene,
        spheres=[
            {"center": [0.25, 0.0, -0.2], "radius": 0.18,
             "material": {"color": [0.8, 0.6, 0.2], "roughness": 0.25,
                          "metallic": 1.0}},
            {"center": [-0.3, 0.1, -0.1], "radius": 0.12,
             "material": {"emission": [4.0, 3.0, 2.0],
                          "color": [0, 0, 0]}},
            {"center": [0.0, -0.15, 0.25], "radius": 0.1,
             "material": {"color": [0.9, 0.9, 0.9], "roughness": 0.0,
                          "transmission": 1.0}},
        ],
        planes=[{"point": [0, -0.4, 0], "normal": [0, 1, 0],
                 "material": {"color": [0.5, 0.5, 0.55],
                              "roughness": 0.15}}])
    img_o, img_j = _render_pair(scene, cam, res=40, spp=2, depth=3, seed=9)
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 3e-2
    assert diff.mean() < 4e-3
    # the emissive sphere is actually visible
    assert img_o.max() > 2.0


def test_env_map_parity():
    """Image-based environment with importance sampling + MIS: JAX matches
    the oracle, and the env NEE actually contributes."""
    from oracle.envmap import gradient_sky
    scene, cam = gen.single_strand()
    scene = dict(scene, env_map=gradient_sky(h=16, w=32), point_lights=[])
    img_o, img_j = _render_pair(scene, cam, res=32, spp=2, depth=3, seed=7)
    diff = np.abs(img_o - img_j)
    assert np.isfinite(img_j).all()
    assert np.quantile(diff, 0.99) < 2e-2
    assert diff.mean() < 3e-3
    # sky visible: corner pixels see the gradient, not black
    assert img_o.max() > 0.3
