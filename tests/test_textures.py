"""Texture parity: oracle (f64) vs JAX (f32) texture lookups end-to-end.

Covers SURVEY.md §2.5 `texture` / §2.6 image sampling (VERDICT r1 missing
#4): bilinear filtering, sphere/plane/mesh UVs, color + emission +
roughness modulation, and the bilinear env-map lookup.
"""

import numpy as np
import jax
import jax.numpy as jnp

from oracle import pathtrace as opt
from oracle.texture import (apply_textures, checkerboard, tex_bilinear,
                            uv_gradient)
from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.core.texture import flatten_textures, sample_bilinear
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


def test_bilinear_sampler_matches_oracle():
    imgs = [checkerboard(16, 24, tiles=4), uv_gradient(9, 7)]
    td, tm = flatten_textures(imgs)
    rng = np.random.default_rng(0)
    u = rng.random(400) * 2.0 - 0.5      # exercises wrap
    v = rng.random(400) * 1.4 - 0.2      # exercises clamp
    for ti, img in enumerate(imgs):
        a = tex_bilinear(img, u, v)
        b = np.asarray(sample_bilinear(
            td, tm, jnp.full(400, ti, jnp.int32),
            jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)))
        assert np.abs(a - b).max() < 1e-4


def test_negative_tid_is_neutral():
    td, tm = flatten_textures([uv_gradient(8, 8)])
    out = np.asarray(sample_bilinear(
        td, tm, jnp.full(5, -1, jnp.int32),
        jnp.linspace(0, 1, 5), jnp.linspace(0, 1, 5)))
    np.testing.assert_allclose(out, 1.0)


def test_apply_textures_multiplies():
    scene = {"textures": [{"data": uv_gradient(8, 8)}]}
    sp = {"color": np.full((3, 3), 0.5),
          "emission": np.zeros((3, 3)),
          "roughness": np.full(3, 0.8),
          "color_tex": np.array([0, -1, 0]),
          "emission_tex": np.full(3, -1),
          "roughness_tex": np.array([-1, -1, 0])}
    uv = np.array([[0.25, 0.5], [0.25, 0.5], [0.75, 0.25]])
    out = apply_textures(scene, sp, uv)
    tex = tex_bilinear(uv_gradient(8, 8), uv[:, 0], uv[:, 1])
    np.testing.assert_allclose(out["color"][0], 0.5 * tex[0])
    np.testing.assert_allclose(out["color"][1], 0.5)
    np.testing.assert_allclose(out["roughness"][2], 0.8 * tex[2].mean())


def test_textured_scene_parity():
    """Checker sphere + gradient plane + emissive-texture sphere: oracle
    and JAX renders of the same textured scene must agree."""
    scene, cam = gen.single_strand()
    scene = dict(
        scene,
        textures=[{"data": checkerboard(32, 32, tiles=6)},
                  {"data": uv_gradient(16, 16)}],
        spheres=[
            {"center": [0.25, 0.0, -0.2], "radius": 0.18,
             "material": {"color": [0.9, 0.9, 0.9], "roughness": 0.4,
                          "color_tex": 0}},
            {"center": [-0.3, 0.1, -0.1], "radius": 0.12,
             "material": {"emission": [4.0, 4.0, 4.0], "color": [0, 0, 0],
                          "emission_tex": 1}},
        ],
        planes=[{"point": [0, -0.4, 0], "normal": [0, 1, 0],
                 "material": {"color": [0.6, 0.6, 0.6], "roughness": 0.9,
                              "color_tex": 1, "roughness_tex": 1}}])
    img_o, img_j = _render_pair(scene, cam, res=40, spp=2, depth=3, seed=3)
    assert np.isfinite(img_j).all()
    diff = np.abs(img_o - img_j)
    assert np.quantile(diff, 0.99) < 1e-2
    assert diff.mean() < 2e-3
    # the textures must actually show: untextured render differs
    plain = dict(scene, textures=[])
    for part in ("spheres", "planes"):
        plain[part] = [dict(p, material={
            k: v for k, v in p["material"].items()
            if not k.endswith("_tex")}) for p in scene[part]]
    img_p, _ = _render_pair(plain, cam, res=40, spp=2, depth=3, seed=3)
    assert np.abs(img_p - img_o).max() > 1e-2


def test_mesh_texcoords_parity():
    scene, cam = gen.single_strand()
    quad = {
        "positions": [[-0.5, -0.3, -0.4], [0.5, -0.3, -0.4],
                      [0.5, 0.5, -0.4], [-0.5, 0.5, -0.4]],
        "triangles": [[0, 1, 2], [0, 2, 3]],
        "texcoords": [[0, 0], [1, 0], [1, 1], [0, 1]],
        "material": {"color": [1.0, 1.0, 1.0], "roughness": 1.0,
                     "specular": 0.0, "color_tex": 0},
    }
    scene = dict(scene, textures=[{"data": checkerboard(16, 16, tiles=4)}],
                 meshes=[quad])
    img_o, img_j = _render_pair(scene, cam, res=40, spp=2, depth=2, seed=4)
    assert np.isfinite(img_j).all()
    diff = np.abs(img_o - img_j)
    assert np.quantile(diff, 0.99) < 1e-2
    assert diff.mean() < 2e-3


def test_env_bilinear_parity():
    """Bilinear env-map eval matches between oracle and JAX (and differs
    from what a nearest lookup would give on a smooth gradient)."""
    from oracle.envmap import EnvMap, gradient_sky

    sky = gradient_sky(h=16, w=32)
    em = EnvMap(sky)
    rng = np.random.default_rng(1)
    d = rng.normal(size=(300, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    scene, cam = gen.single_strand()
    sc = jscene.from_dict(dict(scene, env_map=sky))
    from yhair_tpu.core.envmap import env_eval
    a = em.eval(d)
    b = np.asarray(jax.jit(env_eval)(sc, jnp.asarray(d, jnp.float32)))
    assert np.abs(a - b).max() < 1e-3
    # bilinear != nearest on a smooth sky
    x = np.minimum((em.pmf.size // em.w * 0 + (
        (np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi) + 0.5) % 1.0
        * em.w).astype(int)), em.w - 1)
    y = np.minimum((np.arccos(np.clip(d[:, 1], -1, 1)) / np.pi
                    * em.h).astype(int), em.h - 1)
    nearest = sky[y, x]
    assert np.abs(a - nearest).max() > 1e-3
