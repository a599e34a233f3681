"""Triangle-mesh geometry: oracle vs JAX intersection parity, smooth
normals, fur-on-mesh growth, and end-to-end render parity of a
mesh-bodied scene (the reference's `triangles` shape support,
SURVEY.md §2.2/§2.3 [U:libs/yocto/yocto_shape.h])."""

import numpy as np
import jax
import jax.numpy as jnp

from oracle import geometry as geo
from oracle import pathtrace as opt
from scenes import generators as gen
from yhair_tpu.geometry import triangles as jtri
import pytest


def _random_rays(n, seed=0, origin_box=1.5):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-origin_box, origin_box, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_triangle_intersect_parity():
    mesh = gen.icosphere(center=(0.1, -0.2, 0.3), radius=0.7, subdiv=2)
    pos, tri = mesh["positions"], mesh["triangles"]
    o, _ = _random_rays(512, seed=3)
    # aim at jittered points near the sphere so most rays hit
    rng = np.random.default_rng(33)
    aim = np.array([0.1, -0.2, 0.3]) + rng.normal(0, 0.4, (512, 3))
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ho = geo.intersect_triangles(o, d, pos[tri[:, 0]], pos[tri[:, 1]],
                                 pos[tri[:, 2]])

    tr = jtri.Triangles.from_meshes([mesh])
    t, idx, hit = jtri.nearest_hit(jnp.asarray(o, jnp.float32),
                                   jnp.asarray(d, jnp.float32), tr,
                                   chunk=128)
    t, idx, hit = map(np.asarray, (t, idx, hit))
    # hits agree except knife-edge cases within f32 epsilon of an edge
    assert (hit == ho["hit"]).mean() > 0.99
    both = hit & ho["hit"]
    assert both.sum() > 100
    assert np.allclose(t[both], ho["t"][both], atol=1e-4)
    assert (idx[both] == ho["tri"][both]).mean() > 0.99


def test_triangle_smooth_normals():
    """Interpolated normals on an icosphere approximate the analytic
    sphere normal much better than flat normals."""
    mesh = gen.icosphere(radius=1.0, subdiv=2)
    o, d = _random_rays(512, seed=4, origin_box=2.0)
    # only rays pointing at the sphere
    keep = np.sum(-o * d, -1) > 0
    o, d = o[keep], d[keep]
    tr = jtri.Triangles.from_meshes([mesh])
    of, df = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    t, idx, hit = jtri.nearest_hit(of, df, tr, chunk=256)
    sh = jtri.shade_info(of, df, idx, tr)
    t, hit = np.asarray(t), np.asarray(hit)
    assert hit.sum() > 50
    p = o + t[:, None] * d
    exact = p / np.linalg.norm(p, axis=-1, keepdims=True)
    sn = np.asarray(sh.normal)[hit]
    gn = np.asarray(sh.gnormal)[hit]
    err_smooth = np.abs(1 - np.sum(sn * exact[hit], -1)).mean()
    err_flat = np.abs(1 - np.sum(gn * exact[hit], -1)).mean()
    assert err_smooth < 0.2 * err_flat
    assert err_smooth < 2e-3


def test_fur_on_mesh_roots_on_surface():
    mesh = gen.icosphere(radius=0.5, subdiv=2)
    cp = gen.fur_on_mesh(mesh, 2000, rng=np.random.default_rng(1))
    assert cp.shape == (2000, 4, 3)
    r = np.linalg.norm(cp[:, 0], axis=-1)
    assert np.all(r < 0.5 + 1e-9)           # roots inside/on the sphere
    assert np.all(r > 0.5 * 0.95)           # ... but on the mesh shell
    tips = np.linalg.norm(cp[:, 3], axis=-1)
    assert np.all(tips > r)                  # strands grow outward


@pytest.mark.slow
def test_mesh_render_parity():
    """Mesh-bodied furry bunny renders identically in oracle and JAX."""
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.integrator import path as jpath

    scene, cam = gen.furry_bunny(n_strands=120, n_seg=4, subdiv=1)
    rng = np.random.default_rng(5)
    u = rng.random((32, 32, 2, opt.n_uniform_dims(3)))
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
    # the mesh body is actually visible (image not hair/plane only):
    # center pixels hit the bunny
    assert img_o[14:18, 14:18].mean() > 0.01
