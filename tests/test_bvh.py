"""LBVH build + stackless traversal vs brute-force ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from scenes import generators as gen
from yhair_tpu.accel import build_scene_bvh, lbvh, traverse
from yhair_tpu.core import scene as jscene
from yhair_tpu.geometry import segments as seg
from yhair_tpu.integrator import path as jpath


def _random_rays(rng, n, radius=2.0):
    o = rng.normal(size=(n, 3)) * radius
    target = rng.normal(size=(n, 3)) * 0.2
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def test_skip_indices_small():
    sk = lbvh._skip_indices(16)
    # 1-based heap of 8 leaves: escape(2)=3, escape(3)=0, escape(5)=3,
    # escape(7)=0, escape(9)=5, escape(15)=0
    assert sk[1] == 0 and sk[2] == 3 and sk[3] == 0
    assert sk[5] == 3 and sk[7] == 0 and sk[9] == 5 and sk[15] == 0


def test_bvh_matches_bruteforce():
    scene_d, _ = gen.curly_hairball(n_strands=400, n_seg=8)
    sc = jscene.from_dict(scene_d)
    sc2, bvh, nearest = build_scene_bvh(sc)

    rng = np.random.default_rng(0)
    o, d = _random_rays(rng, 2048)
    t_b, idx_b, hit_b = jax.jit(
        lambda o, d: seg.nearest_hit(o, d, sc.segments, chunk=512))(o, d)
    t_v, idx_v, hit_v = jax.jit(nearest)(o, d)

    hit_b = np.asarray(hit_b)
    hit_v = np.asarray(hit_v)
    np.testing.assert_array_equal(hit_v, hit_b)
    np.testing.assert_allclose(np.asarray(t_v)[hit_v],
                               np.asarray(t_b)[hit_b], rtol=1e-5, atol=1e-6)
    # winning segment should be the same original segment (up to exact-tie)
    orig_v = np.asarray(bvh.seg_index)[np.asarray(idx_v)][hit_v]
    orig_b = np.asarray(idx_b)[hit_b]
    assert (orig_v == orig_b).mean() > 0.999


def test_bvh_render_parity_with_bruteforce():
    """Full integrator: BVH hook must reproduce brute-force renders."""
    scene_d, cam_d = gen.curly_hairball(n_strands=120, n_seg=6)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    rng = np.random.default_rng(1)
    from yhair_tpu.core.rng import n_uniform_dims
    u = jnp.asarray(rng.random((32, 32, 2, n_uniform_dims(3))), jnp.float32)

    img_bf = np.asarray(jax.jit(lambda: jpath.render(
        sc, cam, u, max_depth=3, chunk=512))())
    sc2, _, nearest = build_scene_bvh(sc)
    img_bvh = np.asarray(jax.jit(lambda: jpath.render(
        sc2, cam, u, max_depth=3, nearest_segments=nearest))())
    diff = np.abs(img_bvh - img_bf)
    # same geometry, different segment order: rare exact-tie flips may
    # diverge single sample paths
    assert np.quantile(diff, 0.999) < 1e-4
    assert diff.mean() < 1e-5


def test_bvh_padding_never_hits():
    # 3 segments -> padded leaves; rays through the padding region miss
    p0 = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float64)
    p1 = p0 + [0, 1, 0]
    r = np.full(3, 0.05)
    host = lbvh.build(p0, p1, r, r, leaf_size=4)
    bvh = traverse.DeviceBVH.from_host(host)
    o = jnp.asarray([[1e7, 1e7, -10.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, idx, hit, _ = traverse.nearest_hit(o, d, bvh)
    assert not bool(hit[0])
