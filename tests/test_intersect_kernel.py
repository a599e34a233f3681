"""Pallas cluster-intersection kernel vs brute force (interpret mode on
CPU; the real-TPU path is exercised by bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.geometry import segments as seg
from yhair_tpu.integrator import path as jpath
from yhair_tpu.ops import build_scene_clusters


@pytest.fixture(scope="module")
def setup():
    scene_d, cam_d = gen.curly_hairball(n_strands=300, n_seg=8)
    sc = jscene.from_dict(scene_d)
    sc2, cl, nearest = build_scene_clusters(sc, interpret=True)
    return sc, sc2, cl, nearest, cam_d


def _random_rays(rng, n, radius=2.0):
    o = rng.normal(size=(n, 3)) * radius
    target = rng.normal(size=(n, 3)) * 0.2
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def test_kernel_matches_bruteforce(setup):
    """Kernel vs brute-force scan must agree EXACTLY: both use the same
    per-axis f32 arithmetic and the same lexicographic (t, original id)
    tie-break, so t is bitwise equal and the winning segment identical
    even at strand-vertex junction ties."""
    sc, sc2, cl, nearest, _ = setup
    rng = np.random.default_rng(0)
    o, d = _random_rays(rng, 1024)
    t_k, idx_k, hit_k = nearest(o, d)
    # brute force over the SAME reordered segments for index comparability
    t_b, idx_b, hit_b = seg.nearest_hit(o, d, sc2.segments, chunk=512,
                                        ids=cl.seg_index)

    hit_k = np.asarray(hit_k)
    hit_b = np.asarray(hit_b)
    np.testing.assert_array_equal(hit_k, hit_b)
    np.testing.assert_array_equal(np.asarray(t_k)[hit_k],
                                  np.asarray(t_b)[hit_b])
    np.testing.assert_array_equal(np.asarray(idx_k)[hit_k],
                                  np.asarray(idx_b)[hit_b])


def test_kernel_ray_padding(setup):
    """Batch size not a multiple of the block must still work."""
    _, sc2, cl, nearest, _ = setup
    rng = np.random.default_rng(1)
    o, d = _random_rays(rng, 100)
    t, idx, hit = nearest(o, d)
    t_b, _, hit_b = seg.nearest_hit(o, d, sc2.segments, chunk=512)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_b))
    np.testing.assert_allclose(np.asarray(t)[np.asarray(hit)],
                               np.asarray(t_b)[np.asarray(hit_b)],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_kernel_render_parity(setup):
    sc, sc2, cl, nearest, cam_d = setup
    cam = jscene.camera_from_dict(cam_d)
    rng = np.random.default_rng(2)
    from yhair_tpu.core.rng import n_uniform_dims
    u = jnp.asarray(rng.random((24, 24, 2, n_uniform_dims(3))), jnp.float32)
    img_bf = np.asarray(jpath.render(sc, cam, u, max_depth=3, chunk=512))
    img_k = np.asarray(jpath.render(sc2, cam, u, max_depth=3,
                                    nearest_segments=nearest))
    diff = np.abs(img_k - img_bf)
    # same per-axis arithmetic + (t, original id) tie-break in both paths:
    # winners match even at junction ties, so the renders agree to noise
    # (bit-exact on CPU; tiny atol headroom for platform FMA differences)
    assert np.isfinite(img_k).all()
    assert diff.max() < 1e-5


def test_any_hit_matches_nearest(setup):
    """any_hit must equal (nearest t < t_max) for the same rays."""
    import jax.numpy as jnp
    from yhair_tpu.ops import intersect_kernel as ik

    _, sc2, cl, nearest, _ = setup
    rng = np.random.default_rng(3)
    o, d = _random_rays(rng, 512)
    t_max = jnp.asarray(rng.uniform(0.5, 4.0, 512), jnp.float32)
    occ = ik.make_occluded_fn(cl, interpret=True)(o, d, t_max)
    t, _, hit = nearest(o, d)
    want = np.asarray(hit) & (np.asarray(t) < np.asarray(t_max))
    np.testing.assert_array_equal(np.asarray(occ), want)


def test_streaming_matches_resident(setup):
    """The HBM-streaming (double-buffered DMA) kernel variant must agree
    with the VMEM-resident one bit-for-bit (it runs the same tests in the
    same front-to-back order)."""
    from yhair_tpu.ops import intersect_kernel as ik

    sc, sc2, cl, nearest, _ = setup
    rng = np.random.default_rng(7)
    o, d = _random_rays(rng, 512)
    t_r, idx_r, hit_r = ik.make_nearest_fn(cl, interpret=True,
                                           stream=False)(o, d)
    occ_r = ik.make_occluded_fn(cl, interpret=True, stream=False)(
        o, d, jnp.full(o.shape[:1], 0.9 * np.asarray(t_r)))

    t_s, idx_s, hit_s = ik.make_nearest_fn(cl, interpret=True,
                                           stream=True)(o, d)
    occ_s = ik.make_occluded_fn(cl, interpret=True, stream=True)(
        o, d, jnp.full(o.shape[:1], 0.9 * np.asarray(t_r)))

    np.testing.assert_array_equal(np.asarray(hit_r), np.asarray(hit_s))
    np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(idx_s))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))
