"""Native C++ cluster builder vs the numpy fallback."""

import numpy as np
import pytest

from scenes import generators as gen
from yhair_tpu.accel import native
from yhair_tpu.ops import clusters


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_native_structural_validity():
    scene_d, _ = gen.curly_hairball(n_strands=500, n_seg=8)
    p0, p1, r0, r1 = scene_d["segments"]
    out = native.build_clusters(p0, p1, r0, r1, cluster_size=128)
    n = p0.shape[0]
    k = 128
    c = out["n_clusters"]
    assert out["s0"].shape == (c * k, 4)
    # seg_index: permutation of [0, n) plus -1 padding
    idx = out["seg_index"]
    real = idx[idx >= 0]
    assert len(real) == n and len(np.unique(real)) == n
    # reordered rows match original segments
    np.testing.assert_allclose(out["s0"][:n, :3],
                               np.asarray(p0, np.float32)[real], atol=0)
    np.testing.assert_allclose(out["s0"][:n, 3],
                               np.asarray(r0, np.float32)[real], atol=0)
    # every cluster AABB contains its segments (inflated by radius)
    for ci in range(0, c, max(1, c // 8)):
        rows = slice(ci * k, ci * k + k)
        s0 = out["s0"][rows]
        s1 = out["s1"][rows]
        live = out["seg_index"][rows] >= 0
        if not live.any():
            assert (out["cmin"][ci] > 1e30).all()
            continue
        lo = np.minimum(s0[live, :3] - s0[live, 3:4],
                        s1[live, :3] - s1[live, 3:4]).min(0)
        hi = np.maximum(s0[live, :3] + s0[live, 3:4],
                        s1[live, :3] + s1[live, 3:4]).max(0)
        assert (out["cmin"][ci] <= lo + 1e-5).all()
        assert (out["cmax"][ci] >= hi - 1e-5).all()


@needs_native
def test_native_matches_numpy_hits():
    """Native and numpy builds may order ties differently, but the kernel
    must find identical nearest hits on both."""
    import jax.numpy as jnp
    from yhair_tpu.ops import intersect_kernel

    scene_d, _ = gen.curly_hairball(n_strands=200, n_seg=6)
    p0, p1, r0, r1 = scene_d["segments"]
    cl_nat = clusters.build(p0, p1, r0, r1, use_native=True)
    cl_np = clusters.build(p0, p1, r0, r1, use_native=False)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(512, 3)) * 2
    t = rng.normal(size=(512, 3)) * 0.2
    d = t - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    t_n, i_n, h_n = intersect_kernel.nearest_hit(o, d, cl_nat,
                                                 interpret=True)
    t_p, i_p, h_p = intersect_kernel.nearest_hit(o, d, cl_np,
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(h_n), np.asarray(h_p))
    np.testing.assert_allclose(np.asarray(t_n)[np.asarray(h_n)],
                               np.asarray(t_p)[np.asarray(h_p)],
                               rtol=1e-5, atol=1e-6)
    # winning ORIGINAL segment ids agree
    orig_n = np.asarray(cl_nat.seg_index)[np.asarray(i_n)][np.asarray(h_n)]
    orig_p = np.asarray(cl_np.seg_index)[np.asarray(i_p)][np.asarray(h_p)]
    assert (orig_n == orig_p).mean() > 0.999


@needs_native
def test_native_speed():
    rng = np.random.default_rng(1)
    n = 200_000
    p0 = rng.normal(size=(n, 3))
    p1 = p0 + rng.normal(size=(n, 3)) * 0.01
    r = rng.uniform(1e-3, 3e-3, n)
    import time
    t0 = time.time()
    native.build_clusters(p0, p1, r, r)
    dt = time.time() - t0
    assert dt < 2.0, f"native build too slow: {dt:.2f}s"
