"""Real-TPU hardware checks (auto-skip when no TPU is attached).

The CPU suite runs the Pallas kernels in interpret mode, which cannot
catch compiled-vs-XLA numerical drift (Mosaic may fuse FMAs differently
from the XLA recompute). These tests run the COMPILED kernel on the real
chip and pin down the claims the integrator relies on:

  * kernel nearest-hit t == the differentiable closed-form recompute on
    the winning segment (integrator/path.py's geometry-gradient path);
  * kernel nearest-hit == brute-force scan (t bit-equal, same winner
    under the (t, id) tie-break).

Run: `pytest tests/test_tpu_hardware.py` in an environment where
jax.devices() is a TPU (the CPU-pinned conftest is overridden here).
"""

import os

import numpy as np
import pytest

# the shared conftest pins JAX_PLATFORMS=cpu for the CI suite; this module
# needs the real chip, so it spawns nothing and just skips on CPU
import jax

if jax.devices()[0].platform == "cpu":
    pytest.skip("no TPU attached (CPU-pinned environment)",
                allow_module_level=True)

import jax.numpy as jnp

from scenes.generators import curly_hairball
from yhair_tpu.core import scene as jscene
from yhair_tpu.core.camera import camera_rays
from yhair_tpu.geometry import segments as seg
from yhair_tpu.ops import build_scene_clusters
from yhair_tpu.ops import intersect_kernel as ik
from yhair_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def hairball():
    scene_d, cam_d = curly_hairball(n_strands=600, n_seg=8)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc, cl, _ = build_scene_clusters(sc)
    width = height = 64
    pid = jnp.arange(width * height, dtype=jnp.int32)
    sid = jnp.zeros_like(pid)
    u = pmesh._ray_uniforms(jax.random.key(0), pid, sid, 1, jnp.float32)
    i = (pid % width).astype(jnp.float32)
    j = (pid // width).astype(jnp.float32)
    o, d = camera_rays(cam, width, height, i, j, u[:, :4])
    return sc, cl, o, d


def test_kernel_t_matches_recompute_bitexact(hairball):
    """ADVICE r2: the integrator swaps the kernel's t for the closed-form
    recompute; verify they are bit-equal ON HARDWARE (not interpret)."""
    sc, cl, o, d = hairball
    t, idx, hit = jax.jit(lambda o, d: ik.nearest_hit(o, d, cl))(o, d)
    s_re, _, _ = jax.jit(seg._closest_approach)(
        o, d, sc.segments.p0[idx], sc.segments.p1[idx])
    t_np = np.asarray(t)[np.asarray(hit)]
    s_np = np.asarray(s_re)[np.asarray(hit)]
    assert hit.sum() > 100
    ulp = np.abs(t_np - s_np) / np.maximum(np.abs(t_np), 1e-30)
    # expectation: bit-equal; tolerate a couple of FMA-fusion ulps if a
    # compiler version ever splits them differently
    assert float(ulp.max()) <= 4 * np.finfo(np.float32).eps, (
        f"kernel t vs recompute drift: max rel {ulp.max():.3e}")


def test_kernel_matches_bruteforce_on_hardware(hairball):
    sc, cl, o, d = hairball
    t_k, idx_k, hit_k = jax.jit(
        lambda o, d: ik.nearest_hit(o, d, cl))(o, d)
    segs = seg.Segments(p0=cl.s0[:, :3], p1=cl.s1[:, :3],
                        r0=cl.s0[:, 3], r1=cl.s1[:, 3])
    t_b, idx_b, hit_b = jax.jit(
        lambda o, d: seg.nearest_hit(o, d, segs, chunk=2048))(o, d)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_b))
    m = np.asarray(hit_k)
    np.testing.assert_array_equal(np.asarray(t_k)[m], np.asarray(t_b)[m])
    np.testing.assert_array_equal(np.asarray(idx_k)[m],
                                  np.asarray(idx_b)[m])
