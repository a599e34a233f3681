"""Mesh sharding: render must be bit-identical across device counts, and
the sharded inverse-rendering step must produce finite psum'd gradients.

Runs on the 8-virtual-device CPU backend (conftest.py). SURVEY.md §7 step 9:
1-chip and N-device runs share all code and must agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from scenes import generators as gen
from yhair_tpu.accel import build_scene_bvh
from yhair_tpu.core import scene as jscene
from yhair_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def small_scene():
    scene_d, cam_d = gen.curly_hairball(n_strands=80, n_seg=6)
    sc = jscene.from_dict(scene_d)
    cam = jscene.camera_from_dict(cam_d)
    sc2, _, nearest = build_scene_bvh(sc)
    return sc2, cam, nearest


@pytest.mark.slow
def test_render_matches_across_device_counts(small_scene):
    sc, cam, nearest = small_scene
    key = jax.random.key(7)
    kw = dict(width=32, height=32, spp=2, max_depth=3,
              nearest_segments=nearest)

    img1 = np.asarray(pmesh.render_fn(**kw)(sc, cam, key))
    mesh8 = pmesh.make_mesh(jax.devices())
    assert mesh8.devices.size == 8
    img8 = np.asarray(jax.jit(pmesh.render_fn(**kw, mesh=mesh8))(sc, cam,
                                                                 key))
    mesh2 = pmesh.make_mesh(jax.devices()[:2])
    img2 = np.asarray(jax.jit(pmesh.render_fn(**kw, mesh=mesh2))(sc, cam,
                                                                 key))
    assert np.isfinite(img1).all()
    # different device counts must be BIT-identical (counter-based RNG,
    # per-pixel accumulation is local to one device)
    np.testing.assert_array_equal(img8, img2)
    # sharded vs unsharded may differ by f32 fusion/reduction order, which
    # can flip a rare discrete decision (lobe pick/RR) on a sample path
    diff = np.abs(img8 - img1)
    assert np.quantile(diff, 0.999) < 5e-4
    assert diff.mean() < 5e-5
    assert img1.std() > 1e-3  # non-trivial image


@pytest.mark.slow
def test_sharded_train_step(small_scene):
    sc, cam, nearest = small_scene
    mesh = pmesh.make_mesh(jax.devices())
    opt = optax.adam(1e-2)
    step = pmesh.train_step_fn(width=16, height=16, spp=2, max_depth=2,
                               nearest_segments=nearest, mesh=mesh,
                               optimizer=opt)
    key = jax.random.key(0)
    target = pmesh.render_fn(width=16, height=16, spp=2, max_depth=2,
                             nearest_segments=nearest)(sc, cam, key)

    params = {"beta_m": jnp.float32(0.45),
              "sigma_a": jnp.asarray([0.3, 0.3, 0.3], jnp.float32)}
    opt_state = opt.init(params)
    params2, opt_state, loss, grads = jax.jit(step)(
        params, opt_state, sc, cam, target, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(grads["beta_m"]))
    assert abs(float(grads["beta_m"])) > 0
    # params moved
    assert float(params2["beta_m"]) != 0.45


@pytest.mark.slow
def test_train_reduces_loss(small_scene):
    """A few steps of the sharded step must reduce the loss toward the
    true parameters (mini inverse-rendering smoke)."""
    sc, cam, nearest = small_scene
    mesh = pmesh.make_mesh(jax.devices())
    opt = optax.adam(5e-2)
    step = jax.jit(pmesh.train_step_fn(width=16, height=16, spp=2,
                                       max_depth=2,
                                       nearest_segments=nearest, mesh=mesh,
                                       optimizer=opt))
    key = jax.random.key(0)
    target = pmesh.render_fn(width=16, height=16, spp=2, max_depth=2,
                             nearest_segments=nearest)(sc, cam, key)
    params = {"beta_m": jnp.float32(0.6)}
    opt_state = opt.init(params)
    losses = []
    for it in range(8):
        params, opt_state, loss, _ = step(params, opt_state, sc, cam,
                                          target, jax.random.key(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
