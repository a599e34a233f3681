"""Sanitizer integration (SURVEY.md §5: chex + jax_debug_nans row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yhair_tpu.utils import debug


def test_assert_finite_disabled_is_noop():
    debug.enable_finite_checks(False)
    debug.assert_finite(jnp.asarray(float("nan")), "ignored")


def test_assert_finite_concrete():
    debug.enable_finite_checks(True)
    try:
        debug.assert_finite({"a": jnp.ones(3)}, "ok")
        with pytest.raises(AssertionError):
            debug.assert_finite(jnp.asarray(float("inf")), "bad")
    finally:
        debug.enable_finite_checks(False)


def test_assert_finite_under_jit():
    debug.enable_finite_checks(True)
    try:
        @jax.jit
        def f(x):
            debug.assert_finite(x, "x")
            return x * 2

        assert float(f(jnp.float32(3.0))) == 6.0
        with pytest.raises(Exception, match="non-finite|callback"):
            np.asarray(f(jnp.float32(float("nan"))))
    finally:
        debug.enable_finite_checks(False)
        jax.clear_caches()


def test_train_step_runs_with_checks_on(monkeypatch):
    """The invert train step with YHAIR_CHECK_FINITE on must not break
    on healthy gradients (wiring test; parallel/mesh.py)."""
    import optax

    from scenes import generators as gen
    from yhair_tpu.core import scene as jscene
    from yhair_tpu.parallel import mesh as pmesh

    debug.enable_finite_checks(True)
    try:
        scene, cam = gen.single_strand()
        sc = jscene.from_dict(scene)
        cam_j = jscene.camera_from_dict(cam)
        opt = optax.adam(1e-2)
        step = jax.jit(pmesh.train_step_fn(width=16, height=16, spp=1,
                                           max_depth=2, optimizer=opt))
        target = pmesh.render_fn(width=16, height=16, spp=1,
                                 max_depth=2)(sc, cam_j, jax.random.key(0))
        params = {"beta_m": jnp.float32(0.4)}
        st = opt.init(params)
        params, st, loss, grads = step(params, st, sc, cam_j, target,
                                       jax.random.key(1))
        assert np.isfinite(float(loss))
    finally:
        debug.enable_finite_checks(False)
        jax.clear_caches()
