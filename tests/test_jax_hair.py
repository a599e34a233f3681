"""JAX hair BSDF vs the float64 oracle: values, sampling, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle.hair_bsdf import HairBSDF
from yhair_tpu.bsdf import hair as jh


def _rand_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _setup(n=4096, seed=0, beta_m=0.3, beta_n=0.35, sigma_a=(0.2, 0.4, 0.8)):
    rng = np.random.default_rng(seed)
    h = rng.uniform(-0.98, 0.98, n)
    wo = _rand_dirs(rng, n)
    wi = _rand_dirs(rng, n)
    oracle = HairBSDF(h=h, sigma_a=np.array(sigma_a), beta_m=beta_m,
                      beta_n=beta_n)
    mat = jh.HairMaterial.make(sigma_a=np.array(sigma_a), beta_m=beta_m,
                               beta_n=beta_n)
    return rng, h, wo, wi, oracle, mat


def test_f_matches_oracle():
    _, h, wo, wi, oracle, mat = _setup()
    want = oracle.f(wo, wi)
    got = jax.jit(jh.hair_f)(mat, jnp.asarray(h, jnp.float32),
                             jnp.asarray(wo, jnp.float32),
                             jnp.asarray(wi, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_pdf_matches_oracle():
    _, h, wo, wi, oracle, mat = _setup(seed=1)
    want = oracle.pdf(wo, wi)
    got = jax.jit(jh.hair_pdf)(mat, jnp.asarray(h, jnp.float32),
                               jnp.asarray(wo, jnp.float32),
                               jnp.asarray(wi, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_sample_matches_oracle():
    rng, h, wo, _, oracle, mat = _setup(seed=2, n=2048)
    u = rng.random((2048, 4))
    f_o, wi_o, pdf_o = oracle.sample_f(wo, u)
    wi_j, f_j, pdf_j = jax.jit(jh.hair_sample)(
        mat, jnp.asarray(h, jnp.float32), jnp.asarray(wo, jnp.float32),
        jnp.asarray(u, jnp.float32))
    # lobe choice can differ only when u0 sits within f32 eps of a cdf edge
    same = np.abs(np.asarray(wi_j) - wi_o).max(axis=-1) < 1e-3
    assert same.mean() > 0.995
    np.testing.assert_allclose(np.asarray(pdf_j)[same], pdf_o[same],
                               rtol=5e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_j)[same], f_o[same],
                               rtol=5e-3, atol=2e-4)


def test_furnace_jax():
    """Energy conservation holds for the f32 JAX implementation directly."""
    rng = np.random.default_rng(3)
    n = 30_000
    h = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    wo = jnp.asarray(_rand_dirs(rng, n), jnp.float32)
    u = jnp.asarray(rng.random((n, 4)), jnp.float32)
    mat = jh.HairMaterial.make(sigma_a=np.zeros(3), beta_m=0.4, beta_n=0.4)
    wi, f, pdf = jax.jit(jh.hair_sample)(mat, h, wo, u)
    w = np.asarray(f[:, 0] * jnp.abs(wi[:, 2]) / jnp.maximum(pdf, 1e-12))
    ok = np.asarray(pdf) > 1e-9
    assert np.abs(w[ok].mean() - 1.0) < 0.01


def test_grad_beta_matches_fd():
    """d/d(beta_m, beta_n, sigma_a) of mean f matches oracle finite diff."""
    rng, h, wo, wi, _, _ = _setup(seed=4, n=512)

    def mean_f(beta_m, beta_n, sigma_a):
        mat = jh.HairMaterial.make(sigma_a=sigma_a, beta_m=beta_m,
                                   beta_n=beta_n)
        return jh.hair_f(mat, jnp.asarray(h, jnp.float32),
                         jnp.asarray(wo, jnp.float32),
                         jnp.asarray(wi, jnp.float32)).mean()

    g = jax.grad(mean_f, argnums=(0, 1, 2))(
        jnp.float32(0.3), jnp.float32(0.35),
        jnp.asarray([0.2, 0.4, 0.8], jnp.float32))

    def oracle_mean(beta_m, beta_n, sigma_a):
        return HairBSDF(h=h, sigma_a=sigma_a, beta_m=beta_m,
                        beta_n=beta_n).f(wo, wi).mean()

    eps = 1e-4
    fd_m = (oracle_mean(0.3 + eps, 0.35, np.array([0.2, 0.4, 0.8]))
            - oracle_mean(0.3 - eps, 0.35, np.array([0.2, 0.4, 0.8]))) / (2 * eps)
    fd_n = (oracle_mean(0.3, 0.35 + eps, np.array([0.2, 0.4, 0.8]))
            - oracle_mean(0.3, 0.35 - eps, np.array([0.2, 0.4, 0.8]))) / (2 * eps)
    assert np.abs(float(g[0]) - fd_m) < 2e-2 * max(1.0, abs(fd_m))
    assert np.abs(float(g[1]) - fd_n) < 2e-2 * max(1.0, abs(fd_n))
    # sigma_a gradient: FD per channel
    for c in range(3):
        sa = np.array([0.2, 0.4, 0.8])
        sp, sm = sa.copy(), sa.copy()
        sp[c] += eps
        sm[c] -= eps
        fd_c = (oracle_mean(0.3, 0.35, sp) - oracle_mean(0.3, 0.35, sm)) / (2 * eps)
        assert np.abs(float(g[2][c]) - fd_c) < 2e-2 * max(1.0, abs(fd_c))


def test_melanin_helpers_match():
    from oracle.hair_bsdf import (sigma_a_from_concentration as o_conc,
                                  sigma_a_from_reflectance as o_refl)
    np.testing.assert_allclose(
        np.asarray(jh.sigma_a_from_concentration(1.3, 0.2)),
        o_conc(1.3, 0.2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jh.sigma_a_from_reflectance(jnp.array([0.6, 0.3, 0.1]), 0.3)),
        o_refl(np.array([0.6, 0.3, 0.1]), 0.3), rtol=1e-5)


def test_extremes_finite_f32():
    mat = jh.HairMaterial.make(sigma_a=np.array([0.1, 0.2, 0.3]),
                               beta_m=0.05, beta_n=0.05)
    h = jnp.asarray([-1.0, 1.0, 0.0, 0.999], jnp.float32)
    wo = jnp.tile(jnp.asarray([[0.999, 0.0447, 0.001]], jnp.float32), (4, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.tile(jnp.asarray([[-0.999, 0.001, 0.0447]], jnp.float32), (4, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    f = jh.hair_f(mat, h, wo, wi)
    p = jh.hair_pdf(mat, h, wo, wi)
    assert bool(jnp.isfinite(f).all()) and bool(jnp.isfinite(p).all())
    g = jax.grad(lambda bm: jh.hair_f(
        mat._replace(beta_m=bm), h, wo, wi).sum())(jnp.float32(0.05))
    assert bool(jnp.isfinite(g))
