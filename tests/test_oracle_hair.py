"""Property tests for the numpy hair-BSDF oracle.

These are the pbrt-v3 hair tests (pbrt src/tests/hair.cpp — the strongest
public ground truth for this model, SURVEY.md §4): white furnace, sampled
furnace, per-sample weights, and pdf normalization. They validate the oracle
itself; the JAX implementation is then tested allclose against the oracle.
"""

import numpy as np
import pytest

from oracle.hair_bsdf import (HairBSDF, P_MAX, sigma_a_from_concentration,
                              sigma_a_from_reflectance)


def uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u2
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


@pytest.mark.parametrize("beta_m", [0.2, 0.4, 0.8])
@pytest.mark.parametrize("beta_n", [0.3, 0.6])
def test_white_furnace(beta_m, beta_n):
    """sigma_a = 0: uniform-sphere integral of f * |wi.z| must be ~1."""
    rng = np.random.default_rng(0)
    h = -1.0 + 0.4  # fixed h
    wo = uniform_sphere(rng.random(), rng.random())
    bsdf = HairBSDF(h=h, sigma_a=np.zeros(3), beta_m=beta_m, beta_n=beta_n)
    n = 200_000
    wi = uniform_sphere(rng.random(n), rng.random(n))
    f = bsdf.f(wo, wi)  # (n, 3)
    est = (f[:, 1] * np.abs(wi[:, 2])).mean() * 4.0 * np.pi
    assert est == pytest.approx(1.0, abs=0.05)


@pytest.mark.parametrize("beta_m", [0.1, 0.5, 0.9])
@pytest.mark.parametrize("beta_n", [0.2, 0.7])
def test_white_furnace_sampled(beta_m, beta_n):
    """Importance-sampled furnace: E[f * |wi.z| / pdf] = 1 almost exactly."""
    rng = np.random.default_rng(1)
    wo = uniform_sphere(rng.random(), rng.random())
    n = 30_000
    h = rng.uniform(-1, 1, size=n)
    bsdf = HairBSDF(h=h, sigma_a=np.zeros(3), beta_m=beta_m, beta_n=beta_n)
    u = rng.random((n, 4))
    f, wi, pdf = bsdf.sample_f(np.broadcast_to(wo, (n, 3)), u)
    ok = pdf > 0
    w = f[ok, 1] * np.abs(wi[ok, 2]) / pdf[ok]
    assert w.mean() == pytest.approx(1.0, abs=0.01)


def test_sampling_weights_unit():
    """With sigma_a = 0, each sample weight f*|cos|/pdf is exactly ~1
    (sum of A_p telescopes to 1)."""
    rng = np.random.default_rng(2)
    n = 20_000
    h = rng.uniform(-1, 1, size=n)
    bsdf = HairBSDF(h=h, sigma_a=np.zeros(3), beta_m=0.4, beta_n=0.4)
    wo = uniform_sphere(rng.random(n), rng.random(n))
    f, wi, pdf = bsdf.sample_f(wo, u=rng.random((n, 4)))
    ok = pdf > 1e-12
    w = f[ok, 0] * np.abs(wi[ok, 2]) / pdf[ok]
    np.testing.assert_allclose(w, 1.0, atol=5e-3)


@pytest.mark.parametrize("beta", [(0.3, 0.3), (0.7, 0.2)])
def test_pdf_normalized(beta):
    """Uniform-sphere integral of pdf(wo, .) must be 1."""
    beta_m, beta_n = beta
    rng = np.random.default_rng(3)
    wo = uniform_sphere(rng.random(), rng.random())
    bsdf = HairBSDF(h=0.25, sigma_a=np.array([0.3, 0.5, 1.2]),
                    beta_m=beta_m, beta_n=beta_n)
    n = 200_000
    wi = uniform_sphere(rng.random(n), rng.random(n))
    est = bsdf.pdf(wo, wi).mean() * 4.0 * np.pi
    assert est == pytest.approx(1.0, abs=0.05)


def test_sample_matches_pdf_histogram():
    """Empirical phi-marginal of sampled wi matches pdf-weighted marginal."""
    rng = np.random.default_rng(4)
    wo = np.array([0.3, np.sqrt(1 - 0.09), 0.0])
    bsdf = HairBSDF(h=-0.5, sigma_a=np.array([0.2, 0.2, 0.2]),
                    beta_m=0.5, beta_n=0.5)
    n = 400_000
    _, wi, _ = bsdf.sample_f(np.broadcast_to(wo, (n, 3)), rng.random((n, 4)))
    phi = np.arctan2(wi[:, 2], wi[:, 1])
    hist_emp, edges = np.histogram(phi, bins=32, range=(-np.pi, np.pi),
                                   density=True)
    # pdf-weighted marginal via uniform-sphere MC binned by phi
    wi_u = uniform_sphere(rng.random(n), rng.random(n))
    pdfs = bsdf.pdf(wo, wi_u)
    phi_u = np.arctan2(wi_u[:, 2], wi_u[:, 1])
    hist_pdf, _ = np.histogram(phi_u, bins=32, range=(-np.pi, np.pi),
                               weights=pdfs)
    hist_pdf = hist_pdf / hist_pdf.sum() / (edges[1] - edges[0])
    np.testing.assert_allclose(hist_emp, hist_pdf, atol=0.05)


def test_sigma_a_color_controls():
    s = sigma_a_from_concentration(1.3, 0.2)
    assert s.shape == (3,)
    assert (s > 0).all()
    # more eumelanin -> darker (larger absorption), blue absorbed most
    s2 = sigma_a_from_concentration(8.0, 0.2)
    assert (s2 > s).all() and s[2] > s[0]

    c = np.array([0.6, 0.3, 0.1])
    sa = sigma_a_from_reflectance(c, 0.3)
    assert sa.shape == (3,) and (sa >= 0).all()
    # darker requested color -> more absorption
    sa_dark = sigma_a_from_reflectance(c * 0.3, 0.3)
    assert (sa_dark > sa).all()


def test_f_finite_at_extremes():
    """Numerical hardening: grazing angles, h = +-1, tiny roughness."""
    bsdf = HairBSDF(h=np.array([-1.0, 1.0, 0.0]),
                    sigma_a=np.array([0.1, 0.2, 0.3]),
                    beta_m=0.05, beta_n=0.05)
    wo = np.array([[0.999, 0.04, 0.01]] * 3)
    wo = wo / np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = np.array([[-0.999, 0.01, 0.04]] * 3)
    wi = wi / np.linalg.norm(wi, axis=-1, keepdims=True)
    f = bsdf.f(wo, wi)
    assert np.isfinite(f).all()
    p = bsdf.pdf(wo, wi)
    assert np.isfinite(p).all()
