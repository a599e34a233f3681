"""Surface BSDF: oracle self-consistency + JAX/oracle parity.

Mirrors the property-test strategy used for the hair BSDF (SURVEY.md §4):
pdf normalization, sample/eval consistency, energy conservation, and the
JAX implementation matching the float64 oracle.
"""

import numpy as np
import pytest

from oracle import surface_bsdf as osb

MATS = {
    "matte": dict(color=(0.7, 0.5, 0.3), roughness=1.0),
    "glossy": dict(color=(0.6, 0.2, 0.2), roughness=0.2, ior=1.5),
    "rough_metal": dict(color=(0.9, 0.7, 0.4), roughness=0.3, metallic=1.0),
    "thin_glass_rough": dict(color=(0.9, 0.9, 0.9), roughness=0.15,
                             transmission=1.0),
    "mixed": dict(color=(0.5, 0.6, 0.7), roughness=0.4, metallic=0.3,
                  transmission=0.2),
}
DELTA_MATS = {
    "mirror": dict(color=(0.9, 0.9, 0.9), roughness=0.0, metallic=1.0),
    "thin_glass": dict(color=(1.0, 1.0, 1.0), roughness=0.0,
                       transmission=1.0),
    "plastic": dict(color=(0.6, 0.1, 0.1), roughness=0.0),
}


def _wo(n, rng):
    z = rng.uniform(0.05, 1.0, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(1 - z ** 2)
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], -1)


def _sphere_dirs(n, rng):
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(np.maximum(1 - z ** 2, 0))
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], -1)


@pytest.mark.parametrize("name", sorted(MATS))
def test_pdf_integrates_to_one(name):
    """∫ pdf dω = 1 (midpoint quadrature in (cosθ, φ) — deterministic, so
    it resolves sharply peaked GGX lobes that uniform MC cannot)."""
    nt, nf = 2000, 1000
    mat = osb.make_material(**MATS[name])
    ct = -1.0 + (np.arange(nt) + 0.5) * (2.0 / nt)
    phi = (np.arange(nf) + 0.5) * (2.0 * np.pi / nf)
    st = np.sqrt(np.maximum(1.0 - ct ** 2, 0.0))
    wo = np.array([0.4, 0.1, np.sqrt(1 - 0.17)])
    integral = 0.0
    for f in phi:  # stream over φ to keep memory flat
        wi = np.stack([st * np.cos(f), st * np.sin(f), ct], -1)
        pdf = osb.surface_pdf(mat, np.broadcast_to(wo, (nt, 3)), wi)
        integral += pdf.sum()
    integral *= (2.0 / nt) * (2.0 * np.pi / nf)
    assert abs(integral - 1.0) < 0.02, (name, integral)


@pytest.mark.parametrize("name", sorted(MATS))
def test_sample_pdf_consistency(name):
    """E_sampled[g/pdf] == E_uniform[g] for g = f·|cos| (same measure)."""
    rng = np.random.default_rng(5)
    n = 400_000
    mat = osb.make_material(**MATS[name])
    wo = np.broadcast_to(np.array([0.3, -0.2, np.sqrt(1 - 0.13)]), (n, 3))
    u = rng.uniform(size=(n, 3))
    wi, weight, pdf, is_delta = osb.sample_surface(mat, wo, u)
    assert not is_delta.any()
    est_sampled = weight.mean(0)  # = E[f|cos|/pdf]
    wi_u = _sphere_dirs(n, rng)
    f_u = osb.surface_f(mat, wo, wi_u) * np.abs(wi_u[:, 2:3])
    est_uniform = f_u.mean(0) * 4 * np.pi
    assert np.allclose(est_sampled, est_uniform, rtol=0.05, atol=5e-3), (
        name, est_sampled, est_uniform)


@pytest.mark.parametrize("name", sorted(MATS) + sorted(DELTA_MATS))
def test_energy_conservation(name):
    """Total sampled throughput ≤ 1 + tol (white-furnace upper bound)."""
    rng = np.random.default_rng(7)
    n = 200_000
    spec = {**(MATS.get(name) or DELTA_MATS[name])}
    spec["color"] = (1.0, 1.0, 1.0)
    mat = osb.make_material(**spec)
    wo = _wo(n, rng)
    u = rng.uniform(size=(n, 3))
    _, weight, _, _ = osb.sample_surface(mat, wo, u)
    refl = weight.mean(0)
    assert (refl < 1.05).all(), (name, refl)


@pytest.mark.parametrize("name", sorted(DELTA_MATS))
def test_delta_lobes(name):
    rng = np.random.default_rng(11)
    n = 4096
    mat = osb.make_material(**DELTA_MATS[name])
    wo = _wo(n, rng)
    u = rng.uniform(size=(n, 3))
    wi, weight, pdf, is_delta = osb.sample_surface(mat, wo, u)
    # delta-sampled lanes: mirror or straight-through directions
    mirr = np.abs(wi - np.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], -1)
                  ).max(-1) < 1e-12
    thru = np.abs(wi + wo).max(-1) < 1e-12
    assert (mirr | thru | ~is_delta).all()
    assert np.isfinite(weight).all()
    # NEE sees no delta contribution
    f = osb.surface_f(mat, wo, np.stack(
        [-wo[:, 0], -wo[:, 1], wo[:, 2]], -1))
    if name != "plastic":
        assert np.abs(f).max() < 1e-12


@pytest.mark.parametrize("name", sorted(MATS) + sorted(DELTA_MATS))
def test_jax_matches_oracle(name):
    import jax.numpy as jnp

    from yhair_tpu.bsdf import surface as js

    rng = np.random.default_rng(13)
    n = 2048
    spec = MATS.get(name) or DELTA_MATS[name]
    omat = osb.make_material(**spec)
    jmat = js.SurfaceMaterial.make([spec]).gather(
        jnp.zeros(n, jnp.int32))
    wo = _wo(n, rng)
    u = rng.uniform(size=(n, 3))
    wi, w_o, pdf_o, d_o = osb.sample_surface(omat, wo, u)

    wo32, u32 = jnp.asarray(wo, jnp.float32), jnp.asarray(u, jnp.float32)
    wi_j, w_j, pdf_j, d_j = js.surface_sample(jmat, wo32, u32)
    f_j = js.surface_f(jmat, wo32, jnp.asarray(wi, jnp.float32))
    f_o = osb.surface_f(omat, wo, wi)
    pdf_j2 = js.surface_pdf(jmat, wo32, jnp.asarray(wi, jnp.float32))

    # f/pdf at spec peaks reach ~1e4; compare relatively
    rel_f = np.abs(np.asarray(f_j) - f_o) / (np.abs(f_o) + 1e-3)
    assert np.quantile(rel_f, 0.999) < 5e-3, rel_f.max()
    rel_p = np.abs(np.asarray(pdf_j2) - pdf_o) / (np.abs(pdf_o) + 1e-3)
    assert np.quantile(rel_p, 0.999) < 5e-3, rel_p.max()

    # sampling parity: exclude lanes whose u_lobe sits within 1e-3 of a
    # lobe CDF boundary (f32 vs f64 may legitimately pick different lobes)
    p = osb._broadcast_params(omat, n)
    wd, ws, _wt = osb._lobe_weights(p, np.maximum(wo[:, 2], 1e-6))
    ul = u[:, 2]
    stable = (np.abs(ul - wd) > 1e-3) & (np.abs(ul - (wd + ws)) > 1e-3)
    assert stable.mean() > 0.98
    assert np.allclose(np.asarray(wi_j)[stable], wi[stable], atol=2e-3)
    rel_w = (np.abs(np.asarray(w_j) - w_o)
             / (np.abs(w_o) + 1e-2))[stable]
    assert np.quantile(rel_w, 0.99) < 2e-2
    assert (np.asarray(d_j) == d_o)[stable].all()


def test_black_material_is_safe():
    """Black color still keeps the dielectric specular lobe (black
    plastic); sampling must stay finite and kill pdf<=0 lanes."""
    mat = osb.make_material(color=(0, 0, 0), roughness=0.5)
    rng = np.random.default_rng(17)
    n = 1024
    wo = _wo(n, rng)
    u = rng.uniform(size=(n, 3))
    wi, weight, pdf, _ = osb.sample_surface(mat, wo, u)
    assert np.isfinite(weight).all()
    assert (np.abs(weight[pdf <= 0]) < 1e-12).all()
    # black diffuse: only the dielectric specular highlight remains, and
    # its average throughput is small
    assert weight.mean() < 0.1
