"""pbrt-v3 hair scattering model in JAX — eval / sample / pdf.

TPU-native re-implementation of the reference's hair extension
(SURVEY.md §2.8; reference symbols hair_brdf / eval_hair_scattering /
sample_hair_scattering / sample_hair_scattering_pdf
[U:libs/yocto_extension/yocto_extension.cpp]). Semantics match
`oracle/hair_bsdf.py` (the float64 ground truth) to f32 tolerance; tested
in tests/test_jax_hair.py.

Design notes (TPU-first):
  * Pure functions over a `HairMaterial` pytree; everything is `jit`-able,
    `vmap`-free (explicitly batched over leading dims) and differentiable
    w.r.t. sigma_a / beta_m / beta_n / alpha.
  * All four lobes (R, TT, TRT, residual) are computed unrolled and summed
    — no data-dependent control flow; lobe selection in `sample` is a
    pure `where` cascade so it fuses into one VPU pass.
  * f32-hardened: LogI0 large-argument branch, clamped denominators,
    logistic tails in exp space.

Convention (pbrt's, same as the oracle): local frame x = strand tangent,
sin(theta) = w.x, phi = atan2(w.z, w.y); `f` carries a 1/|w_i.z| factor
which the integrator cancels with its |cos| term.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069
TWO_PI = 6.283185307179586


class HairMaterial(NamedTuple):
    """Differentiable hair material parameters (a pytree).

    Matches the reference material extension fields (SURVEY.md §2.5):
    sigma_a (absorption, (3,)), beta_m/beta_n (roughness), alpha (scale
    tilt, radians), eta (IOR). Fields may be scalars or broadcastable to
    the shading batch.
    """

    sigma_a: jax.Array
    beta_m: jax.Array
    beta_n: jax.Array
    alpha: jax.Array
    eta: jax.Array

    @classmethod
    def make(cls, sigma_a, beta_m=0.3, beta_n=0.3, alpha=0.0349066,
             eta=1.55, dtype=jnp.float32):
        return cls(jnp.asarray(sigma_a, dtype), jnp.asarray(beta_m, dtype),
                   jnp.asarray(beta_n, dtype), jnp.asarray(alpha, dtype),
                   jnp.asarray(eta, dtype))


# ---------------------------------------------------------------------------
# scalar helpers (all shape-preserving, f32-safe)


def _safe_sqrt(x):
    """sqrt(max(x, 0)) with a FINITE gradient at x <= 0.

    sqrt'(0) = inf, and inf * 0 = NaN even when the caller gates the
    result with `where` (geometry gradients hit this at |h| = 1, where
    cos(gamma) = sqrt(1 - h^2) = 0). Values are bit-identical to
    sqrt(max(x, 0)); gradients are 0 where x <= 1e-12."""
    return jnp.where(x > 1e-12, jnp.sqrt(jnp.maximum(x, 1e-12)),
                     jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(x, 0.0))))


def _safe_asin(x):
    """arcsin(clip(x, -1, 1)) with a FINITE gradient at |x| -> 1
    (asin'(1) = inf; same inf * 0 = NaN failure mode as _safe_sqrt).
    Values bit-identical; gradients 0 in the outermost 1e-6 band."""
    lim = 1.0 - 1e-6
    return jnp.where((x > -lim) & (x < lim),
                     jnp.arcsin(jnp.clip(x, -lim, lim)),
                     jax.lax.stop_gradient(jnp.arcsin(
                         jnp.clip(x, -1.0, 1.0))))


def _grad_interior(x, lim=1.0 - 1e-3):
    """Identity in VALUE; gradient gated to zero for |x| >= lim.

    Geometry gradients differentiate the strand offset h, and both
    asin(h) and sqrt(1 - h^2) have INFINITE derivatives at |h| = 1 —
    every silhouette-grazing hit would inject inf/NaN into d/d(control
    points) (hair-parameter gradients never differentiate h, so they
    were unaffected). Clamping the derivative (not the value) keeps
    renders bit-identical while making geometry gradients finite; the
    lost signal is the outermost 0.1% of the strand width."""
    xc = jnp.clip(x, -lim, lim)
    return xc + jax.lax.stop_gradient(x - xc)


def _i0(x):
    """Modified Bessel I0, 10-term even series (pbrt's I0)."""
    x2 = x * x
    val = jnp.ones_like(x)
    term = jnp.ones_like(x)
    # term_i = x^{2i} / (4^i (i!)^2); ratio term_i/term_{i-1} = x2/(4 i^2)
    for i in range(1, 10):
        term = term * x2 / (4.0 * i * i)
        val = val + term
    return val


def _log_i0(x):
    big = x + 0.5 * (-jnp.log(TWO_PI) + jnp.log(1.0 / jnp.maximum(x, 1e-30))
                     + 1.0 / (8.0 * jnp.maximum(x, 1e-30)))
    small = jnp.log(_i0(jnp.minimum(x, 12.0)))
    return jnp.where(x > 12.0, big, small)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return _sigmoid(x / s)


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _sample_trimmed_logistic(u, s, a, b):
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    denom = jnp.clip(u * k + _logistic_cdf(a, s), 1e-30, None)
    x = -s * jnp.log(1.0 / denom - 1.0)
    return jnp.clip(x, a, b)


def fr_dielectric(cos_theta_i, eta):
    """Unpolarized dielectric Fresnel (external eta_i=1)."""
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_theta_i > 0
    eta_i = jnp.where(entering, 1.0, eta)
    eta_t = jnp.where(entering, eta, 1.0)
    ci = jnp.abs(cos_theta_i)
    sin_t = eta_i / eta_t * _safe_sqrt(1.0 - ci * ci)
    ct = _safe_sqrt(1.0 - sin_t * sin_t)
    r_parl = (eta_t * ci - eta_i * ct) / jnp.maximum(eta_t * ci + eta_i * ct,
                                                     1e-30)
    r_perp = (eta_i * ci - eta_t * ct) / jnp.maximum(eta_i * ci + eta_t * ct,
                                                     1e-30)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(sin_t >= 1.0, jnp.ones_like(fr), fr)


# ---------------------------------------------------------------------------
# parameter remaps


def roughness_to_v(beta_m):
    """-> tuple of 4 per-lobe longitudinal variances."""
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20) ** 2
    return (v0, 0.25 * v0, 4.0 * v0, 4.0 * v0)


def roughness_to_s(beta_n):
    return SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                             + 5.372 * beta_n ** 22)


def alpha_terms(alpha):
    """sin/cos of 2^k alpha, k = 0..2 (double-angle recurrence)."""
    s0, c0 = jnp.sin(alpha), jnp.cos(alpha)
    s1, c1 = 2.0 * c0 * s0, c0 * c0 - s0 * s0
    s2, c2 = 2.0 * c1 * s1, c1 * c1 - s1 * s1
    return (s0, s1, s2), (c0, c1, c2)


def sigma_a_from_concentration(ce, cp):
    eumelanin = jnp.array([0.419, 0.697, 1.37])
    pheomelanin = jnp.array([0.187, 0.4, 1.05])
    return (jnp.asarray(ce)[..., None] * eumelanin
            + jnp.asarray(cp)[..., None] * pheomelanin)


def sigma_a_from_reflectance(color, beta_n):
    beta_n = jnp.asarray(beta_n)[..., None]
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return (jnp.log(jnp.clip(color, 1e-9, 1.0)) / denom) ** 2


# ---------------------------------------------------------------------------
# lobe terms


def _mp(cos_i, cos_o, sin_i, sin_o, v):
    v = jnp.maximum(v, 1e-7)
    a = cos_i * cos_o / v
    b = sin_i * sin_o / v
    # exponent is analytically <= log(1/2v) + 0.7 (since
    # cos(ti+to) - 1 <= 0); clip anyway so the unselected branch of the
    # `where` below can never produce inf and poison gradients.
    exp_small = jnp.clip(_log_i0(a) - b - 1.0 / v + 0.6931
                         + jnp.log(1.0 / (2.0 * v)), -80.0, 80.0)
    out_small = jnp.exp(exp_small)
    # big-v branch: exp(-b) I0(a) / (2 v sinh(1/v)). Selected only when
    # v > 0.1, so |a|, |b| <= 10 there — the clips below are
    # value-preserving on the selected domain and keep the UNSELECTED
    # branch finite (inf * 0 cotangent = NaN otherwise).
    a_big = jnp.clip(a, 0.0, 12.0)
    b_big = jnp.clip(b, -60.0, 60.0)
    inv_v = jnp.minimum(1.0 / v, 20.0)
    sinh_term = 0.5 * (jnp.exp(inv_v) - jnp.exp(-inv_v))
    out_big = jnp.exp(-b_big) * _i0(a_big) / (sinh_term * 2.0 * v)
    return jnp.where(v <= 0.1, out_small, out_big)


def _phi_fn(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * jnp.pi


def _np_term(phi, p, s, gamma_o, gamma_t):
    dphi = phi - _phi_fn(p, gamma_o, gamma_t)
    dphi = jnp.mod(dphi + jnp.pi, TWO_PI) - jnp.pi
    return _trimmed_logistic(dphi, s, -jnp.pi, jnp.pi)


def _tilted(sin_o, cos_o, s2k, c2k, p):
    """Scale-tilted (sin, |cos|) of theta_o for lobe p (pbrt ordering)."""
    if p == 0:
        s = sin_o * c2k[1] - cos_o * s2k[1]
        c = cos_o * c2k[1] + sin_o * s2k[1]
    elif p == 1:
        s = sin_o * c2k[0] + cos_o * s2k[0]
        c = cos_o * c2k[0] - sin_o * s2k[0]
    elif p == 2:
        s = sin_o * c2k[2] + cos_o * s2k[2]
        c = cos_o * c2k[2] - sin_o * s2k[2]
    else:
        s, c = sin_o, cos_o
    return s, jnp.abs(c)


def _shared_terms(mat: HairMaterial, h, sin_o, cos_o):
    """Refraction geometry + per-lobe attenuation; shared by f/pdf/sample."""
    eta = mat.eta
    sin_t = sin_o / eta
    cos_t = _safe_sqrt(1.0 - sin_t * sin_t)
    etap = _safe_sqrt(eta * eta - sin_o * sin_o) / jnp.maximum(cos_o, 1e-7)
    sin_gt = h / jnp.maximum(etap, 1e-7)
    cos_gt = _safe_sqrt(1.0 - sin_gt * sin_gt)
    gamma_t = _safe_asin(sin_gt)
    # transmittance (..., 3)
    T = jnp.exp(-mat.sigma_a * (2.0 * cos_gt
                                / jnp.maximum(cos_t, 1e-7))[..., None])
    # attenuation chain
    cos_go = _safe_sqrt(1.0 - h * h)
    f = fr_dielectric(cos_o * cos_go, eta)[..., None]
    ap0 = jnp.broadcast_to(f, f.shape[:-1] + (3,))
    ap1 = (1.0 - f) ** 2 * T
    ap2 = ap1 * T * f
    ap3 = ap2 * f * T / jnp.maximum(1.0 - T * f, 1e-5)
    return gamma_t, T, (ap0, ap1, ap2, ap3)


def _angles(w):
    sin_t = w[..., 0]
    cos_t = _safe_sqrt(1.0 - sin_t * sin_t)
    # guarded atan2: its vjp is x/(x^2+y^2) -> NaN at (0, 0), which miss
    # lanes hit (zero shading frame) — the gate keeps values identical
    # and zeroes the gradient there (inputs sanitized so the unselected
    # branch cannot emit NaN either; same pattern as _safe_sqrt)
    y, z = w[..., 1], w[..., 2]
    safe = (y * y + z * z) > 1e-18
    # atan2(0, 1) == atan2(0, 0) == 0, so substituting (1, 0) on unsafe
    # lanes preserves values exactly while the `where` gates zero their
    # gradient (and no unsanitized atan2(0,0) exists for debug_nans to
    # trip on)
    phi = jnp.arctan2(jnp.where(safe, z, 0.0), jnp.where(safe, y, 1.0))
    return sin_t, cos_t, phi


def _luminance(c):
    return c.mean(axis=-1)


def _ap_pdf(aps):
    ys = [jnp.maximum(_luminance(a), 0.0) for a in aps]
    total = jnp.maximum(sum(ys), 1e-30)
    return [y / total for y in ys]


# ---------------------------------------------------------------------------
# shared evaluation context
#
# Everything that depends only on (material, h, wo) — refraction geometry,
# the attenuation chain, roughness remaps, tilted angles — is computed once
# per shading point and reused across every wi the integrator evaluates
# (NEE directions + the sampled bounce). The integrator evaluates the BSDF
# 4-6x per bounce; sharing this context roughly halves its transcendental
# cost (VERDICT r1 weak #2: "fuse the 3 BSDF evals per bounce").


class HairCtx(NamedTuple):
    gamma_o: jax.Array
    sin_o: jax.Array
    cos_o: jax.Array
    phi_o: jax.Array
    gamma_t: jax.Array
    s: jax.Array                 # azimuthal logistic scale
    vs: tuple                    # 4 per-lobe longitudinal variances
    tilt: tuple                  # 4 (sin_op, cos_op) tilted angles
    aps: tuple                   # 4 attenuation terms (..., 3)
    ap_pdf: tuple                # 4 lobe-selection probabilities


def hair_ctx(mat: HairMaterial, h, wo) -> HairCtx:
    """Precompute the wi-independent part of the BSDF at a shading point."""
    h = _grad_interior(h)
    gamma_o = _safe_asin(h)
    sin_o, cos_o, phi_o = _angles(wo)
    gamma_t, _T, aps = _shared_terms(mat, h, sin_o, cos_o)
    s = roughness_to_s(mat.beta_n)
    vs = roughness_to_v(mat.beta_m)
    s2k, c2k = alpha_terms(mat.alpha)
    tilt = tuple(_tilted(sin_o, cos_o, s2k, c2k, p)
                 for p in range(P_MAX + 1))
    return HairCtx(gamma_o=gamma_o, sin_o=sin_o, cos_o=cos_o, phi_o=phi_o,
                   gamma_t=gamma_t, s=s, vs=vs, tilt=tilt, aps=aps,
                   ap_pdf=tuple(_ap_pdf(aps)))


def _lobe_mn(ctx: HairCtx, wi):
    """Per-lobe longitudinal x azimuthal products for one wi.

    Returns ([m_p * n_p for p < P_MAX], m_last) — the only wi-dependent
    work; shared verbatim between f and pdf."""
    sin_i, cos_i, phi_i = _angles(wi)
    phi = phi_i - ctx.phi_o
    mn = []
    for p in range(P_MAX):
        sin_op, cos_op = ctx.tilt[p]
        m = _mp(cos_i, cos_op, sin_i, sin_op, ctx.vs[p])
        n = _np_term(phi, float(p), ctx.s, ctx.gamma_o, ctx.gamma_t)
        mn.append(m * n)
    m_last = _mp(cos_i, ctx.cos_o, sin_i, ctx.sin_o, ctx.vs[P_MAX])
    return mn, m_last


def hair_f_ctx(ctx: HairCtx, wi):
    """BSDF value from a precomputed context. -> (..., 3)."""
    mn, m_last = _lobe_mn(ctx, wi)
    fsum = sum((mn[p][..., None] * ctx.aps[p] for p in range(P_MAX)),
               (m_last / TWO_PI)[..., None] * ctx.aps[P_MAX])
    abs_cos = jnp.abs(wi[..., 2])
    return fsum / jnp.maximum(abs_cos, 1e-7)[..., None]


def hair_pdf_ctx(ctx: HairCtx, wi):
    mn, m_last = _lobe_mn(ctx, wi)
    pdf = sum((mn[p] * ctx.ap_pdf[p] for p in range(P_MAX)),
              m_last * ctx.ap_pdf[P_MAX] / TWO_PI)
    return pdf


def hair_f_pdf_ctx(ctx: HairCtx, wi):
    """Fused (f, pdf) — one _lobe_mn pass instead of two full evals."""
    mn, m_last = _lobe_mn(ctx, wi)
    fsum = sum((mn[p][..., None] * ctx.aps[p] for p in range(P_MAX)),
               (m_last / TWO_PI)[..., None] * ctx.aps[P_MAX])
    abs_cos = jnp.abs(wi[..., 2])
    f = fsum / jnp.maximum(abs_cos, 1e-7)[..., None]
    pdf = sum((mn[p] * ctx.ap_pdf[p] for p in range(P_MAX)),
              m_last * ctx.ap_pdf[P_MAX] / TWO_PI)
    return f, pdf


def hair_sample_wi(ctx: HairCtx, u):
    """Sample only the direction from a context (f/pdf via the fused
    evaluators, on whichever ctx — detached or not — the caller wants)."""
    ap_pdf = ctx.ap_pdf
    u0 = u[..., 0]
    cdf0 = ap_pdf[0]
    cdf1 = cdf0 + ap_pdf[1]
    cdf2 = cdf1 + ap_pdf[2]
    p_idx = ((u0 >= cdf0).astype(jnp.int32) + (u0 >= cdf1).astype(jnp.int32)
             + (u0 >= cdf2).astype(jnp.int32))

    # select tilted angles and variance for the chosen lobe
    sin_op = jnp.zeros_like(ctx.sin_o)
    cos_op = jnp.zeros_like(ctx.cos_o)
    v_p = jnp.zeros_like(ctx.sin_o)
    for p in range(P_MAX + 1):
        s_p, c_p = ctx.tilt[p]
        sel = p_idx == p
        sin_op = jnp.where(sel, s_p, sin_op)
        cos_op = jnp.where(sel, c_p, cos_op)
        v_p = jnp.where(sel, ctx.vs[p], v_p)

    # longitudinal sample
    u1 = jnp.maximum(u[..., 1], 1e-5)
    cos_theta = 1.0 + v_p * jnp.log(u1 + (1.0 - u1) * jnp.exp(-2.0 / v_p))
    sin_theta = _safe_sqrt(1.0 - cos_theta * cos_theta)
    cos_phi = jnp.cos(TWO_PI * u[..., 2])
    sin_i = -cos_theta * sin_op + sin_theta * cos_phi * cos_op
    cos_i = _safe_sqrt(1.0 - sin_i * sin_i)

    # azimuthal sample
    p_f = p_idx.astype(cos_i.dtype)
    dphi_l = (_phi_fn(p_f, ctx.gamma_o, ctx.gamma_t)
              + _sample_trimmed_logistic(u[..., 3], ctx.s, -jnp.pi, jnp.pi))
    dphi = jnp.where(p_idx < P_MAX, dphi_l, TWO_PI * u[..., 3])
    phi_i = ctx.phi_o + dphi
    return jnp.stack([sin_i, cos_i * jnp.cos(phi_i),
                      cos_i * jnp.sin(phi_i)], axis=-1)


# ---------------------------------------------------------------------------
# public interface (thin wrappers over the context API)


def hair_f(mat: HairMaterial, h, wo, wi):
    """BSDF value (pbrt convention — includes 1/|wi.z|). -> (..., 3)."""
    return hair_f_ctx(hair_ctx(mat, h, wo), wi)


def hair_pdf(mat: HairMaterial, h, wo, wi):
    """Solid-angle pdf of `hair_sample`. -> (...)."""
    return hair_pdf_ctx(hair_ctx(mat, h, wo), wi)


def hair_sample(mat: HairMaterial, h, wo, u):
    """Sample w_i given 4 uniforms u (..., 4). Returns (wi, f, pdf).

    Discrete choices (lobe index) are made with pure `where` cascades;
    gradients flow through f and pdf but the integrator detaches the
    sampled direction (detached-sampling reparameterization, SURVEY §7.6).
    """
    ctx = hair_ctx(mat, h, wo)
    wi = hair_sample_wi(ctx, u)
    f, pdf = hair_f_pdf_ctx(ctx, wi)
    return wi, f, pdf
