"""pbrt-v3 hair scattering model — numpy float64 oracle.

Implements the published specification (SURVEY.md §2.8 [PBRT]): the
R/TT/TRT(+residual) lobe model with longitudinal term M_p, azimuthal term
N_p and attenuation A_p, exactly as in pbrt-v3's HairBSDF (the model the
reference's yocto_extension reproduces; reference symbols: hair_brdf,
eval_hair_scattering, sample_hair_scattering, sample_hair_scattering_pdf
[U:libs/yocto_extension/yocto_extension.cpp]).

Conventions (pbrt's): the local shading frame has
  x = strand tangent (curve direction),
  z = "shading normal" axis in the normal plane,
so sin(theta) = w.x and phi = atan2(w.z, w.y).
`f()` returns the BSDF value *divided by* |w_i.z| (pbrt's AbsCosTheta), and
the integrator multiplies back by |w_i.z|; `pdf()` has no such factor.

All functions broadcast over leading batch dimensions; colors are (..., 3).
"""

from __future__ import annotations

import numpy as np

P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069

# ---------------------------------------------------------------------------
# Small math helpers


def _safe_sqrt(x):
    return np.sqrt(np.maximum(x, 0.0))


def _safe_asin(x):
    return np.arcsin(np.clip(x, -1.0, 1.0))


def sigmoid(x):
    # numerically stable logistic CDF
    return np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.abs(x))),
                    np.exp(-np.abs(x)) / (1.0 + np.exp(-np.abs(x))))


def i0(x):
    """Modified Bessel I0 via the 10-term even power series (pbrt's I0)."""
    x = np.asarray(x, dtype=np.float64)
    val = np.zeros_like(x)
    x2i = np.ones_like(x)
    ifact = 1.0
    four_i = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (four_i * ifact * ifact)
        x2i = x2i * x * x
        four_i *= 4.0
    return val


def log_i0(x):
    """log(I0(x)) with the asymptotic form for large x (pbrt's LogI0)."""
    x = np.asarray(x, dtype=np.float64)
    big = x + 0.5 * (-np.log(2.0 * np.pi) + np.log(1.0 / np.maximum(x, 1e-300))
                     + 1.0 / (8.0 * np.maximum(x, 1e-300)))
    small = np.log(i0(np.minimum(x, 12.0)))
    return np.where(x > 12.0, big, small)


def logistic(x, s):
    x = np.abs(x)
    e = np.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def logistic_cdf(x, s):
    return sigmoid(x / s)


def trimmed_logistic(x, s, a, b):
    return logistic(x, s) / (logistic_cdf(b, s) - logistic_cdf(a, s))


def sample_trimmed_logistic(u, s, a, b):
    k = logistic_cdf(b, s) - logistic_cdf(a, s)
    x = -s * np.log(1.0 / np.clip(u * k + logistic_cdf(a, s), 1e-300, None) - 1.0)
    return np.clip(x, a, b)


def fr_dielectric(cos_theta_i, eta):
    """Unpolarized dielectric Fresnel, external side (eta_i=1, eta_t=eta)."""
    cos_theta_i = np.clip(cos_theta_i, -1.0, 1.0)
    # flip for rays leaving the medium
    entering = cos_theta_i > 0
    eta_i = np.where(entering, 1.0, eta)
    eta_t = np.where(entering, eta, 1.0)
    cos_theta_i = np.abs(cos_theta_i)
    sin_theta_t = eta_i / eta_t * _safe_sqrt(1.0 - cos_theta_i ** 2)
    cos_theta_t = _safe_sqrt(1.0 - sin_theta_t ** 2)
    r_parl = (eta_t * cos_theta_i - eta_i * cos_theta_t) / (
        eta_t * cos_theta_i + eta_i * cos_theta_t + 1e-300)
    r_perp = (eta_i * cos_theta_i - eta_t * cos_theta_t) / (
        eta_i * cos_theta_i + eta_t * cos_theta_t + 1e-300)
    fr = 0.5 * (r_parl ** 2 + r_perp ** 2)
    return np.where(sin_theta_t >= 1.0, 1.0, fr)


# ---------------------------------------------------------------------------
# Parameter remaps


def roughness_to_v(beta_m):
    """Longitudinal roughness -> variance per lobe; returns (..., P_MAX+1)."""
    beta_m = np.asarray(beta_m, dtype=np.float64)
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20) ** 2
    v = np.stack([v0, 0.25 * v0, 4.0 * v0, 4.0 * v0], axis=-1)
    return v


def roughness_to_s(beta_n):
    beta_n = np.asarray(beta_n, dtype=np.float64)
    return SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                             + 5.372 * beta_n ** 22)


def alpha_terms(alpha):
    """sin/cos of 2^k * alpha for k = 0, 1, 2 via double-angle recurrence."""
    alpha = np.asarray(alpha, dtype=np.float64)
    sin_2k = [np.sin(alpha)]
    cos_2k = [np.cos(alpha)]
    for _ in range(2):
        s_prev, c_prev = sin_2k[-1], cos_2k[-1]
        sin_2k.append(2.0 * c_prev * s_prev)
        cos_2k.append(c_prev ** 2 - s_prev ** 2)
    return np.stack(sin_2k, axis=-1), np.stack(cos_2k, axis=-1)


def sigma_a_from_concentration(ce, cp):
    """Melanin concentrations -> absorption (eumelanin, pheomelanin)."""
    eumelanin = np.array([0.419, 0.697, 1.37])
    pheomelanin = np.array([0.187, 0.4, 1.05])
    ce = np.asarray(ce, dtype=np.float64)[..., None]
    cp = np.asarray(cp, dtype=np.float64)[..., None]
    return ce * eumelanin + cp * pheomelanin


def sigma_a_from_reflectance(color, beta_n):
    color = np.asarray(color, dtype=np.float64)
    beta_n = np.asarray(beta_n, dtype=np.float64)[..., None]
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return (np.log(np.clip(color, 1e-9, 1.0)) / denom) ** 2


# ---------------------------------------------------------------------------
# Lobe terms


def mp(cos_theta_i, cos_theta_o, sin_theta_i, sin_theta_o, v):
    a = cos_theta_i * cos_theta_o / v
    b = sin_theta_i * sin_theta_o / v
    small_v = v <= 0.1
    v_safe = np.maximum(v, 1e-12)
    out_small = np.exp(log_i0(a) - b - 1.0 / v_safe + 0.6931
                       + np.log(1.0 / (2.0 * v_safe)))
    with np.errstate(over="ignore", invalid="ignore"):
        out_big = (np.exp(-b) * i0(a)) / (np.sinh(1.0 / v_safe) * 2.0 * v_safe)
    out_big = np.nan_to_num(out_big, nan=0.0, posinf=0.0)
    return np.where(small_v, out_small, out_big)


def phi_fn(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * np.pi


def np_term(phi, p, s, gamma_o, gamma_t):
    dphi = phi - phi_fn(p, gamma_o, gamma_t)
    # wrap to [-pi, pi]
    dphi = np.remainder(dphi + np.pi, 2.0 * np.pi) - np.pi
    return trimmed_logistic(dphi, s, -np.pi, np.pi)


def ap(cos_theta_o, eta, h, transmittance):
    """Attenuation per lobe; returns (..., P_MAX+1, 3)."""
    cos_gamma_o = _safe_sqrt(1.0 - h ** 2)
    cos_theta = cos_theta_o * cos_gamma_o
    f = fr_dielectric(cos_theta, eta)[..., None] * np.ones(3)
    T = transmittance
    a = [f, (1.0 - f) ** 2 * T]
    for p in range(2, P_MAX):
        a.append(a[-1] * T * f)
    a.append(a[-1] * f * T / np.maximum(1.0 - T * f, 1e-9))
    return np.stack(a, axis=-2)


# ---------------------------------------------------------------------------
# BSDF interface


class HairBSDF:
    """Per-intersection hair BSDF state (h, sigma_a, beta_m, beta_n, alpha, eta).

    Scalar parameters may be floats or broadcastable arrays; sigma_a is
    (..., 3). `h` in [-1, 1] is the offset across the strand width.
    """

    def __init__(self, h, sigma_a, beta_m=0.3, beta_n=0.3, alpha=np.deg2rad(2.0),
                 eta=1.55):
        self.h = np.asarray(h, dtype=np.float64)
        self.sigma_a = np.asarray(sigma_a, dtype=np.float64)
        self.beta_m = np.asarray(beta_m, dtype=np.float64)
        self.beta_n = np.asarray(beta_n, dtype=np.float64)
        self.alpha = np.asarray(alpha, dtype=np.float64)
        self.eta = np.asarray(eta, dtype=np.float64)
        self.gamma_o = _safe_asin(self.h)
        self.v = roughness_to_v(self.beta_m)
        self.s = roughness_to_s(self.beta_n)
        self.sin_2k_alpha, self.cos_2k_alpha = alpha_terms(self.alpha)

    # -- internals ---------------------------------------------------------

    def _angles(self, w):
        sin_theta = w[..., 0]
        cos_theta = _safe_sqrt(1.0 - sin_theta ** 2)
        phi = np.arctan2(w[..., 2], w[..., 1])
        return sin_theta, cos_theta, phi

    def _refract(self, sin_theta_o, cos_theta_o):
        sin_theta_t = sin_theta_o / self.eta
        cos_theta_t = _safe_sqrt(1.0 - sin_theta_t ** 2)
        etap = _safe_sqrt(self.eta ** 2 - sin_theta_o ** 2) / np.maximum(
            cos_theta_o, 1e-9)
        sin_gamma_t = self.h / np.maximum(etap, 1e-9)
        cos_gamma_t = _safe_sqrt(1.0 - sin_gamma_t ** 2)
        gamma_t = _safe_asin(sin_gamma_t)
        return cos_theta_t, gamma_t, cos_gamma_t

    def _transmittance(self, cos_theta_t, cos_gamma_t):
        return np.exp(-self.sigma_a * (2.0 * cos_gamma_t
                                       / np.maximum(cos_theta_t, 1e-9))[..., None])

    def _tilted_o(self, sin_theta_o, cos_theta_o, p):
        """Apply scale tilt to the 'o' direction for lobe p (pbrt order)."""
        s2k, c2k = self.sin_2k_alpha, self.cos_2k_alpha
        if p == 0:
            sin_op = sin_theta_o * c2k[..., 1] - cos_theta_o * s2k[..., 1]
            cos_op = cos_theta_o * c2k[..., 1] + sin_theta_o * s2k[..., 1]
        elif p == 1:
            sin_op = sin_theta_o * c2k[..., 0] + cos_theta_o * s2k[..., 0]
            cos_op = cos_theta_o * c2k[..., 0] - sin_theta_o * s2k[..., 0]
        elif p == 2:
            sin_op = sin_theta_o * c2k[..., 2] + cos_theta_o * s2k[..., 2]
            cos_op = cos_theta_o * c2k[..., 2] - sin_theta_o * s2k[..., 2]
        else:
            sin_op, cos_op = sin_theta_o, cos_theta_o
        return sin_op, np.abs(cos_op)

    def _ap_pdf(self, cos_theta_o):
        """Luminance-normalized lobe-selection pdf, (..., P_MAX+1)."""
        sin_theta_o = _safe_sqrt(1.0 - cos_theta_o ** 2)
        cos_theta_t, gamma_t, cos_gamma_t = self._refract(sin_theta_o, cos_theta_o)
        T = self._transmittance(cos_theta_t, cos_gamma_t)
        a = ap(cos_theta_o, self.eta, self.h, T)
        y = a.mean(axis=-1)  # luminance proxy (pbrt uses spectrum y())
        return y / np.maximum(y.sum(axis=-1, keepdims=True), 1e-300)

    # -- public ------------------------------------------------------------

    def f(self, wo, wi):
        """BSDF value (pbrt convention: includes the 1/|wi.z| factor)."""
        wo = np.asarray(wo, dtype=np.float64)
        wi = np.asarray(wi, dtype=np.float64)
        sin_o, cos_o, phi_o = self._angles(wo)
        sin_i, cos_i, phi_i = self._angles(wi)
        cos_theta_t, gamma_t, cos_gamma_t = self._refract(sin_o, cos_o)
        T = self._transmittance(cos_theta_t, cos_gamma_t)
        a = ap(cos_o, self.eta, self.h, T)
        phi = phi_i - phi_o
        fsum = np.zeros(np.broadcast_shapes(sin_o.shape, sin_i.shape,
                                            self.sigma_a.shape[:-1]) + (3,))
        for p in range(P_MAX):
            sin_op, cos_op = self._tilted_o(sin_o, cos_o, p)
            m = mp(cos_i, cos_op, sin_i, sin_op, self.v[..., p])
            n = np_term(phi, p, self.s, self.gamma_o, gamma_t)
            fsum = fsum + (m * n)[..., None] * a[..., p, :]
        m_last = mp(cos_i, cos_o, sin_i, sin_o, self.v[..., P_MAX])
        fsum = fsum + (m_last / (2.0 * np.pi))[..., None] * a[..., P_MAX, :]
        abs_cos_wi = np.abs(wi[..., 2])
        fsum = np.where(abs_cos_wi[..., None] > 0,
                        fsum / np.maximum(abs_cos_wi, 1e-300)[..., None], fsum)
        return fsum

    def pdf(self, wo, wi):
        wo = np.asarray(wo, dtype=np.float64)
        wi = np.asarray(wi, dtype=np.float64)
        sin_o, cos_o, phi_o = self._angles(wo)
        sin_i, cos_i, phi_i = self._angles(wi)
        _, gamma_t, _ = self._refract(sin_o, cos_o)
        ap_pdf = self._ap_pdf(cos_o)
        phi = phi_i - phi_o
        pdf = np.zeros(np.broadcast_shapes(sin_o.shape, sin_i.shape,
                                           self.beta_m.shape))
        for p in range(P_MAX):
            sin_op, cos_op = self._tilted_o(sin_o, cos_o, p)
            m = mp(cos_i, cos_op, sin_i, sin_op, self.v[..., p])
            n = np_term(phi, p, self.s, self.gamma_o, gamma_t)
            pdf = pdf + m * n * ap_pdf[..., p]
        m_last = mp(cos_i, cos_o, sin_i, sin_o, self.v[..., P_MAX])
        pdf = pdf + m_last * ap_pdf[..., P_MAX] / (2.0 * np.pi)
        return pdf

    def sample_f(self, wo, u):
        """Sample an incident direction.

        Args:
          wo: (..., 3) outgoing direction in the hair frame.
          u: (..., 4) uniforms: lobe select, cos-theta, phi-gauss, phi-logistic.

        Returns: (f, wi, pdf)
        """
        wo = np.asarray(wo, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        sin_o, cos_o, phi_o = self._angles(wo)
        ap_pdf = self._ap_pdf(cos_o)  # (..., P_MAX+1)
        cdf = np.cumsum(ap_pdf, axis=-1)
        p_idx = (u[..., 0:1] >= cdf).sum(axis=-1)
        p_idx = np.minimum(p_idx, P_MAX)
        # rescale u0 within the chosen lobe interval (keeps stratification)
        lo = np.take_along_axis(
            np.concatenate([np.zeros_like(cdf[..., :1]), cdf], axis=-1),
            p_idx[..., None], axis=-1)[..., 0]

        # tilted wo per chosen lobe
        sin_op = np.zeros_like(sin_o)
        cos_op = np.zeros_like(cos_o)
        for p in range(P_MAX + 1):
            s_p, c_p = self._tilted_o(sin_o, cos_o, p)
            sel = p_idx == p
            sin_op = np.where(sel, s_p, sin_op)
            cos_op = np.where(sel, c_p, cos_op)

        v_p = np.take_along_axis(
            np.broadcast_to(self.v, np.broadcast_shapes(
                self.v.shape[:-1], p_idx.shape) + (P_MAX + 1,)),
            p_idx[..., None], axis=-1)[..., 0]

        u1 = np.maximum(u[..., 1], 1e-5)
        cos_theta = 1.0 + v_p * np.log(u1 + (1.0 - u1) * np.exp(-2.0 / v_p))
        sin_theta = _safe_sqrt(1.0 - cos_theta ** 2)
        cos_phi = np.cos(2.0 * np.pi * u[..., 2])
        sin_theta_i = -cos_theta * sin_op + sin_theta * cos_phi * cos_op
        cos_theta_i = _safe_sqrt(1.0 - sin_theta_i ** 2)

        _, gamma_t, _ = self._refract(sin_o, cos_o)
        dphi_logistic = phi_fn(p_idx.astype(np.float64), self.gamma_o, gamma_t) \
            + sample_trimmed_logistic(u[..., 3], self.s, -np.pi, np.pi)
        dphi_uniform = 2.0 * np.pi * u[..., 3]
        dphi = np.where(p_idx < P_MAX, dphi_logistic, dphi_uniform)

        phi_i = phi_o + dphi
        wi = np.stack([sin_theta_i,
                       cos_theta_i * np.cos(phi_i),
                       cos_theta_i * np.sin(phi_i)], axis=-1)
        del lo  # (stratification rescale not needed for correctness)
        return self.f(wo, wi), wi, self.pdf(wo, wi)
