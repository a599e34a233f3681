"""Surface (non-hair) BSDF in JAX — mirror of oracle/surface_bsdf.py.

TPU-native rebuild of the reference's material->BSDF lowering
[U:libs/yocto/yocto_trace.cpp eval_brdfcos/sample_brdf/sample_brdf_pdf]
(SURVEY.md §2.7). Fully vectorized and masked: diffuse + GGX
specular/metal + thin transmission + delta (roughness == 0) variants, all
evaluated branch-free so one compiled program shades a mixed batch.

Conventions match the oracle: local frame with n = +z, wo.z > 0, `f`
excludes the |cos| factor, delta lobes return f = 0 / pdf = 0 and only
contribute through sample()'s analytic weight.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.safemath import safe_normalize
import numpy as np

LUM = np.array([0.2126, 0.7152, 0.0722])
MIN_ALPHA = 1e-4
DELTA_ROUGHNESS = 1e-3


class SurfaceMaterial(NamedTuple):
    """SoA material table (M entries) — the analog of the reference's
    scene material vector [U:libs/yocto/yocto_sceneio.h]."""

    emission: jax.Array      # (M, 3)
    color: jax.Array         # (M, 3)
    roughness: jax.Array     # (M,)
    metallic: jax.Array      # (M,)
    ior: jax.Array           # (M,)
    transmission: jax.Array  # (M,)
    specular: jax.Array      # (M,) dielectric-lobe scale (matte = 0)
    color_tex: jax.Array     # (M,) int32 scene texture id, -1 = none
    emission_tex: jax.Array  # (M,) int32
    roughness_tex: jax.Array  # (M,) int32

    @classmethod
    def make(cls, mats: list, dtype=jnp.float32) -> "SurfaceMaterial":
        """From a list of oracle-format material dicts (>= 1 entry)."""
        if not mats:
            mats = [{"emission": (0, 0, 0), "color": (0, 0, 0),
                     "roughness": 1.0, "metallic": 0.0, "ior": 1.5,
                     "transmission": 0.0, "specular": 1.0}]

        def col(key, default, width=None):
            rows = [np.asarray(m.get(key, default), np.float64)
                    for m in mats]
            a = np.stack([np.broadcast_to(r, (width,)) if width else r
                          for r in rows]) if width else np.asarray(rows)
            return jnp.asarray(a, dtype)

        def icol(key):
            return jnp.asarray([int(m.get(key, -1)) for m in mats],
                               jnp.int32)

        return cls(
            emission=col("emission", (0.0, 0.0, 0.0), 3),
            color=col("color", (0.0, 0.0, 0.0), 3),
            roughness=col("roughness", 1.0),
            metallic=col("metallic", 0.0),
            ior=col("ior", 1.5),
            transmission=col("transmission", 0.0),
            specular=col("specular", 1.0),
            color_tex=icol("color_tex"),
            emission_tex=icol("emission_tex"),
            roughness_tex=icol("roughness_tex"),
        )

    def gather(self, idx) -> "SurfaceMaterial":
        """Per-hit parameter lookup: (M, ...) -> (N, ...)."""
        idx = jnp.clip(idx, 0, self.roughness.shape[0] - 1)
        return SurfaceMaterial(*(a[idx] for a in self))


def _lum(c):
    return c @ jnp.asarray(LUM, c.dtype)


def _f0(p: SurfaceMaterial):
    f0d = p.specular * ((p.ior - 1.0) / (p.ior + 1.0)) ** 2
    return f0d[..., None] * (1.0 - p.metallic[..., None]) \
        + p.color * p.metallic[..., None]


def _fresnel(p: SurfaceMaterial, cos_t):
    """Mixed Schlick fresnel — mirror of oracle _fresnel: the dielectric
    lobe (incl. its grazing term) is scaled by `specular`."""
    m = jnp.clip(1.0 - jnp.abs(cos_t), 0.0, 1.0) ** 5
    f_metal = p.color + (1.0 - p.color) * m[..., None]
    f0d = ((p.ior - 1.0) / (p.ior + 1.0)) ** 2
    f_diel = (p.specular * (f0d + (1.0 - f0d) * m))[..., None]
    return p.metallic[..., None] * f_metal \
        + (1.0 - p.metallic[..., None]) * f_diel


def _ggx_d(cos_h, alpha):
    a2 = alpha ** 2
    den = cos_h ** 2 * (a2 - 1.0) + 1.0
    return jnp.where(cos_h > 0,
                     a2 / jnp.maximum(jnp.pi * den ** 2, 1e-30), 0.0)


def _ggx_g1(cos_w, alpha):
    a2 = alpha ** 2
    c = jnp.abs(cos_w)
    return 2.0 * c / jnp.maximum(c + jnp.sqrt(a2 + (1.0 - a2) * c ** 2),
                                 1e-12)


def _ggx_g(cos_o, cos_i, alpha):
    return _ggx_g1(cos_o, alpha) * _ggx_g1(cos_i, alpha)


def _ggx_sample_vndf(wo, alpha, u0, u1):
    """Heitz 2018 visible-normal GGX sampling (isotropic). wo.z > 0."""
    vh = jnp.stack([alpha * wo[:, 0], alpha * wo[:, 1], wo[:, 2]], -1)
    vh = safe_normalize(vh)
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-24))
    t1 = jnp.where((lensq > 1e-20)[:, None],
                   jnp.stack([-vh[:, 1] * inv, vh[:, 0] * inv,
                              jnp.zeros_like(inv)], -1),
                   jnp.asarray([[1.0, 0.0, 0.0]], vh.dtype))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u0)
    phi = 2.0 * jnp.pi * u1
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[:, 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 ** 2, 0.0)) + s * p2
    nh = p1[:, None] * t1 + p2[:, None] * t2 + jnp.sqrt(jnp.maximum(
        1.0 - p1 ** 2 - p2 ** 2, 0.0))[:, None] * vh
    h = jnp.stack([alpha * nh[:, 0], alpha * nh[:, 1],
                   jnp.maximum(nh[:, 2], 0.0)], -1)
    return safe_normalize(h)


def _ggx_pdf_wi(wo, hv, alpha):
    """pdf of wi = reflect(wo, h) under VNDF sampling:
    G1(wo) D(h) / (4 cos_o)."""
    cos_o = jnp.maximum(wo[:, 2], 1e-6)
    return _ggx_g1(cos_o, alpha) * _ggx_d(hv[:, 2], alpha) / (4.0 * cos_o)


def _lobe_weights(p: SurfaceMaterial, cos_o):
    fo = _lum(_fresnel(p, cos_o))
    w_spec = fo
    base = (1.0 - fo) * (1.0 - p.metallic)
    w_diff = base * (1.0 - p.transmission)
    w_trans = base * p.transmission
    total = w_diff + w_spec + w_trans
    safe = jnp.maximum(total, 1e-12)
    ok = total > 1e-12
    return (jnp.where(ok, w_diff / safe, 1.0),
            jnp.where(ok, w_spec / safe, 0.0),
            jnp.where(ok, w_trans / safe, 0.0))


def _flip_z(w):
    return w * jnp.asarray([1.0, 1.0, -1.0], w.dtype)


def surface_f(p: SurfaceMaterial, wo, wi):
    """BSDF value (N, 3) WITHOUT |cos wi|; p holds per-hit (N,...) params."""
    delta = p.roughness < DELTA_ROUGHNESS
    alpha = jnp.maximum(p.roughness ** 2, MIN_ALPHA)
    cos_o = jnp.maximum(wo[:, 2], 1e-6)
    cos_i = wi[:, 2]
    f0 = _f0(p)

    wi_r = jnp.where((cos_i < 0)[:, None], _flip_z(wi), wi)
    hv = wo + wi_r
    hv = safe_normalize(hv)
    ch = jnp.sum(wo * hv, -1)
    fh = _fresnel(p, ch)
    d_term = _ggx_d(hv[:, 2], alpha)
    g_term = _ggx_g(cos_o, jnp.abs(cos_i), alpha)
    micro = (d_term * g_term
             / jnp.maximum(4.0 * cos_o * jnp.abs(cos_i), 1e-12))[:, None]
    spec = fh * micro

    # Ashikhmin-Shirley coupled diffuse (energy-conserving with the
    # Schlick specular; see oracle/surface_bsdf.py)
    kd = ((1.0 - p.metallic) * (1.0 - p.transmission)
          * (1.0 - _lum(f0)))[:, None]
    as_o = 1.0 - (1.0 - 0.5 * cos_o) ** 5
    as_i = 1.0 - (1.0 - 0.5 * jnp.abs(cos_i)) ** 5
    diff = p.color * (28.0 / (23.0 * jnp.pi)) * kd \
        * (as_o * as_i)[:, None]
    f_refl = diff + spec

    kt = ((1.0 - p.metallic) * p.transmission)[:, None] \
        * (1.0 - _lum(fh))[:, None]
    f_trans = p.color * kt * micro

    f = jnp.where((cos_i > 0)[:, None], f_refl, f_trans)
    f = jnp.where((jnp.abs(cos_i) < 1e-7)[:, None], 0.0, f)
    f_delta = jnp.where((cos_i > 0)[:, None], diff, 0.0)
    return jnp.where(delta[:, None], f_delta, f)


def surface_pdf(p: SurfaceMaterial, wo, wi):
    delta = p.roughness < DELTA_ROUGHNESS
    alpha = jnp.maximum(p.roughness ** 2, MIN_ALPHA)
    cos_i = wi[:, 2]
    w_diff, w_spec, w_trans = _lobe_weights(p, jnp.maximum(wo[:, 2], 1e-6))

    pdf_diff = jnp.maximum(cos_i, 0.0) / jnp.pi

    wi_r = jnp.where((cos_i < 0)[:, None], _flip_z(wi), wi)
    hv = wo + wi_r
    hv = safe_normalize(hv)
    pdf_ggx = _ggx_pdf_wi(wo, hv, alpha)

    pdf = jnp.where(cos_i > 0, w_diff * pdf_diff + w_spec * pdf_ggx,
                    w_trans * pdf_ggx)
    return jnp.where(delta, w_diff * pdf_diff, pdf)


def surface_sample(p: SurfaceMaterial, wo, u):
    """u[:, 0:3] = (u0, u1, u_lobe) ->
    (wi, weight = f|cos|/pdf incl. delta, pdf, is_delta_sample)."""
    delta = p.roughness < DELTA_ROUGHNESS
    alpha = jnp.maximum(p.roughness ** 2, MIN_ALPHA)
    cos_o = jnp.maximum(wo[:, 2], 1e-6)
    w_diff, w_spec, w_trans = _lobe_weights(p, cos_o)

    u0, u1, ul = u[:, 0], u[:, 1], u[:, 2]
    pick_diff = ul < w_diff
    pick_spec = ~pick_diff & (ul < w_diff + w_spec)
    pick_trans = ~pick_diff & ~pick_spec

    r = jnp.sqrt(u0)
    phi = 2.0 * jnp.pi * u1
    wi_d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                      jnp.sqrt(jnp.maximum(0.0, 1.0 - u0))], -1)

    hv = _ggx_sample_vndf(wo, alpha, u0, u1)
    wi_s = 2.0 * jnp.sum(wo * hv, -1)[:, None] * hv - wo
    wi_mirror = jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], -1)
    wi_s = jnp.where(delta[:, None], wi_mirror, wi_s)

    wi_t = _flip_z(wi_s)
    wi_t = jnp.where(delta[:, None], -wo, wi_t)

    wi = jnp.where(pick_diff[:, None], wi_d,
                   jnp.where(pick_spec[:, None], wi_s, wi_t))

    pdf = surface_pdf(p, wo, wi)
    f = surface_f(p, wo, wi)
    weight = f * jnp.abs(wi[:, 2:3]) / jnp.maximum(pdf[:, None], 1e-12)
    weight = jnp.where((pdf > 1e-12)[:, None], weight, 0.0)

    fh = _fresnel(p, cos_o)
    w_delta_spec = fh / jnp.maximum(w_spec[:, None], 1e-12)
    kt = ((1.0 - p.metallic) * p.transmission)[:, None]
    w_delta_trans = p.color * kt * (1.0 - _lum(fh))[:, None] \
        / jnp.maximum(w_trans[:, None], 1e-12)
    is_delta_sample = delta & (pick_spec | pick_trans)
    weight = jnp.where((delta & pick_spec)[:, None], w_delta_spec, weight)
    weight = jnp.where((delta & pick_trans)[:, None], w_delta_trans,
                       weight)

    bad = (pick_spec & ~delta & (wi[:, 2] <= 0)) \
        | (pick_trans & ~delta & (wi[:, 2] >= 0))
    weight = jnp.where(bad[:, None], 0.0, weight)
    return wi, weight, pdf, is_delta_sample
