"""Surface (non-hair) BSDF — numpy float64 oracle.

Replicates the reference's material->BSDF lowering for ordinary surfaces
[U:libs/yocto/yocto_trace.cpp eval_brdfcos/sample_brdf/sample_brdf_pdf]
(SURVEY.md §2.7): a single parametric material (color, roughness,
metallic, ior, transmission, emission) lowered to a lobe mixture

  * diffuse (lambertian)            (1-metallic)(1-transmission)(1-F)
  * microfacet GGX specular/metal   Schlick fresnel, F0 = lerp(f0(ior),
                                    color, metallic)
  * thin transmission               GGX lobe mirrored into the lower
                                    hemisphere, (1-metallic)·transmission
  * delta variants of the specular/transmission lobes when roughness == 0
    (polished metal / plastic / thin glass)

Conventions: local shading frame with the normal = +z and wo.z > 0 (the
integrator flips the frame so the outgoing ray is always in the upper
hemisphere). `f` returns the BSDF WITHOUT the |cos| factor; delta lobes
return f = 0 and pdf = 0 (they only contribute through sample()'s weight),
matching how the reference's integrator treats delta BSDFs in NEE/MIS.

All functions are batched over leading axis N and float64.
"""

from __future__ import annotations

import numpy as np

LUM = np.array([0.2126, 0.7152, 0.0722])
MIN_ALPHA = 1e-4
DELTA_ROUGHNESS = 1e-3  # roughness below this => delta lobes


def make_material(emission=(0.0, 0.0, 0.0), color=(0.0, 0.0, 0.0),
                  roughness=1.0, metallic=0.0, ior=1.5, transmission=0.0,
                  specular=1.0, color_tex=-1, emission_tex=-1,
                  roughness_tex=-1):
    """Normalized material dict (the oracle scene format). `specular`
    scales the dielectric reflection lobe (yocto-style knob: matte
    surfaces have specular = 0). *_tex index scene["textures"] (-1 =
    none); a texture MULTIPLIES its constant (oracle/texture.py)."""
    return {
        "emission": np.asarray(emission, np.float64),
        "color": np.asarray(color, np.float64),
        "roughness": float(roughness),
        "metallic": float(metallic),
        "ior": float(ior),
        "transmission": float(transmission),
        "specular": float(specular),
        "color_tex": int(color_tex),
        "emission_tex": int(emission_tex),
        "roughness_tex": int(roughness_tex),
    }


def material_from_legacy(prim: dict):
    """Back-compat: {'albedo': c} => matte (spec-free) material."""
    if "material" in prim:
        return make_material(**prim["material"])
    return make_material(color=prim.get("albedo", (0.0, 0.0, 0.0)),
                         specular=0.0)


def _lum(c):
    return c @ LUM


def _f0(color, metallic, ior, specular):
    f0d = specular * ((ior - 1.0) / (ior + 1.0)) ** 2
    return f0d[..., None] * (1.0 - metallic[..., None]) \
        + color * metallic[..., None]


def _fresnel(p, cos_t):
    """Mixed Schlick fresnel: metal part uses color F0; the dielectric
    part is scaled by `specular` INCLUDING its grazing term (specular=0
    kills the lobe entirely, unlike Schlick with F0=0)."""
    m = np.clip(1.0 - np.abs(cos_t), 0.0, 1.0) ** 5
    f_metal = p["color"] + (1.0 - p["color"]) * m[..., None]
    f0d = ((p["ior"] - 1.0) / (p["ior"] + 1.0)) ** 2
    f_diel = (p["specular"] * (f0d + (1.0 - f0d) * m))[..., None]
    return p["metallic"][..., None] * f_metal \
        + (1.0 - p["metallic"][..., None]) * f_diel


def _ggx_d(cos_h, alpha):
    a2 = alpha ** 2
    den = cos_h ** 2 * (a2 - 1.0) + 1.0
    return np.where(cos_h > 0, a2 / np.maximum(np.pi * den ** 2, 1e-30),
                    0.0)


def _ggx_g1(cos_w, alpha):
    a2 = alpha ** 2
    c = np.abs(cos_w)
    return 2.0 * c / np.maximum(
        c + np.sqrt(a2 + (1.0 - a2) * c ** 2), 1e-12)


def _ggx_g(cos_o, cos_i, alpha):
    return _ggx_g1(cos_o, alpha) * _ggx_g1(cos_i, alpha)


def _ggx_sample_vndf(wo, alpha, u0, u1):
    """Heitz 2018 visible-normal GGX sampling (isotropic). wo.z > 0."""
    vh = np.stack([alpha * wo[:, 0], alpha * wo[:, 1], wo[:, 2]], -1)
    vh = vh / np.maximum(np.linalg.norm(vh, axis=-1, keepdims=True), 1e-12)
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv = 1.0 / np.sqrt(np.maximum(lensq, 1e-24))
    t1 = np.where((lensq > 1e-20)[:, None],
                  np.stack([-vh[:, 1] * inv, vh[:, 0] * inv,
                            np.zeros_like(inv)], -1),
                  np.array([[1.0, 0.0, 0.0]]))
    t2 = np.cross(vh, t1)
    r = np.sqrt(u0)
    phi = 2.0 * np.pi * u1
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1.0 + vh[:, 2])
    p2 = (1.0 - s) * np.sqrt(np.maximum(1.0 - p1 ** 2, 0.0)) + s * p2
    nh = p1[:, None] * t1 + p2[:, None] * t2 + np.sqrt(np.maximum(
        1.0 - p1 ** 2 - p2 ** 2, 0.0))[:, None] * vh
    h = np.stack([alpha * nh[:, 0], alpha * nh[:, 1],
                  np.maximum(nh[:, 2], 0.0)], -1)
    return h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def _ggx_pdf_wi(wo, hv, alpha):
    """pdf of wi = reflect(wo, h) under VNDF sampling:
    G1(wo) D(h) / (4 cos_o)."""
    cos_o = np.maximum(wo[:, 2], 1e-6)
    return _ggx_g1(cos_o, alpha) * _ggx_d(hv[:, 2], alpha) / (4.0 * cos_o)


def _broadcast_params(mat, n):
    """mat: dict of per-batch or scalar params -> arrays of shape (n, ...)."""
    out = {}
    for k in ("emission", "color"):
        v = np.asarray(mat[k], np.float64)
        out[k] = np.broadcast_to(v, (n, 3)).astype(np.float64)
    mat = dict(mat)
    mat.setdefault("specular", 1.0)
    for k in ("roughness", "metallic", "ior", "transmission", "specular"):
        v = np.asarray(mat[k], np.float64)
        out[k] = np.broadcast_to(v, (n,)).astype(np.float64)
    return out


def _lobe_weights(p, cos_o):
    """Sampling weights (p_diff, p_spec, p_trans), normalized."""
    fo = _lum(_fresnel(p, cos_o))
    w_spec = fo
    base = (1.0 - fo) * (1.0 - p["metallic"])
    w_diff = base * (1.0 - p["transmission"])
    w_trans = base * p["transmission"]
    total = w_diff + w_spec + w_trans
    # black material: fall back to cosine sampling so pdf stays valid
    w_diff = np.where(total > 1e-12, w_diff / np.maximum(total, 1e-12), 1.0)
    w_spec = np.where(total > 1e-12, w_spec / np.maximum(total, 1e-12), 0.0)
    w_trans = np.where(total > 1e-12, w_trans / np.maximum(total, 1e-12),
                       0.0)
    return w_diff, w_spec, w_trans


def surface_f(mat, wo, wi):
    """BSDF value (N, 3), WITHOUT the |cos wi| factor. Delta lobes -> 0."""
    n = wo.shape[0]
    p = _broadcast_params(mat, n)
    delta = p["roughness"] < DELTA_ROUGHNESS
    alpha = np.maximum(p["roughness"] ** 2, MIN_ALPHA)
    cos_o = np.maximum(wo[:, 2], 1e-6)
    cos_i = wi[:, 2]
    f0 = _f0(p["color"], p["metallic"], p["ior"], p["specular"])

    # reflection half-vector terms
    wi_r = np.where((cos_i < 0)[:, None],
                    wi * np.array([1.0, 1.0, -1.0]), wi)
    hv = wo + wi_r
    hv = hv / np.maximum(np.linalg.norm(hv, axis=-1, keepdims=True), 1e-12)
    ch = np.sum(wo * hv, -1)
    fh = _fresnel(p, ch)
    d_term = _ggx_d(hv[:, 2], alpha)
    g_term = _ggx_g(cos_o, np.abs(cos_i), alpha)
    spec = fh * (d_term * g_term
                 / np.maximum(4.0 * cos_o * np.abs(cos_i), 1e-12))[:, None]

    # Ashikhmin-Shirley coupled diffuse: energy-conserving with the
    # Schlick specular by construction (plain (1-F(h)) diffuse gains
    # up to ~20% at grazing angles)
    kd = ((1.0 - p["metallic"]) * (1.0 - p["transmission"])
          * (1.0 - _lum(f0)))[:, None]
    as_o = 1.0 - (1.0 - 0.5 * cos_o) ** 5
    as_i = 1.0 - (1.0 - 0.5 * np.abs(cos_i)) ** 5
    diff = p["color"] * (28.0 / (23.0 * np.pi)) * kd \
        * (as_o * as_i)[:, None]
    f_refl = diff + spec

    kt = ((1.0 - p["metallic"]) * p["transmission"])[:, None] \
        * (1.0 - _lum(fh))[:, None]
    f_trans = p["color"] * kt * (d_term * g_term / np.maximum(
        4.0 * cos_o * np.abs(cos_i), 1e-12))[:, None]

    f = np.where((cos_i > 0)[:, None], f_refl, f_trans)
    f = np.where((np.abs(cos_i) < 1e-7)[:, None], 0.0, f)
    # delta materials: only the diffuse lobe survives in eval
    f_delta = np.where((cos_i > 0)[:, None], diff, 0.0)
    return np.where(delta[:, None], f_delta, f)


def surface_pdf(mat, wo, wi):
    """Solid-angle pdf of sample_surface. Delta lobes excluded."""
    n = wo.shape[0]
    p = _broadcast_params(mat, n)
    delta = p["roughness"] < DELTA_ROUGHNESS
    alpha = np.maximum(p["roughness"] ** 2, MIN_ALPHA)
    cos_i = wi[:, 2]
    w_diff, w_spec, w_trans = _lobe_weights(p, np.maximum(wo[:, 2], 1e-6))

    pdf_diff = np.maximum(cos_i, 0.0) / np.pi

    wi_r = np.where((cos_i < 0)[:, None],
                    wi * np.array([1.0, 1.0, -1.0]), wi)
    hv = wo + wi_r
    hv = hv / np.maximum(np.linalg.norm(hv, axis=-1, keepdims=True), 1e-12)
    pdf_ggx = _ggx_pdf_wi(wo, hv, alpha)

    pdf = np.where(cos_i > 0, w_diff * pdf_diff + w_spec * pdf_ggx,
                   w_trans * pdf_ggx)
    pdf_delta = w_diff * pdf_diff  # only diffuse is non-delta
    return np.where(delta, pdf_delta, pdf)


def sample_surface(mat, wo, u):
    """Sample wi from (u0, u1, u_lobe) = u[:, 0:3].

    Returns (wi (N,3), weight (N,3) = f*|cos|/pdf incl. delta lobes,
    pdf (N,), is_delta_sample (N,) bool).
    """
    n = wo.shape[0]
    p = _broadcast_params(mat, n)
    delta = p["roughness"] < DELTA_ROUGHNESS
    alpha = np.maximum(p["roughness"] ** 2, MIN_ALPHA)
    cos_o = np.maximum(wo[:, 2], 1e-6)
    w_diff, w_spec, w_trans = _lobe_weights(p, cos_o)

    u0, u1, ul = u[:, 0], u[:, 1], u[:, 2]
    pick_diff = ul < w_diff
    pick_spec = ~pick_diff & (ul < w_diff + w_spec)
    pick_trans = ~pick_diff & ~pick_spec

    # diffuse: cosine hemisphere
    r = np.sqrt(u0)
    phi = 2.0 * np.pi * u1
    wi_d = np.stack([r * np.cos(phi), r * np.sin(phi),
                     np.sqrt(np.maximum(0.0, 1.0 - u0))], -1)

    # GGX half-vector: visible-normal sampling
    hv = _ggx_sample_vndf(wo, alpha, u0, u1)
    wi_s = 2.0 * np.sum(wo * hv, -1)[:, None] * hv - wo
    # delta: mirror reflection
    wi_mirror = np.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], -1)
    wi_s = np.where(delta[:, None], wi_mirror, wi_s)

    wi_t = wi_s * np.array([1.0, 1.0, -1.0])
    # delta thin transmission: straight through
    wi_pass = -wo
    wi_t = np.where(delta[:, None], wi_pass, wi_t)

    wi = np.where(pick_diff[:, None], wi_d,
                  np.where(pick_spec[:, None], wi_s, wi_t))

    pdf = surface_pdf(mat, wo, wi)
    f = surface_f(mat, wo, wi)
    weight = f * np.abs(wi[:, 2:3]) / np.maximum(pdf[:, None], 1e-12)
    weight = np.where((pdf > 1e-12)[:, None], weight, 0.0)

    # delta lobe weights override (f/pdf of a delta pair is analytic)
    fh = _fresnel(p, cos_o)
    w_delta_spec = fh / np.maximum(w_spec[:, None], 1e-12)
    kt = ((1.0 - p["metallic"]) * p["transmission"])[:, None]
    w_delta_trans = p["color"] * kt * (1.0 - _lum(fh))[:, None] \
        / np.maximum(w_trans[:, None], 1e-12)
    is_delta_sample = delta & (pick_spec | pick_trans)
    weight = np.where((delta & pick_spec)[:, None], w_delta_spec, weight)
    weight = np.where((delta & pick_trans)[:, None], w_delta_trans, weight)

    bad = (pick_spec & ~delta & (wi[:, 2] <= 0)) \
        | (pick_trans & ~delta & (wi[:, 2] >= 0))
    weight = np.where(bad[:, None], 0.0, weight)
    return wi, weight, pdf, is_delta_sample
