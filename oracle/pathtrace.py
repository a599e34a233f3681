"""Tiny deterministic path tracer — numpy float64 oracle.

Mirrors the reference's `trace_path` loop (SURVEY.md §3.1
[U:libs/yocto/yocto_trace.cpp]): intersect -> emission/env -> direct
lighting -> BSDF sample -> Russian roulette — over hair segments plus
spheres/planes carrying full surface materials (oracle/surface_bsdf.py:
matte/glossy/metal/thin-transmission incl. delta lobes, emission), point
lights, env map / constant environment.

Determinism contract: all randomness comes from the caller-provided
`uniforms` tensor of shape (n_rays, 4 + max_depth * 8):
  [0:2]                          subpixel jitter
  [2:4]                          thin-lens disk sample
  [4 + 8*d : 4 + 8*d + 4]        BSDF sample at bounce d
                                 (surfaces use dims 0,1 + dim 2 as the
                                 lobe choice; hair uses all four)
  [4 + 8*d + 4]                  Russian roulette at bounce d
  [4 + 8*d + 5]                  light selection (reserved)
  [4 + 8*d + 6 : 4 + 8*d + 8]    environment-map NEE sample at bounce d
The JAX integrator consumes the SAME layout, so feeding both the same
uniforms must reproduce the same image up to float32 tolerance.
"""

from __future__ import annotations

import numpy as np

from . import geometry as geo
from . import surface_bsdf as osb
from .hair_bsdf import HairBSDF

RR_START = 3
D_PIXEL = 4
D_BOUNCE = 8


def n_uniform_dims(max_depth):
    return D_PIXEL + D_BOUNCE * max_depth


def _to_local(w, fx, fy, fz):
    return np.stack([np.sum(w * fx, -1), np.sum(w * fy, -1),
                     np.sum(w * fz, -1)], axis=-1)


def _to_world(w, fx, fy, fz):
    return (w[..., 0:1] * fx + w[..., 1:2] * fy + w[..., 2:3] * fz)


def scene_surface_materials(scene):
    """Per-prim surface materials: one entry per sphere then per plane
    (legacy 'albedo' entries lower to matte). Always >= 1 entry."""
    mats = [osb.material_from_legacy(p)
            for p in list(scene.get("spheres", []))
            + list(scene.get("planes", []))]
    return mats or [osb.make_material()]


def _gather_materials(mats, idx):
    """Stack a material list into per-ray param arrays by index."""
    idx = np.clip(idx, 0, len(mats) - 1)
    out = {}
    for k in ("emission", "color"):
        out[k] = np.stack([m[k] for m in mats])[idx]
    for k in ("roughness", "metallic", "ior", "transmission", "specular"):
        out[k] = np.asarray([m[k] for m in mats])[idx]
    return out


def _intersect_scene(scene, o, d):
    """Closest hit over all scene geometry. Returns per-ray dict with
    mat: -1 = miss, 0 = hair, 1 = surface; mat_id indexes
    scene_surface_materials(scene) for surface hits."""
    n = o.shape[0]
    best = {
        "hit": np.zeros(n, bool), "t": np.full(n, geo.INF),
        "mat": np.full(n, -1, np.int64),
        "mat_id": np.zeros(n, np.int64),
        "position": np.zeros((n, 3)), "normal": np.zeros((n, 3)),
        "tangent": np.zeros((n, 3)), "frame_y": np.zeros((n, 3)),
        "frame_z": np.zeros((n, 3)), "h": np.zeros(n),
        "radius": np.zeros(n),
    }
    if scene.get("segments") is not None:
        p0, p1, r0, r1 = scene["segments"]
        hs = geo.intersect_segments(o, d, p0, p1, r0, r1)
        closer = hs["hit"] & (hs["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hs["t"], best["t"])
        best["mat"] = np.where(closer, 0, best["mat"])
        for k in ("position", "tangent", "frame_y", "frame_z"):
            best[k] = np.where(closer[:, None], hs[k], best[k])
        best["h"] = np.where(closer, hs["h"], best["h"])
        seg_r = (hs["u"] * (r1 - r0)[hs["seg"]] + r0[hs["seg"]])
        best["radius"] = np.where(closer, seg_r, best["radius"])
    mat_id = 0
    for sph in scene.get("spheres", []):
        hs = geo.intersect_sphere(o, d, np.asarray(sph["center"], np.float64),
                                  sph["radius"])
        closer = hs["hit"] & (hs["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hs["t"], best["t"])
        best["mat"] = np.where(closer, 1, best["mat"])
        best["mat_id"] = np.where(closer, mat_id, best["mat_id"])
        for k in ("position", "normal"):
            best[k] = np.where(closer[:, None], hs[k], best[k])
        mat_id += 1
    for pl in scene.get("planes", []):
        hs = geo.intersect_plane(o, d, np.asarray(pl["point"], np.float64),
                                 np.asarray(pl["normal"], np.float64),
                                 )
        closer = hs["hit"] & (hs["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hs["t"], best["t"])
        best["mat"] = np.where(closer, 1, best["mat"])
        best["mat_id"] = np.where(closer, mat_id, best["mat_id"])
        for k in ("position", "normal"):
            best[k] = np.where(closer[:, None], hs[k], best[k])
        mat_id += 1
    return best


def _occluded(scene, o, d, dist):
    """Any-hit between o and o + d*dist (for shadow rays)."""
    hs = _intersect_scene(scene, o, d)
    return hs["hit"] & (hs["t"] < dist * (1.0 - 1e-4))


def _occluded_far(scene, o, d):
    """Any-hit to infinity (environment shadow rays)."""
    hs = _intersect_scene(scene, o, d)
    return hs["hit"]


def _hair_bsdf(scene, h, key="hair_material"):
    m = scene.get(key) or scene["hair_material"]
    return HairBSDF(h=h, sigma_a=np.asarray(m["sigma_a"], np.float64),
                    beta_m=m["beta_m"], beta_n=m["beta_n"],
                    alpha=m.get("alpha", np.deg2rad(2.0)),
                    eta=m.get("eta", 1.55))


def trace(scene, o, d, uniforms, max_depth=4):
    """Path-trace a batch of rays. Returns (n, 3) radiance."""
    n = o.shape[0]
    L = np.zeros((n, 3))
    beta = np.ones((n, 3))
    # base-material throughput: drives RR and liveness decisions so they
    # stay fixed under eval-material perturbations (matches the JAX
    # integrator's stop_gradient policy)
    beta_base = np.ones((n, 3))
    alive = np.ones(n, bool)
    env = np.asarray(scene.get("environment", [0.0, 0.0, 0.0]), np.float64)
    lights = scene.get("point_lights", [])
    env_map = scene.get("env_map")
    if env_map is not None and not hasattr(env_map, "sample"):
        from .envmap import EnvMap
        env_map = EnvMap(env_map)
    mats = scene_surface_materials(scene)
    # pdf of the previous bounce's BSDF sample (solid angle) for MIS
    prev_pdf = np.zeros(n)
    # previous bounce sampled a delta lobe: BSDF sampling is the only
    # strategy that can hit anything through it -> env MIS weight 1
    prev_delta = np.zeros(n, bool)

    for depth in range(max_depth):
        hs = _intersect_scene(scene, o, d)
        # environment on miss; env-map part is MIS-weighted against the
        # previous bounce's env NEE (depth 0 came from the camera: w = 1)
        miss = alive & ~hs["hit"]
        L[miss] += beta[miss] * env
        if env_map is not None:
            le = env_map.eval(d)
            if depth == 0:
                w = np.ones(n)
            else:
                pe = env_map.pdf(d)
                w = prev_pdf ** 2 / np.maximum(prev_pdf ** 2 + pe ** 2,
                                               1e-30)
                w = np.where(prev_delta, 1.0, w)
            L[miss] += beta[miss] * le[miss] * w[miss, None]
        alive = alive & hs["hit"]
        if not alive.any():
            break

        is_hair = hs["mat"] == 0
        pos = hs["position"]
        sp = _gather_materials(mats, hs["mat_id"])

        # emission of surface hits (area lights seen by BSDF rays)
        L += np.where((alive & ~is_hair)[:, None], beta * sp["emission"],
                      0.0)

        # shading frames; surface normals flipped to face the ray so the
        # surface BSDF always sees wo.z > 0 (double-sided shading)
        fx = np.where(is_hair[:, None], hs["tangent"], 0.0)
        fy = np.where(is_hair[:, None], hs["frame_y"], 0.0)
        nrm = hs["normal"]
        nrm = nrm * np.where((np.sum(nrm * d, -1) > 0)[:, None], -1.0, 1.0)
        fz = np.where(is_hair[:, None], hs["frame_z"], nrm)
        a = np.where(np.abs(nrm[:, 0:1]) > 0.9, np.array([[0.0, 1.0, 0.0]]),
                     np.array([[1.0, 0.0, 0.0]]))
        t1 = geo.normalize(np.cross(nrm, a))
        t2 = np.cross(nrm, t1)
        fx = np.where(is_hair[:, None], fx, t1)
        fy = np.where(is_hair[:, None], fy, t2)

        wo_w = -d
        wo = _to_local(wo_w, fx, fy, fz)
        # `hair_material` drives sampling decisions; the optional
        # `hair_material_eval` key drives f-evaluation. Splitting them makes
        # finite differences over the eval material compute exactly the
        # detached-sampling gradient estimator the JAX integrator uses
        # (directions/pdf frozen at base parameters).
        bsdf = _hair_bsdf(scene, hs["h"])
        bsdf_eval = (_hair_bsdf(scene, hs["h"], "hair_material_eval")
                     if scene.get("hair_material_eval") else bsdf)

        # ---- direct lighting: sum over all point lights (deterministic)
        ray_eps = np.where(is_hair, 2.0 * hs["radius"], 1e-4)
        for light in lights:
            lp = np.asarray(light["position"], np.float64)
            li = np.asarray(light["intensity"], np.float64)
            to_l = lp - pos
            dist = np.linalg.norm(to_l, axis=-1)
            wi_w = to_l / np.maximum(dist[:, None], 1e-12)
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~_occluded(scene, sh_o, wi_w, dist - ray_eps)
            wi = _to_local(wi_w, fx, fy, fz)
            f_hair = bsdf_eval.f(wo, wi) * np.abs(wi[:, 2:3])
            f_surf = osb.surface_f(sp, wo, wi) * np.abs(wi[:, 2:3])
            f = np.where(is_hair[:, None], f_hair, f_surf)
            contrib = beta * f * li / np.maximum(dist[:, None] ** 2, 1e-12)
            L += np.where((alive & vis)[:, None], contrib, 0.0)

        # ---- environment-map NEE with MIS (if an env map is present)
        if env_map is not None:
            ue = uniforms[:, D_PIXEL + D_BOUNCE * depth + 6:
                          D_PIXEL + D_BOUNCE * depth + 8]
            wi_w, pdf_e = env_map.sample(ue[:, 0], ue[:, 1])
            le = env_map.eval(wi_w)
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~_occluded_far(scene, sh_o, wi_w)
            wi = _to_local(wi_w, fx, fy, fz)
            f_hair = bsdf_eval.f(wo, wi) * np.abs(wi[:, 2:3])
            f_surf = osb.surface_f(sp, wo, wi) * np.abs(wi[:, 2:3])
            f = np.where(is_hair[:, None], f_hair, f_surf)
            pdf_b = np.where(is_hair, bsdf.pdf(wo, wi),
                             osb.surface_pdf(sp, wo, wi))
            w_mis = pdf_e ** 2 / np.maximum(pdf_e ** 2 + pdf_b ** 2, 1e-30)
            contrib = beta * f * le * (w_mis / np.maximum(pdf_e, 1e-12))[:, None]
            L += np.where((alive & vis)[:, None], contrib, 0.0)

        # ---- BSDF sampling for the next bounce
        ub = uniforms[:, D_PIXEL + D_BOUNCE * depth:
                      D_PIXEL + D_BOUNCE * depth + 4]
        f_h, wi_h, pdf_h = bsdf.sample_f(wo, ub)
        f_h_eval = bsdf_eval.f(wo, wi_h) if bsdf_eval is not bsdf else f_h
        denom_pdf = np.maximum(pdf_h[:, None], 1e-12)
        w_hair = f_h_eval * np.abs(wi_h[:, 2:3]) / denom_pdf
        w_hair = np.where((pdf_h > 1e-12)[:, None], w_hair, 0.0)
        w_hair_base = f_h * np.abs(wi_h[:, 2:3]) / denom_pdf
        w_hair_base = np.where((pdf_h > 1e-12)[:, None], w_hair_base, 0.0)
        # surface lobe-mixture sampling (u0, u1, u_lobe)
        wi_s, w_surf, pdf_s, delta_s = osb.sample_surface(
            sp, wo, ub[:, :3])
        wi = np.where(is_hair[:, None], wi_h, wi_s)
        weight = np.where(is_hair[:, None], w_hair, w_surf)
        weight_base = np.where(is_hair[:, None], w_hair_base, w_surf)

        # solid-angle pdf of the chosen continuation (for env MIS)
        prev_pdf = np.where(is_hair, pdf_h, pdf_s)
        prev_delta = ~is_hair & delta_s

        beta = beta * weight
        beta_base = beta_base * weight_base
        d = geo.normalize(_to_world(wi, fx, fy, fz))
        o = pos + d * ray_eps[:, None]
        alive = alive & (np.max(np.abs(beta_base), axis=-1) > 0)

        # ---- Russian roulette (decisions from base throughput)
        if depth >= RR_START:
            u_rr = uniforms[:, D_PIXEL + D_BOUNCE * depth + 4]
            p_cont = np.clip(np.max(beta_base, axis=-1), 0.05, 1.0)
            die = u_rr > p_cont
            alive = alive & ~die
            beta = beta / p_cont[:, None]
            beta_base = beta_base / p_cont[:, None]

        if not alive.any():
            break
    return L


def render(scene, cam, uniforms, max_depth=4):
    """Render an image. uniforms: (H, W, spp, n_uniform_dims). -> (H, W, 3)."""
    h, w, spp, _ = uniforms.shape
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    i = np.repeat(ii.reshape(-1), spp)
    j = np.repeat(jj.reshape(-1), spp)
    u = uniforms.reshape(h * w * spp, -1)
    cam = dict(cam, width=w, height=h)
    o, d = geo.camera_rays(cam, i, j, u[:, :4])
    L = trace(scene, o, d, u, max_depth=max_depth)
    return L.reshape(h, w, spp, 3).mean(axis=2)
