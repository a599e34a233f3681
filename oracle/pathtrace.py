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
  [4 + 12*d : 4 + 12*d + 4]      BSDF sample at bounce d
                                 (surfaces use dims 0,1 + dim 2 as the
                                 lobe choice; hair uses all four)
  [4 + 12*d + 4]                 Russian roulette at bounce d
  [4 + 12*d + 5]                 area-light element selection
  [4 + 12*d + 6 : 4 + 12*d + 8]  environment-map NEE sample at bounce d
  [4 + 12*d + 8 : 4 + 12*d + 10] area-light position sample at bounce d
  [4 + 12*d + 10 : 4 + 12*d + 12] reserved
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
D_BOUNCE = 12


def n_uniform_dims(max_depth):
    return D_PIXEL + D_BOUNCE * max_depth


def _to_local(w, fx, fy, fz):
    return np.stack([np.sum(w * fx, -1), np.sum(w * fy, -1),
                     np.sum(w * fz, -1)], axis=-1)


def _to_world(w, fx, fy, fz):
    return (w[..., 0:1] * fx + w[..., 1:2] * fy + w[..., 2:3] * fz)


def scene_surface_materials(scene):
    """Per-prim surface materials: one entry per sphere, then per plane,
    then per triangle mesh (legacy 'albedo' entries lower to matte).
    Always >= 1 entry."""
    mats = [osb.material_from_legacy(p)
            for p in list(scene.get("spheres", []))
            + list(scene.get("planes", []))
            + list(scene.get("meshes", []))]
    return mats or [osb.make_material()]


def scene_area_lights(scene):
    """Emissive-element light table (the reference's `init_lights` shape
    CDFs, SURVEY.md §2.7 [U:libs/yocto/yocto_trace.cpp]).

    Elements: every emissive sphere (kind 1) and every triangle of an
    emissive mesh (kind 0). Selection pmf ~ element area x emission
    luminance (power heuristic for the element pick). Emission is
    double-sided. Returns None when the scene has no emissive shapes,
    else a dict of flat arrays plus hit->element maps:
      kind (A,), p0/p1/p2 (A,3) (sphere: p0=center, p1[:,0]=radius),
      emission (A,3), area (A,), pmf (A,), cdf (A,),
      sph_light_id (NS,), tri_light_id (T_total,) — -1 = not a light.
    """
    lum = np.array([0.2126, 0.7152, 0.0722])
    spheres = list(scene.get("spheres") or [])
    meshes = list(scene.get("meshes") or [])
    n_pl = len(scene.get("planes") or [])
    mats = scene_surface_materials(scene)
    kind, p0s, p1s, p2s, ems, areas = [], [], [], [], [], []
    uv0s, uv1s, uv2s, texs = [], [], [], []
    sph_light_id = np.full(len(spheres), -1, np.int64)
    tri_light_id = []
    for i, sph in enumerate(spheres):
        em = mats[i]["emission"]
        if (em > 0).any():
            sph_light_id[i] = len(kind)
            kind.append(1)
            p0s.append(np.asarray(sph["center"], np.float64))
            p1s.append(np.array([sph["radius"], 0.0, 0.0]))
            p2s.append(np.zeros(3))
            ems.append(em)
            areas.append(4.0 * np.pi * sph["radius"] ** 2)
            # sphere uv comes from the sampled normal at NEE time
            uv0s.append(np.zeros(2))
            uv1s.append(np.zeros(2))
            uv2s.append(np.zeros(2))
            texs.append(int(mats[i].get("emission_tex", -1)))
    for mi, mesh in enumerate(meshes):
        em = mats[len(spheres) + n_pl + mi]["emission"]
        etex = int(mats[len(spheres) + n_pl + mi].get("emission_tex", -1))
        tri = np.asarray(mesh["triangles"], np.int64)
        ids = np.full(len(tri), -1, np.int64)
        if (em > 0).any():
            pos = np.asarray(mesh["positions"], np.float64)
            v = pos[tri]
            tc = mesh.get("texcoords")
            uvv = (np.asarray(tc, np.float64)[tri] if tc is not None
                   else np.zeros((len(tri), 3, 2)))
            ar = 0.5 * np.linalg.norm(
                np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
            for ti in range(len(tri)):
                ids[ti] = len(kind)
                kind.append(0)
                p0s.append(v[ti, 0])
                p1s.append(v[ti, 1])
                p2s.append(v[ti, 2])
                ems.append(em)
                areas.append(ar[ti])
                uv0s.append(uvv[ti, 0])
                uv1s.append(uvv[ti, 1])
                uv2s.append(uvv[ti, 2])
                # texture only applies when the mesh carries texcoords
                texs.append(etex if tc is not None else -1)
        tri_light_id.append(ids)
    if not kind:
        return None
    areas = np.asarray(areas)
    ems = np.asarray(ems)
    power = areas * np.maximum(ems @ lum, 1e-12)
    pmf = power / power.sum()
    return {
        "kind": np.asarray(kind, np.int64),
        "p0": np.asarray(p0s), "p1": np.asarray(p1s),
        "p2": np.asarray(p2s), "emission": ems, "area": areas,
        "pmf": pmf, "cdf": np.cumsum(pmf),
        # emission-texture support at the sampled light point (NEE must
        # integrate the SAME textured emission that BSDF-ray hits see, or
        # MIS combines two different integrands):
        "uv0": np.asarray(uv0s), "uv1": np.asarray(uv1s),
        "uv2": np.asarray(uv2s), "tex": np.asarray(texs, np.int64),
        "sph_light_id": sph_light_id,
        "tri_light_id": (np.concatenate(tri_light_id)
                         if tri_light_id else np.zeros(0, np.int64)),
    }


def _area_light_point(al, el, u0, u1):
    """Sample a point on light element `el`. -> (point, normal, uv).

    uv at the sampled point (barycentric texcoords for triangles,
    spherical mapping for spheres) feeds the emission-texture lookup so
    NEE and BSDF-hit emission integrate the same textured radiance."""
    kind = al["kind"][el]
    # triangle: uniform barycentric
    su = np.sqrt(np.maximum(u0, 0.0))
    w1 = su * (1.0 - u1)
    w2 = su * u1
    w0 = 1.0 - w1 - w2
    p_tri = (w0[:, None] * al["p0"][el]
             + w1[:, None] * al["p1"][el] + w2[:, None] * al["p2"][el])
    n_tri = np.cross(al["p1"][el] - al["p0"][el],
                     al["p2"][el] - al["p0"][el])
    n_tri = geo.normalize(n_tri)
    uv_tri = (w0[:, None] * al["uv0"][el] + w1[:, None] * al["uv1"][el]
              + w2[:, None] * al["uv2"][el])
    # sphere: uniform area
    z = 1.0 - 2.0 * u0
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u1
    n_sph = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    p_sph = al["p0"][el] + n_sph * al["p1"][el][:, 0:1]
    uv_sph = np.stack(
        [np.arctan2(n_sph[:, 2], n_sph[:, 0]) / (2.0 * np.pi) + 0.5,
         np.arccos(np.clip(n_sph[:, 1], -1.0, 1.0)) / np.pi], axis=-1)
    tri = (kind == 0)[:, None]
    return (np.where(tri, p_tri, p_sph), np.where(tri, n_tri, n_sph),
            np.where(tri, uv_tri, uv_sph))


def _area_light_emission(scene, al, el, uv):
    """Textured emission at the sampled light point (mirror of the
    emission apply_textures path at BSDF-ray hits)."""
    le = al["emission"][el].copy()
    tid = al["tex"][el]
    if not (tid >= 0).any():
        return le
    from . import texture as otex
    texs = otex.scene_textures(scene)
    for ti, img in enumerate(texs):
        m = tid == ti
        if m.any():
            le[m] = le[m] * otex.tex_bilinear(img, uv[m, 0], uv[m, 1])
    return le


def _area_light_pdf_sa(al, el, pos, lpos, lnrm):
    """Solid-angle pdf of NEE sampling light point `lpos` (element `el`)
    from shading point `pos` (double-sided |cos|)."""
    to_l = lpos - pos
    dist2 = np.sum(to_l * to_l, axis=-1)
    dist = np.sqrt(np.maximum(dist2, 1e-24))
    cos_l = np.abs(np.sum(lnrm * to_l, axis=-1)) / dist
    return (al["pmf"][el] * dist2
            / np.maximum(cos_l * al["area"][el], 1e-12))


def _gather_materials(mats, idx):
    """Stack a material list into per-ray param arrays by index."""
    idx = np.clip(idx, 0, len(mats) - 1)
    out = {}
    for k in ("emission", "color"):
        out[k] = np.stack([m[k] for m in mats])[idx]
    for k in ("roughness", "metallic", "ior", "transmission", "specular"):
        out[k] = np.asarray([m[k] for m in mats])[idx]
    for k in ("color_tex", "emission_tex", "roughness_tex"):
        out[k] = np.asarray([m.get(k, -1) for m in mats], np.int64)[idx]
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
        # light_id: scene_area_lights element index of the hit emissive
        # prim, -1 otherwise (drives the MIS weight on BSDF-hit emission)
        "light_id": np.full(n, -1, np.int64),
        "position": np.zeros((n, 3)), "normal": np.zeros((n, 3)),
        # geometric normal (smooth shading never bends it) — drives the
        # area-light pdf used in MIS weights
        "gnormal": np.zeros((n, 3)),
        "tangent": np.zeros((n, 3)), "frame_y": np.zeros((n, 3)),
        "frame_z": np.zeros((n, 3)), "h": np.zeros(n),
        "radius": np.zeros(n),
        # texture coordinates at the hit (oracle/texture.py conventions)
        "uv": np.zeros((n, 2)),
        # winning hair-segment id (per-shape hair materials), -1 = none
        "seg_id": np.full(n, -1, np.int64),
    }
    al = scene.get("_area_lights")
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
        best["seg_id"] = np.where(closer, hs["seg"], best["seg_id"])
    if scene.get("curves"):
        # first-class Bezier strands, chord-frame attributes for parity
        # with the JAX integrator's curves branch (yhair_tpu
        # integrator/path.py; oracle/bezier.py chord_frame). Curve hits
        # shade with the scene's global hair_material (seg_id stays -1;
        # per-curve mat_id tables are a JAX-side feature).
        from . import bezier as obez

        cv = scene["curves"]
        hc = obez.intersect_curves(o, d, cv["cp"], cv["r0"], cv["r1"],
                                   depth=3, chord_frame=True)
        closer = hc["hit"] & (hc["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hc["t"], best["t"])
        best["mat"] = np.where(closer, 0, best["mat"])
        for k in ("position", "tangent", "frame_y", "frame_z"):
            best[k] = np.where(closer[:, None], hc[k], best[k])
        best["h"] = np.where(closer, hc["h"], best["h"])
        crv_r = (np.asarray(cv["r0"], np.float64)[hc["curve"]]
                 * (1.0 - hc["u"])
                 + np.asarray(cv["r1"], np.float64)[hc["curve"]]
                 * hc["u"])
        best["radius"] = np.where(closer, crv_r, best["radius"])
        best["seg_id"] = np.where(closer, -1, best["seg_id"])
    mat_id = 0
    for si, sph in enumerate(scene.get("spheres") or []):
        hs = geo.intersect_sphere(o, d, np.asarray(sph["center"], np.float64),
                                  sph["radius"])
        closer = hs["hit"] & (hs["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hs["t"], best["t"])
        best["mat"] = np.where(closer, 1, best["mat"])
        best["mat_id"] = np.where(closer, mat_id, best["mat_id"])
        if al is not None:
            best["light_id"] = np.where(closer, al["sph_light_id"][si],
                                        best["light_id"])
        for k in ("position", "normal"):
            best[k] = np.where(closer[:, None], hs[k], best[k])
        best["gnormal"] = np.where(closer[:, None], hs["normal"],
                                   best["gnormal"])
        nrm = hs["normal"]  # outward unit normal -> spherical uv
        uv_s = np.stack(
            [np.arctan2(nrm[:, 2], nrm[:, 0]) / (2.0 * np.pi) + 0.5,
             np.arccos(np.clip(nrm[:, 1], -1.0, 1.0)) / np.pi], axis=-1)
        best["uv"] = np.where(closer[:, None], uv_s, best["uv"])
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
        # planes are never lights: clear any sphere light_id they occlude
        best["light_id"] = np.where(closer, -1, best["light_id"])
        for k in ("position", "normal"):
            best[k] = np.where(closer[:, None], hs[k], best[k])
        best["gnormal"] = np.where(closer[:, None], hs["normal"],
                                   best["gnormal"])
        # planar uv in the STORED normal's tangent frame (never the
        # ray-flipped shading normal: uv must not depend on ray side)
        pn = geo.normalize(np.asarray(pl["normal"], np.float64))
        ax = (np.array([0.0, 1.0, 0.0]) if abs(pn[0]) > 0.9
              else np.array([1.0, 0.0, 0.0]))
        t1p = geo.normalize(np.cross(pn, ax))
        t2p = np.cross(pn, t1p)
        rel = hs["position"] - np.asarray(pl["point"], np.float64)
        uv_p = np.stack([rel @ t1p, rel @ t2p], axis=-1)
        best["uv"] = np.where(closer[:, None], uv_p, best["uv"])
        mat_id += 1
    tri_base = 0
    for mesh in scene.get("meshes", []):
        pos = np.asarray(mesh["positions"], np.float64)
        tri = np.asarray(mesh["triangles"], np.int64)
        hs = geo.intersect_triangles(o, d, pos[tri[:, 0]], pos[tri[:, 1]],
                                     pos[tri[:, 2]])
        closer = hs["hit"] & (hs["t"] < best["t"])
        best["hit"] |= closer
        best["t"] = np.where(closer, hs["t"], best["t"])
        best["mat"] = np.where(closer, 1, best["mat"])
        best["mat_id"] = np.where(closer, mat_id, best["mat_id"])
        if al is not None:
            lid = al["tri_light_id"][tri_base + hs["tri"]]
            best["light_id"] = np.where(closer, lid, best["light_id"])
        tri_base += len(tri)
        nrm = hs["normal"]
        if mesh.get("normals") is not None:
            vn = np.asarray(mesh["normals"], np.float64)[tri[hs["tri"]]]
            nrm = geo.normalize((1.0 - hs["u"] - hs["v"])[:, None] * vn[:, 0]
                                + hs["u"][:, None] * vn[:, 1]
                                + hs["v"][:, None] * vn[:, 2])
            # keep the shading normal on the geometric normal's side
            flip = np.sum(nrm * hs["normal"], axis=-1) < 0
            nrm = nrm * np.where(flip[:, None], -1.0, 1.0)
        best["position"] = np.where(closer[:, None], hs["position"],
                                    best["position"])
        best["normal"] = np.where(closer[:, None], nrm, best["normal"])
        best["gnormal"] = np.where(closer[:, None], hs["normal"],
                                   best["gnormal"])
        if mesh.get("texcoords") is not None:
            tc = np.asarray(mesh["texcoords"], np.float64)[tri[hs["tri"]]]
            uv_m = ((1.0 - hs["u"] - hs["v"])[:, None] * tc[:, 0]
                    + hs["u"][:, None] * tc[:, 1]
                    + hs["v"][:, None] * tc[:, 2])
            best["uv"] = np.where(closer[:, None], uv_m, best["uv"])
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


def _hair_bsdf(scene, h, seg_id=None, key="hair_material"):
    if scene.get("hair_materials") and seg_id is not None:
        # per-shape hair materials: gather table rows per hit segment
        ms = scene["hair_materials"]
        mid = np.asarray(scene["segment_mat_id"],
                         np.int64)[np.maximum(seg_id, 0)]
        return HairBSDF(
            h=h,
            sigma_a=np.stack([np.asarray(m["sigma_a"], np.float64)
                              for m in ms])[mid],
            beta_m=np.asarray([m["beta_m"] for m in ms])[mid],
            beta_n=np.asarray([m["beta_n"] for m in ms])[mid],
            alpha=np.asarray([m.get("alpha", np.deg2rad(2.0))
                              for m in ms])[mid],
            eta=np.asarray([m.get("eta", 1.55) for m in ms])[mid])
    m = scene.get(key) or scene["hair_material"]
    return HairBSDF(h=h, sigma_a=np.asarray(m["sigma_a"], np.float64),
                    beta_m=m["beta_m"], beta_n=m["beta_n"],
                    alpha=m.get("alpha", np.deg2rad(2.0)),
                    eta=m.get("eta", 1.55))


def trace(scene, o, d, uniforms, max_depth=4, edge_softness=0.0):
    """Path-trace a batch of rays. Returns (n, 3) radiance.

    edge_softness > 0 enables SOFT SILHOUETTES on hair strands: a hit
    whose width offset |h| lands in the outer (1 - edge_softness, 1]
    band of the strand is kept only with probability
    alpha = (1 - |h|) / edge_softness; otherwise the ray PASSES THROUGH
    and continues unchanged (consuming the bounce). The estimator keeps
    weight 1 on both branches (the alpha / detached-alpha importance
    ratio is 1 in value), so renders match the JAX integrator sample for
    sample; the JAX side differentiates alpha, which is what carries the
    silhouette (boundary) term of geometry gradients that the interior
    estimator drops (VERDICT r3 #5)."""
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
    al = scene.get("_area_lights", ...)
    if al is ...:
        al = scene_area_lights(scene)
        scene = dict(scene, _area_lights=al)
    # pdf of the previous bounce's BSDF sample (solid angle) for MIS
    prev_pdf = np.zeros(n)
    # previous bounce sampled a delta lobe: BSDF sampling is the only
    # strategy that can hit anything through it -> env MIS weight 1
    prev_delta = np.zeros(n, bool)

    for depth in range(max_depth):
        d_in = d
        prev_pdf_in, prev_delta_in = prev_pdf, prev_delta
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
        pass_th = np.zeros(n, bool)
        if edge_softness:
            u_cov = uniforms[:, D_PIXEL + D_BOUNCE * depth + 10]
            alpha = np.clip((1.0 - np.abs(hs["h"])) / edge_softness,
                            0.0, 1.0)
            cov = alive & is_hair
            alpha = np.where(cov, alpha, 1.0)
            # defensive clamped branch probability — must match the JAX
            # integrator's a_s exactly (see path.py) for value parity
            a_s = np.where(alpha >= 1.0, 1.0, np.clip(alpha, 0.2, 0.8))
            pass_th = cov & (u_cov >= a_s)
            w_cov = np.where(pass_th,
                             (1.0 - alpha) / np.maximum(1.0 - a_s, 1e-6),
                             alpha / np.maximum(a_s, 1e-6))
            w_cov = np.where(cov, w_cov, 1.0)
            beta = beta * w_cov[:, None]
            beta_base = beta_base * w_cov[:, None]
        pos = hs["position"]
        sp = _gather_materials(mats, hs["mat_id"])
        if scene.get("textures"):
            from . import texture as otex
            sp = otex.apply_textures(scene, sp, hs["uv"])

        # emission of surface hits (area lights seen by BSDF rays),
        # MIS-weighted against the area-light NEE that could have sampled
        # the same point (camera rays / delta bounces: weight 1)
        w_em = np.ones(n)
        if al is not None and depth > 0:
            lid = np.maximum(hs["light_id"], 0)
            pdf_l = _area_light_pdf_sa(al, lid, o, hs["position"],
                                       hs["gnormal"])
            w = prev_pdf ** 2 / np.maximum(prev_pdf ** 2 + pdf_l ** 2,
                                           1e-30)
            w_em = np.where(hs["light_id"] >= 0,
                            np.where(prev_delta, 1.0, w), 1.0)
        L += np.where((alive & ~is_hair)[:, None],
                      beta * sp["emission"] * w_em[:, None], 0.0)

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
        bsdf = _hair_bsdf(scene, hs["h"], hs["seg_id"])
        bsdf_eval = (_hair_bsdf(scene, hs["h"],
                                key="hair_material_eval")
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
            L += np.where((alive & vis & ~pass_th)[:, None], contrib, 0.0)

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
            L += np.where((alive & vis & ~pass_th)[:, None], contrib, 0.0)

        # ---- area-light NEE with MIS (emissive spheres / triangles)
        if al is not None:
            u_sel = uniforms[:, D_PIXEL + D_BOUNCE * depth + 5]
            ua = uniforms[:, D_PIXEL + D_BOUNCE * depth + 8:
                          D_PIXEL + D_BOUNCE * depth + 10]
            el = np.minimum(np.searchsorted(al["cdf"], u_sel),
                            len(al["cdf"]) - 1)
            lpos, lnrm, luv = _area_light_point(al, el, ua[:, 0], ua[:, 1])
            to_l = lpos - pos
            dist = np.linalg.norm(to_l, axis=-1)
            wi_w = to_l / np.maximum(dist[:, None], 1e-12)
            pdf_a = _area_light_pdf_sa(al, el, pos, lpos, lnrm)
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~_occluded(scene, sh_o, wi_w, dist - 2.0 * ray_eps)
            wi = _to_local(wi_w, fx, fy, fz)
            f_hair = bsdf_eval.f(wo, wi) * np.abs(wi[:, 2:3])
            f_surf = osb.surface_f(sp, wo, wi) * np.abs(wi[:, 2:3])
            f = np.where(is_hair[:, None], f_hair, f_surf)
            pdf_b = np.where(is_hair, bsdf.pdf(wo, wi),
                             osb.surface_pdf(sp, wo, wi))
            w_mis = pdf_a ** 2 / np.maximum(pdf_a ** 2 + pdf_b ** 2, 1e-30)
            le = _area_light_emission(scene, al, el, luv)
            ok = (alive & vis & ~pass_th & (pdf_a > 1e-12)
                  & (dist > 4.0 * ray_eps))
            contrib = beta * f * le * (w_mis / np.maximum(pdf_a,
                                                          1e-12))[:, None]
            L += np.where(ok[:, None], contrib, 0.0)

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

        if edge_softness:
            # pass-through lanes keep their ray and MIS state; weight 1
            weight = np.where(pass_th[:, None], 1.0, weight)
            weight_base = np.where(pass_th[:, None], 1.0, weight_base)
            prev_pdf = np.where(pass_th, prev_pdf_in, prev_pdf)
            prev_delta = np.where(pass_th, prev_delta_in, prev_delta)
        beta = beta * weight
        beta_base = beta_base * weight_base
        d = geo.normalize(_to_world(wi, fx, fy, fz))
        o = pos + d * ray_eps[:, None]
        if edge_softness:
            d = np.where(pass_th[:, None], d_in, d)
            o = np.where(pass_th[:, None],
                         pos + d_in * ray_eps[:, None], o)
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


def render(scene, cam, uniforms, max_depth=4, edge_softness=0.0):
    """Render an image. uniforms: (H, W, spp, n_uniform_dims). -> (H, W, 3)."""
    h, w, spp, _ = uniforms.shape
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    i = np.repeat(ii.reshape(-1), spp)
    j = np.repeat(jj.reshape(-1), spp)
    u = uniforms.reshape(h * w * spp, -1)
    cam = dict(cam, width=w, height=h)
    o, d = geo.camera_rays(cam, i, j, u[:, :4])
    L = trace(scene, o, d, u, max_depth=max_depth,
              edge_softness=edge_softness)
    return L.reshape(h, w, spp, 3).mean(axis=2)
