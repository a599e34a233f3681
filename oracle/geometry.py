"""Ray/strand geometry — numpy float64 oracle.

Thin-strand model (reference: yocto-gl `intersect_line`
[U:libs/yocto/yocto_shape.h], SURVEY.md §2.2): a hair strand is a polyline
of 2-vertex segments with per-vertex radius. A ray hits a segment when the
closest approach between the ray line and the segment axis is within the
interpolated radius; the hit point is placed ON the axis (pbrt-style thin
ribbon facing the ray) and the offset `h` in [-1, 1] records where across
the strand width the ray passed.

Shading frame at a hit (shared convention with the JAX implementation —
must match exactly for parity tests):
  x = strand tangent (segment direction, as authored),
  z = component of -ray_dir perpendicular to x, normalized (faces viewer),
  y = cross(z, x),
  h = dot(offset_vector, y) / radius.

Cubic Bezier strands are tessellated into segments (uniform parameter
steps); this matches how the reference's converter turns curves into yocto
`lines` (SURVEY.md §3.5).
"""

from __future__ import annotations

import numpy as np

INF = np.float64(1e30)


def normalize(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-300)


def bezier_eval(cp, t):
    """Cubic Bezier point. cp: (..., 4, 3), t: (...,) -> (..., 3)."""
    t = np.asarray(t, dtype=np.float64)[..., None]
    u = 1.0 - t
    return (u ** 3 * cp[..., 0, :] + 3 * u ** 2 * t * cp[..., 1, :]
            + 3 * u * t ** 2 * cp[..., 2, :] + t ** 3 * cp[..., 3, :])


def bezier_to_segments(cp, radius0, radius1, n_seg=8):
    """Tessellate one cubic Bezier into `n_seg` line segments.

    Returns (p0, p1, r0, r1): (n_seg, 3) x2 and (n_seg,) x2, with radius
    lerped along the curve (strand taper).
    """
    cp = np.asarray(cp, dtype=np.float64)
    ts = np.linspace(0.0, 1.0, n_seg + 1)
    pts = bezier_eval(cp[None, :, :], ts)
    radii = radius0 + (radius1 - radius0) * ts
    return pts[:-1], pts[1:], radii[:-1], radii[1:]


def intersect_segments(ray_o, ray_d, p0, p1, r0, r1, t_min=1e-4, t_max=INF):
    """Brute-force intersect a batch of rays against all segments.

    Args:
      ray_o, ray_d: (R, 3) origins and unit directions.
      p0, p1: (S, 3) segment endpoints; r0, r1: (S,) radii.

    Returns dict with, per ray:
      hit (R,) bool, t (R,) ray distance, seg (R,) int index,
      u (R,) param along segment, h (R,) width offset in [-1, 1],
      tangent (R, 3), position (R, 3) (on the axis).
    """
    ray_o = ray_o[:, None, :]          # (R, 1, 3)
    ray_d = ray_d[:, None, :]
    d2 = (p1 - p0)[None, :, :]         # (1, S, 3)
    w0 = ray_o - p0[None, :, :]

    b = np.sum(ray_d * d2, axis=-1)
    c = np.sum(d2 * d2, axis=-1)
    d = np.sum(ray_d * w0, axis=-1)
    e = np.sum(d2 * w0, axis=-1)
    denom = np.maximum(c - b * b, 1e-12)  # a = |ray_d|^2 = 1

    u = np.clip((b * d - e) * -1.0 / denom, 0.0, 1.0)  # = (e - b d)/denom
    s = b * u - d                        # ray parameter of closest approach
    axis_pt = p0[None, :, :] + u[..., None] * d2
    ray_pt = ray_o + s[..., None] * ray_d
    off = ray_pt - axis_pt
    dist2 = np.sum(off * off, axis=-1)
    radius = r0[None, :] + (r1 - r0)[None, :] * u

    hit = (dist2 <= radius ** 2) & (s > t_min) & (s < t_max)
    s_masked = np.where(hit, s, INF)
    seg = np.argmin(s_masked, axis=-1)               # (R,)
    rix = np.arange(ray_o.shape[0])
    any_hit = hit[rix, seg]
    t = s_masked[rix, seg]

    u_h = u[rix, seg]
    tangent = normalize(d2[0, seg, :])
    off_h = off[rix, seg, :]
    rd = ray_d[:, 0, :]
    # frame: z faces viewer, y is the width axis
    z = -(rd - np.sum(rd * tangent, axis=-1, keepdims=True) * tangent)
    z = normalize(z)
    y = np.cross(z, tangent)
    h = np.sum(off_h * y, axis=-1) / np.maximum(radius[rix, seg], 1e-300)
    h = np.clip(h, -1.0, 1.0)

    return {
        "hit": any_hit,
        "t": np.where(any_hit, t, INF),
        "seg": seg,
        "u": u_h,
        "h": np.where(any_hit, h, 0.0),
        "tangent": tangent,
        "frame_z": z,
        "frame_y": y,
        "position": ray_o[:, 0, :] + np.where(any_hit, t, 0.0)[..., None] * rd,
    }


def intersect_sphere(ray_o, ray_d, center, radius, t_min=1e-4, t_max=INF):
    """Ray-sphere (used for simple non-hair props in oracle scenes)."""
    oc = ray_o - center
    b = np.sum(oc * ray_d, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - c
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = np.where((t0 > t_min) & (t0 < t_max), t0,
                 np.where((t1 > t_min) & (t1 < t_max), t1, INF))
    hit = ok & (t < INF)
    pos = ray_o + t[..., None] * ray_d
    normal = normalize(pos - center)
    return {"hit": hit, "t": np.where(hit, t, INF), "position": pos,
            "normal": normal}


def intersect_triangles(ray_o, ray_d, v0, v1, v2, t_min=1e-4, t_max=INF):
    """Nearest ray-triangle hit over a whole mesh, Moller-Trumbore.

    Mirrors the reference's `intersect_triangle` [U:libs/yocto/
    yocto_shape.h] (SURVEY.md §2.2) vectorized over (N rays, T tris).
    ray_o, ray_d: (N, 3); v0, v1, v2: (T, 3).
    Returns nearest hit with barycentric (u, v) — position = (1-u-v)·v0 +
    u·v1 + v·v2 — plus the triangle index and geometric normal.
    """
    e1 = (v1 - v0)[None]                    # (1, T, 3)
    e2 = (v2 - v0)[None]
    pv = np.cross(ray_d[:, None, :], e2)    # (N, T, 3)
    det = np.sum(e1 * pv, axis=-1)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
    tv = ray_o[:, None, :] - v0[None]
    u = np.sum(tv * pv, axis=-1) * inv
    qv = np.cross(tv, e1)
    v = np.sum(ray_d[:, None, :] * qv, axis=-1) * inv
    t = np.sum(e2 * qv, axis=-1) * inv
    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > t_min) & (t < t_max))
    t = np.where(ok, t, INF)
    tri = np.argmin(t, axis=-1)             # (N,)
    n = ray_o.shape[0]
    rid = np.arange(n)
    t_best = t[rid, tri]
    hit = t_best < INF
    pos = ray_o + t_best[:, None] * ray_d
    gn = normalize(np.cross(v1 - v0, v2 - v0))[tri]
    return {"hit": hit, "t": t_best, "position": pos, "normal": gn,
            "tri": tri, "u": u[rid, tri], "v": v[rid, tri]}


def intersect_plane(ray_o, ray_d, point, normal, t_min=1e-4, t_max=INF):
    denom = np.sum(ray_d * normal, axis=-1)
    t = np.sum((point - ray_o) * normal, axis=-1) / np.where(
        np.abs(denom) < 1e-12, 1e-12, denom)
    hit = (np.abs(denom) > 1e-9) & (t > t_min) & (t < t_max)
    pos = ray_o + t[..., None] * ray_d
    n = np.broadcast_to(normal, pos.shape) * np.where(
        denom[..., None] < 0, 1.0, -1.0)
    return {"hit": hit, "t": np.where(hit, t, INF), "position": pos,
            "normal": n}


def camera_rays(cam, i, j, u_px):
    """Thin-lens camera rays (pinhole when aperture = 0).

    cam: dict(position, look_at, up, vfov_deg[, aperture, focus_dist]).
    i, j: (N,) pixel coords (col, row); u_px: (N, 4): subpixel jitter in
    [:, 0:2], lens-disk sample in [:, 2:4]. Returns (origins, directions)
    (N, 3). Row 0 = top; conventions shared with the JAX camera.
    """
    pos = np.asarray(cam["position"], dtype=np.float64)
    look_at = np.asarray(cam["look_at"], dtype=np.float64)
    fwd = normalize(look_at - pos)
    right = normalize(np.cross(fwd, np.asarray(cam["up"], dtype=np.float64)))
    up = np.cross(right, fwd)
    tan_half = np.tan(np.deg2rad(cam["vfov_deg"]) * 0.5)
    w, h = cam["width"], cam["height"]
    aspect = w / h
    sx = (i + u_px[:, 0]) / w * 2.0 - 1.0
    sy = 1.0 - (j + u_px[:, 1]) / h * 2.0
    d = (fwd[None, :] + sx[:, None] * tan_half * aspect * right[None, :]
         + sy[:, None] * tan_half * up[None, :])
    o = np.broadcast_to(pos, d.shape).copy()
    aperture = float(cam.get("aperture", 0.0))
    if aperture > 0.0:
        focus = float(cam.get("focus_dist",
                              np.linalg.norm(look_at - pos)))
        # concentric-free simple disk sample (sqrt(r), theta)
        r = aperture * 0.5 * np.sqrt(u_px[:, 2])
        theta = 2.0 * np.pi * u_px[:, 3]
        lens = (r * np.cos(theta))[:, None] * right[None, :] \
            + (r * np.sin(theta))[:, None] * up[None, :]
        # focal point along the (unnormalized) pinhole ray: fwd component 1
        focal_pt = o + d * focus
        o = o + lens
        d = focal_pt - o
    return o, normalize(d)
