"""Ray-cubic-Bezier intersection oracle (float64 numpy, recursive).

The reference renders hair as line segments pre-tessellated from curves,
but BASELINE.json's north star names Bezier-curve strand intersection as
a first-class capability (SURVEY.md §7.3). This oracle implements the
pbrt-style approach: recursively subdivide the curve with conservative
AABB culling (convex-hull property of the control polygon, inflated by
the max radius), and test the leaf chords as round capsules with radius
interpolated along the CURVE parameter.

With `depth` subdivisions the leaf chords coincide exactly with a
2^depth-segment tessellation, so the JAX fixed-depth intersector
(yhair_tpu/geometry/bezier.py) must agree bit-for-bit on hit/t/u; the
gains over pre-tessellation are: no 2^depth-segment storage, the EXACT
curve tangent at the hit (from the derivative at the recovered curve
parameter, not the chord direction), and direct differentiability with
respect to the 4 control points.
"""

from __future__ import annotations

import numpy as np

INF = 1e30


def bezier_point(cp, t):
    """cp (..., 4, 3), t (...,) -> (..., 3)."""
    t = np.asarray(t, np.float64)[..., None]
    u = 1.0 - t
    return (u ** 3 * cp[..., 0, :] + 3 * u ** 2 * t * cp[..., 1, :]
            + 3 * u * t ** 2 * cp[..., 2, :] + t ** 3 * cp[..., 3, :])


def bezier_deriv(cp, t):
    """d/dt of the cubic. cp (..., 4, 3), t (...,) -> (..., 3)."""
    t = np.asarray(t, np.float64)[..., None]
    u = 1.0 - t
    return 3.0 * (u ** 2 * (cp[..., 1, :] - cp[..., 0, :])
                  + 2 * u * t * (cp[..., 2, :] - cp[..., 1, :])
                  + t ** 2 * (cp[..., 3, :] - cp[..., 2, :]))


def _split(cp):
    """De Casteljau split at t=0.5 -> (left (...,4,3), right (...,4,3))."""
    p01 = 0.5 * (cp[..., 0, :] + cp[..., 1, :])
    p12 = 0.5 * (cp[..., 1, :] + cp[..., 2, :])
    p23 = 0.5 * (cp[..., 2, :] + cp[..., 3, :])
    p012 = 0.5 * (p01 + p12)
    p123 = 0.5 * (p12 + p23)
    mid = 0.5 * (p012 + p123)
    left = np.stack([cp[..., 0, :], p01, p012, mid], axis=-2)
    right = np.stack([mid, p123, p23, cp[..., 3, :]], axis=-2)
    return left, right


def _chord_test(o, d, p0, p1, ra, rb, t_min):
    """Capsule test of one chord; radius lerped ra->rb along the chord.
    Returns (hit, s, u_local)."""
    d2 = p1 - p0
    w0 = o - p0
    b = d @ d2
    c = max(d2 @ d2, 1e-300)
    dd = d @ w0
    e = d2 @ w0
    denom = max(c - b * b, 1e-12)
    u = np.clip((e - b * dd) / denom, 0.0, 1.0)
    s = b * u - dd
    off = (o + s * d) - (p0 + u * d2)
    r = ra + (rb - ra) * u
    hit = (off @ off <= r * r) and (s > t_min)
    return hit, s, u


def intersect_curves(ray_o, ray_d, cp, r0, r1, depth=3, t_min=1e-4,
                     refine=0, chord_frame=False):
    """Closest hit of each ray against a set of cubic Bezier strands.

    ray_o, ray_d: (R, 3); cp: (C, 4, 3); r0, r1: (C,) root/tip radius
    (lerped along the curve parameter). depth: subdivision levels (leaf
    chords = 2^depth). refine: optional Newton iterations on the curve
    parameter at the winning chord (0 keeps chord-exact parity with the
    fixed-depth JAX path).
    chord_frame: compute shading attributes (tangent, frames, h, radius
    interpolation point) from the WINNING CHORD's endpoints instead of
    the exact curve derivative — exactly what the JAX integrator's
    merged segment view does, so oracle/JAX renders of curve scenes
    stay sample-for-sample comparable (integrator/path.py curves
    branch). Requires refine == 0.

    Returns dict: hit (R,), t, curve (R,) int, u (R,) curve param,
    h in [-1,1], tangent/frame_y/frame_z (R, 3), position (R, 3).
    """
    assert not (chord_frame and refine), "chord_frame implies refine=0"
    ray_o = np.asarray(ray_o, np.float64)
    ray_d = np.asarray(ray_d, np.float64)
    cp = np.asarray(cp, np.float64)
    r0 = np.asarray(r0, np.float64)
    r1 = np.asarray(r1, np.float64)
    R = ray_o.shape[0]
    C = cp.shape[0]

    t_out = np.full(R, INF)
    curve_out = np.zeros(R, np.int64)
    u_out = np.zeros(R)

    for ri in range(R):
        o = ray_o[ri]
        d = ray_d[ri]
        best_t, best_c, best_u = INF, 0, 0.0
        for ci in range(C):
            rmax = max(r0[ci], r1[ci])

            stack = [(cp[ci], 0.0, 1.0, depth)]
            while stack:
                c4, ua, ub, lev = stack.pop()
                # conservative cull: control-hull AABB inflated by rmax
                lo = c4.min(axis=0) - rmax
                hi = c4.max(axis=0) + rmax
                tn, tf = t_min, min(best_t, INF)
                ok = True
                for ax in range(3):
                    da = d[ax]
                    if abs(da) < 1e-300:
                        if o[ax] < lo[ax] or o[ax] > hi[ax]:
                            ok = False
                            break
                        continue
                    x0 = (lo[ax] - o[ax]) / da
                    x1 = (hi[ax] - o[ax]) / da
                    if x0 > x1:
                        x0, x1 = x1, x0
                    tn = max(tn, x0)
                    tf = min(tf, x1)
                    if tn > tf:
                        ok = False
                        break
                if not ok:
                    continue
                if lev == 0:
                    ra = r0[ci] + (r1[ci] - r0[ci]) * ua
                    rb = r0[ci] + (r1[ci] - r0[ci]) * ub
                    h, s, ul = _chord_test(o, d, c4[0], c4[3], ra, rb,
                                           t_min)
                    if h and s < best_t:
                        best_t, best_c = s, ci
                        best_u = ua + (ub - ua) * ul
                else:
                    left, right = _split(c4)
                    um = 0.5 * (ua + ub)
                    # push right first so the near (left) child pops first
                    stack.append((right, um, ub, lev - 1))
                    stack.append((left, ua, um, lev - 1))
        for _ in range(refine if best_t < INF else 0):
            # Newton step on g(u) = (closest-approach residual): move u
            # toward the true closest point of the full curve
            ci = best_c
            pu = bezier_point(cp[ci], best_u)
            du = bezier_deriv(cp[ci], best_u)
            # s that minimizes |o + s d - p(u)| for current u
            s = (pu - o) @ d
            x = o + s * d - pu
            g = x @ du
            dg = -(du @ du)
            if abs(dg) > 1e-300:
                best_u = float(np.clip(best_u - g / dg, 0.0, 1.0))
            pu = bezier_point(cp[ci], best_u)
            best_t = float((pu - o) @ d)
        t_out[ri] = best_t
        curve_out[ri] = best_c
        u_out[ri] = best_u

    hit = t_out < INF
    if chord_frame:
        # chord-based attributes: identical leaf geometry to the JAX
        # integrator (and to tessellated segments)
        n_leaf = 1 << depth
        leaf = np.clip((u_out * n_leaf).astype(np.int64), 0, n_leaf - 1)
        ta = leaf / n_leaf
        tb = (leaf + 1) / n_leaf
        q0 = bezier_point(cp[curve_out], ta)
        q1 = bezier_point(cp[curve_out], tb)
        ul = u_out * n_leaf - leaf
        tan = q1 - q0
        tan = tan / np.maximum(
            np.linalg.norm(tan, axis=-1, keepdims=True), 1e-300)
        axis_pt = q0 + ul[:, None] * (q1 - q0)
    else:
        tan = bezier_deriv(cp[curve_out], u_out)
        tan = tan / np.maximum(np.linalg.norm(tan, axis=-1, keepdims=True),
                               1e-300)
        axis_pt = bezier_point(cp[curve_out], u_out)
    pos = ray_o + np.where(hit, t_out, 0.0)[:, None] * ray_d
    off = pos - axis_pt
    z = -(ray_d - np.sum(ray_d * tan, axis=-1, keepdims=True) * tan)
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-300)
    y = np.cross(z, tan)
    radius = r0[curve_out] + (r1[curve_out] - r0[curve_out]) * u_out
    h = np.sum(off * y, axis=-1) / np.maximum(radius, 1e-300)
    return {
        "hit": hit,
        "t": np.where(hit, t_out, INF),
        "curve": curve_out,
        "u": u_out,
        "h": np.clip(np.where(hit, h, 0.0), -1.0, 1.0),
        "tangent": tan,
        "frame_z": z,
        "frame_y": y,
        "position": pos,
    }
