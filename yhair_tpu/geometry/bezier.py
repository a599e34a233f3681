"""Differentiable ray-cubic-Bezier intersection (fixed-depth, TPU-first).

TPU-native counterpart of oracle/bezier.py (SURVEY.md §7.3; reference
analogue: curve primitives tessellated to `lines` in yocto's shape layer
[U:libs/yocto/yocto_shape.cpp]). Recursion is hostile to XLA, so the
pbrt-style subdivision is flattened: every curve is evaluated at
2^depth+1 STATICALLY-placed parameters (de Casteljau at fixed t is just
polynomial evaluation) and the resulting chords are capsule-tested
densely — identical leaf geometry to the oracle's recursion, so hit/t/u
agree to f32 while shapes stay static and the whole thing jits, vmaps
and differentiates w.r.t. the control points.

What this buys over pre-tessellated segments (the kernel fast path):
  * gradients flow to the 4 control points directly (inverse rendering
    of strand geometry), not to 2^depth tessellated endpoints;
  * no 2^depth-segment storage: chords are evaluated on the fly, so
    depth is a free knob (tessellation at depth d stores 2^d segments);
  * the exact curve derivative is available at the recovered parameter
    (tests/test_bezier.py measures it comparable to the chord tangent —
    the parameter itself carries the O(2^-depth) discretization error,
    so this is convenience, not extra accuracy).
The chord-vs-curve distance error is the same as tessellation's at equal
depth (identical leaf geometry) — quantified in tests/test_bezier.py —
which is why the production Pallas kernel keeps tessellated segments
(shared precomputed cluster tiles, better arithmetic density) and this
path serves curve-parameterized uses (strand-geometry optimization,
storage-free high-depth ground truth, oracle parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


def bezier_point(cp, t):
    """cp (..., 4, 3), t (...,) -> (..., 3)."""
    t = t[..., None]
    u = 1.0 - t
    return (u ** 3 * cp[..., 0, :] + 3 * u ** 2 * t * cp[..., 1, :]
            + 3 * u * t ** 2 * cp[..., 2, :] + t ** 3 * cp[..., 3, :])


def bezier_deriv(cp, t):
    t = t[..., None]
    u = 1.0 - t
    return 3.0 * (u ** 2 * (cp[..., 1, :] - cp[..., 0, :])
                  + 2 * u * t * (cp[..., 2, :] - cp[..., 1, :])
                  + t ** 2 * (cp[..., 3, :] - cp[..., 2, :]))


@functools.partial(jax.jit, static_argnames=("depth", "chunk"))
def nearest_hit(o, d, cp, r0, r1, depth=3, t_min=1e-4, chunk=512):
    """Closest hit of rays (R, 3) against curves cp (C, 4, 3).

    r0, r1: (C,) root/tip radii (lerped along the curve parameter).
    Returns (t (R,), curve (R,) int32, u (R,) curve param, hit (R,)).
    Matches oracle/bezier.py:intersect_curves(depth=depth, refine=0).
    """
    n_leaf = 1 << depth
    ts = jnp.linspace(0.0, 1.0, n_leaf + 1)
    pts = bezier_point(cp[:, None, :, :], jnp.broadcast_to(
        ts[None, :], (cp.shape[0], n_leaf + 1)))        # (C, L+1, 3)
    p0 = pts[:, :-1].reshape(-1, 3)                      # (C*L, 3)
    p1 = pts[:, 1:].reshape(-1, 3)
    rr = r0[:, None] + (r1 - r0)[:, None] * ts[None, :]  # (C, L+1)
    ra = rr[:, :-1].reshape(-1)
    rb = rr[:, 1:].reshape(-1)

    def ray_chunk(args):
        oc, dc = args                                    # (chunk, 3)
        d2 = p1 - p0                                     # (S, 3)
        w0 = oc[:, None, :] - p0[None]                   # (chunk, S, 3)
        b = jnp.sum(dc[:, None, :] * d2[None], -1)
        c = jnp.maximum(jnp.sum(d2 * d2, -1), 1e-30)[None]
        dd = jnp.sum(dc[:, None, :] * w0, -1)
        e = jnp.sum(d2[None] * w0, -1)
        denom = jnp.maximum(c - b * b, 1e-12)
        u = jnp.clip((e - b * dd) / denom, 0.0, 1.0)
        s = b * u - dd
        off = (oc[:, None, :] + s[..., None] * dc[:, None, :]
               - (p0[None] + u[..., None] * d2[None]))
        dist2 = jnp.sum(off * off, -1)
        r = ra[None] + (rb - ra)[None] * u
        ok = (dist2 <= r * r) & (s > t_min)
        s_m = jnp.where(ok, s, INF)
        j = jnp.argmin(s_m, axis=1)
        t = jnp.take_along_axis(s_m, j[:, None], 1)[:, 0]
        ul = jnp.take_along_axis(u, j[:, None], 1)[:, 0]
        return t, j.astype(jnp.int32), ul

    n = o.shape[0]
    if n <= chunk:
        t, j, ul = ray_chunk((o, d))
    else:
        pad = (-n) % chunk
        o_p = jnp.concatenate([o, jnp.full((pad, 3), 1e8, o.dtype)])
        d_p = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t, j, ul = jax.lax.map(
            ray_chunk, (o_p.reshape(-1, chunk, 3),
                        d_p.reshape(-1, chunk, 3)))
        t = t.reshape(-1)[:n]
        j = j.reshape(-1)[:n]
        ul = ul.reshape(-1)[:n]

    hit = t < INF
    curve = j // n_leaf
    leaf = (j % n_leaf).astype(t.dtype)
    u_glob = (leaf + ul) / n_leaf
    return jnp.where(hit, t, INF), curve, u_glob, hit


def shade_frame(o, d, t, cp, curve, u):
    """Exact curve-frame shading attributes at a hit.

    Returns (position (on the ray), tangent, frame_y, frame_z, off)
    with the tangent from the curve derivative at u."""
    cpc = cp[curve]
    tan = bezier_deriv(cpc, u)
    tan = tan / jnp.maximum(
        jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-20)
    pos = o + t[:, None] * d
    axis_pt = bezier_point(cpc, u)
    off = pos - axis_pt
    z = -(d - jnp.sum(d * tan, -1, keepdims=True) * tan)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-20)
    y = jnp.cross(z, tan)
    return pos, tan, y, z, off


def h_offset(off, frame_y, radius):
    h = jnp.sum(off * frame_y, -1) / jnp.maximum(radius, 1e-20)
    return jnp.clip(h, -1.0, 1.0)
