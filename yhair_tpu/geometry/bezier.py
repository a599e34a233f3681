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

from ..core.safemath import safe_normalize

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


def tessellate(cp, r0, r1, depth=3):
    """On-the-fly chord tessellation: cp (C, 4, 3) -> per-chord arrays
    (p0, p1 (C*L, 3); ra, rb (C*L,)) with radius lerped along the GLOBAL
    curve parameter — identical leaf geometry to oracle
    bezier_to_segments(n_seg=2^depth)."""
    import numpy as np
    n_leaf = 1 << depth
    # np (not jnp) linspace: an eagerly-created jax array inside a traced
    # function becomes a LIFTED executable constant, and jaxlib 0.9's
    # re-execution fastpath drops lifted consts (buffer-count mismatch);
    # a numpy literal embeds in the HLO instead
    ts = np.linspace(0.0, 1.0, n_leaf + 1, dtype=np.float32)
    pts = bezier_point(cp[:, None, :, :], jnp.broadcast_to(
        ts[None, :], (cp.shape[0], n_leaf + 1)))        # (C, L+1, 3)
    p0 = pts[:, :-1].reshape(-1, 3)                      # (C*L, 3)
    p1 = pts[:, 1:].reshape(-1, 3)
    rr = r0[:, None] + (r1 - r0)[:, None] * ts[None, :]  # (C, L+1)
    return p0, p1, rr[:, :-1].reshape(-1), rr[:, 1:].reshape(-1)


# NOTE: deliberately NOT @jax.jit-wrapped, and implemented on the shared
# segments scan: the previous dense (rays x all-chords) formulation here
# triggered a jaxlib 0.9 buffer-count mismatch on RE-execution of an
# enclosing jitted train step ("Execution supplied N buffers but
# compiled program expected M"); routing through seg.nearest_hit (the
# formulation every other search uses, proven across the suite) avoids
# the miscompiling pattern and keeps one closest-approach code path.
def nearest_hit(o, d, cp, r0, r1, depth=3, t_min=1e-4, chunk=2048):
    """Closest hit of rays (R, 3) against curves cp (C, 4, 3).

    r0, r1: (C,) root/tip radii (lerped along the curve parameter).
    Returns (t (R,), curve (R,) int32, u (R,) curve param, hit (R,)).
    Matches oracle/bezier.py:intersect_curves(depth=depth, refine=0).
    """
    from . import segments as seg

    n_leaf = 1 << depth
    p0, p1, ra, rb = tessellate(cp, r0, r1, depth)
    t, j, hit = seg.nearest_hit(o, d, seg.Segments(p0, p1, ra, rb),
                                t_min=t_min, chunk=chunk)
    # recover the chord-local parameter for the winning chord
    _, ul, _ = seg._closest_approach(o, d, p0[j], p1[j])
    curve = j // n_leaf
    leaf = (j % n_leaf).astype(t.dtype)
    u_glob = (leaf + ul) / n_leaf
    return jnp.where(hit, t, INF), curve, u_glob, hit


def shade_frame(o, d, t, cp, curve, u):
    """Exact curve-frame shading attributes at a hit.

    Returns (position (on the ray), tangent, frame_y, frame_z, off)
    with the tangent from the curve derivative at u."""
    cpc = cp[curve]
    tan = safe_normalize(bezier_deriv(cpc, u), eps=1e-20)
    pos = o + t[:, None] * d
    axis_pt = bezier_point(cpc, u)
    off = pos - axis_pt
    z = safe_normalize(
        -(d - jnp.sum(d * tan, -1, keepdims=True) * tan), eps=1e-20)
    y = jnp.cross(z, tan)
    return pos, tan, y, z, off


def h_offset(off, frame_y, radius):
    h = jnp.sum(off * frame_y, -1) / jnp.maximum(radius, 1e-20)
    return jnp.clip(h, -1.0, 1.0)
