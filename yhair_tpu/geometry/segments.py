"""Ray - hair-segment intersection in JAX (thin-strand model).

Mirrors oracle/geometry.py:intersect_segments (same closest-approach math,
same shading-frame and h conventions — the parity tests depend on it).
Reference analogue: yocto's `intersect_line` [U:libs/yocto/yocto_shape.h]
(SURVEY.md §2.2).

TPU-first design: the nearest-hit search runs as a `lax.scan` over fixed
segment chunks (static shapes, bounded VMEM footprint, fuses into a single
pass); attributes (u, h, tangent, frames) are recomputed once per ray for
the winning segment only. The Pallas kernel in ops/ replaces the scan on
the hot path; this version is the portable/reference implementation and the
autodiff path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.safemath import safe_normalize

INF = jnp.float32(1e30)


class Segments(NamedTuple):
    """SoA hair geometry: polyline segments with per-vertex radius.

    Matches the reference's `lines` shape channel layout (positions +
    radius, SURVEY.md §2.3) flattened to independent segments.
    """

    p0: jax.Array  # (S, 3)
    p1: jax.Array  # (S, 3)
    r0: jax.Array  # (S,)
    r1: jax.Array  # (S,)

    @classmethod
    def make(cls, p0, p1, r0, r1, dtype=jnp.float32):
        return cls(jnp.asarray(p0, dtype), jnp.asarray(p1, dtype),
                   jnp.asarray(r0, dtype), jnp.asarray(r1, dtype))

    def padded(self, multiple: int) -> "Segments":
        """Pad with never-hit segments so S % multiple == 0."""
        s = self.p0.shape[0]
        pad = (-s) % multiple
        if pad == 0:
            return self
        far = jnp.full((pad, 3), 1e8, self.p0.dtype)
        zero = jnp.zeros((pad,), self.r0.dtype)
        return Segments(jnp.concatenate([self.p0, far]),
                        jnp.concatenate([self.p1, far]),
                        jnp.concatenate([self.r0, zero]),
                        jnp.concatenate([self.r1, zero]))


def _closest_approach(o, d, p0, p1):
    """Per (ray, segment) closest-approach parameters.

    o, d: (N, 1, 3) or (N, C, 3)-broadcastable; p0, p1: (..., 3).
    Returns (s ray-param, u segment-param in [0,1], dist2).
    """
    # explicit per-axis forms, kept BIT-IDENTICAL to the Pallas kernel's
    # ops/intersect_kernel.py:_segment_test — near-ties at strand-vertex
    # junctions otherwise flip winners between the two paths (reduction
    # order / FMA fusion differ between jnp.sum and unrolled sums)
    d2 = p1 - p0
    w0 = [o[..., ax] - p0[..., ax] for ax in range(3)]
    b = (d[..., 0] * d2[..., 0] + d[..., 1] * d2[..., 1]
         + d[..., 2] * d2[..., 2])
    c = (d2[..., 0] * d2[..., 0] + d2[..., 1] * d2[..., 1]
         + d2[..., 2] * d2[..., 2])
    dd = d[..., 0] * w0[0] + d[..., 1] * w0[1] + d[..., 2] * w0[2]
    e = d2[..., 0] * w0[0] + d2[..., 1] * w0[1] + d2[..., 2] * w0[2]
    denom = jnp.maximum(c - b * b, 1e-12)
    u = jnp.clip((e - b * dd) / denom, 0.0, 1.0)
    s = b * u - dd
    off0 = (o[..., 0] + s * d[..., 0]) - (p0[..., 0] + u * d2[..., 0])
    off1 = (o[..., 1] + s * d[..., 1]) - (p0[..., 1] + u * d2[..., 1])
    off2 = (o[..., 2] + s * d[..., 2]) - (p0[..., 2] + u * d2[..., 2])
    return s, u, off0 * off0 + off1 * off1 + off2 * off2


_BIG_ID = jnp.int32(2**31 - 1)


def nearest_hit(o, d, segs: Segments, t_min=1e-4, t_max=INF, chunk=2048,
                ids=None):
    """Closest hit over all segments via a chunked scan.

    o, d: (N, 3). Returns (t (N,), idx (N,) int32, hit (N,) bool).
    ids (S,) int32: optional tie-break keys — among bitwise-equal
    nearest t the segment with the smallest id wins (the Pallas kernel
    applies the same rule with original segment ids, so passing the
    cluster seg_index here makes the two paths agree exactly even on
    exact junction ties). Default arange order = lowest index wins,
    matching the pre-existing behavior.
    """
    s_total_raw = segs.p0.shape[0]
    segs = segs.padded(chunk)
    s_total = segs.p0.shape[0]
    n_chunks = s_total // chunk
    if ids is None:
        ids = jnp.arange(s_total, dtype=jnp.int32)
    else:
        ids = jnp.where(jnp.asarray(ids, jnp.int32) < 0, _BIG_ID,
                        jnp.asarray(ids, jnp.int32))
        pad = s_total - s_total_raw
        if pad:
            ids = jnp.concatenate([ids, jnp.full((pad,), _BIG_ID,
                                                 jnp.int32)])
    p0 = segs.p0.reshape(n_chunks, chunk, 3)
    p1 = segs.p1.reshape(n_chunks, chunk, 3)
    r0 = segs.r0.reshape(n_chunks, chunk)
    r1 = segs.r1.reshape(n_chunks, chunk)
    cid = ids.reshape(n_chunks, chunk)

    o_b = o[:, None, :]
    d_b = d[:, None, :]
    n = o.shape[0]

    def body(carry, xs):
        best_t, best_i, best_id = carry
        cp0, cp1, cr0, cr1, base, ci = xs
        s, u, dist2 = _closest_approach(o_b, d_b, cp0[None], cp1[None])
        r = cr0[None] + (cr1 - cr0)[None] * u
        ok = (dist2 <= r * r) & (s > t_min) & (s < t_max)
        s = jnp.where(ok, s, INF)
        t_local = jnp.min(s, axis=-1)
        # lexicographic (t, id): among lanes tied at t_local take min id
        idm = jnp.where(s == t_local[:, None], ci[None], _BIG_ID)
        i_local = jnp.argmin(idm, axis=-1)
        id_local = jnp.min(idm, axis=-1)
        has = t_local < INF
        closer = (t_local < best_t) | (
            has & (t_local == best_t) & (id_local < best_id))
        best_t = jnp.where(closer, t_local, best_t)
        best_i = jnp.where(closer, base + i_local.astype(jnp.int32), best_i)
        best_id = jnp.where(closer, id_local, best_id)
        return (best_t, best_i, best_id), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (t, idx, _), _ = jax.lax.scan(
        body, (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32),
               jnp.full((n,), _BIG_ID)),
        (p0, p1, r0, r1, bases, cid))
    return t, idx, t < INF


def occluded(o, d, dist, segs: Segments, t_min=1e-4, chunk=2048):
    """Any-hit within [t_min, dist] (shadow rays)."""
    t, _, hit = nearest_hit(o, d, segs, t_min=t_min, chunk=chunk)
    return hit & (t < dist * (1.0 - 1e-4))


class SegmentShade(NamedTuple):
    position: jax.Array  # (N, 3) on the strand axis
    tangent: jax.Array   # (N, 3) frame x
    frame_y: jax.Array   # (N, 3) width axis
    frame_z: jax.Array   # (N, 3) faces the viewer
    h: jax.Array         # (N,) offset across the width
    u: jax.Array         # (N,) param along the segment
    radius: jax.Array    # (N,)


def shade_info(o, d, t, idx, segs: Segments) -> SegmentShade:
    """Recompute shading attributes for the winning segment of each ray.

    Frame convention shared with the oracle (oracle/geometry.py docstring):
    x = tangent, z = viewer-facing perpendicular of -d, y = cross(z, x),
    h = dot(offset, y) / radius.
    """
    p0 = segs.p0[idx]
    p1 = segs.p1[idx]
    r0 = segs.r0[idx]
    r1 = segs.r1[idx]
    s, u, _ = _closest_approach(o, d, p0, p1)
    # use the integrator's t (same value) for the hit position
    hit_pos = o + t[:, None] * d
    axis_pt = p0 + u[:, None] * (p1 - p0)
    off = hit_pos - axis_pt
    radius = r0 + (r1 - r0) * u
    tangent = safe_normalize(p1 - p0)
    z = safe_normalize(
        -(d - jnp.sum(d * tangent, -1, keepdims=True) * tangent))
    y = jnp.cross(z, tangent)
    h = jnp.clip(jnp.sum(off * y, -1) / jnp.maximum(radius, 1e-12),
                 -1.0, 1.0)
    return SegmentShade(position=hit_pos, tangent=tangent, frame_y=y,
                        frame_z=z, h=h, u=u, radius=radius)
