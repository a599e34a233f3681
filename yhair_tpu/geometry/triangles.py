"""Ray - triangle-mesh intersection in JAX.

Mirrors oracle/geometry.py:intersect_triangles (Moller-Trumbore, same
barycentric conventions — the parity tests depend on it). Reference
analogue: yocto's `intersect_triangle` over indexed `triangles` shapes
[U:libs/yocto/yocto_shape.h] (SURVEY.md §2.2, §2.3).

TPU-first design: all meshes are flattened into one SoA buffer of
pre-gathered triangle vertices with a per-triangle material id; the
nearest-hit search runs as a `lax.scan` over fixed-size chunks (static
shapes, bounded VMEM), exactly like geometry/segments.py. Shading
attributes (interpolated smooth normal) are recomputed once per ray for
the winning triangle only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(1e30)


class Triangles(NamedTuple):
    """SoA triangle soup: pre-gathered vertices + per-vertex normals.

    Normals default to the geometric normal (flat shading) when a mesh
    carries no vertex normals. mat_id indexes the scene's surface-material
    table.
    """

    v0: jax.Array      # (T, 3)
    v1: jax.Array      # (T, 3)
    v2: jax.Array      # (T, 3)
    n0: jax.Array      # (T, 3)
    n1: jax.Array      # (T, 3)
    n2: jax.Array      # (T, 3)
    uv0: jax.Array     # (T, 2) per-vertex texcoords (zeros = none)
    uv1: jax.Array     # (T, 2)
    uv2: jax.Array     # (T, 2)
    mat_id: jax.Array  # (T,) int32

    @property
    def n_triangles(self):
        return self.v0.shape[0]

    @classmethod
    def empty(cls, dtype=jnp.float32) -> "Triangles":
        z = jnp.zeros((0, 3), dtype)
        z2 = jnp.zeros((0, 2), dtype)
        return cls(z, z, z, z, z, z, z2, z2, z2,
                   jnp.zeros((0,), jnp.int32))

    @classmethod
    def from_meshes(cls, meshes: list, mat_id0: int = 0,
                    dtype=jnp.float32) -> "Triangles":
        """Flatten a list of mesh dicts ({'positions', 'triangles',
        optional 'normals', optional 'texcoords'}) into one buffer;
        mesh i gets material id mat_id0 + i."""
        if not meshes:
            return cls.empty(dtype)
        vs, ns, uvs, mids = [], [], [], []
        for i, mesh in enumerate(meshes):
            pos = np.asarray(mesh["positions"], np.float64)
            tri = np.asarray(mesh["triangles"], np.int64)
            v = pos[tri]                            # (T, 3, 3)
            gn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
            gn = gn / np.maximum(
                np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
            if mesh.get("normals") is not None:
                vn = np.asarray(mesh["normals"], np.float64)[tri]
            else:
                vn = np.broadcast_to(gn[:, None], v.shape)
            if mesh.get("texcoords") is not None:
                uv = np.asarray(mesh["texcoords"], np.float64)[tri]
            else:
                uv = np.zeros((len(tri), 3, 2))
            vs.append(v)
            ns.append(vn)
            uvs.append(uv)
            mids.append(np.full(len(tri), mat_id0 + i, np.int32))
        v = np.concatenate(vs)
        vn = np.concatenate(ns)
        uv = np.concatenate(uvs)
        mid = np.concatenate(mids)
        as_ = lambda a: jnp.asarray(a, dtype)
        return cls(as_(v[:, 0]), as_(v[:, 1]), as_(v[:, 2]),
                   as_(vn[:, 0]), as_(vn[:, 1]), as_(vn[:, 2]),
                   as_(uv[:, 0]), as_(uv[:, 1]), as_(uv[:, 2]),
                   jnp.asarray(mid))

    def padded(self, multiple: int) -> "Triangles":
        """Pad with degenerate never-hit triangles so T % multiple == 0."""
        t = self.n_triangles
        pad = (-t) % multiple
        if pad == 0:
            return self
        far = jnp.full((pad, 3), 1e8, self.v0.dtype)
        z2 = jnp.zeros((pad, 2), self.uv0.dtype)
        return Triangles(
            jnp.concatenate([self.v0, far]),
            jnp.concatenate([self.v1, far]),
            jnp.concatenate([self.v2, far]),
            jnp.concatenate([self.n0, far]),
            jnp.concatenate([self.n1, far]),
            jnp.concatenate([self.n2, far]),
            jnp.concatenate([self.uv0, z2]),
            jnp.concatenate([self.uv1, z2]),
            jnp.concatenate([self.uv2, z2]),
            jnp.concatenate([self.mat_id,
                             jnp.zeros((pad,), jnp.int32)]))


def _mt_hit(o, d, v0, v1, v2, t_min, t_max):
    """Moller-Trumbore over broadcastable (rays, tris). Returns
    (t-or-INF, u, v)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, -1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tv = o - v0
    u = jnp.sum(tv * pv, -1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, -1) * inv
    t = jnp.sum(e2 * qv, -1) * inv
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > t_min) & (t < t_max))
    return jnp.where(ok, t, INF), u, v


def nearest_hit(o, d, tris: Triangles, t_min=1e-4, t_max=INF, chunk=2048):
    """Closest hit over all triangles via a chunked scan.

    o, d: (N, 3). Returns (t (N,), idx (N,) int32, hit (N,) bool).
    """
    tris = tris.padded(chunk)
    total = tris.n_triangles
    n_chunks = total // chunk
    v0 = tris.v0.reshape(n_chunks, chunk, 3)
    v1 = tris.v1.reshape(n_chunks, chunk, 3)
    v2 = tris.v2.reshape(n_chunks, chunk, 3)

    o_b = o[:, None, :]
    d_b = d[:, None, :]
    n = o.shape[0]

    def body(carry, xs):
        best_t, best_i = carry
        cv0, cv1, cv2, base = xs
        t, _, _ = _mt_hit(o_b, d_b, cv0[None], cv1[None], cv2[None],
                          t_min, t_max)
        i_local = jnp.argmin(t, axis=-1)
        t_local = jnp.take_along_axis(t, i_local[:, None], axis=-1)[:, 0]
        closer = t_local < best_t
        best_t = jnp.where(closer, t_local, best_t)
        best_i = jnp.where(closer, base + i_local.astype(jnp.int32),
                           best_i)
        return (best_t, best_i), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (t, idx), _ = jax.lax.scan(
        body, (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32)),
        (v0, v1, v2, bases))
    return t, idx, t < INF


def occluded(o, d, dist, tris: Triangles, t_min=1e-4, chunk=2048):
    """Any-hit within [t_min, dist] (shadow rays)."""
    t, _, hit = nearest_hit(o, d, tris, t_min=t_min, chunk=chunk)
    return hit & (t < dist * (1.0 - 1e-4))


class TriangleShade(NamedTuple):
    normal: jax.Array   # (N, 3) interpolated shading normal
    gnormal: jax.Array  # (N, 3) geometric normal
    mat_id: jax.Array   # (N,) int32
    uv: jax.Array       # (N, 2) interpolated texcoords


def shade_info(o, d, idx, tris: Triangles) -> TriangleShade:
    """Recompute shading attributes for the winning triangle of each ray."""
    v0 = tris.v0[idx]
    v1 = tris.v1[idx]
    v2 = tris.v2[idx]
    _, u, v = _mt_hit(o, d, v0, v1, v2, -INF, INF)
    gn = jnp.cross(v1 - v0, v2 - v0)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                          1e-20)
    w = 1.0 - u - v
    sn = (w[:, None] * tris.n0[idx] + u[:, None] * tris.n1[idx]
          + v[:, None] * tris.n2[idx])
    sn = sn / jnp.maximum(jnp.linalg.norm(sn, axis=-1, keepdims=True),
                          1e-12)
    # keep the shading normal on the geometric normal's side (matches
    # oracle/pathtrace.py mesh shading)
    sn = sn * jnp.where((jnp.sum(sn * gn, -1) < 0)[:, None], -1.0, 1.0)
    uv = (w[:, None] * tris.uv0[idx] + u[:, None] * tris.uv1[idx]
          + v[:, None] * tris.uv2[idx])
    return TriangleShade(normal=sn, gnormal=gn, mat_id=tris.mat_id[idx],
                         uv=uv)
