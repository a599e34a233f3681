"""Two-level acceleration: posed instances over ONE shared cluster set.

Reference analogue: the two-level BVH (instance BVH over shape BVHs,
SURVEY.md §2.4 [U:libs/yocto/yocto_bvh.cpp]) and the scene graph's
instance = (frame, shape, material) [U:yocto_sceneio.h]. The JSON loader
BAKES instances by default (exact, oracle-parity; io/scene_json.py);
this module is the memory-sharing alternative for many posed copies of
one wig: the canonical shape is cluster-built ONCE, and traversal
transforms each ray into every instance's local space and reuses the
same Pallas kernel — a TPU-idiomatic two-level scheme where the "top
level" is a small static instance loop instead of a pointer-chased tree
(instance counts in hair scenes are a handful; each iteration is a full
dense wavefront traversal, which the kernel already does well).

Rigid frames with one uniform scale; `t` is preserved under the inverse
transform by keeping local ray directions UNIT-length and dividing the
recovered distance by the scale.

Segment indices come back in a virtual concatenated space
idx = instance * S + local_segment; the integrator decodes it and
applies the instance frame to the gathered endpoints so the
differentiable hit recompute and shading frames live in world space
(integrator/path.py:intersect_scene).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.clusters import Clusters
from ..ops.intersect_kernel import T_MIN

INF = jnp.float32(1e30)


class InstancedClusters(NamedTuple):
    cl: Clusters          # canonical-shape clusters (ONE copy)
    R: jax.Array          # (I, 3, 3) instance rotation(+scale) columns
    t: jax.Array          # (I, 3) instance origins
    R_inv: jax.Array      # (I, 3, 3) inverse rotations (scale undone)
    scale: jax.Array      # (I,) uniform scale per instance
    inst_mat: jax.Array   # (I,) int32 hair-material table id
    bmin: jax.Array       # (I, 3) posed world-space AABB (top-level cull)
    bmax: jax.Array       # (I, 3)


jax.tree_util.register_pytree_node(
    InstancedClusters,
    lambda a: ((a.cl, a.R, a.t, a.R_inv, a.scale, a.inst_mat,
                a.bmin, a.bmax), None),
    lambda _, ch: InstancedClusters(*ch),
)


def build_instanced(cl: Clusters, frames, inst_mat=None) -> InstancedClusters:
    """frames: list of 4x3 [x, y, z, origin] rows (io/scene_json format).
    inst_mat: per-instance hair-material table ids (default all 0)."""
    from ..io.scene_json import frame_matrix

    Ms, ts, ss = [], [], []
    for fr in frames:
        M, o, s = frame_matrix(fr)
        Ms.append(M)
        ts.append(o)
        ss.append(s)
    R = np.stack(Ms)
    Rinv = np.stack([np.linalg.inv(M) for M in Ms])
    n_inst = len(frames)
    mats = (np.zeros(n_inst, np.int32) if inst_mat is None
            else np.asarray(inst_mat, np.int32))

    # posed world AABB per instance for the TOP-LEVEL cull (reference
    # analogue: the instance BVH over shape BVHs, SURVEY.md §2.4). The
    # canonical root box is the union of the finite cluster boxes
    # (sentinel 4e30 boxes mark all-padding clusters); posing the 8
    # corners through the frame gives a conservative world box.
    cmin = np.asarray(cl.cmin)
    cmax = np.asarray(cl.cmax)
    fin = cmin[:, 0] < 1e30
    root_min = cmin[fin].min(0)
    root_max = cmax[fin].max(0)
    corners = np.stack(np.meshgrid(*zip(root_min, root_max),
                                   indexing="ij"), -1).reshape(8, 3)
    posed = np.einsum("iab,cb->ica", R, corners) + np.stack(ts)[:, None]
    return InstancedClusters(
        cl=cl, R=jnp.asarray(R, jnp.float32),
        t=jnp.asarray(np.stack(ts), jnp.float32),
        R_inv=jnp.asarray(Rinv, jnp.float32),
        scale=jnp.asarray(ss, jnp.float32), inst_mat=jnp.asarray(mats),
        bmin=jnp.asarray(posed.min(1), jnp.float32),
        bmax=jnp.asarray(posed.max(1), jnp.float32))


def _box_interval(o, d, bmin, bmax):
    """Conservative ray/AABB slab interval (tn, tf) against one box."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (bmin[None] - o) * inv
    t1 = (bmax[None] - o) * inv
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), jnp.float32(T_MIN))
    tf = jnp.maximum(t0, t1).min(-1)
    return tn, tf


def _local_ray(ic: InstancedClusters, i, o, d):
    """World ray -> instance-local unit-direction ray + rescaling terms.

    The kernel's closest-approach algebra assumes |d| = 1, so the local
    direction is normalized; a world point at distance t then sits at
    local parameter t * |R^-1 d| (= t / scale for a uniform scale). The
    kernel's T_MIN therefore acts at world distance scale * T_MIN — a
    scale-DEPENDENT near clip (ADVICE r4). Shifting the local origin
    backward by delta = T_MIN * (1 - |R^-1 d|) re-centers the clip: the
    kernel's t'' > T_MIN is then t_local > T_MIN * |R^-1 d|, i.e. world
    t > T_MIN for every instance. Returns (o_l, d_l, norm, delta)."""
    o_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], o - ic.t[i])
    d_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], d)
    norm = jnp.maximum(jnp.linalg.norm(d_l, axis=-1, keepdims=True),
                       1e-20)
    d_l = d_l / norm
    delta = T_MIN * (1.0 - norm[:, 0])
    o_l = o_l - delta[:, None] * d_l
    return o_l, d_l, norm[:, 0], delta


def _nearest_one(ic: InstancedClusters, i, o, d, interpret):
    """Closest hit against instance i in its local space -> world t."""
    from ..ops import intersect_kernel as ik

    o_l, d_l, norm, delta = _local_ray(ic, i, o, d)
    t_l, idx, hit = ik.make_nearest_fn(ic.cl, interpret=interpret)(o_l, d_l)
    return (t_l - delta) / norm, idx, hit


def make_nearest_fn(ic: InstancedClusters, interpret=False):
    """Two-level traversal with a top-level instance cull: rays that miss
    an instance's posed AABB are neutralized (origin -> far away, so
    their sorted blocks list zero clusters) and instances no ray in the
    wavefront can touch skip their traversal entirely via lax.cond."""
    n_inst = int(ic.R.shape[0])
    S = ic.cl.s0.shape[0]

    def fn(o, d):
        n = o.shape[0]
        t_best = jnp.full((n,), INF)
        idx_best = jnp.zeros((n,), jnp.int32)
        hit_any = jnp.zeros((n,), bool)
        for i in range(n_inst):
            tn, tf = _box_interval(o, d, ic.bmin[i], ic.bmax[i])
            touch = tn <= tf
            o_c = jnp.where(touch[:, None], o, 1e8)

            def traverse(o_c=o_c, i=i):
                t_i, idx_i, hit_i = _nearest_one(ic, i, o_c, d, interpret)
                return jnp.where(hit_i, t_i, INF), idx_i, hit_i

            def skip():
                return (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32),
                        jnp.zeros((n,), bool))

            if interpret:
                # CPU/interpret path: cond over a pallas_call trips the
                # interpreter's vma bookkeeping; the cull is a runtime
                # optimization only, so take the plain path
                t_i, idx_i, hit_i = traverse()
            else:
                t_i, idx_i, hit_i = jax.lax.cond(jnp.any(touch),
                                                 traverse, skip)
            better = t_i < t_best
            t_best = jnp.where(better, t_i, t_best)
            idx_best = jnp.where(better, i * S + idx_i, idx_best)
            hit_any = hit_any | hit_i
        return t_best, idx_best, hit_any
    return fn


def make_occluded_fn(ic: InstancedClusters, interpret=False):
    from ..ops import intersect_kernel as ik

    n_inst = int(ic.R.shape[0])

    def fn(o, d, t_max):
        n = o.shape[0]
        occ = jnp.zeros((n,), bool)
        for i in range(n_inst):
            tn, tf = _box_interval(o, d, ic.bmin[i], ic.bmax[i])
            # only rays whose box interval overlaps (T_MIN, t_max) can
            # be occluded by this instance; the rest are removed
            # structurally (t_max below T_MIN empties their lists)
            touch = (tn <= tf) & (tn <= t_max) & ~occ
            o_l, d_l, norm, delta = _local_ray(ic, i, o, d)
            tm_l = jnp.where(touch, t_max * norm + delta, 0.0)

            def traverse(tm_l=tm_l, o_l=o_l, d_l=d_l):
                return ik.make_occluded_fn(ic.cl, interpret=interpret)(
                    o_l, d_l, tm_l)

            def skip():
                return jnp.zeros((n,), bool)

            if interpret:
                occ_i = traverse()
            else:
                occ_i = jax.lax.cond(jnp.any(touch), traverse, skip)
            occ = occ | occ_i
        return occ
    return fn


def gather_world_segments(ic: InstancedClusters, segments, idx):
    """Decode virtual idx -> world-space per-ray segment endpoints/radii
    + the instance's hair-material id (for the integrator's recompute)."""
    S = segments.p0.shape[0]
    inst = idx // S
    sidx = idx % S
    Rm = ic.R[inst]
    tv = ic.t[inst]
    p0 = jnp.einsum("nij,nj->ni", Rm, segments.p0[sidx]) + tv
    p1 = jnp.einsum("nij,nj->ni", Rm, segments.p1[sidx]) + tv
    s = ic.scale[inst]
    return p0, p1, segments.r0[sidx] * s, segments.r1[sidx] * s, \
        ic.inst_mat[inst]
