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

INF = jnp.float32(1e30)


class InstancedClusters(NamedTuple):
    cl: Clusters          # canonical-shape clusters (ONE copy)
    R: jax.Array          # (I, 3, 3) instance rotation(+scale) columns
    t: jax.Array          # (I, 3) instance origins
    R_inv: jax.Array      # (I, 3, 3) inverse rotations (scale undone)
    scale: jax.Array      # (I,) uniform scale per instance
    inst_mat: jax.Array   # (I,) int32 hair-material table id


jax.tree_util.register_pytree_node(
    InstancedClusters,
    lambda a: ((a.cl, a.R, a.t, a.R_inv, a.scale, a.inst_mat), None),
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
    return InstancedClusters(
        cl=cl, R=jnp.asarray(R, jnp.float32),
        t=jnp.asarray(np.stack(ts), jnp.float32),
        R_inv=jnp.asarray(Rinv, jnp.float32),
        scale=jnp.asarray(ss, jnp.float32), inst_mat=jnp.asarray(mats))


def _nearest_one(ic: InstancedClusters, i, o, d, interpret):
    """Closest hit against instance i in its local space -> world t."""
    from ..ops import intersect_kernel as ik

    o_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], o - ic.t[i])
    d_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], d)
    # keep |d_l| = 1 so the kernel's T_MIN/t math is scale-free. A world
    # point at distance t sits at local parameter t_l = t * |R^-1 d|
    # (= t / scale for a uniform scale), so world t = t_l / |R^-1 d|.
    norm = jnp.maximum(jnp.linalg.norm(d_l, axis=-1, keepdims=True),
                       1e-20)
    d_l = d_l / norm
    t_l, idx, hit = ik.make_nearest_fn(ic.cl, interpret=interpret)(o_l, d_l)
    return t_l / norm[:, 0], idx, hit


def make_nearest_fn(ic: InstancedClusters, interpret=False):
    n_inst = int(ic.R.shape[0])
    S = ic.cl.s0.shape[0]

    def fn(o, d):
        t_best = jnp.full((o.shape[0],), INF)
        idx_best = jnp.zeros((o.shape[0],), jnp.int32)
        hit_any = jnp.zeros((o.shape[0],), bool)
        for i in range(n_inst):
            t_i, idx_i, hit_i = _nearest_one(ic, i, o, d, interpret)
            t_i = jnp.where(hit_i, t_i, INF)
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
        occ = jnp.zeros((o.shape[0],), bool)
        for i in range(n_inst):
            o_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], o - ic.t[i])
            d_l = jnp.einsum("ij,nj->ni", ic.R_inv[i], d)
            norm = jnp.maximum(
                jnp.linalg.norm(d_l, axis=-1, keepdims=True), 1e-20)
            d_l = d_l / norm
            tm_l = t_max * norm[:, 0]
            occ = occ | ik.make_occluded_fn(ic.cl, interpret=interpret)(
                o_l, d_l, tm_l)
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
