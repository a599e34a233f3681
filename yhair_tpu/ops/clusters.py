"""Cluster acceleration structure — the TPU-native BVH bottom level.

Per-ray pointer-chasing BVH traversal (accel/traverse.py) is correct but
catastrophically slow on TPU: every step is a per-lane HBM gather.
Measured on a v5 lite chip it reached ~0.001 Mrays/s — gathers, not
compile, were the bottleneck. The TPU-native layout instead:

  * segments are Morton-sorted and packed into contiguous CLUSTERS of
    `cluster_size` (128) — one cluster = one aligned VMEM tile row-block;
  * each cluster gets an AABB (the LBVH leaf level, reusing accel/lbvh);
  * intersection = dense ray x cluster-AABB culling (VPU, no gathers)
    followed by dense ray-block x cluster segment tests in a Pallas
    kernel (ops/intersect_kernel.py) that only ever slices CONTIGUOUS
    segment rows.

Segment storage is two (S, 4) f32 arrays [x, y, z, r] per endpoint so a
cluster slice is a single (128, 4) contiguous block.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import lbvh

CLUSTER_SIZE = 128


def _tiles(s0, s1, seg_index, n_clusters, k):
    """Precomputed per-cluster kernel tiles from the (S, 4) endpoint SoA.

    tc (C, 16, k): p0.xyz, r0, d2.xyz (= p1 - p0), dr (= r1 - r0),
    |d2|^2, original segment id (f32 — exact below 2^24; used for the
    deterministic min-(t, id) tie-break at strand-vertex junctions),
    6 zero rows (16 sublanes = two aligned (8, 128) f32 tiles — both the
    VMEM-resident layout and the per-cluster DMA unit). Precomputing
    d2/|d2|^2 here removes VPU ops per cluster visit.
    """
    assert s0.shape[0] < (1 << 24), "f32 tie-break ids need S < 2^24"
    a0 = s0.reshape(n_clusters, k, 4).transpose(0, 2, 1)   # (C, 4, k)
    a1 = s1.reshape(n_clusters, k, 4).transpose(0, 2, 1)
    p0 = a0[:, :3]
    d2 = a1[:, :3] - p0
    c_seg = (d2 * d2).sum(1, keepdims=True)
    # padding lanes (seg_index == -1) get a huge id so they lose ties
    oid = np.where(seg_index < 0, np.float32(3e30),
                   seg_index.astype(np.float32))
    oid = oid.reshape(n_clusters, 1, k)
    tc = np.concatenate([p0, a0[:, 3:4], d2, a1[:, 3:4] - a0[:, 3:4],
                         c_seg, oid,
                         np.zeros((n_clusters, 6, k), np.float32)], axis=1)
    return np.ascontiguousarray(tc.astype(np.float32))


class Clusters(NamedTuple):
    s0: jax.Array        # (S, 4) p0.xyz, r0 — Morton-ordered, padded
    s1: jax.Array        # (S, 4) p1.xyz, r1
    tc: jax.Array        # (C, 16, k) per-cluster kernel tiles (see
                         #   _tiles) — cluster select is a LEADING-axis
                         #   dynamic index (lane-dim dynamic slices explode
                         #   Mosaic compile time; a flat (S, 4) layout pads
                         #   4 lanes -> 128, a 32x VMEM blowup)
    cmin: jax.Array      # (C, 3) cluster AABB min
    cmax: jax.Array      # (C, 3)
    seg_index: jax.Array  # (S,) original segment id, -1 = padding
    n_clusters: int      # static
    cluster_size: int    # static


jax.tree_util.register_pytree_node(
    Clusters,
    lambda c: ((c.s0, c.s1, c.tc, c.cmin, c.cmax, c.seg_index),
               (c.n_clusters, c.cluster_size)),
    lambda aux, ch: Clusters(*ch, n_clusters=aux[0], cluster_size=aux[1]),
)


def build(p0, p1, r0, r1, cluster_size=CLUSTER_SIZE, use_native=True,
          method="median"):
    """Host-side build: native C++ builder when compiled, numpy fallback.

    method: "median" (longest-axis median splits — ~2x tighter cluster
    AABBs than Morton runs on dense hair, see lbvh._median_split_order)
    or "morton".
    """
    if use_native:
        from ..accel import native
        out = native.build_clusters(p0, p1, r0, r1, cluster_size,
                                    method=method)
        if out is not None:
            tc = _tiles(out["s0"], out["s1"], out["seg_index"],
                        out["n_clusters"], cluster_size)
            return Clusters(
                s0=jnp.asarray(out["s0"]), s1=jnp.asarray(out["s1"]),
                tc=jnp.asarray(tc),
                cmin=jnp.asarray(out["cmin"]), cmax=jnp.asarray(out["cmax"]),
                seg_index=jnp.asarray(out["seg_index"]),
                n_clusters=out["n_clusters"], cluster_size=cluster_size)
    host = lbvh.build(np.asarray(p0), np.asarray(p1), np.asarray(r0),
                      np.asarray(r1), leaf_size=cluster_size,
                      method=method)
    # leaf AABBs live at heap level [n_leaves, 2*n_leaves)
    cmin = host.node_min[host.n_leaves:]
    cmax = host.node_max[host.n_leaves:]
    # inf boxes (all-padding clusters) -> never-hit sentinel boxes
    bad = ~np.isfinite(cmin).all(1)
    cmin = np.where(bad[:, None], 4e30, cmin)
    cmax = np.where(bad[:, None], 4e30, cmax)
    s0 = np.concatenate([host.p0, host.r0[:, None]], 1).astype(np.float32)
    s1 = np.concatenate([host.p1, host.r1[:, None]], 1).astype(np.float32)
    tc = _tiles(s0, s1, host.seg_index, int(host.n_leaves), cluster_size)
    return Clusters(
        s0=jnp.asarray(s0), s1=jnp.asarray(s1),
        tc=jnp.asarray(tc),
        cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
        seg_index=jnp.asarray(host.seg_index),
        n_clusters=int(host.n_leaves), cluster_size=cluster_size)
