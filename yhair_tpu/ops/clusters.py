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


def _tile(s, n_clusters, k):
    """(S, 4) -> (C, 4, k) contiguous per-cluster tiles."""
    return np.ascontiguousarray(
        s.reshape(n_clusters, k, 4).transpose(0, 2, 1))


class Clusters(NamedTuple):
    s0: jax.Array        # (S, 4) p0.xyz, r0 — Morton-ordered, padded
    s1: jax.Array        # (S, 4) p1.xyz, r1
    s0c: jax.Array       # (C, 4, k) per-cluster tiles for the Pallas
    s1c: jax.Array       # (C, 4, k) kernel: cluster select is a LEADING-
                         #   axis dynamic index (lane-dim dynamic slices
                         #   explode Mosaic compile time; a flat (S, 4)
                         #   layout pads 4 lanes -> 128, a 32x blowup)
    cmin: jax.Array      # (C, 3) cluster AABB min
    cmax: jax.Array      # (C, 3)
    seg_index: jax.Array  # (S,) original segment id, -1 = padding
    n_clusters: int      # static
    cluster_size: int    # static


jax.tree_util.register_pytree_node(
    Clusters,
    lambda c: ((c.s0, c.s1, c.s0c, c.s1c, c.cmin, c.cmax, c.seg_index),
               (c.n_clusters, c.cluster_size)),
    lambda aux, ch: Clusters(*ch, n_clusters=aux[0], cluster_size=aux[1]),
)


def build(p0, p1, r0, r1, cluster_size=CLUSTER_SIZE, use_native=True):
    """Host-side build: native C++ builder when compiled, numpy fallback."""
    if use_native:
        from ..accel import native
        out = native.build_clusters(p0, p1, r0, r1, cluster_size)
        if out is not None:
            return Clusters(
                s0=jnp.asarray(out["s0"]), s1=jnp.asarray(out["s1"]),
                s0c=jnp.asarray(_tile(out["s0"], out["n_clusters"],
                                      cluster_size)),
                s1c=jnp.asarray(_tile(out["s1"], out["n_clusters"],
                                      cluster_size)),
                cmin=jnp.asarray(out["cmin"]), cmax=jnp.asarray(out["cmax"]),
                seg_index=jnp.asarray(out["seg_index"]),
                n_clusters=out["n_clusters"], cluster_size=cluster_size)
    host = lbvh.build(np.asarray(p0), np.asarray(p1), np.asarray(r0),
                      np.asarray(r1), leaf_size=cluster_size)
    # leaf AABBs live at heap level [n_leaves, 2*n_leaves)
    cmin = host.node_min[host.n_leaves:]
    cmax = host.node_max[host.n_leaves:]
    # inf boxes (all-padding clusters) -> never-hit sentinel boxes
    bad = ~np.isfinite(cmin).all(1)
    cmin = np.where(bad[:, None], 4e30, cmin)
    cmax = np.where(bad[:, None], 4e30, cmax)
    s0 = np.concatenate([host.p0, host.r0[:, None]], 1).astype(np.float32)
    s1 = np.concatenate([host.p1, host.r1[:, None]], 1).astype(np.float32)
    return Clusters(
        s0=jnp.asarray(s0), s1=jnp.asarray(s1),
        s0c=jnp.asarray(_tile(s0, int(host.n_leaves), cluster_size)),
        s1c=jnp.asarray(_tile(s1, int(host.n_leaves), cluster_size)),
        cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
        seg_index=jnp.asarray(host.seg_index),
        n_clusters=int(host.n_leaves), cluster_size=cluster_size)
