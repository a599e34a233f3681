"""Stackless BVH traversal in JAX (skip-pointer walk).

TPU-native counterpart of the reference's stack-based `intersect_bvh`
[U:libs/yocto/yocto_bvh.cpp] (SURVEY.md §2.4): instead of a per-ray node
stack (bad fit for 8x128 vector lanes), every ray carries one node pointer
through the DFS of the implicit heap tree built by accel/lbvh.py:

    internal hit  -> first child (2*node)
    internal miss -> skip[node]   (escape past the subtree)
    leaf          -> test K segments, then skip[node]

One `lax.while_loop` steps all rays in lockstep until every pointer hits
the 0 sentinel; finished rays are masked. Gathers are per-ray dynamic
indexing — the Pallas kernel in ops/ specializes this further; this module
is the portable reference implementation the kernel is tested against.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


class DeviceBVH(NamedTuple):
    node_min: jax.Array   # (2L, 3)
    node_max: jax.Array   # (2L, 3)
    skip: jax.Array       # (2L,) int32
    p0: jax.Array         # (L*K, 3) Morton-ordered, padded
    p1: jax.Array
    r0: jax.Array         # (L*K,)
    r1: jax.Array
    seg_index: jax.Array  # (L*K,) int32, -1 for padding
    n_leaves: int         # static
    leaf_size: int        # static

    @classmethod
    def from_host(cls, b):
        return cls(jnp.asarray(b.node_min), jnp.asarray(b.node_max),
                   jnp.asarray(b.skip), jnp.asarray(b.p0), jnp.asarray(b.p1),
                   jnp.asarray(b.r0), jnp.asarray(b.r1),
                   jnp.asarray(b.seg_index), int(b.n_leaves),
                   int(b.leaf_size))


# register as pytree with static leaf metadata
jax.tree_util.register_pytree_node(
    DeviceBVH,
    lambda b: ((b.node_min, b.node_max, b.skip, b.p0, b.p1, b.r0, b.r1,
                b.seg_index), (b.n_leaves, b.leaf_size)),
    lambda aux, ch: DeviceBVH(*ch, n_leaves=aux[0], leaf_size=aux[1]),
)


def _seg_hit(o, d, p0, p1, r0, r1, t_min, t_best):
    """Single-segment closest-approach test (same math as geometry/segments)."""
    d2 = p1 - p0
    w0 = o - p0
    b = jnp.sum(d * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    dd = jnp.sum(d * w0, -1)
    e = jnp.sum(d2 * w0, -1)
    denom = jnp.maximum(c - b * b, 1e-12)
    u = jnp.clip((e - b * dd) / denom, 0.0, 1.0)
    s = b * u - dd
    off = w0 + s[..., None] * d - u[..., None] * d2
    dist2 = jnp.sum(off * off, -1)
    r = r0 + (r1 - r0) * u
    ok = (dist2 <= r * r) & (s > t_min) & (s < t_best)
    return ok, s


def nearest_hit(o, d, bvh: DeviceBVH, t_min=1e-4, t_max=INF,
                max_iters=None):
    """Closest hit. o, d: (N, 3) -> (t, original_seg_idx, hit)."""
    n = o.shape[0]
    K = bvh.leaf_size
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)
    t_cap = jnp.minimum(jnp.broadcast_to(jnp.asarray(t_max, o.dtype), (n,)),
                        INF)

    if max_iters is None:
        # worst case: full DFS of 2L nodes; in practice far fewer
        max_iters = 4 * bvh.n_leaves + 64

    def cond(st):
        node, t_best, idx, it = st
        return jnp.logical_and(jnp.any(node != 0), it < max_iters)

    def body(st):
        node, t_best, idx, it = st
        active = node != 0
        node_safe = jnp.maximum(node, 1)
        bmin = bvh.node_min[node_safe]          # (N, 3) gather
        bmax = bvh.node_max[node_safe]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), -1)
        tfar = jnp.min(jnp.maximum(t0, t1), -1)
        box_hit = (tnear <= tfar) & (tfar > t_min) & (tnear < t_best)

        is_leaf = node_safe >= bvh.n_leaves
        leaf_first = (node_safe - bvh.n_leaves) * K
        do_leaf = active & is_leaf & box_hit
        for k in range(K):
            sidx = leaf_first + k
            ok, s = _seg_hit(o, d, bvh.p0[sidx], bvh.p1[sidx],
                             bvh.r0[sidx], bvh.r1[sidx], t_min, t_best)
            ok = ok & do_leaf
            t_best = jnp.where(ok, s, t_best)
            idx = jnp.where(ok, sidx, idx)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, 2 * node_safe, bvh.skip[node_safe])
        node = jnp.where(active, nxt, 0)
        return node, t_best, idx, it + 1

    # derive the init carry from the ray arrays so its varying-axis type
    # matches the body output under shard_map manual axes
    zero_like = (o[:, 0] + d[:, 0]) * 0.0
    st = (zero_like.astype(jnp.int32) + 1, t_cap + zero_like,
          zero_like.astype(jnp.int32), jnp.zeros((), jnp.int32))
    node, t_best, idx, _ = jax.lax.while_loop(cond, body, st)
    hit = t_best < t_cap
    orig = jnp.where(hit, bvh.seg_index[idx], 0)
    return jnp.where(hit, t_best, INF), idx, hit, orig


def make_nearest_fn(bvh: DeviceBVH, reordered_segments):
    """Adapter for integrator.intersect_scene's `nearest_segments` hook.

    Returns fn(o, d) -> (t, idx_into_reordered, hit). The integrator's
    `shade_info` must then index the REORDERED segment arrays, which are
    exposed as `reordered_segments` (a geometry.Segments built from the
    BVH's Morton-ordered, padded SoA).
    """
    def fn(o, d):
        t, idx, hit, _ = nearest_hit(o, d, bvh)
        return t, idx, hit
    return fn
