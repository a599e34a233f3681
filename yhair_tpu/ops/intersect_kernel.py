"""Pallas TPU kernel: nearest ray-segment hit over the cluster structure.

The hot loop of the whole renderer (reference analogue: `intersect_bvh` +
`intersect_line`, SURVEY.md §3.1 HOT LOOP 1). Design (see ops/clusters.py
for why the pointer-chasing version is hopeless on TPU):

  phase 1 (XLA, dense): slab-test every ray against every cluster AABB,
      reduce to a per-ray-BLOCK cluster hit mask, compact into a
      (hit-count, sorted id list) per block.
  phase 2 (Pallas): grid over ray blocks; the block's cluster list is
      scalar-prefetched; a fori_loop walks the list, dynamic-slices the
      cluster's CONTIGUOUS (128, 4) segment rows from VMEM and evaluates
      all block_size x 128 closest-approach tests as dense linear algebra
      (three (block,3)x(3,128) matmuls + elementwise VPU ops). No per-lane
      gathers anywhere; the only dynamic addressing is a contiguous row
      slice per cluster.

Tie-breaking matches the brute-force reference: clusters are visited in
ascending id order and argmin picks the first minimum, so the winning
index equals jnp.argmin over all segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clusters import Clusters

INF = jnp.float32(1e30)
T_MIN = 1e-4
BLOCK = 128


def _block_cluster_lists(o, d, cl: Clusters, block):
    """Phase 1: per-block sorted hit-cluster ids + counts.

    o, d: (N, 3). Returns (ids (nb, C) int32, counts (nb,) int32).
    """
    import math

    n = o.shape[0]
    c = cl.n_clusters
    nb = n // block
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)

    def chunk_masks(args):
        oc, invc = args  # (chunk, 3)
        tn = jnp.full((oc.shape[0], c), jnp.float32(T_MIN))
        tf = jnp.full((oc.shape[0], c), INF)
        for ax in range(3):
            t0 = (cl.cmin[None, :, ax] - oc[:, ax, None]) * invc[:, ax, None]
            t1 = (cl.cmax[None, :, ax] - oc[:, ax, None]) * invc[:, ax, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn <= tf  # (chunk, C)

    # process rays in the largest block-aligned chunk that divides N, so
    # the (chunk, C) intermediates stay a few MB
    ray_chunk = block * math.gcd(nb, 32)
    if n <= ray_chunk:
        hit = chunk_masks((o, inv))
    else:
        hit = jax.lax.map(chunk_masks,
                          (o.reshape(-1, ray_chunk, 3),
                           inv.reshape(-1, ray_chunk, 3))).reshape(n, c)
    block_hit = hit.reshape(nb, block, c).any(axis=1)  # (nb, C)
    counts = block_hit.sum(axis=1).astype(jnp.int32)
    # hit clusters first, ascending id within each group
    order = jnp.argsort(~block_hit, axis=1, stable=True).astype(jnp.int32)
    return order, counts


def _hit_kernel(ids_ref, counts_ref, o_ref, d_ref, s0_ref, s1_ref,
                t_ref, idx_ref, *, cluster_size, block, k_cap):
    b = pl.program_id(0)
    o = o_ref[:, :]              # (block, 3)
    d = d_ref[:, :]
    k = cluster_size

    # ray-constant terms
    d_dot_o = jnp.sum(d * o, axis=1, keepdims=True)       # (block, 1)
    o_dot_o = jnp.sum(o * o, axis=1, keepdims=True)

    n_hit = counts_ref[b]
    # counts > k_cap are encoded as n_clusters (sentinel): the block's
    # list overflowed SMEM, so scan every cluster in order instead
    use_all = n_hit > k_cap

    def body(i, carry):
        t_best, idx_best = carry                          # (block,1) each
        cid = jnp.where(use_all, i,
                        ids_ref[b, jnp.minimum(i, k_cap - 1)])
        s0 = s0_ref[cid]                                   # (4, k)
        s1 = s1_ref[cid]
        p0 = s0[:3, :]                                     # (3, k)
        p1 = s1[:3, :]
        r0 = s0[3:4, :]                                    # (1, k)
        r1 = s1[3:4, :]
        d2 = p1 - p0                                       # (3, k)

        # dense closest-approach algebra over (block, k)
        B = jnp.dot(d, d2, preferred_element_type=jnp.float32)
        o_d2 = jnp.dot(o, d2, preferred_element_type=jnp.float32)
        d_p0 = jnp.dot(d, p0, preferred_element_type=jnp.float32)
        c_seg = jnp.sum(d2 * d2, axis=0)[None, :]          # (1, k)
        p0_d2 = jnp.sum(p0 * d2, axis=0)[None, :]

        dd = d_dot_o - d_p0                                # d . w0
        e = o_d2 - p0_d2                                   # d2 . w0
        denom = jnp.maximum(c_seg - B * B, 1e-12)
        u = jnp.clip((e - B * dd) / denom, 0.0, 1.0)
        s = B * u - dd
        # distance per axis, subtract-then-square: the expanded quadratic
        # form cancels catastrophically in f32 at hair radii (~1e-3)
        dist2 = jnp.zeros_like(u)
        for ax in range(3):
            off = ((o[:, ax:ax + 1] - p0[ax:ax + 1, :])
                   + s * d[:, ax:ax + 1] - u * d2[ax:ax + 1, :])
            dist2 = dist2 + off * off
        r = r0 + (r1 - r0) * u                             # (block, k)
        ok = (dist2 <= r * r) & (s > T_MIN) & (s < t_best)
        s_m = jnp.where(ok, s, 1e30)
        j = jnp.argmin(s_m, axis=1)                        # (block,)
        t_loc = jnp.min(s_m, axis=1)
        better = t_loc < t_best[:, 0]
        t_best = jnp.where(better[:, None], t_loc[:, None], t_best)
        idx_new = cid * k + j.astype(jnp.int32)
        idx_best = jnp.where(better[:, None], idx_new[:, None], idx_best)
        return t_best, idx_best

    init = (jnp.full((block, 1), 1e30, jnp.float32),
            jnp.zeros((block, 1), jnp.int32))
    t_best, idx_best = jax.lax.fori_loop(0, n_hit, body, init)
    t_ref[:, :] = t_best
    idx_ref[:, :] = idx_best


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def nearest_hit(o, d, cl: Clusters, block=BLOCK, interpret=False):
    """Closest hit for a ray batch. o, d: (N, 3), N % block == 0.

    Returns (t, idx, hit): idx indexes the Morton-reordered segment SoA
    (cl.s0/s1 rows), matching geometry.Segments built from them.
    """
    n = o.shape[0]
    assert n % block == 0, f"rays {n} % block {block}"
    nb = n // block
    c = cl.n_clusters
    ids_full, counts = _block_cluster_lists(o, d, cl, block)
    # SMEM holds ~1MB of scalar-prefetch data; cap each block's cluster
    # list and fall back to a full scan (sentinel count) on overflow
    k_cap = max(32, min(c, (512 * 1024) // max(nb * 4, 1)))
    ids = ids_full[:, :k_cap]
    counts = jnp.where(counts > k_cap, c, counts).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b, ids, cnt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda b, ids, cnt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s0 (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s1 (full)
        ],
        out_specs=[
            pl.BlockSpec((block, 1), lambda b, ids, cnt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda b, ids, cnt: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_hit_kernel, cluster_size=cl.cluster_size,
                               block=block, k_cap=k_cap)
    t, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)],
        interpret=interpret,
    )(ids, counts, o, d, cl.s0c, cl.s1c)
    t = t[:, 0]
    idx = idx[:, 0]
    hit = t < INF
    return jnp.where(hit, t, INF), idx, hit


def make_nearest_fn(cl: Clusters, block=BLOCK, interpret=False):
    """Adapter for integrator.intersect_scene's nearest_segments hook.
    Pads the ray batch up to a block multiple when needed."""
    def fn(o, d):
        n = o.shape[0]
        pad = (-n) % block
        if pad:
            o = jnp.concatenate([o, jnp.full((pad, 3), 1e8, o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t, idx, hit = nearest_hit(o, d, cl, block=block,
                                  interpret=interpret)
        return t[:n], idx[:n], hit[:n]
    return fn
