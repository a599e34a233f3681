"""Subgroup wavefront traversal — v2 of the cluster intersection kernel.

Motivation (measured on the v5e hairball bench, see
benchmarks/profile_blocksweep.py): the v1 kernel tests each 128-ray BLOCK
against the union of clusters any of its rays touches; after one bounce
that union averages ~290 clusters/block even with Morton-sorted rays,
while a 16-ray subgroup's union is ~100 — the per-ray test work integral
drops 2.7x at 16-ray granularity. v1 could not shrink its block because
(a) per-grid-step overhead (~4 us) multiplies with the grid, and (b) the
scalar-prefetch SMEM ids table is padded to 256 int32 words per row, so
finer blocks blow the ~1 MB SMEM budget (compile failure reproduced at
block=32).

v2 keeps the 128-ray grid but splits each block into G=8 subgroups of 16
rays, each walking its OWN compacted front-to-back cluster list:

  phase 1 (XLA): slab-test rays x cluster AABBs, reduce hit masks and
      conservative entry distances to SUBGROUP granularity; ONE
      block-level 3-operand `lax.sort` orders clusters front-to-back;
      per-subgroup lists are then compacted by a cumsum+scatter (no
      per-group sort, no O(C x cap) compare-reduce).
  kernel (Pallas): the per-block id + entry-key rows live in HBM and are
      DMA'd into SMEM scratch at each grid step (scalar-prefetch SMEM
      row padding made the table itself unplaceable); each subgroup runs
      a while_loop over its list that BREAKS once the sorted entry key
      exceeds the subgroup's worst current hit — sound because
      key[slot] = min over the BLOCK's rays of the cluster entry
      distance <= every subgroup ray's entry, and monotone along the
      list by construction, so every skipped candidate satisfies
      s >= tn > max(t_best) and cannot change the (t, id) lexicographic
      winner. This replaces v1's two-pass t_max-pruned rebuild (and its
      second phase-1) with in-kernel pruning.

The any-hit variant additionally early-exits a subgroup once all 16 rays
are occluded (v1 needed the whole 128-ray block dark) and shrinks its
break bound to the unoccluded rays' max t_max as rays darken.

v2 requires the cluster tiles VMEM-resident; scenes whose tiles exceed
the budget keep the v1 streaming path (see intersect_kernel.nearest_hit).

Reference analogue: `intersect_bvh` closest/any-hit [U:libs/yocto/
yocto_bvh.cpp] (SURVEY.md §2.4); bit-identical to the brute-force scan
(tests/test_intersect_kernel.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clusters import Clusters
from .intersect_kernel import (INF, T_MIN, _out_struct, _segment_test,
                               _vma_of)

GS = int(os.environ.get("YHAIR_GS", "16"))          # rays per subgroup
CAP = int(os.environ.get("YHAIR_CAP", "256"))       # list slots per group


def _round_cap(c, gs, block):
    """Largest useful cap: multiple of 16 (so G*cap lands on 128-word
    rows for any G in {4, 8}), clipped to the cluster count."""
    cap = min(CAP, ((c + 15) // 16) * 16)
    g = block // gs
    while (g * cap) % 128:
        cap += 16
    return cap


def _group_cluster_lists(o, d, cl: Clusters, block, gs, cap, t_max=None):
    """Phase 1: per-subgroup front-to-back cluster lists.

    Returns (ids_rows (nb*R, 128) int32, key_rows (nb*R, 128) f32,
    counts (G, nb) int32) where R = G*cap/128 rows per block and slot
    g*cap + i of block b lives at [b*R + slot//128, slot%128]. key_rows
    hold the sorted block-level conservative entry distance of each
    listed cluster (monotone per list; the kernel's break bound).
    Subgroups with more than `cap` clusters report their true count
    (the caller encodes the scan-all sentinel).
    """
    n = o.shape[0]
    c = cl.n_clusters
    nb = n // block
    g_cnt = block // gs
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)

    def chunk_masks(args):
        """Slab-test a ray chunk against every cluster, reduced to
        SUBGROUP granularity inside the mapped body (the (chunk, C)
        intermediates fuse into the reductions — see
        intersect_kernel._block_cluster_lists)."""
        if t_max is None:
            oc, invc = args
            tm = None
        else:
            oc, invc, tm = args
        tn = jnp.full((oc.shape[0], c), jnp.float32(T_MIN))
        tf = jnp.full((oc.shape[0], c), INF)
        for ax in range(3):
            t0 = (cl.cmin[None, :, ax] - oc[:, ax, None]) * invc[:, ax, None]
            t1 = (cl.cmax[None, :, ax] - oc[:, ax, None]) * invc[:, ax, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = tn <= tf
        if tm is not None:
            hit = hit & (tn <= tm[:, None])
        hs = hit.reshape(-1, gs, c).any(axis=1)
        ts = jnp.where(hit, tn, INF).reshape(-1, gs, c).min(axis=1)
        return hs, ts

    ray_chunk = block * math.gcd(nb, 32)
    args = ((o, inv) if t_max is None else (o, inv, t_max))
    if n <= ray_chunk:
        hsub, tsub = chunk_masks(args)
    else:
        resh = ((o.reshape(-1, ray_chunk, 3), inv.reshape(-1, ray_chunk, 3))
                if t_max is None else
                (o.reshape(-1, ray_chunk, 3), inv.reshape(-1, ray_chunk, 3),
                 t_max.reshape(-1, ray_chunk)))
        hsub, tsub = jax.lax.map(chunk_masks, resh)
        hsub = hsub.reshape(n // gs, c)
        tsub = tsub.reshape(n // gs, c)
    hsub = hsub.reshape(nb, g_cnt, c)
    tsub = tsub.reshape(nb, g_cnt, c)

    # ONE block-level front-to-back sort; subgroup membership rides along
    # as a bit-packed payload so no per-group sort is needed
    key = jnp.where(hsub.any(1), tsub.min(1), INF)
    shifts = (1 << jnp.arange(g_cnt, dtype=jnp.int32))[None, :, None]
    mpack = jnp.sum(hsub.astype(jnp.int32) * shifts, axis=1)
    cid = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (nb, c))
    key_s, m_s, cid_s = jax.lax.sort((key, mpack, cid), dimension=1,
                                     num_keys=1)

    # compact each subgroup's entries to the front of its cap-slot list
    bits = ((m_s[:, None, :] >> jnp.arange(g_cnt, dtype=jnp.int32)
             [None, :, None]) & 1)
    csum = jnp.cumsum(bits, axis=2)
    counts = csum[:, :, -1]                                  # (nb, G)
    pos = jnp.where(bits > 0, csum - 1, cap)                 # cap = dropped
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, g_cnt, c), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (nb, g_cnt, c), 1)
    ids3 = jnp.zeros((nb, g_cnt, cap + 1), jnp.int32).at[bi, gi, pos].set(
        jnp.broadcast_to(cid_s[:, None, :], (nb, g_cnt, c)),
        mode="drop")[:, :, :cap]
    key3 = jnp.full((nb, g_cnt, cap + 1), INF, jnp.float32).at[
        bi, gi, pos].set(
        jnp.broadcast_to(key_s[:, None, :], (nb, g_cnt, c)),
        mode="drop")[:, :, :cap]

    ids_rows = ids3.reshape(nb * (g_cnt * cap // 128), 128)
    key_rows = key3.reshape(nb * (g_cnt * cap // 128), 128)
    return ids_rows, key_rows, counts.T.astype(jnp.int32)


def _hit_kernel2(counts_ref, o_ref, d_ref, ids_hbm, key_hbm, tc_ref,
                 t_ref, idx_ref, oid_ref, ids_smem, key_smem, sem_i,
                 sem_k, *, cluster_size, block, gs, cap, n_clusters):
    b = pl.program_id(0)
    g_cnt = block // gs
    rows = g_cnt * cap // 128
    dma_i = pltpu.make_async_copy(ids_hbm.at[pl.ds(b * rows, rows), :],
                                  ids_smem, sem_i)
    dma_k = pltpu.make_async_copy(key_hbm.at[pl.ds(b * rows, rows), :],
                                  key_smem, sem_k)
    dma_i.start()
    dma_k.start()
    dma_i.wait()
    dma_k.wait()

    k = cluster_size
    for g in range(g_cnt):
        og = o_ref[g * gs:(g + 1) * gs, :]
        dg = d_ref[g * gs:(g + 1) * gs, :]
        n_hit = counts_ref[g, b]
        use_all = n_hit > cap
        n_iter = jnp.where(use_all, n_clusters, n_hit)
        base = g * cap

        def slot(i):
            s = base + jnp.minimum(i, cap - 1)
            return s // 128, s % 128

        def cid_of(i):
            r, l = slot(i)
            return jnp.where(use_all, i, ids_smem[r, l])

        def key_of(i):
            r, l = slot(i)
            return jnp.where(use_all, jnp.float32(-1e30), key_smem[r, l])

        def cond(carry):
            i, t_cap, *_ = carry
            # key is the block-level entry distance, sorted ascending:
            # every remaining candidate has s >= key > max(t_best), so
            # the (t, id) winner is already final for all 16 rays
            return (i < n_iter) & (key_of(i) <= t_cap)

        def body(carry):
            i, t_cap, t_best, idx_best, oid_best = carry
            cid = cid_of(i)
            ok, s, oid = _segment_test(og, dg, tc_ref[cid], t_best)
            s_m = jnp.where(ok, s, 1e30)
            t_loc = jnp.min(s_m, axis=1)
            oid_m = jnp.where(s_m == t_loc[:, None], oid, 3.3e38)
            j = jnp.argmin(oid_m, axis=1)
            oid_loc = jnp.min(oid_m, axis=1)
            has = t_loc < 1e30
            better = (t_loc < t_best[:, 0]) | (
                has & (t_loc == t_best[:, 0]) & (oid_loc < oid_best[:, 0]))
            t_best = jnp.where(better[:, None], t_loc[:, None], t_best)
            idx_new = cid * k + j.astype(jnp.int32)
            idx_best = jnp.where(better[:, None], idx_new[:, None],
                                 idx_best)
            oid_best = jnp.where(better[:, None], oid_loc[:, None],
                                 oid_best)
            return (i + 1, jnp.max(t_best), t_best, idx_best, oid_best)

        init = (jnp.int32(0), jnp.float32(1e30),
                jnp.full((gs, 1), 1e30, jnp.float32),
                jnp.zeros((gs, 1), jnp.int32),
                jnp.full((gs, 1), 3.4e38, jnp.float32))
        _, _, t_best, idx_best, oid_best = jax.lax.while_loop(cond, body,
                                                              init)
        t_ref[g * gs:(g + 1) * gs, :] = t_best
        idx_ref[g * gs:(g + 1) * gs, :] = idx_best
        oid_ref[g * gs:(g + 1) * gs, :] = oid_best


def _any_kernel2(counts_ref, o_ref, d_ref, tcap_ref, ids_hbm, key_hbm,
                 tc_ref, occ_ref, ids_smem, key_smem, sem_i, sem_k, *,
                 cluster_size, block, gs, cap, n_clusters):
    b = pl.program_id(0)
    g_cnt = block // gs
    rows = g_cnt * cap // 128
    dma_i = pltpu.make_async_copy(ids_hbm.at[pl.ds(b * rows, rows), :],
                                  ids_smem, sem_i)
    dma_k = pltpu.make_async_copy(key_hbm.at[pl.ds(b * rows, rows), :],
                                  key_smem, sem_k)
    dma_i.start()
    dma_k.start()
    dma_i.wait()
    dma_k.wait()

    for g in range(g_cnt):
        og = o_ref[g * gs:(g + 1) * gs, :]
        dg = d_ref[g * gs:(g + 1) * gs, :]
        tm = tcap_ref[g * gs:(g + 1) * gs, :]
        n_hit = counts_ref[g, b]
        use_all = n_hit > cap
        n_iter = jnp.where(use_all, n_clusters, n_hit)
        base = g * cap

        def slot(i):
            s = base + jnp.minimum(i, cap - 1)
            return s // 128, s % 128

        def cid_of(i):
            r, l = slot(i)
            return jnp.where(use_all, i, ids_smem[r, l])

        def key_of(i):
            r, l = slot(i)
            return jnp.where(use_all, jnp.float32(-1e30), key_smem[r, l])

        def cond(carry):
            i, t_cap, occ = carry
            # stop when all 16 rays are occluded, or every remaining
            # candidate starts beyond the unoccluded rays' t_max
            return (i < n_iter) & (jnp.min(occ) < 1) & (key_of(i) <= t_cap)

        def body(carry):
            i, t_cap, occ = carry
            cid = cid_of(i)
            ok, _, _ = _segment_test(og, dg, tc_ref[cid], tm)
            occ = jnp.maximum(occ, jnp.any(ok, axis=1, keepdims=True)
                              .astype(jnp.int32))
            t_cap = jnp.max(jnp.where(occ > 0, jnp.float32(-1e30), tm))
            return i + 1, t_cap, occ

        init = (jnp.int32(0), jnp.max(tm),
                jnp.zeros((gs, 1), jnp.int32))
        _, _, occ = jax.lax.while_loop(cond, body, init)
        occ_ref[g * gs:(g + 1) * gs, :] = occ


def _call2(kernel, counts, ids_rows, key_rows, extra_in, extra_in_specs,
           out_shape, out_specs, o, d, cl, block, gs, cap, interpret):
    n = o.shape[0]
    nb = n // block
    g_cnt = block // gs
    rows = g_cnt * cap // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            *extra_in_specs,
            pl.BlockSpec(memory_space=pl.ANY),      # ids rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # key rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tc tiles (resident)
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((rows, 128), jnp.int32),
            pltpu.SMEM((rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def _promote(x):
        missing = tuple(_vma_of(o) - _vma_of(x))
        return jax.lax.pvary(x, missing) if missing else x

    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(*map(_promote, (counts, o, d, *extra_in, ids_rows, key_rows, cl.tc)))


@functools.partial(jax.jit,
                   static_argnames=("block", "gs", "interpret"))
def nearest_hit_grouped(o, d, cl: Clusters, block=128, gs=GS,
                        interpret=False):
    """Closest hit via the subgroup kernel. Bit-identical to v1/brute
    force (same segment test, same (t, id) tie-break, sound pruning)."""
    n = o.shape[0]
    assert n % block == 0 and block % gs == 0
    c = cl.n_clusters
    cap = _round_cap(c, gs, block)
    ids_rows, key_rows, counts = _group_cluster_lists(o, d, cl, block, gs,
                                                      cap)
    counts = jnp.where(counts > cap, c, counts)
    kernel = functools.partial(_hit_kernel2, cluster_size=cl.cluster_size,
                               block=block, gs=gs, cap=cap, n_clusters=c)
    spec_b1 = pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                           memory_space=pltpu.VMEM)
    t, idx, _ = _call2(
        kernel, counts, ids_rows, key_rows, (), (),
        [_out_struct((n, 1), jnp.float32, o),
         _out_struct((n, 1), jnp.int32, o),
         _out_struct((n, 1), jnp.float32, o)],
        [spec_b1, spec_b1, spec_b1],
        o, d, cl, block, gs, cap, interpret)
    t = t[:, 0]
    idx = idx[:, 0]
    hit = t < INF
    return jnp.where(hit, t, INF), idx, hit


@functools.partial(jax.jit,
                   static_argnames=("block", "gs", "interpret"))
def any_hit_grouped(o, d, t_max, cl: Clusters, block=128, gs=GS,
                    interpret=False):
    """Occlusion query via the subgroup kernel (t_max-bounded lists,
    per-subgroup all-occluded early exit)."""
    n = o.shape[0]
    assert n % block == 0 and block % gs == 0
    c = cl.n_clusters
    cap = _round_cap(c, gs, block)
    ids_rows, key_rows, counts = _group_cluster_lists(o, d, cl, block, gs,
                                                      cap, t_max=t_max)
    counts = jnp.where(counts > cap, c, counts)
    kernel = functools.partial(_any_kernel2, cluster_size=cl.cluster_size,
                               block=block, gs=gs, cap=cap, n_clusters=c)
    spec_b1 = pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                           memory_space=pltpu.VMEM)
    (occ,) = _call2(
        kernel, counts, ids_rows, key_rows,
        (t_max.reshape(n, 1),), (spec_b1,),
        [_out_struct((n, 1), jnp.int32, o)], [spec_b1],
        o, d, cl, block, gs, cap, interpret)
    return occ[:, 0] > 0
