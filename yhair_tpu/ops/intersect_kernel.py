"""Pallas TPU kernels: ray-segment intersection over the cluster structure.

The hot loop of the whole renderer (reference analogue: `intersect_bvh` +
`intersect_line`, SURVEY.md §3.1 HOT LOOP 1). Design (see ops/clusters.py
for why pointer-chasing traversal is hopeless on TPU):

  phase 1 (XLA, dense): slab-test every ray against every cluster AABB,
      reduce to a per-ray-BLOCK cluster hit mask, compact into a sorted
      (front-to-back) id list + count per block.
  phase 2 (Pallas): grid over ray blocks; the block's cluster list is
      scalar-prefetched; a loop walks the list, selects the cluster's
      precomputed (8, k) tiles by LEADING-axis dynamic index and evaluates
      all block x k closest-approach tests as dense VPU algebra. No
      per-lane gathers anywhere.

Two kernels share the segment test:
  * nearest_hit: closest hit (t, segment index, hit mask).
  * any_hit: boolean occlusion with per-ray t_max and an all-occluded
    early exit — shadow rays are ~2/3 of all casts and mostly terminate
    in the first clusters of dense hair.

Tie-breaking note: clusters are visited front-to-back, and within a
cluster argmin picks the first minimum; the winning index can differ from
a flat argmin only for exactly-equal t (tested at 99.9% agreement).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clusters import Clusters

INF = jnp.float32(1e30)
T_MIN = 1e-4
BLOCK = 128
# Per-block cluster lists live in HBM and are DMA'd into SMEM scratch at
# each grid step (4-8 KB). The previous design scalar-prefetched them,
# which (a) capped list capacity at 256 ids/block (SMEM rows pad to 256
# int32 words; ~1 MB total SMEM), so blocks with longer lists fell back
# to scanning ALL clusters — at bounce depth >= 2 HALF the hairball
# blocks overflowed, paying 1024 visits for ~300-700-entry lists — and
# (b) tied capacity to the ray count. cap = min(round-up(C), MAX_IDS).
MAX_IDS = 2048


def _block_cluster_lists(o, d, cl: Clusters, block, t_max=None,
                         exclude_below=None, return_key=False):
    """Phase 1: per-block front-to-back hit-cluster ids + counts.

    o, d: (N, 3); t_max: optional per-ray (N,) upper bound — a cluster
    only counts for a ray when its conservative entry distance tn lies
    within [T_MIN, t_max] (sound: any hit with t <= t_max is inside a
    cluster entered at tn <= t). Without a bound every cluster along the
    ray's INFINITE extent is listed, which is what makes interior-ray
    lists long.
    exclude_below: optional (nb,) per-block entry-distance threshold —
    clusters with tn_block STRICTLY below it are dropped. A previous
    prefix pass visited exactly the front-to-back entries up to its
    count, i.e. every cluster with tn below (and possibly tied at) the
    last visited entry's tn; dropping the strictly-below set removes
    revisits (ties conservatively revisit) while the pass seeds carry
    the previous result (see nearest_hit's two-pass note).
    Returns (ids (nb, C) int32, counts (nb,) int32[, key (nb, C)]);
    key (with return_key) is the front-to-back sort key: tn_block where
    the block hits the cluster, +inf otherwise.
    """
    n = o.shape[0]
    c = cl.n_clusters
    nb = n // block
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)

    def chunk_masks(args):
        """Slab-test a ray chunk against every cluster AND reduce to the
        block level INSIDE the mapped body: the (chunk, C) intermediates
        then fuse into the reductions and never round-trip through HBM
        (the unreduced variant materialized ~300 MB per traversal and was
        5x slower on v5e)."""
        if t_max is None:
            oc, invc = args  # (chunk, 3)
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
        hb = hit.reshape(-1, block, c).any(axis=1)              # (cb, C)
        tb = jnp.where(hit, tn, INF).reshape(-1, block, c).min(axis=1)
        return hb, tb

    # process rays in the largest block-aligned chunk that divides N, so
    # the (chunk, C) fusion workspace stays a few MB
    ray_chunk = block * math.gcd(nb, 32)
    args = ((o, inv) if t_max is None else (o, inv, t_max))
    if n <= ray_chunk:
        block_hit, tn_block = chunk_masks(args)
    else:
        resh = ((o.reshape(-1, ray_chunk, 3), inv.reshape(-1, ray_chunk, 3))
                if t_max is None else
                (o.reshape(-1, ray_chunk, 3), inv.reshape(-1, ray_chunk, 3),
                 t_max.reshape(-1, ray_chunk)))
        block_hit, tn_block = jax.lax.map(chunk_masks, resh)
        block_hit = block_hit.reshape(nb, c)
        tn_block = tn_block.reshape(nb, c)
    if exclude_below is not None:
        block_hit = block_hit & ~(tn_block < exclude_below[:, None])
    counts = block_hit.sum(axis=1).astype(jnp.int32)
    # FRONT-TO-BACK: hit clusters sorted by conservative entry distance
    # (missed ones sort to the back with +inf keys) — improves the
    # in-kernel `s < t_best` rejection rate
    key = jnp.where(block_hit, tn_block, INF)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    if return_key:
        return order, counts, key
    return order, counts


def _visited_threshold(key, ids, counts, n_visited):
    """Per-block tn threshold under which every cluster was visited by a
    prefix pass over the first min(counts, n_visited) list entries: the
    tn of the LAST visited entry (clusters strictly below it are all
    inside the prefix). -inf where the prefix visited nothing."""
    n_vis = jnp.minimum(counts, n_visited)
    last = jnp.take_along_axis(
        ids, jnp.maximum(n_vis - 1, 0)[:, None], axis=1)
    thresh = jnp.take_along_axis(key, last, axis=1)[:, 0]
    return jnp.where(n_vis > 0, thresh, -jnp.inf)


def _segment_test(o, d, tc, t_cap):
    """Dense closest-approach test of a ray block against one cluster.

    o, d: (block, 3); tc: the cluster's precomputed (16, k) tile
    (ops/clusters.py layout); t_cap: (block, 1) current upper bound.
    Returns (ok (block,k), s (block,k), oid (1,k) original segment ids).

    The arithmetic here is kept FORM-IDENTICAL to the portable
    geometry/segments.py:_closest_approach (w0 = o - p0 first, then the
    three dot products, subtract-then-square distance): near-ties at
    strand-vertex junctions otherwise flip winners between the kernel
    and the brute-force/autodiff path and diverge whole sample paths.
    Inclusive `s <= t_cap` admits equal-t candidates so the (t, id)
    tie-break in the caller stays deterministic across cluster order.
    """
    p0 = tc[0:3, :]
    r0 = tc[3:4, :]
    d2 = tc[4:7, :]
    dr = tc[7:8, :]
    c_seg = tc[8:9, :]
    oid = tc[9:10, :]

    # K=3 contractions as explicit outer-product sums (tiny-K matmuls
    # trigger Mosaic relayouts; the VPU form is cheap and fusion-friendly)
    w0 = [o[:, ax:ax + 1] - p0[ax:ax + 1, :] for ax in range(3)]
    B = (d[:, 0:1] * d2[0:1, :] + d[:, 1:2] * d2[1:2, :]
         + d[:, 2:3] * d2[2:3, :])
    dd = (d[:, 0:1] * w0[0] + d[:, 1:2] * w0[1] + d[:, 2:3] * w0[2])
    e = (d2[0:1, :] * w0[0] + d2[1:2, :] * w0[1] + d2[2:3, :] * w0[2])
    denom = jnp.maximum(c_seg - B * B, 1e-12)
    u = jnp.clip((e - B * dd) / denom, 0.0, 1.0)
    s = B * u - dd
    # distance per axis, subtract-then-square: the expanded quadratic
    # form cancels catastrophically in f32 at hair radii (~1e-3)
    off0 = (o[:, 0:1] + s * d[:, 0:1]) - (p0[0:1, :] + u * d2[0:1, :])
    off1 = (o[:, 1:2] + s * d[:, 1:2]) - (p0[1:2, :] + u * d2[1:2, :])
    off2 = (o[:, 2:3] + s * d[:, 2:3]) - (p0[2:3, :] + u * d2[2:3, :])
    dist2 = off0 * off0 + off1 * off1 + off2 * off2
    r = r0 + dr * u
    ok = (dist2 <= r * r) & (s > T_MIN) & (s <= t_cap)
    return ok, s, oid


def _hit_kernel(counts_ref, o_ref, d_ref, t0_ref, i0_ref,
                oid0_ref, ids_hbm, tc_ref, t_ref, idx_ref, oid_ref,
                ids_smem, ids_sem, *,
                cluster_size, block, k_cap, stream):
    b = pl.program_id(0)
    rows = k_cap // 128
    dma_ids = pltpu.make_async_copy(
        ids_hbm.at[pl.ds(b * rows, rows), :], ids_smem, ids_sem)
    dma_ids.start()
    o = o_ref[:, :]              # (block, 3)
    d = d_ref[:, :]
    k = cluster_size

    n_hit = counts_ref[b]
    # counts > k_cap are encoded as n_clusters (sentinel): the list
    # exceeded even the HBM table capacity (only possible when
    # n_clusters > MAX_IDS), so scan every cluster in order instead
    use_all = n_hit > k_cap
    dma_ids.wait()

    def cid_of(i):
        j = jnp.minimum(i, k_cap - 1)
        return jnp.where(use_all, i, ids_smem[j // 128, j % 128])

    def run(get_tile):
        # The in-loop state is PER-LANE (block, k): cross-lane min /
        # argmin reductions cost ~log2(k) shuffle steps per sublane tile
        # and were ~1/3 of the old per-visit time; deferring them to ONE
        # reduction after the loop replaces them with cheap elementwise
        # lexicographic updates. The (t, original-id) min is associative
        # and commutative, so per-lane-then-across-lanes selects exactly
        # the winner the old per-visit reduction did (bit-identical).
        t_seed = t0_ref[:, :]                             # (block, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (block, k), 1)

        def visit(i, carry):
            t_lane, idx_lane, oid_lane = carry            # (block,k) each
            cid = cid_of(i)
            # the candidate bound stays the PASS SEED (not tightened in
            # the loop): pass-2 lists are already t1-pruned, and the
            # inclusive <= keeps equal-t tie candidates admissible
            ok, s, oid = _segment_test(o, d, get_tile(i, cid), t_seed)
            s_m = jnp.where(ok, s, 1e30)
            oid_b = jnp.broadcast_to(oid, (block, k))
            better = (s_m < t_lane) | ((s_m == t_lane)
                                       & (oid_b < oid_lane))
            t_lane = jnp.where(better, s_m, t_lane)
            oid_lane = jnp.where(better, oid_b, oid_lane)
            idx_lane = jnp.where(better, cid * k + lane, idx_lane)
            return t_lane, idx_lane, oid_lane

        def body2(i2, carry):
            # 4-wide unrolled visits (VMEM-resident tiles only): cuts
            # loop-control overhead and widens the scheduling window
            # (measured depth-1 nearest 21.1 -> 15.4 ms; 8-wide flat).
            # The tail REVISITS the last entry (min-updates are
            # idempotent, so repeats cannot change the winner).
            i = 4 * i2
            carry = visit(i, carry)
            for u_ in (1, 2, 3):
                carry = visit(jnp.minimum(i + u_, n_hit - 1), carry)
            return carry

        # NOTE: an early-termination while_loop (stop when the next
        # front-to-back cluster starts beyond max(t_best)) measured ~2x
        # SLOWER here: a block almost always contains at least one miss
        # ray whose t_best stays inf, so the exit never fires and the
        # per-iteration cond is pure overhead. Plain fori wins; the
        # two-pass t_max pruning in nearest_hit bounds the list instead.
        init = (jnp.full((block, k), 1e30, jnp.float32),
                jnp.zeros((block, k), jnp.int32),
                jnp.full((block, k), 3.4e38, jnp.float32))
        if stream:
            # the double-buffered DMA sequence must see each index once
            t_lane, idx_lane, oid_lane = jax.lax.fori_loop(
                0, n_hit, visit, init)
        else:
            t_lane, idx_lane, oid_lane = jax.lax.fori_loop(
                0, (n_hit + 3) // 4, body2, init)

        # ONE cross-lane lexicographic reduction, then merge the pass
        # seed (pass 1: INF; pass 2: the prefix result) the same way —
        # splitting the cluster list across passes, even with revisits,
        # selects the same winner.
        t_loc = jnp.min(t_lane, axis=1)                   # (block,)
        oid_m = jnp.where(t_lane == t_loc[:, None], oid_lane, 3.4e38)
        oid_loc = jnp.min(oid_m, axis=1)
        sel = (t_lane == t_loc[:, None]) & (oid_m == oid_loc[:, None])
        idx_loc = jnp.min(jnp.where(sel, idx_lane, jnp.int32(2 ** 30)),
                          axis=1)
        t_best, idx_best, oid_best = (t0_ref[:, :], i0_ref[:, :],
                                      oid0_ref[:, :])
        has = t_loc < 1e30
        better = (t_loc < t_best[:, 0]) | (
            has & (t_loc == t_best[:, 0]) & (oid_loc < oid_best[:, 0]))
        t_ref[:, :] = jnp.where(better[:, None], t_loc[:, None], t_best)
        idx_ref[:, :] = jnp.where(better[:, None], idx_loc[:, None],
                                  idx_best)
        oid_ref[:, :] = jnp.where(better[:, None], oid_loc[:, None],
                                  oid_best)

    if not stream:
        run(lambda i, cid: tc_ref[cid])
        return

    # STREAMING: tiles live in HBM; double-buffered DMA of the 16 x k
    # cluster tile hides the copy behind the previous cluster's test.
    def scoped(scratch, sem):
        def dma(slot, i):
            return pltpu.make_async_copy(tc_ref.at[cid_of(i)],
                                         scratch.at[slot], sem.at[slot])

        @pl.when(n_hit > 0)
        def _():
            dma(0, 0).start()

        def get_tile(i, cid):
            @pl.when(i + 1 < n_hit)
            def _():
                dma((i + 1) % 2, i + 1).start()
            dma(i % 2, i).wait()
            return scratch[i % 2]

        run(get_tile)

    pl.run_scoped(scoped,
                  scratch=pltpu.VMEM((2, 16, cluster_size), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((2,)))


def _any_kernel(counts_ref, o_ref, d_ref, tcap_ref, ids_hbm, tc_ref,
                occ_ref, ids_smem, ids_sem, *,
                cluster_size, block, k_cap, stream):
    b = pl.program_id(0)
    rows = k_cap // 128
    dma_ids = pltpu.make_async_copy(
        ids_hbm.at[pl.ds(b * rows, rows), :], ids_smem, ids_sem)
    dma_ids.start()
    o = o_ref[:, :]
    d = d_ref[:, :]
    t_cap = tcap_ref[:, :]                                # (block, 1)

    n_hit = counts_ref[b]
    use_all = n_hit > k_cap
    dma_ids.wait()

    def cid_of(i):
        j = jnp.minimum(i, k_cap - 1)
        return jnp.where(use_all, i, ids_smem[j // 128, j % 128])

    def run(get_tile):
        # occ is PER-LANE int32 (Mosaic cannot legalize vector<i1> loop
        # carries): the per-visit cross-lane any() and the early-exit's
        # vector->scalar min() cost ~1/3 of a visit, so visits run in
        # chunks of up to 8 with ONE dark-block check per chunk (at most
        # 7 extra visits for a block that darkens mid-chunk).
        k = cluster_size

        def visit(i, occ_lane):
            cid = cid_of(i)
            ok, _, _ = _segment_test(o, d, get_tile(i, cid), t_cap)
            return jnp.maximum(occ_lane, ok.astype(jnp.int32))

        if stream:
            def body(carry):
                i, occ_lane = carry
                step = jnp.minimum(8, n_hit - i)
                occ_lane = jax.lax.fori_loop(
                    0, step, lambda j, ol: visit(i + j, ol), occ_lane)
                return i + step, occ_lane
        else:
            def body(carry):
                # 4-wide unrolled visits (resident tiles; clamped
                # tail revisits — max-updates are idempotent)
                i, occ_lane = carry
                step = jnp.minimum(8, n_hit - i)

                def pair(j2, ol):
                    j = i + 4 * j2
                    ol = visit(j, ol)
                    for u_ in (1, 2, 3):
                        ol = visit(jnp.minimum(j + u_, n_hit - 1), ol)
                    return ol

                occ_lane = jax.lax.fori_loop(0, (step + 3) // 4, pair,
                                             occ_lane)
                return i + step, occ_lane

        def cond(carry):
            i, occ_lane = carry
            # shadow rays in dense hair mostly occlude in the first few
            # front-to-back clusters: stop once the whole block is dark
            return (i < n_hit) & (jnp.min(jnp.max(occ_lane, axis=1)) < 1)

        i_f, occ_lane = jax.lax.while_loop(
            cond, body, (jnp.int32(0),
                         jnp.zeros((block, k), jnp.int32)))
        return i_f, jnp.max(occ_lane, axis=1, keepdims=True)

    if not stream:
        _, occ = run(lambda i, cid: tc_ref[cid])
        occ_ref[:, :] = occ
        return

    def scoped(scratch, sem):
        def dma(slot, i):
            return pltpu.make_async_copy(tc_ref.at[cid_of(i)],
                                         scratch.at[slot], sem.at[slot])

        @pl.when(n_hit > 0)
        def _():
            dma(0, 0).start()

        def get_tile(i, cid):
            @pl.when(i + 1 < n_hit)
            def _():
                dma((i + 1) % 2, i + 1).start()
            dma(i % 2, i).wait()
            return scratch[i % 2]

        i_f, occ = run(get_tile)
        # early exit leaves the prefetched DMA for step i_f in flight
        # (started by body i_f - 1, never waited): drain it so the
        # semaphore is clean at kernel end
        @pl.when(i_f < n_hit)
        def _():
            dma(i_f % 2, i_f).wait()

        occ_ref[:, :] = occ

    pl.run_scoped(scoped,
                  scratch=pltpu.VMEM((2, 16, cluster_size), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((2,)))


def _k_cap(nb, c):
    """HBM-table capacity per block: round the cluster count up to whole
    128-word rows, bounded by MAX_IDS (the sentinel only fires beyond)."""
    return min(((c + 127) // 128) * 128, MAX_IDS)


def _vma_of(x):
    """Varying-mesh-axes of a traced value (so pallas_call out_shapes can
    declare their sharding when the kernel runs inside shard_map)."""
    try:
        return jax.typeof(x).vma
    except Exception:
        return frozenset()


def _out_struct(shape, dtype, like):
    return jax.ShapeDtypeStruct(shape, dtype, vma=_vma_of(like))


# keep the cluster tiles VMEM-resident (zero in-loop DMA; revisits are
# free) while they fit comfortably under the ~16 MB scoped-VMEM limit;
# above it, stream per-cluster tiles from HBM with double-buffered DMA
RESIDENT_TILE_BUDGET = 10 * 1024 * 1024


def _use_stream(cl: Clusters):
    return cl.tc.size * 4 > RESIDENT_TILE_BUDGET


def _common_call(kernel, ids, counts, extra_in, extra_in_specs, out_shape,
                 out_specs, o, d, cl, block, interpret, k_cap, stream):
    n = o.shape[0]
    nb = n // block
    rows = k_cap // 128

    tile_space = pl.ANY if stream else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                       # counts only
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            *extra_in_specs,
            pl.BlockSpec(memory_space=pl.ANY),       # ids rows (HBM)
            pl.BlockSpec(memory_space=tile_space),   # tc tiles (full)
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # pack each block's id list into whole 128-word HBM rows; the kernel
    # DMAs its rows into SMEM scratch (scalar-prefetch SMEM tables pad
    # rows to 256 words and capped capacity at 256 ids — see MAX_IDS)
    if ids.shape[1] < k_cap:
        ids = jnp.pad(ids, ((0, 0), (0, k_cap - ids.shape[1])))
    ids_rows = ids[:, :k_cap].reshape(nb * rows, 128)
    counts = jnp.where(counts > k_cap, cl.n_clusters,
                       counts).astype(jnp.int32)

    def _promote(x):
        # under shard_map the rays are mesh-varying but the cluster tiles
        # are replicated; promote everything to the same vma so the
        # kernel's (interpret-mode) slices type-check
        missing = tuple(_vma_of(o) - _vma_of(x))
        return jax.lax.pvary(x, missing) if missing else x

    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(*map(_promote, (counts, o, d, *extra_in, ids_rows, cl.tc)))


# prefix pass length: front-to-back clusters visited to seed the per-ray
# upper bound before the t_max-pruned main pass (see nearest_hit).
# Re-swept on the v5e depth-1 hairball wavefront AFTER pass 2 gained the
# visited-cluster exclusion: nearest_hit 40.5/29.5/25.5/27.9/37.7 ms at
# K = 16/32/64/96/128 — with revisits eliminated, a small seed pass that
# resolves most rays cheaply and leaves the rest to the per-ray-pruned,
# deduplicated pass 2 wins (the old sweep, 558 ms fwd best at K=128,
# predates the exclusion: then pass 2 re-paid the whole prefix).
# YHAIR_K_PREFIX overrides.
K_PREFIX = int(__import__("os").environ.get("YHAIR_K_PREFIX", "64"))

# any-hit prefix length (see any_hit): shadow rays in dense hair occlude
# almost immediately, so a short pass resolves ~97% of rays and the
# straggler pass sees near-empty block lists
K_ANY_PREFIX = int(__import__("os").environ.get("YHAIR_K_ANY_PREFIX",
                                                "16"))


def _hit_pass(o, d, seeds, ids, counts, cl, block, interpret, k_cap,
              stream):
    n = o.shape[0]
    kernel = functools.partial(_hit_kernel, cluster_size=cl.cluster_size,
                               block=block, k_cap=k_cap, stream=stream)
    spec_b1 = pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                           memory_space=pltpu.VMEM)
    return _common_call(
        kernel, ids, counts, seeds, (spec_b1,) * 3,
        [_out_struct((n, 1), jnp.float32, o),
         _out_struct((n, 1), jnp.int32, o),
         _out_struct((n, 1), jnp.float32, o)],
        [spec_b1, spec_b1, spec_b1],
        o, d, cl, block, interpret, k_cap, stream)


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "stream"))
def nearest_hit(o, d, cl: Clusters, block=BLOCK, interpret=False,
                stream=None):
    """Closest hit for a ray batch. o, d: (N, 3), N % block == 0.

    Returns (t, idx, hit): idx indexes the cluster-reordered segment SoA
    (cl.s0/s1 rows), matching geometry.Segments built from them.
    stream: None = auto (tiles bigger than the VMEM budget stream from
    HBM); True/False forces the variant.

    TWO-PASS traversal: phase 1 lists every cluster along the ray's
    infinite extent, so interior rays in dense hair see O(C^(2/3))-long
    lists although their hit lies in the first few clusters. Pass 1
    visits only the K_PREFIX nearest (front-to-back) clusters, which
    resolves most rays and yields a per-ray upper bound t1; pass 2
    reruns phase 1 pruned by t_max = t1 (sound: a hit at t <= t1 lies in
    a cluster entered at tn <= t) and finishes from the pass-1 seeds.
    Revisited prefix clusters cannot change the (t, id) lexicographic
    winner, so the result is bit-identical to a single full pass.
    """
    n = o.shape[0]
    assert n % block == 0, f"rays {n} % block {block}"
    c = cl.n_clusters
    k_cap = _k_cap(n // block, c)
    if stream is None:
        stream = _use_stream(cl)

    k_prefix = min(K_PREFIX, k_cap)
    ids, counts, key1 = _block_cluster_lists(o, d, cl, block,
                                             return_key=True)
    if c <= k_prefix:
        seeds = (jnp.full((n, 1), INF, jnp.float32),
                 jnp.zeros((n, 1), jnp.int32),
                 jnp.full((n, 1), 3.4e38, jnp.float32))
        t, idx, _ = _hit_pass(o, d, seeds, ids, counts, cl, block,
                              interpret, k_cap, stream)
    else:
        seeds = (jnp.full((n, 1), INF, jnp.float32),
                 jnp.zeros((n, 1), jnp.int32),
                 jnp.full((n, 1), 3.4e38, jnp.float32))
        t1, i1, oid1 = _hit_pass(
            o, d, seeds, ids[:, :k_prefix],
            jnp.minimum(counts, k_prefix), cl, block, interpret,
            max(128, k_prefix), stream)
        # pass 2 EXCLUDES the clusters pass 1 already visited (cheap
        # per-block tn threshold, not a scatter): the (t1, i1, oid1)
        # seeds carry their result, so revisits cannot change the
        # winner and only burn kernel visits
        thresh = _visited_threshold(key1, ids, counts, k_prefix)
        ids2, counts2 = _block_cluster_lists(o, d, cl, block,
                                             t_max=t1[:, 0],
                                             exclude_below=thresh)
        t, idx, _ = _hit_pass(o, d, (t1, i1, oid1), ids2, counts2, cl,
                              block, interpret, k_cap, stream)
    t = t[:, 0]
    idx = idx[:, 0]
    hit = t < INF
    return jnp.where(hit, t, INF), idx, hit


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "stream"))
def any_hit(o, d, t_max, cl: Clusters, block=BLOCK, interpret=False,
            stream=None):
    """Occlusion query: True where some segment lies in (T_MIN, t_max).

    o, d: (N, 3); t_max: (N,). All-occluded blocks exit early.
    """
    n = o.shape[0]
    assert n % block == 0, f"rays {n} % block {block}"
    c = cl.n_clusters
    k_cap = _k_cap(n // block, c)
    if stream is None:
        stream = _use_stream(cl)

    spec_b1 = pl.BlockSpec((block, 1), lambda b, *_: (b, 0),
                           memory_space=pltpu.VMEM)

    def run_pass(o_, tm, ids, counts, cap):
        kernel = functools.partial(_any_kernel,
                                   cluster_size=cl.cluster_size,
                                   block=block, k_cap=cap, stream=stream)
        (occ,) = _common_call(
            kernel, ids, counts, (tm.reshape(n, 1),), (spec_b1,),
            [_out_struct((n, 1), jnp.int32, o_)], [spec_b1],
            o_, d, cl, block, interpret, cap, stream)
        return occ[:, 0] > 0

    # per-ray t_max pruning keeps shadow-ray cluster lists short (only
    # clusters entered before the light can occlude)
    ids, counts, key1 = _block_cluster_lists(o, d, cl, block,
                                             t_max=t_max, return_key=True)
    if c <= K_ANY_PREFIX:
        return run_pass(o, t_max, ids, counts, k_cap)

    # TWO-PASS: most shadow rays in dense hair occlude within the first
    # few front-to-back clusters, but the in-kernel early exit only fires
    # once the WHOLE block is dark — a handful of unoccluded stragglers
    # force the full list. Pass A scans a short prefix; pass B neutralizes
    # the rays pass A already resolved (origin -> far away, so they
    # contribute nothing to any block's cluster union) and rebuilds the
    # lists for the stragglers only — most blocks then have zero clusters.
    occ_a = run_pass(o, t_max, ids[:, :K_ANY_PREFIX],
                     jnp.minimum(counts, K_ANY_PREFIX), 128)
    # a block whose list fit entirely in the prefix is fully resolved
    done = (counts <= K_ANY_PREFIX)
    done_ray = jnp.repeat(done, block) | occ_a
    # neutralize resolved rays STRUCTURALLY: t_max below T_MIN excludes
    # them from both the list rebuild (tn <= t_max, tn >= T_MIN) and the
    # kernel's s <= t_cap test, at any scene scale (ADVICE r3: the old
    # origin -> 1e8 displacement relied on geometric misses). Clusters
    # pass A already visited are excluded outright (occ_a holds their
    # verdict for every ray of the block).
    tmax_b = jnp.where(done_ray, 0.0, t_max)
    thresh = _visited_threshold(key1, ids, counts, K_ANY_PREFIX)
    ids_b, counts_b = _block_cluster_lists(o, d, cl, block, t_max=tmax_b,
                                           exclude_below=thresh)
    occ_b = run_pass(o, tmax_b, ids_b, counts_b, k_cap)
    return occ_a | occ_b


def _pad_rays(o, d, block, extra=None):
    n = o.shape[0]
    pad = (-n) % block
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e8, o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        if extra is not None:
            extra = jnp.concatenate([extra, jnp.zeros((pad,), extra.dtype)])
    return o, d, extra, n


# NEGATIVE RESULT (kept as a doc note; the code was retired in r5): a
# "v2" variant traversed per-SUBGROUP (16-ray) cluster lists instead of
# per-128-ray-block lists, cutting cluster visits ~4x on paper. Measured
# end-to-end on the v5e hairball bench it was 2.2x SLOWER (full trace
# 1243 ms vs 572 ms): per-visit fixed overhead (~0.5 us of loop control,
# dynamic tile indexing and scalar/vector round-trips) dominates, so 8x
# more (16, 128) visits lose to v1's shared (128, 128) block visits.
# Narrower-than-block traversal only pays off if the per-visit overhead
# is amortized over multiple clusters per iteration.


def make_nearest_fn(cl: Clusters, block=BLOCK, interpret=False,
                    stream=None):
    """Adapter for integrator.intersect_scene's nearest_segments hook.
    Pads the ray batch up to a block multiple when needed."""

    def fn(o, d):
        o, d, _, n = _pad_rays(o, d, block)
        t, idx, hit = nearest_hit(o, d, cl, block=block,
                                  interpret=interpret, stream=stream)
        return t[:n], idx[:n], hit[:n]
    return fn


def make_occluded_fn(cl: Clusters, block=BLOCK, interpret=False,
                     stream=None):
    """Occlusion adapter: fn(o, d, t_max) -> bool (N,)."""

    def fn(o, d, t_max):
        o, d, t_max, n = _pad_rays(o, d, block, t_max)
        occ = any_hit(o, d, t_max, cl, block=block,
                      interpret=interpret, stream=stream)
        return occ[:n]
    return fn
