"""LBVH build (host-side, vectorized numpy) for hair segments.

TPU-native replacement for the reference's recursive SAH BVH builder
[U:libs/yocto/yocto_bvh.cpp] (SURVEY.md §2.4, §3.3). Rather than porting
the pointer-chasing C++ build, segments are Morton-sorted and packed into
an IMPLICIT complete binary tree in heap order:

  * leaves hold K consecutive Morton-ordered segments,
  * node i (1-based heap) has children 2i / 2i+1 — no child pointers,
  * the stackless-traversal skip index ("escape" to the next DFS node
    after the subtree) has the closed form: strip trailing one-bits of i,
    then +1 — precomputed here as an int32 array,
  * bboxes are computed bottom-up with level-reshaped min/max reductions.

Everything is O(N log N) vectorized numpy (no Python recursion), so builds
are fast on host and the flat arrays upload straight to HBM. Quality is
LBVH-median; a binned-SAH native builder can swap in underneath the same
array format.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BVHArrays(NamedTuple):
    """Flat BVH ready for device upload.

    Heap layout, 1-based: nodes [1 .. 2*n_leaves-1]; leaves are indices
    >= n_leaves. Index 0 is the traversal sentinel ("done").
    """

    node_min: np.ndarray   # (2*L, 3) f32; row 0 unused
    node_max: np.ndarray   # (2*L, 3) f32
    skip: np.ndarray       # (2*L,) int32; 0 = done
    # Morton-reordered segment SoA, padded to L*K:
    p0: np.ndarray         # (L*K, 3) f32
    p1: np.ndarray
    r0: np.ndarray         # (L*K,) f32
    r1: np.ndarray
    seg_index: np.ndarray  # (L*K,) int32 original segment id (-1 = pad)
    n_leaves: int
    leaf_size: int


def _expand_bits(v):
    """Spread 10 bits over 30 (3D Morton)."""
    v = v.astype(np.uint64)
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton3(x, y, z):
    """30-bit Morton code from [0,1)^3 coordinates."""
    def q(a):
        return np.clip(a * 1024.0, 0, 1023).astype(np.uint64)
    return (_expand_bits(q(x)) << 2) | (_expand_bits(q(y)) << 1) \
        | _expand_bits(q(z))


def _skip_indices(n_total):
    """Closed-form escape index for every heap node.

    skip(i): j = i >> (number of trailing 1-bits of i); 0 if j <= 1 else
    j + 1. (Stripping trailing ones walks up while the node is a right
    child; the next DFS node is then the right sibling.)
    """
    i = np.arange(n_total, dtype=np.uint32)
    lowest_zero = ~i & (i + 1)          # power of two marking first 0 bit
    trailing_ones = np.zeros_like(i)
    lz = lowest_zero.copy()
    # log2 of a power of two via shifts (vectorized, 5 steps for 32-bit)
    for shift in (16, 8, 4, 2, 1):
        big = lz >= (np.uint32(1) << np.uint32(shift))
        trailing_ones = trailing_ones + np.where(big, shift, 0).astype(np.uint32)
        lz = np.where(big, lz >> np.uint32(shift), lz)
    j = i >> trailing_ones
    skip = np.where(j <= 1, 0, j + 1).astype(np.int32)
    skip[0] = 0
    return skip


def _median_split_order(centroid, n_leaves, K):
    """Recursive longest-axis median split into K-sized leaves.

    Returns a permutation of segment indices such that leaf l holds
    order[l*K:(l+1)*K] AND the implicit heap's internal nodes coincide
    with the split hierarchy (each split puts exactly (n_lv//2)*K
    elements left, so subtree -> contiguous range -> heap node).

    Why not Morton runs: packing 128 consecutive Morton codes gives
    ragged cluster AABBs that overlap badly in dense hair — measured on
    the 10k-strand hairball, ~76 cluster boxes contain a typical
    interior point's entry interval. Median splits cut that roughly in
    half, which directly scales the Pallas kernel's cluster-visit count.
    Deterministic (stable sort by coordinate), so a native builder can
    reproduce it bit-identically with std::stable_sort.
    """
    s = centroid.shape[0]
    order = np.arange(s, dtype=np.int64)
    stack = [(0, s, n_leaves)]
    while stack:
        lo, hi, n_lv = stack.pop()
        if n_lv <= 1 or hi - lo <= K:
            continue
        seg = order[lo:hi]
        c = centroid[seg]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        srt = np.argsort(c[:, ax], kind="stable")
        order[lo:hi] = seg[srt]
        left = min(hi - lo, (n_lv // 2) * K)
        stack.append((lo, lo + left, n_lv // 2))
        stack.append((lo + left, hi, n_lv - n_lv // 2))
    return order.astype(np.int32)


def build(p0, p1, r0, r1, leaf_size=4, method="median"):
    """Build the LBVH. Inputs: (S, 3) endpoints, (S,) radii (any float).

    method: "median" (longest-axis median splits — tighter leaf boxes,
    the default) or "morton" (Morton-sorted runs — matches the native
    C++ builder's layout).
    """
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    r0 = np.asarray(r0, np.float64)
    r1 = np.asarray(r1, np.float64)
    s = p0.shape[0]
    K = leaf_size

    # segment bboxes (endpoint spheres, as the reference inflates line
    # bboxes by radius — SURVEY.md §3.3)
    bmin = np.minimum(p0 - r0[:, None], p1 - r1[:, None])
    bmax = np.maximum(p0 + r0[:, None], p1 + r1[:, None])
    centroid = 0.5 * (bmin + bmax)

    n_leaves = max(1, 1 << int(np.ceil(np.log2(max(1, (s + K - 1) // K)))))
    if method == "median":
        order = _median_split_order(centroid, n_leaves, K)
    else:
        lo = centroid.min(0)
        span = np.maximum(centroid.max(0) - lo, 1e-12)
        unit = (centroid - lo) / span
        codes = morton3(unit[:, 0], unit[:, 1], unit[:, 2])
        order = np.argsort(codes, kind="stable").astype(np.int32)
    padded = n_leaves * K

    def gather_pad(a, fill):
        out = np.full((padded,) + a.shape[1:], fill, np.float32)
        out[:s] = a[order].astype(np.float32)
        return out

    gp0 = gather_pad(p0, 1e8)
    gp1 = gather_pad(p1, 1e8)
    gr0 = gather_pad(r0, 0.0)
    gr1 = gather_pad(r1, 0.0)
    seg_index = np.full(padded, -1, np.int32)
    seg_index[:s] = order

    # leaf bboxes (padding contributes +inf/-inf so it never hits)
    lbmin = np.full((padded, 3), np.inf, np.float32)
    lbmax = np.full((padded, 3), -np.inf, np.float32)
    lbmin[:s] = bmin[order].astype(np.float32)
    lbmax[:s] = bmax[order].astype(np.float32)
    leaf_min = lbmin.reshape(n_leaves, K, 3).min(1)
    leaf_max = lbmax.reshape(n_leaves, K, 3).max(1)

    n_total = 2 * n_leaves
    node_min = np.full((n_total, 3), np.inf, np.float32)
    node_max = np.full((n_total, 3), -np.inf, np.float32)
    node_min[n_leaves:] = leaf_min
    node_max[n_leaves:] = leaf_max
    # bottom-up: parents of level [2^d, 2^{d+1})
    lvl = n_leaves
    while lvl > 1:
        child_min = node_min[lvl:2 * lvl].reshape(lvl // 2, 2, 3)
        child_max = node_max[lvl:2 * lvl].reshape(lvl // 2, 2, 3)
        node_min[lvl // 2:lvl] = child_min.min(1)
        node_max[lvl // 2:lvl] = child_max.max(1)
        lvl //= 2

    return BVHArrays(node_min=node_min, node_max=node_max,
                     skip=_skip_indices(n_total),
                     p0=gp0, p1=gp1, r0=gr0, r1=gr1, seg_index=seg_index,
                     n_leaves=n_leaves, leaf_size=K)
