"""Wavefront path-tracing integrator in JAX.

TPU-native rebuild of the reference's `trace_path` loop
[U:libs/yocto/yocto_trace.cpp] (SURVEY.md §2.7, §3.1): camera rays ->
bounce loop { intersect -> env on miss -> direct lighting with shadow rays
-> BSDF sample -> Russian roulette } — but expressed as a `lax.scan` over a
fixed max depth with alive-masks instead of recursion/compaction
(SURVEY.md §7.6), so the whole render step is one compiled XLA program.

Parity: consumes the same uniforms layout as oracle/pathtrace.py and
reproduces it pixel-for-pixel (tests/test_render_parity.py).

Differentiability: discrete sampling decisions (lobe choice, RR) are made
on `stop_gradient`ed quantities; the path throughput f·|cos|/pdf carries
the gradient (detached-sampling reparameterization — unbiased for the
continuous hair parameters; validated against finite differences).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bsdf import hair as jh
from ..bsdf import surface as js
from ..core.camera import Camera, camera_rays
from ..core.envmap import env_eval, env_pdf, env_sample, has_env
from ..core.rng import D_BOUNCE, D_PIXEL, n_uniform_dims
from ..core.scene import Scene
from ..core.safemath import safe_normalize
from ..geometry import segments as seg
from ..geometry import triangles as tri

INF = seg.INF
RR_START = 3
# fixed subdivision depth for first-class Bezier curve primitives (must
# be static under jit; 2^3 chords/curve matches geometry/bezier.py's
# default and the tessellation used by scenes.generators)
CURVE_DEPTH = 3


class Hit(NamedTuple):
    hit: jax.Array        # (N,) bool
    t: jax.Array          # (N,)
    mat: jax.Array        # (N,) int32: -1 miss, 0 hair, 1 surface
    mat_id: jax.Array     # (N,) int32 into scene.surf_mat (surface hits)
    light_id: jax.Array   # (N,) int32 area-light element id, -1 = none
    position: jax.Array   # (N, 3)
    normal: jax.Array     # (N, 3) surface shading normal
    gnormal: jax.Array    # (N, 3) geometric normal (area-light MIS pdf)
    tangent: jax.Array    # (N, 3) hair frame x
    frame_y: jax.Array    # (N, 3)
    frame_z: jax.Array    # (N, 3)
    h: jax.Array          # (N,)
    radius: jax.Array     # (N,)
    uv: jax.Array         # (N, 2) texture coordinates (surface hits)
    hair_mid: jax.Array   # (N,) int32 hair-material table index


def _nearest(scene: Scene, o, d, chunk, nearest_segments):
    """Resolve the segment search: explicit hook > scene.accel > brute
    force. scene.accel travels inside the Scene pytree so the structure
    arrays are jit ARGUMENTS (a closure would bake megabytes of geometry
    into the compiled program as constants)."""
    # the search is a discrete argmin: detach its inputs so neither JVP
    # nor VJP is ever pushed through the scan / Pallas kernel (the caller
    # recomputes the winner's t differentiably — recompute-based backward)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    if nearest_segments is not None:
        return nearest_segments(o, d)
    accel = scene.accel
    if accel is None:
        return seg.nearest_hit(o, d, scene.segments, chunk=chunk)
    from ..accel.instanced import InstancedClusters
    from ..accel.traverse import DeviceBVH
    from ..ops.clusters import Clusters
    if isinstance(accel, Clusters):
        from ..ops import intersect_kernel as ik
        interp = jax.devices()[0].platform == "cpu"
        return ik.make_nearest_fn(accel, interpret=interp)(o, d)
    if isinstance(accel, InstancedClusters):
        from ..accel import instanced
        interp = jax.devices()[0].platform == "cpu"
        return instanced.make_nearest_fn(accel, interpret=interp)(o, d)
    if isinstance(accel, DeviceBVH):
        from ..accel import traverse
        t, idx, hit, _ = traverse.nearest_hit(o, d, accel)
        return t, idx, hit
    raise TypeError(f"unknown accel type {type(accel)}")


def intersect_scene(scene: Scene, o, d, chunk=2048,
                    nearest_segments=None) -> Hit:
    """Closest hit over hair segments + analytic props.

    `nearest_segments(o, d) -> (t, idx, hit)` can override the segment
    search; by default scene.accel decides (see _nearest).
    """
    n = o.shape[0]
    t_seg, idx, hit_seg = _nearest(scene, o, d, chunk, nearest_segments)

    # GEOMETRY GRADIENTS: the nearest search (Pallas kernel or chunked
    # scan) is a discrete argmin — detach it and recompute the winning
    # segment's ray parameter with the differentiable closed form, so
    # ∂t/∂(strand endpoints) flows into positions, NEE distances and the
    # shading frame (recompute-based backward for the kernel; SURVEY.md
    # §7.8, VERDICT r1 missing #1). The closed form below IS the
    # arithmetic both search paths use, so s_re matches the searched t up
    # to (at worst) FMA-fusion ulps between the Pallas kernel and this
    # XLA recompute; the `where(hit_seg, ...)` gate keys off the SEARCH's
    # hit mask, so ulp drift cannot flip hit/miss (tested bit-equal on
    # TPU hardware in tests/test_tpu_hardware.py).
    #
    # ESTIMATOR NOTE (interior term only): hit/miss indicators, the
    # winning index and occlusion stay detached, so silhouette /
    # visibility derivatives are dropped. Gradients at strand edges are
    # biased toward zero; inverse rendering of positions relies on the
    # interior (shading + foreshortening + occlusion-geometry) term. An
    # edge-sampling or reparameterized-visibility boundary estimator is
    # future work (see README "Geometry gradients").
    t_seg = jax.lax.stop_gradient(t_seg)
    idx = jax.lax.stop_gradient(idx)
    from ..accel.instanced import InstancedClusters, gather_world_segments
    if isinstance(scene.accel, InstancedClusters):
        # two-level path: idx is (instance * S + segment); gather the
        # canonical segment and pose it into world space so the
        # differentiable recompute + shading stay world-space exact
        p0g, p1g, r0g, r1g, inst_mid = gather_world_segments(
            scene.accel, scene.segments, idx)
        segs_view = seg.Segments(p0=p0g, p1=p1g, r0=r0g, r1=r1g)
        idx_view = jnp.arange(n, dtype=jnp.int32)
        hair_mid = inst_mid
    else:
        segs_view = scene.segments
        idx_view = idx
        if scene.seg_mat_id.shape[0]:
            hair_mid = scene.seg_mat_id[jnp.clip(
                idx, 0, scene.seg_mat_id.shape[0] - 1)]
        else:  # curves-only scene: no tessellated strands to look up
            hair_mid = jnp.zeros((n,), jnp.int32)
    if scene.n_curves:
        # FIRST-CLASS Bezier curves: discrete search (curve id, leaf,
        # param) is detached like the segment argmin; the winner's chord
        # endpoints are then re-evaluated differentiably from the
        # CONTROL POINTS, so the shared recompute + shading frame below
        # carry ∂pixel/∂cp for strand-geometry inverse rendering
        # (geometry/bezier.py; VERDICT r4 missing #4).
        from ..geometry import bezier as bez
        n_leaf = 1 << CURVE_DEPTH
        t_c, cidx, u_c, hit_c = bez.nearest_hit(
            jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(scene.crv_cp),
            jax.lax.stop_gradient(scene.crv_r0),
            jax.lax.stop_gradient(scene.crv_r1), depth=CURVE_DEPTH,
            chunk=min(chunk, 512))
        t_c = jax.lax.stop_gradient(t_c)
        cidx = jax.lax.stop_gradient(cidx)
        u_c = jax.lax.stop_gradient(u_c)
        crv_win = hit_c & (~hit_seg | (t_c < t_seg))
        leaf = jnp.clip((u_c * n_leaf).astype(jnp.int32), 0, n_leaf - 1)
        ta = leaf.astype(o.dtype) / n_leaf
        tb = (leaf + 1).astype(o.dtype) / n_leaf
        cpc = scene.crv_cp[cidx]                 # differentiable gather
        q0 = bez.bezier_point(cpc, ta)
        q1 = bez.bezier_point(cpc, tb)
        cr0 = scene.crv_r0[cidx]
        cr1 = scene.crv_r1[cidx]
        # radius lerps along the GLOBAL curve parameter (identical to
        # both bez.nearest_hit and tessellation via bezier_to_segments)
        ra = cr0 + (cr1 - cr0) * ta
        rb = cr0 + (cr1 - cr0) * tb
        if segs_view.p0.shape[0]:
            sp0 = segs_view.p0[idx_view]
            sp1 = segs_view.p1[idx_view]
            sr0 = segs_view.r0[idx_view]
            sr1 = segs_view.r1[idx_view]
        else:  # curves-only scene: nothing to gather (non-degenerate
            # placeholder — zero-length segments NaN the frame grads)
            sp0 = jnp.zeros((n, 3), o.dtype)
            sp1 = sp0 + jnp.asarray([[1.0, 0.0, 0.0]], o.dtype)
            sr0 = sr1 = jnp.zeros((n,), o.dtype)
        cw = crv_win[:, None]
        segs_view = seg.Segments(jnp.where(cw, q0, sp0),
                                 jnp.where(cw, q1, sp1),
                                 jnp.where(crv_win, ra, sr0),
                                 jnp.where(crv_win, rb, sr1))
        idx_view = jnp.arange(n, dtype=jnp.int32)
        hair_mid = jnp.where(crv_win, scene.crv_mat_id[cidx], hair_mid)
        t_seg = jnp.where(crv_win, t_c, t_seg)
        hit_seg = hit_seg | crv_win
    if segs_view.p0.shape[0]:
        s_re, _, _ = seg._closest_approach(o, d, segs_view.p0[idx_view],
                                           segs_view.p1[idx_view])
        t_seg = jnp.where(hit_seg, s_re, t_seg)
    else:  # no strand geometry at all (prop/curve-free scene);
        # non-degenerate placeholder segment (see curves branch)
        segs_view = seg.Segments(jnp.zeros((1, 3), o.dtype),
                                 jnp.asarray([[1.0, 0.0, 0.0]], o.dtype),
                                 jnp.zeros((1,), o.dtype),
                                 jnp.zeros((1,), o.dtype))
        idx_view = jnp.zeros((n,), jnp.int32)

    best_t = jnp.where(hit_seg, t_seg, INF)
    mat = jnp.where(hit_seg, 0, -1).astype(jnp.int32)
    mat_id = jnp.zeros((n,), jnp.int32)
    light_id = jnp.full((n,), -1, jnp.int32)
    normal = jnp.zeros((n, 3), o.dtype)
    gnormal = jnp.zeros((n, 3), o.dtype)
    uv = jnp.zeros((n, 2), o.dtype)

    if scene.n_spheres:
        oc = o[:, None, :] - scene.sph_center[None]
        b = jnp.sum(oc * d[:, None, :], -1)
        c = jnp.sum(oc * oc, -1) - scene.sph_radius[None] ** 2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        t_cand = jnp.where((disc >= 0) & (t0 > 1e-4), t0,
                           jnp.where((disc >= 0) & (t1 > 1e-4), t1, INF))
        i_s = jnp.argmin(t_cand, -1)
        t_s = jnp.take_along_axis(t_cand, i_s[:, None], -1)[:, 0]
        closer = t_s < best_t
        best_t = jnp.where(closer, t_s, best_t)
        mat = jnp.where(closer, 1, mat)
        mat_id = jnp.where(closer, i_s.astype(jnp.int32), mat_id)
        pos_s = o + t_s[:, None] * d
        n_s = pos_s - scene.sph_center[i_s]
        n_s = n_s / jnp.maximum(
            jnp.linalg.norm(n_s, axis=-1, keepdims=True), 1e-12)
        normal = jnp.where(closer[:, None], n_s, normal)
        gnormal = jnp.where(closer[:, None], n_s, gnormal)
        # spherical uv from the outward normal (oracle/texture.py)
        uv_s = jnp.stack(
            [jnp.arctan2(n_s[:, 2], n_s[:, 0]) / (2.0 * jnp.pi) + 0.5,
             jnp.arccos(jnp.clip(n_s[:, 1], -1.0, 1.0)) / jnp.pi], -1)
        uv = jnp.where(closer[:, None], uv_s, uv)
        if scene.n_area_lights:
            light_id = jnp.where(closer, scene.sph_light_id[i_s],
                                 light_id)

    if scene.n_planes:
        denom = jnp.sum(d[:, None, :] * scene.pln_normal[None], -1)
        tp = jnp.sum((scene.pln_point[None] - o[:, None, :])
                     * scene.pln_normal[None], -1) / jnp.where(
            jnp.abs(denom) < 1e-12, 1e-12, denom)
        tp = jnp.where((jnp.abs(denom) > 1e-9) & (tp > 1e-4), tp, INF)
        i_p = jnp.argmin(tp, -1)
        t_p = jnp.take_along_axis(tp, i_p[:, None], -1)[:, 0]
        closer = t_p < best_t
        best_t = jnp.where(closer, t_p, best_t)
        mat = jnp.where(closer, 1, mat)
        mat_id = jnp.where(closer,
                           scene.n_spheres + i_p.astype(jnp.int32), mat_id)
        pn = scene.pln_normal[i_p]
        normal = jnp.where(closer[:, None], pn, normal)
        gnormal = jnp.where(closer[:, None], pn, gnormal)
        # planar uv in the stored normal's tangent frame (mirror of
        # oracle/pathtrace.py plane uv — never the flipped shading normal)
        pnu = pn / jnp.maximum(
            jnp.linalg.norm(pn, axis=-1, keepdims=True), 1e-12)
        axp = jnp.where(jnp.abs(pnu[:, 0:1]) > 0.9,
                        jnp.array([[0.0, 1.0, 0.0]], pn.dtype),
                        jnp.array([[1.0, 0.0, 0.0]], pn.dtype))
        t1p = jnp.cross(pnu, axp)
        t1p = t1p / jnp.maximum(
            jnp.linalg.norm(t1p, axis=-1, keepdims=True), 1e-12)
        t2p = jnp.cross(pnu, t1p)
        rel = (o + t_p[:, None] * d) - scene.pln_point[i_p]
        uv_p = jnp.stack([jnp.sum(rel * t1p, -1),
                          jnp.sum(rel * t2p, -1)], -1)
        uv = jnp.where(closer[:, None], uv_p, uv)
        # planes are never lights: clear any sphere light_id they occlude
        light_id = jnp.where(closer, -1, light_id)

    if scene.n_triangles:
        t_t, i_t, hit_t = tri.nearest_hit(o, d, scene.tris, chunk=chunk)
        closer = jnp.where(hit_t, t_t, INF) < best_t
        best_t = jnp.where(closer, t_t, best_t)
        mat = jnp.where(closer, 1, mat)
        tsh = tri.shade_info(o, d, i_t, scene.tris)
        mat_id = jnp.where(closer, tsh.mat_id, mat_id)
        normal = jnp.where(closer[:, None], tsh.normal.astype(o.dtype),
                           normal)
        gnormal = jnp.where(closer[:, None], tsh.gnormal.astype(o.dtype),
                            gnormal)
        uv = jnp.where(closer[:, None], tsh.uv.astype(o.dtype), uv)
        if scene.n_area_lights:
            light_id = jnp.where(closer, scene.tri_light_id[i_t],
                                 light_id)

    hit = best_t < INF
    is_hair = hit & (mat == 0)
    sh = seg.shade_info(o, d, jnp.where(is_hair, best_t, 0.0), idx_view,
                        segs_view)
    pos = o + jnp.where(hit, best_t, 0.0)[:, None] * d
    position = jnp.where(is_hair[:, None], sh.position, pos)
    return Hit(hit=hit, t=jnp.where(hit, best_t, INF), mat=mat,
               mat_id=mat_id, light_id=light_id, position=position,
               normal=normal, gnormal=gnormal,
               tangent=sh.tangent, frame_y=sh.frame_y, frame_z=sh.frame_z,
               h=jnp.where(is_hair, sh.h, 0.0),
               radius=jnp.where(is_hair, sh.radius, 0.0), uv=uv,
               hair_mid=hair_mid)


def occluded_scene(scene: Scene, o, d, dist, chunk=2048,
                   nearest_segments=None) -> jax.Array:
    """Lean any-hit: skips shading-attribute computation (shadow rays only
    need a boolean), roughly halving shadow-ray cost vs intersect_scene."""
    # occlusion is boolean: derivative-free by construction; detach inputs
    # so autodiff never traverses the shadow kernels/scans
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    dist = jax.lax.stop_gradient(dist)
    limit = dist * (1.0 - 1e-4)
    from ..accel.instanced import InstancedClusters
    from ..ops.clusters import Clusters
    if nearest_segments is None and isinstance(scene.accel, Clusters):
        # dedicated any-hit kernel: per-ray t_max bound + all-occluded
        # early exit (shadow rays are the majority of casts)
        from ..ops import intersect_kernel as ik
        interp = jax.devices()[0].platform == "cpu"
        occ = ik.make_occluded_fn(scene.accel, interpret=interp)(o, d,
                                                                 limit)
    elif nearest_segments is None and isinstance(scene.accel,
                                                 InstancedClusters):
        from ..accel import instanced
        interp = jax.devices()[0].platform == "cpu"
        occ = instanced.make_occluded_fn(scene.accel, interpret=interp)(
            o, d, limit)
    else:
        t_seg, _, hit_seg = _nearest(scene, o, d, chunk, nearest_segments)
        occ = hit_seg & (t_seg < limit)

    if scene.n_curves:
        from ..geometry import bezier as bez
        t_c, _, _, hit_c = bez.nearest_hit(
            o, d, jax.lax.stop_gradient(scene.crv_cp),
            jax.lax.stop_gradient(scene.crv_r0),
            jax.lax.stop_gradient(scene.crv_r1), depth=CURVE_DEPTH,
            chunk=min(chunk, 512))
        occ = occ | (hit_c & (t_c < limit))

    if scene.n_spheres:
        oc = o[:, None, :] - scene.sph_center[None]
        b = jnp.sum(oc * d[:, None, :], -1)
        c = jnp.sum(oc * oc, -1) - scene.sph_radius[None] ** 2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        t_s = jnp.where((disc >= 0) & (t0 > 1e-4), t0,
                        jnp.where((disc >= 0) & (t1 > 1e-4), t1, INF))
        occ = occ | (t_s.min(-1) < limit)

    if scene.n_planes:
        denom = jnp.sum(d[:, None, :] * scene.pln_normal[None], -1)
        tp = jnp.sum((scene.pln_point[None] - o[:, None, :])
                     * scene.pln_normal[None], -1) / jnp.where(
            jnp.abs(denom) < 1e-12, 1e-12, denom)
        tp = jnp.where((jnp.abs(denom) > 1e-9) & (tp > 1e-4), tp, INF)
        occ = occ | (tp.min(-1) < limit)

    if scene.n_triangles:
        occ = occ | tri.occluded(o, d, dist, scene.tris, chunk=chunk)
    return occ


def _morton_spread3(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _ray_sort_perm(o, d, alive, lo, inv_ext):
    """Coherence permutation for a wavefront bounce.

    The cluster kernel tests each 128-ray BLOCK against the union of the
    clusters any of its rays touch; after one bounce the rays of a block
    scatter over the whole asset and that union explodes (measured on the
    10k-strand hairball: mean clusters/block 36 for camera rays vs 518
    for bounce-1 rays — 14x the kernel work). Sorting the wavefront by
    (Morton cell of origin, direction octant) every bounce restores
    block coherence. Dead rays sort to the back, so their blocks hit
    zero clusters and the kernel loop over them is empty.

    Per-ray hit results are invariant to block composition (the (t, id)
    lexicographic tie-break is visit-order independent), so sorted and
    unsorted renders are bit-identical.
    """
    q = jnp.clip((o - lo) * inv_ext, 0.0, 1.0)
    cell = (q * 1023.0).astype(jnp.int32)          # 10 bits/axis
    m = ((_morton_spread3(cell[:, 0]) << 2)
         | (_morton_spread3(cell[:, 1]) << 1)
         | _morton_spread3(cell[:, 2]))
    # position-major key: the top 18 Morton bits (6/axis), then the
    # direction octant — origin locality dominates which clusters a ray
    # can touch; octant breaks ties within a cell
    key = ((m >> 12) << 3) | (
        (d[:, 0] > 0).astype(jnp.int32)
        + 2 * (d[:, 1] > 0).astype(jnp.int32)
        + 4 * (d[:, 2] > 0).astype(jnp.int32))
    key = jnp.where(alive, key, jnp.int32(1) << 29)
    return jnp.argsort(key)


def _area_light_point(scene: Scene, el, u0, u1):
    """Sample a point on area-light element `el` — mirrors
    oracle/pathtrace.py:_area_light_point. -> (point, normal, uv)."""
    kind = scene.al_kind[el]
    p0, p1, p2 = scene.al_p0[el], scene.al_p1[el], scene.al_p2[el]
    su = jnp.sqrt(jnp.maximum(u0, 0.0))
    w1 = su * (1.0 - u1)
    w2 = su * u1
    w0 = 1.0 - w1 - w2
    p_tri = w0[:, None] * p0 + w1[:, None] * p1 + w2[:, None] * p2
    n_tri = jnp.cross(p1 - p0, p2 - p0)
    n_tri = n_tri / jnp.maximum(
        jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-20)
    uv_tri = (w0[:, None] * scene.al_uv0[el] + w1[:, None] * scene.al_uv1[el]
              + w2[:, None] * scene.al_uv2[el])
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u1
    n_sph = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    p_sph = p0 + n_sph * p1[:, 0:1]
    uv_sph = jnp.stack(
        [jnp.arctan2(n_sph[:, 2], n_sph[:, 0]) / (2.0 * jnp.pi) + 0.5,
         jnp.arccos(jnp.clip(n_sph[:, 1], -1.0, 1.0)) / jnp.pi], axis=-1)
    is_tri = (kind == 0)[:, None]
    return (jnp.where(is_tri, p_tri, p_sph),
            jnp.where(is_tri, n_tri, n_sph),
            jnp.where(is_tri, uv_tri, uv_sph))


def _area_light_pdf_sa(scene: Scene, el, pos, lpos, lnrm):
    """Solid-angle pdf of area-light NEE reaching `lpos` from `pos`."""
    to_l = lpos - pos
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    cos_l = jnp.abs(jnp.sum(lnrm * to_l, axis=-1)) / dist
    return (scene.al_pmf[el] * dist2
            / jnp.maximum(cos_l * scene.al_area[el], 1e-12))


def _hair_mat_at(scene: Scene, hair_mid):
    """Per-ray hair material: gather the (Mh, ...) table rows when the
    scene carries per-shape hair materials (leaves keep their scalar
    shape for single-material scenes so existing programs are unchanged —
    hair_ctx broadcasts either way)."""
    if scene.hair.beta_m.ndim == 0:
        return scene.hair
    return jax.tree.map(lambda a: a[hair_mid], scene.hair)


def _diffuse_frame(nrm):
    a = jnp.where(jnp.abs(nrm[:, 0:1]) > 0.9,
                  jnp.array([[0.0, 1.0, 0.0]], nrm.dtype),
                  jnp.array([[1.0, 0.0, 0.0]], nrm.dtype))
    t1 = safe_normalize(jnp.cross(nrm, a))
    return t1, jnp.cross(nrm, t1)


def _to_local(w, fx, fy, fz):
    return jnp.stack([jnp.sum(w * fx, -1), jnp.sum(w * fy, -1),
                      jnp.sum(w * fz, -1)], -1)


def _to_world(w, fx, fy, fz):
    return w[..., 0:1] * fx + w[..., 1:2] * fy + w[..., 2:3] * fz


def trace_eyelight(scene: Scene, o, d, uniforms, chunk=2048,
                   nearest_segments=None):
    """Debug sampler: shade the first hit with a headlight (reference
    `trace_eyelight` [U:yocto_trace.cpp], SURVEY.md §2.7)."""
    o = o + d * 0.0
    hs = intersect_scene(scene, o, d, chunk=chunk,
                         nearest_segments=nearest_segments)
    is_hair = hs.mat == 0
    sp = scene.surf_mat.gather(hs.mat_id)
    if scene.tex_meta.shape[0]:
        from ..core.texture import apply_textures
        sp = apply_textures(scene.tex_data, scene.tex_meta, sp, hs.uv)
    nrm = hs.normal * jnp.where(
        (jnp.sum(hs.normal * d, -1) > 0)[:, None], -1.0, 1.0)
    t1, t2 = _diffuse_frame(nrm)
    fx = jnp.where(is_hair[:, None], hs.tangent, t1)
    fy = jnp.where(is_hair[:, None], hs.frame_y, t2)
    fz = jnp.where(is_hair[:, None], hs.frame_z, nrm)
    wo = _to_local(-d, fx, fy, fz)
    f_hair = jh.hair_f(_hair_mat_at(scene, hs.hair_mid), hs.h, wo,
                       wo) * jnp.abs(wo[:, 2:3])
    f_surf = (js.surface_f(sp, wo, wo) * jnp.abs(wo[:, 2:3])
              + sp.emission)
    f = jnp.where(is_hair[:, None], f_hair, f_surf) * jnp.pi
    return jnp.where(hs.hit[:, None], f, jnp.broadcast_to(scene.env,
                                                          f.shape))


def trace(scene: Scene, o, d, uniforms, max_depth=4, chunk=2048,
          nearest_segments=None, sampler="path", sort_rays=None,
          edge_softness=0.0, return_alive=False):
    """Path-trace a ray batch. Matches oracle/pathtrace.py:trace.

    o, d: (N, 3); uniforms: (N, n_uniform_dims(max_depth)). -> (N, 3).

    sampler: "path" (NEE + BSDF sampling, the default), "naive" (BSDF
    sampling only — reference `trace_naive`), or "eyelight" (debug).
    sort_rays: re-sort the wavefront for block coherence every bounce
    (see _ray_sort_perm; bit-identical output). None = auto: on for
    large batches over large segment sets.
    edge_softness: > 0 enables the BOUNDARY term of geometry gradients
    via soft strand silhouettes. A hair hit with width offset |h| in
    the outer (1 - edge_softness, 1] band survives with probability
    alpha = (1 - |h|) / edge_softness, else the ray passes through
    unchanged; the branch is chosen on a detached alpha and weighted by
    the alpha / stop_grad(alpha) ratio (value 1, derivative d alpha), so
    pixel values keep matching the oracle sample-for-sample while
    d pixel / d (strand endpoints) gains the silhouette-motion term the
    detached hit test drops (see intersect_scene's ESTIMATOR NOTE and
    tests/test_edge_gradients.py). 0 keeps exact hard edges.
    """
    if sampler == "eyelight":
        return trace_eyelight(scene, o, d, uniforms, chunk=chunk,
                              nearest_segments=nearest_segments)
    use_nee = sampler == "path"
    n = o.shape[0]
    dt = o.dtype
    # Under shard_map, a pinhole origin is a broadcast of the replicated
    # camera position while directions are varying; tie o to d so every
    # scan carry has a consistent varying-axis type.
    o = o + d * 0.0

    ub_all = uniforms[:, D_PIXEL:D_PIXEL + D_BOUNCE * max_depth]
    ub_steps = ub_all.reshape(n, max_depth, D_BOUNCE).transpose(1, 0, 2)

    use_env = has_env(scene)

    if sort_rays is None:
        sort_rays = (max_depth > 1 and n >= 4096
                     and scene.segments.p0.shape[0] >= 4096)
    if sort_rays:
        p0 = jax.lax.stop_gradient(scene.segments.p0)
        p1 = jax.lax.stop_gradient(scene.segments.p1)
        sort_lo = jnp.minimum(p0.min(0), p1.min(0))
        sort_hi = jnp.maximum(p0.max(0), p1.max(0))
        from ..accel.instanced import InstancedClusters
        if isinstance(scene.accel, InstancedClusters):
            # conservative world bounds over posed instances (bounding
            # sphere of the canonical box through each frame) — only the
            # Morton sort's normalization, never correctness
            c = 0.5 * (sort_lo + sort_hi)
            r = 0.87 * jnp.linalg.norm(sort_hi - sort_lo)
            ctr = (jnp.einsum("iab,b->ia", scene.accel.R, c)
                   + scene.accel.t)
            rad = (r * scene.accel.scale)[:, None]
            sort_lo = (ctr - rad).min(0)
            sort_hi = (ctr + rad).max(0)
        sort_inv = 1.0 / jnp.maximum(sort_hi - sort_lo, 1e-6)

    def bounce(carry, xs):
        o, d, L, beta, alive, prev_pdf, prev_delta, ridx = carry
        alive_in = jnp.sum(alive.astype(jnp.int32))
        d_in = d
        prev_pdf_in, prev_delta_in = prev_pdf, prev_delta
        ub, depth = xs
        if sort_rays:
            # uniforms arrive in ORIGINAL ray order; realign to the
            # sorted wavefront
            ub = jnp.take(ub, ridx, axis=0)
        # dead lanes become far-away rays: their sorted blocks hit zero
        # clusters, so the Pallas kernel's list loop over them is empty
        o_int = jnp.where(alive[:, None], o, 1e8)
        hs = intersect_scene(scene, o_int, d, chunk=chunk,
                             nearest_segments=nearest_segments)
        miss = alive & ~hs.hit
        L = L + jnp.where(miss[:, None], beta * scene.env, 0.0)
        if use_env:
            # env-map radiance on miss, MIS-weighted against the previous
            # bounce's env NEE (camera rays / delta bounces: weight 1)
            le = env_eval(scene, d)
            if use_nee:
                pe = env_pdf(scene, d)
                w = jnp.where((depth == 0) | prev_delta, 1.0,
                              prev_pdf ** 2 / jnp.maximum(
                                  prev_pdf ** 2 + pe ** 2, 1e-30))
            else:  # naive sampler: BSDF sampling is the only strategy
                w = jnp.ones((n,), d.dtype)
            L = L + jnp.where(miss[:, None], beta * le * w[:, None], 0.0)
        alive = alive & hs.hit
        shade_alive = alive

        is_hair = hs.mat == 0
        # soft silhouettes (boundary-term estimator; see trace docstring)
        pass_th = jnp.zeros((n,), bool)
        if edge_softness:
            alpha = jnp.clip((1.0 - jnp.abs(hs.h)) / edge_softness,
                             0.0, 1.0)
            cov = alive & is_hair
            alpha = jnp.where(cov, alpha, 1.0)
            a_det = jax.lax.stop_gradient(alpha)
            # defensive branch probability: clamping away from 0/1
            # bounds the alpha/a_s importance weights AND their
            # derivatives (the unclamped estimator's gradient has
            # 1/alpha-style heavy tails at the band ends). Unbiased for
            # any a_s; the oracle mirrors the same formula so values
            # still match sample-for-sample.
            a_s = jnp.where(a_det >= 1.0, 1.0,
                            jnp.clip(a_det, 0.2, 0.8))
            pass_th = cov & (ub[:, 10] >= a_s)
            w_cov = jnp.where(
                pass_th,
                (1.0 - alpha) / jnp.maximum(1.0 - a_s, 1e-6),
                alpha / jnp.maximum(a_s, 1e-6))
            beta = beta * w_cov[:, None]
        sp = scene.surf_mat.gather(hs.mat_id)
        if scene.tex_meta.shape[0]:
            from ..core.texture import apply_textures
            sp = apply_textures(scene.tex_data, scene.tex_meta, sp, hs.uv)
        # emission of surface hits (area lights seen by BSDF rays),
        # MIS-weighted against the area-light NEE that could have reached
        # the same point (camera rays / delta bounces / naive: weight 1)
        w_em = jnp.ones_like(prev_pdf)
        if scene.n_area_lights and use_nee:
            lid = jnp.maximum(hs.light_id, 0)
            pdf_l = _area_light_pdf_sa(scene, lid, o, hs.position,
                                       hs.gnormal)
            w = prev_pdf ** 2 / jnp.maximum(prev_pdf ** 2 + pdf_l ** 2,
                                            1e-30)
            w = jnp.where((depth == 0) | prev_delta, 1.0, w)
            w_em = jnp.where(hs.light_id >= 0, w, 1.0)
        L = L + jnp.where((alive & ~is_hair)[:, None],
                          beta * sp.emission * w_em[:, None], 0.0)

        # surface normals flipped to face the ray (double-sided shading;
        # the surface BSDF expects wo.z > 0)
        nrm = hs.normal * jnp.where(
            (jnp.sum(hs.normal * d, -1) > 0)[:, None], -1.0, 1.0)
        t1, t2 = _diffuse_frame(nrm)
        fx = jnp.where(is_hair[:, None], hs.tangent, t1)
        fy = jnp.where(is_hair[:, None], hs.frame_y, t2)
        fz = jnp.where(is_hair[:, None], hs.frame_z, nrm)

        wo = _to_local(-d, fx, fy, fz)
        h = hs.h
        pos = hs.position
        ray_eps = jnp.where(is_hair, 2.0 * hs.radius, 1e-4)
        # wi-independent BSDF work (refraction geometry, attenuation
        # chain, roughness remaps, tilted angles) computed ONCE and shared
        # by every NEE direction + the bounce sample (4-6 evals/bounce)
        hctx = jh.hair_ctx(_hair_mat_at(scene, hs.hair_mid), h, wo)

        # direct lighting: every point light, deterministic sum
        for li in range(scene.n_lights if use_nee else 0):
            lp = scene.light_pos[li]
            lint = scene.light_intensity[li]
            to_l = lp - pos
            dist = jnp.linalg.norm(to_l, axis=-1)
            wi_w = to_l / jnp.maximum(dist[:, None], 1e-12)
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~occluded_scene(scene, sh_o, wi_w, dist - ray_eps,
                                  chunk=chunk,
                                  nearest_segments=nearest_segments)
            wi = _to_local(wi_w, fx, fy, fz)
            f_hair = jh.hair_f_ctx(hctx, wi) * jnp.abs(wi[:, 2:3])
            f_surf = js.surface_f(sp, wo, wi) * jnp.abs(wi[:, 2:3])
            f = jnp.where(is_hair[:, None], f_hair, f_surf)
            contrib = beta * f * lint / jnp.maximum(dist[:, None] ** 2,
                                                    1e-12)
            L = L + jnp.where((alive & vis & ~pass_th)[:, None],
                              contrib, 0.0)

        # environment-map NEE with MIS
        if use_env and use_nee:
            wi_w, pdf_e = env_sample(scene, ub[:, 6], ub[:, 7])
            le = env_eval(scene, wi_w)
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~occluded_scene(scene, sh_o, wi_w, jnp.full((n,), INF),
                                  chunk=chunk,
                                  nearest_segments=nearest_segments)
            wi = _to_local(wi_w, fx, fy, fz)
            fp_hair, pdf_hair = jh.hair_f_pdf_ctx(hctx, wi)
            f_hair = fp_hair * jnp.abs(wi[:, 2:3])
            f_surf = js.surface_f(sp, wo, wi) * jnp.abs(wi[:, 2:3])
            f = jnp.where(is_hair[:, None], f_hair, f_surf)
            pdf_b = jnp.where(
                is_hair,
                jax.lax.stop_gradient(pdf_hair),
                jax.lax.stop_gradient(js.surface_pdf(sp, wo, wi)))
            w_mis = pdf_e ** 2 / jnp.maximum(pdf_e ** 2 + pdf_b ** 2,
                                             1e-30)
            contrib = beta * f * le * (
                w_mis / jnp.maximum(pdf_e, 1e-12))[:, None]
            L = L + jnp.where((alive & vis & ~pass_th)[:, None],
                              contrib, 0.0)

        # area-light NEE with MIS (emissive spheres / mesh triangles)
        if scene.n_area_lights and use_nee:
            el = jnp.minimum(
                jnp.searchsorted(scene.al_cdf, ub[:, 5]),
                scene.n_area_lights - 1).astype(jnp.int32)
            lpos, lnrm, luv = _area_light_point(scene, el, ub[:, 8],
                                                ub[:, 9])
            lpos = jax.lax.stop_gradient(lpos)
            to_l = lpos - pos
            dist = jnp.linalg.norm(to_l, axis=-1)
            wi_w = to_l / jnp.maximum(dist[:, None], 1e-12)
            pdf_a = jax.lax.stop_gradient(
                _area_light_pdf_sa(scene, el, pos, lpos, lnrm))
            sh_o = pos + wi_w * ray_eps[:, None]
            vis = ~occluded_scene(scene, sh_o, wi_w,
                                  dist - 2.0 * ray_eps, chunk=chunk,
                                  nearest_segments=nearest_segments)
            wi = _to_local(wi_w, fx, fy, fz)
            fp_hair, pdf_hair = jh.hair_f_pdf_ctx(hctx, wi)
            f_hair = fp_hair * jnp.abs(wi[:, 2:3])
            f_surf = js.surface_f(sp, wo, wi) * jnp.abs(wi[:, 2:3])
            f = jnp.where(is_hair[:, None], f_hair, f_surf)
            pdf_b = jnp.where(
                is_hair,
                jax.lax.stop_gradient(pdf_hair),
                jax.lax.stop_gradient(js.surface_pdf(sp, wo, wi)))
            w_mis = pdf_a ** 2 / jnp.maximum(pdf_a ** 2 + pdf_b ** 2,
                                             1e-30)
            le = scene.al_emission[el]
            if scene.tex_meta.shape[0]:
                # textured emission at the sampled point: NEE and
                # BSDF-hit emission must integrate the same radiance or
                # MIS combines two different integrands (biased render)
                from ..core.texture import sample_bilinear
                le = le * sample_bilinear(scene.tex_data, scene.tex_meta,
                                          scene.al_tex[el], luv[:, 0],
                                          luv[:, 1])
            ok = (alive & vis & ~pass_th & (pdf_a > 1e-12)
                  & (dist > 4.0 * ray_eps))
            contrib = beta * f * le * (
                w_mis / jnp.maximum(pdf_a, 1e-12))[:, None]
            L = L + jnp.where(ok[:, None], contrib, 0.0)

        # BSDF sampling (detached directions: wi and pdf are detached at
        # use, so sampling from the live ctx gives identical values)
        wi_h = jax.lax.stop_gradient(jh.hair_sample_wi(hctx, ub[:, :4]))
        f_h, pdf_h = jh.hair_f_pdf_ctx(hctx, wi_h)  # f carries grad
        pdf_h = jax.lax.stop_gradient(pdf_h)
        w_hair = f_h * jnp.abs(wi_h[:, 2:3]) / jnp.maximum(pdf_h[:, None],
                                                           1e-12)
        w_hair = jnp.where((pdf_h > 1e-12)[:, None], w_hair, 0.0)

        wi_s, w_surf, pdf_s, delta_s = js.surface_sample(sp, wo,
                                                         ub[:, :3])
        wi = jnp.where(is_hair[:, None], wi_h, wi_s)
        weight = jnp.where(is_hair[:, None], w_hair, w_surf)
        prev_pdf = jnp.where(is_hair, pdf_h, pdf_s)
        prev_delta = ~is_hair & delta_s

        if edge_softness:
            # pass-through lanes keep their ray and MIS state; weight 1
            weight = jnp.where(pass_th[:, None], 1.0, weight)
            prev_pdf = jnp.where(pass_th, prev_pdf_in, prev_pdf)
            prev_delta = jnp.where(pass_th, prev_delta_in, prev_delta)
        beta = beta * weight
        d_new = safe_normalize(_to_world(wi, fx, fy, fz))
        o_new = pos + d_new * ray_eps[:, None]
        if edge_softness:
            d_new = jnp.where(pass_th[:, None], d_in, d_new)
            o_new = jnp.where(pass_th[:, None],
                              pos + d_in * ray_eps[:, None], o_new)
        alive = alive & (jnp.max(jnp.abs(beta), -1) > 0)

        # Russian roulette (active from RR_START)
        rr_on = depth >= RR_START
        p_cont = jnp.clip(jnp.max(jax.lax.stop_gradient(beta), -1),
                          0.05, 1.0)
        die = rr_on & (ub[:, 4] > p_cont)
        alive = alive & ~die
        beta = jnp.where(rr_on[None] if rr_on.ndim else rr_on,
                         beta / p_cont[:, None], beta)
        carry = (o_new, d_new, L, beta, alive, prev_pdf, prev_delta, ridx)
        if sort_rays:
            perm = _ray_sort_perm(jax.lax.stop_gradient(o_new),
                                  jax.lax.stop_gradient(d_new),
                                  alive, sort_lo, sort_inv)
            carry = tuple(jnp.take(x, perm, axis=0) for x in carry)
        # useful-work accounting for bench.py's alive-ray throughput:
        # traversal rays that served a live lane this bounce (the lanes
        # themselves always run — SIMD lanes do the work either way)
        n_sh = ((scene.n_lights if use_nee else 0)
                + (1 if use_env and use_nee else 0)
                + (1 if scene.n_area_lights and use_nee else 0))
        ys = (alive_in, jnp.sum(shade_alive.astype(jnp.int32)) * n_sh)
        return carry, ys

    # init derived from o so varying-axis types line up under shard_map
    zero3 = (o + d) * 0.0
    ridx0 = (jnp.arange(n, dtype=jnp.int32)
             + zero3[:, 0].astype(jnp.int32))
    init = (o, d, zero3, zero3 + 1.0, zero3[:, 0] < 1.0, zero3[:, 0],
            zero3[:, 0] > 1.0, ridx0)
    (o, d, L, beta, alive, _, _, ridx), aux = jax.lax.scan(
        bounce, init, (ub_steps, jnp.arange(max_depth)))
    if sort_rays:
        # scatter radiance back to original ray order (ridx is a
        # permutation, so this is exact and differentiable)
        L = jnp.zeros_like(L).at[ridx].set(L)
    if return_alive:
        # per-depth (alive bounce rays, useful shadow rays) counts
        return L, aux
    return L


def render(scene: Scene, cam: Camera, uniforms, max_depth=4, chunk=2048,
           nearest_segments=None, sampler="path", edge_softness=0.0):
    """Render from a full uniforms tensor (H, W, spp, D) — parity path."""
    hgt, wid, spp, _ = uniforms.shape
    jj, ii = jnp.meshgrid(jnp.arange(hgt), jnp.arange(wid), indexing="ij")
    i = jnp.repeat(ii.reshape(-1), spp)
    j = jnp.repeat(jj.reshape(-1), spp)
    u = uniforms.reshape(hgt * wid * spp, -1)
    o, d = camera_rays(cam, wid, hgt, i.astype(u.dtype), j.astype(u.dtype),
                       u[:, :4])
    L = trace(scene, o, d, u, max_depth=max_depth, chunk=chunk,
              nearest_segments=nearest_segments, sampler=sampler,
              edge_softness=edge_softness)
    return L.reshape(hgt, wid, spp, 3).mean(axis=2)
