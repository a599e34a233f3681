"""Instances / two-level acceleration (VERDICT r3 next-round #7).

Two posed copies of one wig, three ways:
  A. baked via the JSON-loader path (transform_segments -> flat soup) —
     the oracle-parity ground truth;
  B. the shared-tile two-level accel (one cluster build + per-instance
     ray transforms, accel/instanced.py);
  C. save/load round-trip of the instanced JSON form.
B must match A to f32 transform tolerance while holding ONE copy of the
cluster tiles; per-instance materials must route to the right strands."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from scenes import generators as gen
from yhair_tpu.core import scene as jscene
from yhair_tpu.core.rng import n_uniform_dims
from yhair_tpu.integrator import path as jpath
from yhair_tpu.io.scene_json import frame_matrix, transform_segments


def _wig():
    scene, cam = gen.hair_patch(n_strands=120, n_seg=4)
    return scene, cam


_C, _S = np.cos(np.deg2rad(40.0)), np.sin(np.deg2rad(40.0))
FRAMES = [
    # identity
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]],
    # yaw 40 deg + offset + 1.1x uniform scale
    [[_C * 1.1, 0, -_S * 1.1], [0, 1.1, 0],
     [_S * 1.1, 0, _C * 1.1], [0.35, 0.0, 0.1]],
]


def _baked_scene(scene):
    segs = scene["segments"]
    parts = [transform_segments(segs, fr) for fr in FRAMES]
    cat = tuple(np.concatenate([p[k] for p in parts]) for k in range(4))
    mid = np.concatenate([np.full(len(p[0]), i, np.int64)
                          for i, p in enumerate(parts)])
    m = scene["hair_material"]
    m2 = dict(m, beta_m=min(0.9, m["beta_m"] * 1.6))
    return dict(scene, segments=cat, hair_materials=[m, m2],
                segment_mat_id=mid)


def test_frame_matrix_roundtrip():
    M, o, s = frame_matrix(FRAMES[1])
    assert abs(s - 1.1) < 1e-6
    p = np.array([0.2, -0.1, 0.4])
    p2 = M @ p + o
    assert np.allclose(np.linalg.inv(M) @ (p2 - o), p, atol=1e-12)
    with pytest.raises(ValueError):
        frame_matrix([[2, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]])


def test_two_level_matches_baked():
    scene, cam = _wig()
    baked = _baked_scene(scene)
    sc_baked = jscene.from_dict(baked)
    cam_j = jscene.camera_from_dict(cam)

    # shared-geometry path: canonical clusters + frames
    from yhair_tpu.accel.instanced import build_instanced
    from yhair_tpu.ops import clusters as cmod
    sc_canon = jscene.from_dict(dict(scene,
                                     hair_materials=[
                                         baked["hair_materials"][0],
                                         baked["hair_materials"][1]],
                                     segment_mat_id=np.zeros(
                                         len(scene["segments"][0]),
                                         np.int64)))
    p0, p1, r0, r1 = scene["segments"]
    cl = cmod.build(p0, p1, r0, r1, use_native=False)
    ic = build_instanced(cl, FRAMES, inst_mat=[0, 1])
    # the canonical segments must be the CLUSTER-REORDERED soa so the
    # kernel's indices line up with scene.segments rows
    from yhair_tpu.geometry.segments import Segments
    sc_inst = sc_canon._replace(
        segments=Segments(p0=cl.s0[:, :3], p1=cl.s1[:, :3],
                          r0=cl.s0[:, 3], r1=cl.s1[:, 3]),
        accel=ic)

    rng = np.random.default_rng(0)
    res, spp, depth = 32, 2, 2
    u = jnp.asarray(rng.random((res, res, spp, n_uniform_dims(depth))),
                    jnp.float32)
    img_a = np.asarray(jpath.render(sc_baked, cam_j, u, max_depth=depth,
                                    chunk=512))
    img_b = np.asarray(jpath.render(sc_inst, cam_j, u, max_depth=depth))
    # identical sampling decisions except f32 transform noise at strand
    # boundaries: demand near-total pixel agreement
    close = np.isclose(img_a, img_b, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.97, f"only {close.mean():.3f} close"
    # both wigs must actually appear (the posed copy adds coverage)
    single = np.asarray(jpath.render(jscene.from_dict(scene), cam_j, u,
                                     max_depth=depth, chunk=512))
    assert (np.abs(img_a - single) > 1e-3).mean() > 0.02

    # memory: ONE copy of the cluster tiles for two instances
    assert ic.cl.tc.shape[0] == cl.n_clusters
    baked_segs = sc_baked.segments.p0.shape[0]
    assert ic.cl.s0.shape[0] <= baked_segs // 2 + cl.cluster_size


FRAMES4 = FRAMES + [
    # far left, 0.8x scale
    [[0.8, 0, 0], [0, 0.8, 0], [0, 0, 0.8], [-0.8, 0.1, -0.2]],
    # far right, rolled
    [[0, 1, 0], [-1, 0, 0], [0, 0, 1], [0.8, -0.1, -0.3]],
]


def _instanced_scene(scene, frames, mats=None):
    from yhair_tpu.accel.instanced import build_instanced
    from yhair_tpu.geometry.segments import Segments
    from yhair_tpu.ops import clusters as cmod

    p0, p1, r0, r1 = scene["segments"]
    cl = cmod.build(p0, p1, r0, r1, use_native=False)
    ic = build_instanced(cl, frames, inst_mat=mats)
    sc = jscene.from_dict(scene)
    return sc._replace(
        segments=Segments(p0=cl.s0[:, :3], p1=cl.s1[:, :3],
                          r0=cl.s0[:, 3], r1=cl.s1[:, 3]),
        accel=ic), ic


def test_four_instances_match_baked_with_cull():
    """>= 4 posed instances (VERDICT r4 weak #4): the top-level AABB
    cull must not change results, and the matched-pixel subset must
    agree to a tight per-pixel tolerance (not just a 97% gate)."""
    scene, cam = _wig()
    segs = scene["segments"]
    parts = [transform_segments(segs, fr) for fr in FRAMES4]
    cat = tuple(np.concatenate([p[k] for p in parts]) for k in range(4))
    baked = dict(scene, segments=cat)
    sc_baked = jscene.from_dict(baked)
    cam_j = jscene.camera_from_dict(cam)

    sc_inst, ic = _instanced_scene(scene, FRAMES4)
    assert ic.bmin.shape == (4, 3)

    rng = np.random.default_rng(1)
    res, spp, depth = 32, 2, 2
    u = jnp.asarray(rng.random((res, res, spp, n_uniform_dims(depth))),
                    jnp.float32)
    img_a = np.asarray(jpath.render(sc_baked, cam_j, u, max_depth=depth,
                                    chunk=512))
    img_b = np.asarray(jpath.render(sc_inst, cam_j, u, max_depth=depth))
    close = np.isclose(img_a, img_b, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.97, f"only {close.mean():.3f} close"
    # per-pixel tolerance on the matched subset: f32 transform noise,
    # not structural disagreement
    assert np.abs((img_a - img_b)[close]).max() < 5e-3
    # every instance must contribute pixels somewhere
    single = np.asarray(jpath.render(jscene.from_dict(scene), cam_j, u,
                                     max_depth=depth, chunk=512))
    assert (np.abs(img_a - single) > 1e-3).mean() > 0.05


def test_instance_cull_rays_missing_all_boxes():
    """Rays aimed away from every posed instance must miss (the
    neutralized-origin path) and never occlude."""
    from yhair_tpu.accel import instanced as inst_mod

    scene, _cam = _wig()
    _sc, ic = _instanced_scene(scene, FRAMES4)
    o = jnp.tile(jnp.asarray([[0.0, 5.0, 0.0]]), (8, 1))
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (8, 1))  # straight up
    t, idx, hit = inst_mod.make_nearest_fn(ic, interpret=True)(o, d)
    assert not bool(hit.any())
    occ = inst_mod.make_occluded_fn(ic, interpret=True)(
        o, d, jnp.full((8,), 100.0))
    assert not bool(occ.any())


def test_scale_dependent_tmin_fixed():
    """ADVICE r4: the kernel's T_MIN acted at world distance
    scale * T_MIN per instance. With the origin-shift fix a hit just
    beyond T_MIN world units must be found even under a large scale."""
    from yhair_tpu.accel import instanced as inst_mod
    from yhair_tpu.accel.instanced import build_instanced
    from yhair_tpu.ops import clusters as cmod

    # one straight strand along x at the origin, radius 1e-3 (canonical)
    p0 = np.array([[-0.5, 0.0, 0.0]])
    p1 = np.array([[0.5, 0.0, 0.0]])
    r = np.array([1e-3])
    cl = cmod.build(p0, p1, r, r, use_native=False)
    big = 8.0
    frames = [[[big, 0, 0], [0, big, 0], [0, 0, big], [0, 0, 0]]]
    ic = build_instanced(cl, frames)
    # the thin-strand model reports the closest approach to the AXIS, so
    # start the ray 4e-4 world units from the axis pointing at it: world
    # t = 4e-4 > T_MIN = 1e-4 must hit, but the OLD code clipped
    # anything below scale * T_MIN = 8e-4 (local parameter 5e-5 < T_MIN)
    t_hit = 4e-4
    o = jnp.asarray([[0.0, t_hit, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    t, idx, hit = inst_mod.make_nearest_fn(ic, interpret=True)(o, d)
    assert bool(hit[0]), "near hit was clipped by scale-dependent T_MIN"
    assert abs(float(t[0]) - t_hit) < 1e-4


def test_instanced_json_roundtrip(tmp_path):
    scene, cam = _wig()
    p0, p1, r0, r1 = scene["segments"]
    from yhair_tpu.io import ply

    ply_path = tmp_path / "wig.ply"
    # vertex soup: each segment contributes its two endpoints
    verts = np.concatenate([p0, p1])
    radii = np.concatenate([r0, r1])
    n_seg = p0.shape[0]
    lines = np.stack([np.arange(n_seg), np.arange(n_seg) + n_seg], 1)
    ply.save_strands(str(ply_path), verts, radii, lines)
    doc = {
        "camera": {"position": [0, 0.3, 1.4], "look_at": [0, 0, 0]},
        "strands": [{
            "ply": "wig.ply",
            "material": {"sigma_a": [0.1, 0.2, 0.3], "beta_m": 0.3,
                         "beta_n": 0.3},
            "instances": [[[float(v) for v in row] for row in fr]
                          for fr in FRAMES],
        }],
        "point_lights": [{"position": [1, 1, 1],
                          "intensity": [5, 5, 5]}],
    }
    jpath_file = tmp_path / "scene.json"
    with open(jpath_file, "w") as f:
        json.dump(doc, f)
    from yhair_tpu.io import scene_json
    loaded, _cam = scene_json.load(str(jpath_file))
    assert loaded["segments"][0].shape[0] == 2 * p0.shape[0]
    assert len(loaded["hair_materials"]) == 2
    # the second instance's geometry is the posed copy
    # PLY stores f32, so compare against the transform of the
    # f32-quantized geometry
    expect = transform_segments(
        tuple(np.asarray(a, np.float32) for a in (p0, p1, r0, r1)),
        FRAMES[1])
    np.testing.assert_allclose(
        loaded["segments"][0][p0.shape[0]:], expect[0], atol=1e-6)
    np.testing.assert_allclose(
        loaded["segments"][3][p0.shape[0]:], expect[3], atol=1e-7)
