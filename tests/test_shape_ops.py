"""Quad primitives + mesh subdivision/displacement (SURVEY.md §2.2/§2.3
inventory; VERDICT r3 missing #9)."""

import numpy as np

from yhair_tpu.geometry import shape_ops


def _unit_quad():
    return {"positions": np.array([[0, 0, 0], [1, 0, 0],
                                   [1, 0, 1], [0, 0, 1]], np.float64),
            "quads": np.array([[0, 1, 2, 3]])}


def test_quads_to_triangles():
    m = shape_ops.quads_to_triangles(_unit_quad())
    assert m["triangles"].shape == (2, 3)
    assert "quads" not in m
    # the two triangles tile the quad: total area 1
    pos = m["positions"]
    t = m["triangles"]
    a = 0.5 * np.linalg.norm(np.cross(pos[t[:, 1]] - pos[t[:, 0]],
                                      pos[t[:, 2]] - pos[t[:, 0]]),
                             axis=1).sum()
    assert abs(a - 1.0) < 1e-12
    # non-planar quad splits along the SHORTER diagonal
    bent = _unit_quad()
    bent["positions"][2, 1] = 0.5   # lift one corner
    m2 = shape_ops.quads_to_triangles(bent)
    d13 = {frozenset(t) for t in m2["triangles"].tolist()}
    assert frozenset([0, 1, 3]) in d13 or frozenset([0, 2, 3]) in d13


def test_subdivide_preserves_area_and_dedups():
    m = shape_ops.quads_to_triangles(_unit_quad())

    def area(m):
        pos, t = m["positions"], m["triangles"]
        return 0.5 * np.linalg.norm(
            np.cross(pos[t[:, 1]] - pos[t[:, 0]],
                     pos[t[:, 2]] - pos[t[:, 0]]), axis=1).sum()

    s = shape_ops.subdivide_mesh(m, 2)
    assert s["triangles"].shape[0] == 2 * 16
    assert abs(area(s) - area(m)) < 1e-12   # planar: linear subdiv exact
    # shared-edge midpoints are deduplicated: V = V0 + unique edges
    # level1: 4 verts + 5 edges = 9; level2: 9 + 16 edges = 25
    assert s["positions"].shape[0] == 25
    assert np.isfinite(s["normals"]).all()


def test_displacement():
    m = shape_ops.subdivide_mesh(shape_ops.quads_to_triangles(
        _unit_quad()), 3)
    base = m["positions"].copy()
    out = shape_ops.displace_mesh(m, lambda p: np.sin(4 * p[:, 0]),
                                  scale=0.1)
    d = out["positions"] - base
    expect = 0.1 * np.sin(4 * base[:, 0])
    # displacement follows the (flat, +-y) normal
    assert np.allclose(np.abs(d[:, 1]), np.abs(expect), atol=1e-12)
    assert np.allclose(d[:, [0, 2]], 0.0, atol=1e-12)
    # 2D height-map form works too
    hmap = np.linspace(0, 1, 8)[None, :].repeat(8, 0)
    out2 = shape_ops.displace_mesh(m, hmap, scale=0.05)
    assert out2["positions"].shape == base.shape


def test_quads_via_scene_json(tmp_path):
    import json
    doc = {"strands": {"generator": "single_strand"},
           "meshes": [{"positions": [[0, -0.2, 0], [1, -0.2, 0],
                                     [1, -0.2, 1], [0, -0.2, 1]],
                       "quads": [[0, 1, 2, 3]],
                       "albedo": [0.5, 0.5, 0.5]}],
           "point_lights": [{"position": [1, 1, 1],
                             "intensity": [3, 3, 3]}]}
    p = tmp_path / "s.json"
    with open(p, "w") as f:
        json.dump(doc, f)
    from yhair_tpu.io import scene_json
    scene, _cam = scene_json.load(str(p))
    assert scene["meshes"][0]["triangles"].shape == (2, 3)
