"""Procedural scene generators for the correctness/benchmark ladder.

BASELINE.json configs 1-5 (SURVEY.md §6). The reference ships wig assets
(Cem Yuksel .hair models) converted to PLY lines [U:scripts/, tests/];
those assets are not available offline, so each rung is generated
procedurally and deterministically (fixed seed) — strand counts, image
sizes and materials follow BASELINE.json.

All outputs are float64 numpy; the same generator feeds the oracle and
(cast to f32) the JAX/TPU renderer, so parity tests compare identical
geometry.
"""

from __future__ import annotations

import numpy as np

from oracle.geometry import bezier_to_segments, normalize


def _strands_to_segments(ctrl_pts, radii_root, radii_tip, n_seg=8):
    """ctrl_pts: (N, 4, 3) cubic Bezier control points per strand."""
    p0s, p1s, r0s, r1s = [], [], [], []
    for k in range(ctrl_pts.shape[0]):
        p0, p1, r0, r1 = bezier_to_segments(ctrl_pts[k], radii_root[k],
                                            radii_tip[k], n_seg=n_seg)
        p0s.append(p0)
        p1s.append(p1)
        r0s.append(r0)
        r1s.append(r1)
    return (np.concatenate(p0s), np.concatenate(p1s),
            np.concatenate(r0s), np.concatenate(r1s))


DEFAULT_HAIR = {
    "sigma_a": np.array([0.06, 0.10, 0.20]),  # light brown
    "beta_m": 0.25,
    "beta_n": 0.3,
    "alpha": np.deg2rad(2.0),
    "eta": 1.55,
}


def icosphere(center=(0, 0, 0), radius=1.0, subdiv=2, stretch=(1, 1, 1)):
    """Triangle-mesh sphere by icosahedron subdivision.

    The mesh-shape analogue of the reference's shape ops (SURVEY.md §2.3
    [U:libs/yocto/yocto_shape.cpp] make_sphere/subdivide). Returns a mesh
    dict {positions, triangles, normals}; `stretch` makes ellipsoids
    (normals recomputed for the stretched surface).
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v = normalize(v)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    for _ in range(subdiv):
        mid = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                mid[key] = len(verts)
                verts.append(normalize(0.5 * (verts[a] + verts[b])))
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf, np.int64)
    s = np.asarray(stretch, np.float64)
    pos = v * s * radius + np.asarray(center, np.float64)
    # ellipsoid normal: gradient of the implicit surface = v / s
    nrm = normalize(v / s)
    return {"positions": pos, "triangles": f, "normals": nrm}


def mesh_area_cdf(mesh):
    """Per-triangle area CDF (the reference's `sample_shape` element CDF,
    SURVEY.md §2.3)."""
    pos = np.asarray(mesh["positions"], np.float64)
    tri = np.asarray(mesh["triangles"], np.int64)
    v = pos[tri]
    area = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
    cdf = np.cumsum(area)
    return cdf / cdf[-1], area


def fur_on_mesh(mesh, n_strands, length=(0.04, 0.08), curl=0.015,
                rng=None):
    """Grow fur strands from a triangle mesh: root points sampled
    area-uniformly over the surface, strands extruded along interpolated
    normals with a random lateral curl. Returns (N, 4, 3) Bezier control
    points — the data-prep analogue of the reference's hair-on-shape
    assets (SURVEY.md §3.5)."""
    rng = rng or np.random.default_rng(0)
    cdf, _ = mesh_area_cdf(mesh)
    pos = np.asarray(mesh["positions"], np.float64)
    tri = np.asarray(mesh["triangles"], np.int64)
    nrm = np.asarray(mesh["normals"], np.float64) \
        if mesh.get("normals") is not None else None
    ti = np.searchsorted(cdf, rng.random(n_strands))
    # uniform barycentric sample
    su = np.sqrt(rng.random(n_strands))
    bv = rng.random(n_strands)
    w0, w1, w2 = 1.0 - su, su * (1.0 - bv), su * bv
    v = pos[tri[ti]]
    roots = (w0[:, None] * v[:, 0] + w1[:, None] * v[:, 1]
             + w2[:, None] * v[:, 2])
    if nrm is not None:
        vn = nrm[tri[ti]]
        dirs = normalize(w0[:, None] * vn[:, 0] + w1[:, None] * vn[:, 1]
                         + w2[:, None] * vn[:, 2])
    else:
        dirs = normalize(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]))
    ln = rng.uniform(length[0], length[1], n_strands)[:, None]
    t1 = normalize(np.cross(dirs, rng.normal(0, 1, (n_strands, 3))))
    a1 = rng.uniform(curl / 3, curl, n_strands)[:, None]
    return np.stack([
        roots,
        roots + dirs * ln * 0.4 + t1 * a1,
        roots + dirs * ln * 0.7 + t1 * a1,
        roots + dirs * ln + t1 * a1 * 2,
    ], axis=1)


def _camera(position, look_at, vfov=35.0):
    return {"position": np.asarray(position, np.float64),
            "look_at": np.asarray(look_at, np.float64),
            "up": np.array([0.0, 1.0, 0.0]), "vfov_deg": vfov}


def single_strand(n_seg=16):
    """Config 1: one cubic Bezier strand, direct lighting."""
    cp = np.array([[0.0, -0.5, 0.0],
                   [0.25, -0.1, 0.1],
                   [-0.2, 0.3, -0.05],
                   [0.1, 0.6, 0.0]])
    segs = _strands_to_segments(cp[None], np.array([0.02]), np.array([0.008]),
                                n_seg=n_seg)
    scene = {
        "segments": segs,
        "hair_material": dict(DEFAULT_HAIR),
        "point_lights": [
            {"position": [2.0, 2.0, 2.0], "intensity": [20.0, 20.0, 20.0]},
            {"position": [-2.0, 0.5, 1.5], "intensity": [8.0, 9.0, 10.0]},
        ],
        "environment": np.array([0.05, 0.06, 0.08]),
    }
    return scene, _camera([0.0, 0.1, 2.2], [0.0, 0.05, 0.0])


def hair_patch(n_strands=1000, n_seg=8, seed=7):
    """Config 2: ~1k strands rooted on a small patch, slightly wavy."""
    rng = np.random.default_rng(seed)
    roots = np.stack([rng.uniform(-0.5, 0.5, n_strands),
                      np.full(n_strands, -0.4),
                      rng.uniform(-0.15, 0.15, n_strands)], axis=-1)
    sway = rng.normal(0, 0.08, (n_strands, 2, 3))
    length = rng.uniform(0.5, 0.8, n_strands)[:, None]
    up = np.array([0.0, 1.0, 0.0])
    cp = np.stack([
        roots,
        roots + up * length * 0.33 + sway[:, 0] * [1, 0.2, 1],
        roots + up * length * 0.66 + sway[:, 1] * [1, 0.2, 1],
        roots + up * length + sway[:, 0] * [0.5, 0.1, 0.5],
    ], axis=1)
    segs = _strands_to_segments(cp, np.full(n_strands, 0.004),
                                np.full(n_strands, 0.0015), n_seg=n_seg)
    scene = {
        "segments": segs,
        "hair_material": dict(DEFAULT_HAIR),
        "point_lights": [
            {"position": [1.5, 1.5, 2.5], "intensity": [18.0, 18.0, 18.0]},
        ],
        "environment": np.array([0.08, 0.09, 0.11]),
        "planes": [{"point": [0.0, -0.42, 0.0], "normal": [0.0, 1.0, 0.0],
                    "albedo": [0.4, 0.38, 0.35]}],
    }
    return scene, _camera([0.0, 0.2, 1.9], [0.0, 0.0, 0.0])


def curly_hairball(n_strands=10000, n_seg=12, seed=11):
    """Config 3: curly strands growing radially from a sphere."""
    rng = np.random.default_rng(seed)
    # uniform directions on the sphere
    z = rng.uniform(-1, 1, n_strands)
    phi = rng.uniform(0, 2 * np.pi, n_strands)
    r = np.sqrt(np.maximum(0.0, 1 - z * z))
    dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    r_scalp = 0.3
    roots = dirs * r_scalp
    length = rng.uniform(0.25, 0.4, n_strands)[:, None]
    # curl: offset control points in a random tangential corkscrew
    t1 = normalize(np.cross(dirs, rng.normal(0, 1, (n_strands, 3))))
    t2 = np.cross(dirs, t1)
    a1 = rng.uniform(0.05, 0.12, n_strands)[:, None]
    a2 = rng.uniform(0.05, 0.12, n_strands)[:, None]
    cp = np.stack([
        roots,
        roots + dirs * length * 0.4 + t1 * a1,
        roots + dirs * length * 0.7 - t1 * a1 + t2 * a2,
        roots + dirs * length + t1 * a1 * 0.5 - t2 * a2,
    ], axis=1)
    segs = _strands_to_segments(cp, np.full(n_strands, 0.0025),
                                np.full(n_strands, 0.001), n_seg=n_seg)
    scene = {
        "segments": segs,
        "hair_material": dict(DEFAULT_HAIR, beta_m=0.3, beta_n=0.4),
        "spheres": [{"center": [0.0, 0.0, 0.0], "radius": r_scalp * 0.98,
                     "albedo": [0.25, 0.15, 0.1]}],
        "point_lights": [
            {"position": [2.0, 2.5, 2.0], "intensity": [30.0, 30.0, 30.0]},
            {"position": [-2.5, 1.0, -1.0], "intensity": [10.0, 11.0, 13.0]},
        ],
        "environment": np.array([0.1, 0.11, 0.13]),
    }
    return scene, _camera([0.0, 0.25, 1.6], [0.0, 0.0, 0.0])


def scalp_model(n_strands=30000, n_seg=10, seed=13, eumelanin=1.3,
                pheomelanin=0.2):
    """Config 4: head proxy (sphere) with strands on the upper hemisphere,
    melanin-parameterized color."""
    from oracle.hair_bsdf import sigma_a_from_concentration
    rng = np.random.default_rng(seed)
    # roots on upper hemisphere-ish cap
    z = rng.uniform(0.1, 1.0, n_strands)
    phi = rng.uniform(0, 2 * np.pi, n_strands)
    r = np.sqrt(np.maximum(0.0, 1 - z * z))
    dirs = np.stack([r * np.cos(phi), z, r * np.sin(phi)], axis=-1)
    r_head = 0.35
    roots = dirs * r_head
    g = np.array([0.0, -1.0, 0.0])  # gravity droop
    length = rng.uniform(0.3, 0.5, n_strands)[:, None]
    t1 = normalize(np.cross(dirs, rng.normal(0, 1, (n_strands, 3))))
    a1 = rng.uniform(0.02, 0.06, n_strands)[:, None]
    cp = np.stack([
        roots,
        roots + dirs * length * 0.35 + t1 * a1,
        roots + dirs * length * 0.55 + g * length * 0.25 - t1 * a1,
        roots + dirs * length * 0.6 + g * length * 0.6,
    ], axis=1)
    segs = _strands_to_segments(cp, np.full(n_strands, 0.002),
                                np.full(n_strands, 0.0008), n_seg=n_seg)
    scene = {
        "segments": segs,
        "hair_material": dict(
            DEFAULT_HAIR,
            sigma_a=sigma_a_from_concentration(eumelanin, pheomelanin),
            beta_m=0.25, beta_n=0.35),
        "spheres": [{"center": [0.0, 0.0, 0.0], "radius": r_head * 0.99,
                     "albedo": [0.5, 0.35, 0.28]}],
        "point_lights": [
            {"position": [2.0, 3.0, 2.5], "intensity": [40.0, 40.0, 40.0]},
            {"position": [-2.0, 1.0, 2.0], "intensity": [15.0, 16.0, 18.0]},
        ],
        "environment": np.array([0.12, 0.13, 0.15]),
    }
    return scene, _camera([0.0, 0.35, 1.7], [0.0, 0.1, 0.0])


def bunny_mesh(subdiv=2):
    """Procedural triangle-mesh bunny: ellipsoid body + head + two ears
    (the Stanford-bunny asset is unavailable offline; this stands in for
    config 5's mesh body)."""
    parts = [
        icosphere([0.0, -0.1, 0.0], 0.30, subdiv, stretch=(1.0, 0.9, 1.2)),
        icosphere([0.0, 0.30, 0.16], 0.18, subdiv,
                  stretch=(0.9, 1.0, 1.05)),
        icosphere([-0.08, 0.52, 0.10], 0.055, max(subdiv - 1, 1),
                  stretch=(0.55, 2.2, 0.8)),
        icosphere([0.08, 0.52, 0.10], 0.055, max(subdiv - 1, 1),
                  stretch=(0.55, 2.2, 0.8)),
    ]
    off = 0
    pos, tris, nrm = [], [], []
    for p in parts:
        pos.append(p["positions"])
        tris.append(p["triangles"] + off)
        nrm.append(p["normals"])
        off += len(p["positions"])
    return {"positions": np.concatenate(pos),
            "triangles": np.concatenate(tris),
            "normals": np.concatenate(nrm),
            "material": {"color": [0.3, 0.25, 0.2], "roughness": 0.8,
                         "specular": 0.0}}


def furry_bunny(n_strands=50000, n_seg=6, seed=17, subdiv=2):
    """Config 5: fur grown on a triangle-mesh bunny (area-uniform roots,
    strands along surface normals), env-light dominated — the
    inverse-rendering target scene."""
    rng = np.random.default_rng(seed)
    body = bunny_mesh(subdiv=subdiv)
    cp = fur_on_mesh(body, n_strands, length=(0.04, 0.08), curl=0.015,
                     rng=rng)
    segs = _strands_to_segments(cp, np.full(n_strands, 0.0015),
                                np.full(n_strands, 0.0006), n_seg=n_seg)
    from oracle.envmap import gradient_sky
    scene = {
        "segments": segs,
        "env_map": gradient_sky(),
        "hair_material": dict(DEFAULT_HAIR,
                              sigma_a=np.array([0.8, 1.2, 1.6]),
                              beta_m=0.4, beta_n=0.5),
        "meshes": [body],
        "planes": [{"point": [0.0, -0.45, 0.0], "normal": [0.0, 1.0, 0.0],
                    "albedo": [0.45, 0.45, 0.45]}],
        "point_lights": [
            {"position": [2.0, 2.0, 2.0], "intensity": [12.0, 12.0, 12.0]},
        ],
        "environment": np.array([0.35, 0.38, 0.42]),
    }
    return scene, _camera([0.0, 0.3, 1.5], [0.0, 0.05, 0.0])


CONFIGS = {
    1: dict(fn=single_strand, res=64, spp=4, depth=2),
    2: dict(fn=hair_patch, res=128, spp=8, depth=2),
    3: dict(fn=curly_hairball, res=256, spp=16, depth=6),
    4: dict(fn=scalp_model, res=512, spp=32, depth=6),
    5: dict(fn=furry_bunny, res=1024, spp=64, depth=6),
}
