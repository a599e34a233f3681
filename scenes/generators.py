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


def furry_bunny(n_strands=50000, n_seg=6, seed=17):
    """Config 5: fur on a body proxy (two spheres), env-light dominated —
    the inverse-rendering target scene."""
    rng = np.random.default_rng(seed)
    # body + head spheres
    bodies = [([0.0, -0.1, 0.0], 0.32), ([0.0, 0.32, 0.1], 0.2)]
    counts = [int(n_strands * 0.7), n_strands - int(n_strands * 0.7)]
    cps = []
    for (center, radius), cnt in zip(bodies, counts):
        z = rng.uniform(-1, 1, cnt)
        phi = rng.uniform(0, 2 * np.pi, cnt)
        r = np.sqrt(np.maximum(0.0, 1 - z * z))
        dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
        roots = np.asarray(center) + dirs * radius
        length = rng.uniform(0.04, 0.08, cnt)[:, None]
        t1 = normalize(np.cross(dirs, rng.normal(0, 1, (cnt, 3))))
        a1 = rng.uniform(0.005, 0.02, cnt)[:, None]
        cp = np.stack([
            roots,
            roots + dirs * length * 0.4 + t1 * a1,
            roots + dirs * length * 0.7 + t1 * a1,
            roots + dirs * length + t1 * a1 * 2,
        ], axis=1)
        cps.append(cp)
    cp = np.concatenate(cps)
    segs = _strands_to_segments(cp, np.full(n_strands, 0.0015),
                                np.full(n_strands, 0.0006), n_seg=n_seg)
    from oracle.envmap import gradient_sky
    scene = {
        "segments": segs,
        "env_map": gradient_sky(),
        "hair_material": dict(DEFAULT_HAIR,
                              sigma_a=np.array([0.8, 1.2, 1.6]),
                              beta_m=0.4, beta_n=0.5),
        "spheres": [{"center": c, "radius": r * 0.985,
                     "albedo": [0.3, 0.25, 0.2]} for c, r in bodies],
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
