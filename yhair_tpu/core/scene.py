"""Scene model — pytree-registered SoA arrays.

TPU-native counterpart of the reference's scene graph
[U:libs/yocto/yocto_sceneio.h] (SURVEY.md §2.5): cameras, hair strands
(line segments), simple props (spheres/planes with diffuse albedo), point
lights and a constant environment. Everything lives in fixed-shape device
arrays; the hair material is the differentiable-parameter pytree.

`from_dict` ingests the oracle/scene-generator dict format (also produced
by io/scene_json.py), so oracle and TPU renderers consume identical scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bsdf.hair import HairMaterial
from ..bsdf.surface import SurfaceMaterial
from ..geometry.segments import Segments
from ..geometry.triangles import Triangles
from . import texture
from .camera import Camera


class Scene(NamedTuple):
    segments: Segments
    hair: HairMaterial       # differentiable hair params. Leaves may be
                             # scalar/(3,) (one global material) OR carry a
                             # leading table dim (Mh,)/(Mh, 3) — per-shape
                             # hair materials, indexed by seg_mat_id
                             # (SURVEY.md §2.5 per-material hair params)
    seg_mat_id: jax.Array    # (S,) int32 hair-material index per segment
    surf_mat: SurfaceMaterial  # (M, ...) material table; sphere i ->
                               # entry i, plane j -> entry NS + j,
                               # mesh k -> entry NS + NP + k
    sph_center: jax.Array    # (NS, 3)
    sph_radius: jax.Array    # (NS,)
    pln_point: jax.Array     # (NP, 3)
    pln_normal: jax.Array    # (NP, 3)
    tris: Triangles          # flattened triangle meshes (may be empty)
    light_pos: jax.Array     # (L, 3)
    light_intensity: jax.Array  # (L, 3)
    # area lights: flattened emissive elements (spheres + mesh triangles),
    # mirrors oracle/pathtrace.py:scene_area_lights (the reference's
    # init_lights CDFs, SURVEY.md §2.7). Empty (0, ...) = none.
    al_kind: jax.Array       # (A,) int32: 0 = triangle, 1 = sphere
    al_p0: jax.Array         # (A, 3) v0 / sphere center
    al_p1: jax.Array         # (A, 3) v1 / [radius, 0, 0]
    al_p2: jax.Array         # (A, 3) v2 / 0
    al_emission: jax.Array   # (A, 3)
    al_area: jax.Array       # (A,)
    al_pmf: jax.Array        # (A,)
    al_cdf: jax.Array        # (A,)
    al_uv0: jax.Array        # (A, 2) per-vertex texcoords (tri lights)
    al_uv1: jax.Array        # (A, 2)
    al_uv2: jax.Array        # (A, 2)
    al_tex: jax.Array        # (A,) int32 emission-texture id, -1 = none
    sph_light_id: jax.Array  # (NS,) int32 element id, -1 = not a light
    tri_light_id: jax.Array  # (T,) int32 aligned with tris
    env: jax.Array           # (3,) constant environment term
    env_map: jax.Array       # (H, W, 3) equirect env map; (0, 0, 3) = none
    env_pmf: jax.Array       # (H*W,) texel pmf for importance sampling
    env_cdf: jax.Array       # (H*W,)
    env_sin: jax.Array       # (H,) sin(theta) per row
    tex_data: jax.Array      # (P, 3) flattened texel table (core/texture)
    tex_meta: jax.Array      # (T, 3) int32 (offset, H, W); (0,3) = none
    # cubic Bezier hair curves as FIRST-CLASS primitives (reference
    # analogue: curve shapes tessellated to lines in yocto's shape layer
    # [U:libs/yocto/yocto_shape.cpp]; here the integrator intersects the
    # curve directly — geometry/bezier.py — so gradients reach the 4
    # control points for strand-geometry inverse rendering)
    crv_cp: jax.Array = None      # (C, 4, 3) control points; (0,4,3) = none
    crv_r0: jax.Array = None      # (C,) root radius
    crv_r1: jax.Array = None      # (C,) tip radius
    crv_mat_id: jax.Array = None  # (C,) int32 hair-material table id
    accel: object = None     # acceleration structure pytree (Clusters /
                             # DeviceBVH) or None -> brute-force scan;
                             # carried in the Scene so it crosses jit
                             # boundaries as a traced argument, never as
                             # baked-in constants

    @property
    def n_spheres(self):
        return self.sph_center.shape[0]

    @property
    def n_planes(self):
        return self.pln_point.shape[0]

    @property
    def n_lights(self):
        return self.light_pos.shape[0]

    @property
    def n_triangles(self):
        return self.tris.n_triangles

    @property
    def n_area_lights(self):
        return self.al_kind.shape[0]

    @property
    def n_curves(self):
        return 0 if self.crv_cp is None else self.crv_cp.shape[0]


def from_dict(scene: dict, dtype=jnp.float32) -> Scene:
    """Convert an oracle-format scene dict into device arrays."""
    if scene.get("segments") is not None and len(scene["segments"][0]):
        p0, p1, r0, r1 = scene["segments"]
    else:
        # curves-only / prop-only scenes: ONE far-away zero-radius
        # segment instead of empty arrays — 0-sized jit inputs trip an
        # XLA buffer-count bug on re-execution, and integrator gathers
        # stay trivially in-bounds. NON-degenerate (p1 != p0): a
        # zero-length segment makes ||p1 - p0|| gradients NaN through
        # unselected `where` branches in the shading frame.
        p0 = np.full((1, 3), 1e8)
        p1 = p0 + np.array([[1.0, 0.0, 0.0]])
        r0 = r1 = np.zeros((1,))
    segs = Segments.make(p0, p1, r0, r1, dtype=dtype)
    if scene.get("hair_materials"):
        # per-shape hair-material TABLE: leaves get a leading (Mh,) dim,
        # gathered per hit segment via seg_mat_id in the integrator
        ms = scene["hair_materials"]
        hair = HairMaterial.make(
            sigma_a=np.stack([np.asarray(m["sigma_a"]) for m in ms]),
            beta_m=np.asarray([m["beta_m"] for m in ms]),
            beta_n=np.asarray([m["beta_n"] for m in ms]),
            alpha=np.asarray([m.get("alpha", np.deg2rad(2.0))
                              for m in ms]),
            eta=np.asarray([m.get("eta", 1.55) for m in ms]), dtype=dtype)
        seg_mat_id = jnp.asarray(scene["segment_mat_id"], jnp.int32)
        assert seg_mat_id.shape[0] == np.asarray(p0).shape[0]
    else:
        m = scene["hair_material"]
        hair = HairMaterial.make(
            sigma_a=np.asarray(m["sigma_a"]), beta_m=m["beta_m"],
            beta_n=m["beta_n"], alpha=m.get("alpha", np.deg2rad(2.0)),
            eta=m.get("eta", 1.55), dtype=dtype)
        seg_mat_id = jnp.zeros((np.asarray(p0).shape[0],), jnp.int32)

    spheres = scene.get("spheres") or []
    planes = scene.get("planes") or []
    meshes = scene.get("meshes") or []
    lights = scene.get("point_lights") or []

    def arr(vals, shape):
        if not vals:
            return jnp.zeros(shape, dtype)
        return jnp.asarray(np.asarray(vals, np.float64), dtype)

    from oracle.pathtrace import scene_area_lights, scene_surface_materials

    al = scene_area_lights(scene)
    if al is None:
        z3 = jnp.zeros((0, 3), dtype)
        z2 = jnp.zeros((0, 2), dtype)
        z1 = jnp.zeros((0,), dtype)
        al_fields = dict(
            al_kind=jnp.zeros((0,), jnp.int32), al_p0=z3, al_p1=z3,
            al_p2=z3, al_emission=z3, al_area=z1, al_pmf=z1, al_cdf=z1,
            al_uv0=z2, al_uv1=z2, al_uv2=z2,
            al_tex=jnp.zeros((0,), jnp.int32),
            sph_light_id=jnp.full((len(spheres),), -1, jnp.int32),
            tri_light_id=jnp.full(
                (int(sum(len(np.asarray(m["triangles"])) for m in meshes)),),
                -1, jnp.int32))
    else:
        al_fields = dict(
            al_kind=jnp.asarray(al["kind"], jnp.int32),
            al_p0=jnp.asarray(al["p0"], dtype),
            al_p1=jnp.asarray(al["p1"], dtype),
            al_p2=jnp.asarray(al["p2"], dtype),
            al_emission=jnp.asarray(al["emission"], dtype),
            al_area=jnp.asarray(al["area"], dtype),
            al_pmf=jnp.asarray(al["pmf"], dtype),
            al_cdf=jnp.asarray(al["cdf"], dtype),
            al_uv0=jnp.asarray(al["uv0"], dtype),
            al_uv1=jnp.asarray(al["uv1"], dtype),
            al_uv2=jnp.asarray(al["uv2"], dtype),
            al_tex=jnp.asarray(al["tex"], jnp.int32),
            sph_light_id=jnp.asarray(al["sph_light_id"], jnp.int32),
            tri_light_id=jnp.asarray(al["tri_light_id"], jnp.int32))

    return Scene(
        segments=segs,
        hair=hair,
        seg_mat_id=seg_mat_id,
        surf_mat=SurfaceMaterial.make(scene_surface_materials(scene),
                                      dtype=dtype),
        sph_center=arr([s["center"] for s in spheres], (0, 3)),
        sph_radius=arr([s["radius"] for s in spheres], (0,)),
        pln_point=arr([p["point"] for p in planes], (0, 3)),
        pln_normal=arr([p["normal"] for p in planes], (0, 3)),
        tris=Triangles.from_meshes(meshes,
                                   mat_id0=len(spheres) + len(planes),
                                   dtype=dtype),
        light_pos=arr([l["position"] for l in lights], (0, 3)),
        light_intensity=arr([l["intensity"] for l in lights], (0, 3)),
        **al_fields,
        env=jnp.asarray(np.asarray(scene.get("environment", [0.0, 0.0, 0.0]),
                                   np.float64), dtype),
        **_env_map_arrays(scene.get("env_map"), dtype),
        **dict(zip(("tex_data", "tex_meta"), texture.flatten_textures(
            [t["data"] for t in scene.get("textures", [])], dtype))),
        **_curve_arrays(scene.get("curves"), dtype),
    )


def _curve_arrays(curves, dtype):
    """scene["curves"] = {"cp": (C, 4, 3), "r0": (C,), "r1": (C,),
    "mat_id": optional (C,) int hair-material ids} — first-class cubic
    Bezier strands (intersected directly, geometry/bezier.py)."""
    if not curves:
        return {"crv_cp": jnp.zeros((0, 4, 3), dtype),
                "crv_r0": jnp.zeros((0,), dtype),
                "crv_r1": jnp.zeros((0,), dtype),
                "crv_mat_id": jnp.zeros((0,), jnp.int32)}
    cp = np.asarray(curves["cp"], np.float64)
    assert cp.ndim == 3 and cp.shape[1:] == (4, 3), cp.shape
    c = cp.shape[0]
    mid = curves.get("mat_id")
    return {"crv_cp": jnp.asarray(cp, dtype),
            "crv_r0": jnp.asarray(np.broadcast_to(
                np.asarray(curves["r0"], np.float64), (c,)), dtype),
            "crv_r1": jnp.asarray(np.broadcast_to(
                np.asarray(curves["r1"], np.float64), (c,)), dtype),
            "crv_mat_id": (jnp.zeros((c,), jnp.int32) if mid is None
                           else jnp.asarray(mid, jnp.int32))}


def _env_map_arrays(env_map, dtype):
    if env_map is None:
        return {"env_map": jnp.zeros((0, 0, 3), dtype),
                "env_pmf": jnp.zeros((0,), dtype),
                "env_cdf": jnp.zeros((0,), dtype),
                "env_sin": jnp.zeros((0,), dtype)}
    from oracle.envmap import EnvMap
    em = env_map if hasattr(env_map, "pmf") else EnvMap(env_map)
    return {"env_map": jnp.asarray(em.image, dtype),
            "env_pmf": jnp.asarray(em.pmf, dtype),
            "env_cdf": jnp.asarray(em.cdf, dtype),
            "env_sin": jnp.asarray(em.sin_t, dtype)}


def camera_from_dict(cam: dict) -> Camera:
    return Camera.from_dict(cam)
