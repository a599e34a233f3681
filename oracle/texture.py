"""Texture sampling — float64 oracle.

Reference analogue: yocto's `texture` objects + `eval_texture` lookups in
the material evaluation path (SURVEY.md §2.5, §2.6
[U:libs/yocto/yocto_sceneio.h, yocto_trace.cpp]).

Scene format: `scene["textures"]` is a list of dicts with a `"data"`
(H, W, 3) linear-radiance array. Materials reference textures by index
via `color_tex` / `emission_tex` / `roughness_tex` (-1 or absent = none);
a referenced texture MULTIPLIES the material constant (yocto convention:
material color is a scale on the texture).

Bilinear filtering, repeat-wrap in u, clamp in v — numerically mirrored
by yhair_tpu/core/texture.py (the parity tests compare the two).

UV conventions (mirrored in the JAX intersector):
  sphere   u = atan2(n.z, n.x)/2pi + 0.5, v = acos(n.y)/pi (outward n)
  plane    tangent frame from the STORED plane normal (not the flipped
           shading normal): a = [0,1,0] if |n.x| > 0.9 else [1,0,0],
           t1 = normalize(cross(n, a)), t2 = cross(n, t1);
           uv = ((p - point).t1, (p - point).t2)
  mesh     barycentric interpolation of per-vertex `texcoords`
  hair     untextured (hair material is the differentiable pytree)
"""

from __future__ import annotations

import numpy as np


def tex_bilinear(img, u, v):
    """Bilinear lookup. img (H, W, 3); u, v any shape. Wrap u, clamp v."""
    img = np.asarray(img, np.float64)
    h, w = img.shape[0], img.shape[1]
    x = np.asarray(u, np.float64) * w - 0.5
    y = np.clip(np.asarray(v, np.float64) * h - 0.5, 0.0, h - 1.0)
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xi0 = (x0.astype(np.int64)) % w
    xi1 = (xi0 + 1) % w
    yi0 = y0.astype(np.int64)
    yi1 = np.minimum(yi0 + 1, h - 1)
    c00 = img[yi0, xi0]
    c01 = img[yi0, xi1]
    c10 = img[yi1, xi0]
    c11 = img[yi1, xi1]
    return ((1 - fy) * ((1 - fx) * c00 + fx * c01)
            + fy * ((1 - fx) * c10 + fx * c11))


def scene_textures(scene):
    return [np.asarray(t["data"], np.float64)
            for t in scene.get("textures", [])]


def apply_textures(scene, sp, uv):
    """Modulate gathered per-ray material params by their textures.

    sp: dict of per-ray arrays incl. *_tex int ids; uv: (N, 2).
    Returns a new dict (sp is not mutated).
    """
    texs = scene_textures(scene)
    if not texs:
        return sp
    sp = dict(sp)
    u, v = uv[:, 0], uv[:, 1]
    for field, tex_key in (("color", "color_tex"),
                           ("emission", "emission_tex"),
                           ("roughness", "roughness_tex")):
        tid = sp.get(tex_key)
        if tid is None or not (tid >= 0).any():
            continue
        val = sp[field].copy()
        for ti, img in enumerate(texs):
            m = tid == ti
            if not m.any():
                continue
            texel = tex_bilinear(img, u[m], v[m])
            if val.ndim == 2:
                val[m] = val[m] * texel
            else:
                val[m] = val[m] * texel.mean(-1)
        sp[field] = val
    return sp


def checkerboard(h=64, w=64, tiles=8, c0=(0.9, 0.9, 0.9),
                 c1=(0.15, 0.25, 0.55)):
    """Procedural checker texture (no external assets offline)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    f = ((xx * tiles // w) + (yy * tiles // h)) % 2
    return np.where(f[..., None] == 0, np.asarray(c0, np.float64),
                    np.asarray(c1, np.float64))


def uv_gradient(h=32, w=32):
    """Smooth u/v ramp texture (bilinear-friendly test pattern)."""
    yy, xx = np.meshgrid((np.arange(h) + 0.5) / h,
                         (np.arange(w) + 0.5) / w, indexing="ij")
    return np.stack([xx, yy, 0.5 * (xx + yy)], axis=-1)
