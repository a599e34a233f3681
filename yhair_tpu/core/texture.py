"""Texture table + bilinear sampling in JAX.

TPU-native counterpart of yocto's `texture` + `eval_texture` (SURVEY.md
§2.5/§2.6); numerically mirrors oracle/texture.py (parity-tested).

TPU-first layout: every texture in the scene is flattened into ONE
(P, 3) texel table plus a tiny (T, 3) int32 meta table (offset, H, W),
so a mixed batch of rays referencing different textures is four flat
gathers + a lerp — no ragged arrays, no per-texture dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flatten_textures(textures, dtype=jnp.float32):
    """textures: list of (H, W, 3) arrays -> (tex_data (P,3), tex_meta
    (T,3) int32). Empty list -> (0,3)/(0,3) sentinels."""
    if not textures:
        return (jnp.zeros((0, 3), dtype), jnp.zeros((0, 3), jnp.int32))
    datas, metas, off = [], [], 0
    for t in textures:
        a = np.asarray(t, np.float64)
        h, w = a.shape[0], a.shape[1]
        datas.append(a.reshape(h * w, 3))
        metas.append((off, h, w))
        off += h * w
    return (jnp.asarray(np.concatenate(datas), dtype),
            jnp.asarray(np.asarray(metas), jnp.int32))


def sample_bilinear(tex_data, tex_meta, tid, u, v):
    """Per-ray texture fetch. tid (N,) int32 (-1 = none -> 1.0 so it's a
    neutral multiplier); u, v (N,). Wrap u, clamp v. -> (N, 3)."""
    safe = jnp.maximum(tid, 0)
    meta = tex_meta[safe]                       # (N, 3)
    off, h, w = meta[:, 0], meta[:, 1], meta[:, 2]
    hf = h.astype(u.dtype)
    wf = w.astype(u.dtype)
    x = u * wf - 0.5
    y = jnp.clip(v * hf - 0.5, 0.0, hf - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    xi0 = x0.astype(jnp.int32) % w
    xi1 = (xi0 + 1) % w
    yi0 = y0.astype(jnp.int32)
    yi1 = jnp.minimum(yi0 + 1, h - 1)
    c00 = tex_data[off + yi0 * w + xi0]
    c01 = tex_data[off + yi0 * w + xi1]
    c10 = tex_data[off + yi1 * w + xi0]
    c11 = tex_data[off + yi1 * w + xi1]
    val = ((1 - fy) * ((1 - fx) * c00 + fx * c01)
           + fy * ((1 - fx) * c10 + fx * c11))
    return jnp.where((tid >= 0)[:, None], val, 1.0)


def apply_textures(tex_data, tex_meta, sp, uv):
    """Modulate a gathered per-hit SurfaceMaterial by its textures
    (multiplicative, mirror of oracle/texture.py:apply_textures)."""
    u, v = uv[:, 0], uv[:, 1]
    color = sp.color * sample_bilinear(tex_data, tex_meta,
                                       sp.color_tex, u, v)
    emission = sp.emission * sample_bilinear(tex_data, tex_meta,
                                             sp.emission_tex, u, v)
    rtex = sample_bilinear(tex_data, tex_meta, sp.roughness_tex, u, v)
    roughness = sp.roughness * rtex.mean(-1)
    return sp._replace(color=color, emission=emission,
                       roughness=roughness)
