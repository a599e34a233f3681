"""Environment-map lighting in JAX (mirror of oracle/envmap.py).

Equirectangular, y-up; bilinear eval mirrored texel-for-texel by
oracle/envmap.py so oracle and TPU renders match to f32 tolerance.
Sampling via one searchsorted over the flat luminance*sin(theta)
CDF; pdfs in solid-angle measure. Scene carries the tables as arrays
(core/scene.py) so everything jits; `has_env(scene)` is a static shape
check usable for Python-level branching inside traced code.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def has_env(scene) -> bool:
    return scene.env_map.shape[0] > 0


def _dims(scene):
    return scene.env_map.shape[0], scene.env_map.shape[1]


def direction_to_texel(scene, d):
    h, w = _dims(scene)
    u = jnp.arctan2(d[..., 2], d[..., 0]) / TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    x = jnp.minimum((u % 1.0 * w).astype(jnp.int32), w - 1)
    y = jnp.minimum((jnp.clip(v, 0.0, 1.0 - 1e-7) * h).astype(jnp.int32),
                    h - 1)
    return x, y


def env_eval(scene, d):
    """Bilinear radiance lookup (wrap u, clamp v) — mirrors
    oracle/envmap.py:EnvMap.eval / oracle/texture.py:tex_bilinear."""
    h, w = _dims(scene)
    u = jnp.arctan2(d[..., 2], d[..., 0]) / TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    u = u % 1.0
    v = jnp.clip(v, 0.0, 1.0 - 1e-7)
    x = u * w - 0.5
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xi0 = x0.astype(jnp.int32) % w
    xi1 = (xi0 + 1) % w
    yi0 = y0.astype(jnp.int32)
    yi1 = jnp.minimum(yi0 + 1, h - 1)
    c00 = scene.env_map[yi0, xi0]
    c01 = scene.env_map[yi0, xi1]
    c10 = scene.env_map[yi1, xi0]
    c11 = scene.env_map[yi1, xi1]
    return ((1 - fy) * ((1 - fx) * c00 + fx * c01)
            + fy * ((1 - fx) * c10 + fx * c11))


def env_pdf(scene, d):
    h, w = _dims(scene)
    x, y = direction_to_texel(scene, d)
    pmf = scene.env_pmf[y * w + x]
    solid = (TWO_PI / w) * (jnp.pi / h) * jnp.maximum(scene.env_sin[y], 1e-8)
    return pmf / solid


def env_sample(scene, u1, u2):
    """-> (direction (N, 3), pdf (N,))."""
    h, w = _dims(scene)
    idx = jnp.searchsorted(scene.env_cdf,
                           jnp.clip(u1, 0.0, 1.0 - 1e-7))
    idx = jnp.minimum(idx, h * w - 1).astype(jnp.int32)
    y, x = idx // w, idx % w
    uu = (x + jnp.clip(u2, 0.0, 1.0 - 1e-7)) / w
    vv = (y + 0.5) / h
    theta = vv * jnp.pi
    phi = (uu - 0.5) * TWO_PI
    st = jnp.sin(theta)
    d = jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)],
                  axis=-1)
    pmf = scene.env_pmf[idx]
    solid = (TWO_PI / w) * (jnp.pi / h) * jnp.maximum(scene.env_sin[y], 1e-8)
    return d, pmf / solid
