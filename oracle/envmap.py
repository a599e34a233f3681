"""Equirectangular environment map with importance sampling — f64 oracle.

Reference analogue: yocto environments + `init_lights` environment CDFs
and env importance sampling in the tracer (SURVEY.md §2.5, §2.7
[U:libs/yocto/yocto_trace.cpp]). Convention: y-up,
u = atan2(d.z, d.x)/(2 pi) + 0.5, v = acos(d.y)/pi (v=0 at +y).

Sampling uses a single flat CDF over all texels weighted by
luminance * sin(theta); pdf is returned in solid-angle measure.
"""

from __future__ import annotations

import numpy as np


def direction_to_uv(d):
    u = np.arctan2(d[..., 2], d[..., 0]) / (2.0 * np.pi) + 0.5
    v = np.arccos(np.clip(d[..., 1], -1.0, 1.0)) / np.pi
    return u % 1.0, np.clip(v, 0.0, 1.0 - 1e-9)


def uv_to_direction(u, v):
    theta = v * np.pi
    phi = (u - 0.5) * 2.0 * np.pi
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), np.cos(theta), st * np.sin(phi)],
                    axis=-1)


class EnvMap:
    def __init__(self, image):
        """image: (H, W, 3) linear radiance."""
        self.image = np.asarray(image, np.float64)
        h, w, _ = self.image.shape
        self.h, self.w = h, w
        lum = self.image.mean(-1)
        v_centers = (np.arange(h) + 0.5) / h
        sin_t = np.sin(v_centers * np.pi)
        weights = (lum * sin_t[:, None]).reshape(-1)
        total = weights.sum()
        if total <= 0:
            weights = np.ones_like(weights)
            total = weights.sum()
        self.pmf = weights / total                      # per texel
        self.cdf = np.cumsum(self.pmf)
        self.sin_t = sin_t

    def eval(self, d):
        """Bilinear lookup, wrap in u / clamp in v (mirrored by the JAX
        core/envmap.py:env_eval; the pdf stays nearest-texel — both
        strategies use the same pdf function, so MIS stays consistent)."""
        from .texture import tex_bilinear

        u, v = direction_to_uv(d)
        return tex_bilinear(self.image, u, v)

    def pdf(self, d):
        """Solid-angle pdf of `sample` for direction d."""
        u, v = direction_to_uv(d)
        x = np.minimum((u * self.w).astype(np.int64), self.w - 1)
        y = np.minimum((v * self.h).astype(np.int64), self.h - 1)
        texel_pmf = self.pmf[y * self.w + x]
        texel_solid_angle = (2.0 * np.pi / self.w) * (np.pi / self.h) \
            * np.maximum(self.sin_t[y], 1e-8)
        return texel_pmf / texel_solid_angle

    def sample(self, u1, u2):
        """-> (direction (..., 3), pdf). u1 picks the texel from the flat
        CDF; u2 jitters within the texel."""
        idx = np.searchsorted(self.cdf, np.clip(u1, 0.0, 1.0 - 1e-12))
        idx = np.minimum(idx, self.h * self.w - 1)
        y, x = idx // self.w, idx % self.w
        uu = (x + np.clip(u2, 0.0, 1.0 - 1e-9)) / self.w
        vv = (y + 0.5) / self.h
        d = uv_to_direction(uu, vv)
        texel_pmf = self.pmf[idx]
        texel_solid_angle = (2.0 * np.pi / self.w) * (np.pi / self.h) \
            * np.maximum(self.sin_t[y], 1e-8)
        return d, texel_pmf / texel_solid_angle


def gradient_sky(h=64, w=128, horizon=(0.5, 0.55, 0.6), zenith=(0.2, 0.35,
                 0.7), sun_dir=(0.5, 0.6, 0.3), sun_power=200.0,
                 sun_radius=0.06, sun_color=(50.0, 45.0, 38.0)):
    """Procedural sky: vertical gradient + gaussian sun blob (no external
    HDRI assets are available offline)."""
    vs = (np.arange(h) + 0.5) / h
    us = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(us, vs)
    d = uv_to_direction(uu, vv)
    t = np.clip(d[..., 1], 0.0, 1.0)[..., None]
    img = (1 - t) * np.asarray(horizon) + t * np.asarray(zenith)
    sd = np.asarray(sun_dir, np.float64)
    sd = sd / np.linalg.norm(sd)
    cosang = np.clip((d * sd).sum(-1), -1, 1)
    blob = np.exp(-(np.arccos(cosang) / sun_radius) ** 2)
    img = img + blob[..., None] * np.asarray(sun_color)
    return img
