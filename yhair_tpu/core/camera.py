"""Pinhole camera — JAX mirror of oracle/geometry.py:camera_rays.

Reference analogue: yocto's camera/lens model + `eval_camera`
[U:libs/yocto/yocto_sceneio.h, yocto_trace.cpp] (SURVEY.md §2.5, §3.1).
Thin-lens DoF is a later extension; the ladder scenes use pinhole.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    position: jnp.ndarray   # (3,)
    look_at: jnp.ndarray    # (3,)
    up: jnp.ndarray         # (3,)
    vfov_deg: jnp.ndarray   # ()
    aperture: jnp.ndarray   # () lens diameter; 0 = pinhole
    focus_dist: jnp.ndarray  # () distance to the focal plane

    @classmethod
    def make(cls, position, look_at, up=(0.0, 1.0, 0.0), vfov_deg=35.0,
             aperture=0.0, focus_dist=None, dtype=jnp.float32):
        import numpy as _np
        if focus_dist is None:
            focus_dist = float(_np.linalg.norm(
                _np.asarray(look_at, float) - _np.asarray(position, float)))
        return cls(jnp.asarray(position, dtype), jnp.asarray(look_at, dtype),
                   jnp.asarray(up, dtype), jnp.asarray(vfov_deg, dtype),
                   jnp.asarray(aperture, dtype),
                   jnp.asarray(focus_dist, dtype))

    @classmethod
    def from_dict(cls, cam):
        return cls.make(cam["position"], cam["look_at"],
                        cam.get("up", (0.0, 1.0, 0.0)), cam["vfov_deg"],
                        cam.get("aperture", 0.0), cam.get("focus_dist"))


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def camera_rays(cam: Camera, width, height, i, j, u_px):
    """Generate primary rays (thin lens; pinhole when aperture = 0).

    i, j: (N,) pixel column/row; u_px: (N, 4): subpixel jitter [:, 0:2],
    lens-disk sample [:, 2:4]. Returns (origins, directions) (N, 3).
    Row 0 is the top of the image (same convention as the oracle).
    """
    fwd = _normalize(cam.look_at - cam.position)
    right = _normalize(jnp.cross(fwd, cam.up))
    up = jnp.cross(right, fwd)
    tan_half = jnp.tan(jnp.deg2rad(cam.vfov_deg) * 0.5)
    aspect = width / height
    sx = (i + u_px[:, 0]) / width * 2.0 - 1.0
    sy = 1.0 - (j + u_px[:, 1]) / height * 2.0
    d = (fwd[None, :] + (sx * tan_half * aspect)[:, None] * right[None, :]
         + (sy * tan_half)[:, None] * up[None, :])
    o = jnp.broadcast_to(cam.position, d.shape)
    # thin lens: jitter origin on the aperture disk, aim at the focal
    # plane point of the pinhole ray (no-op when aperture == 0)
    r = cam.aperture * 0.5 * jnp.sqrt(u_px[:, 2])
    theta = 2.0 * jnp.pi * u_px[:, 3]
    lens = ((r * jnp.cos(theta))[:, None] * right[None, :]
            + (r * jnp.sin(theta))[:, None] * up[None, :])
    focal_pt = o + d * cam.focus_dist
    o = o + lens
    d = jnp.where(cam.aperture > 0.0, focal_pt - o, d)
    return o, _normalize(d)
