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

    @classmethod
    def make(cls, position, look_at, up=(0.0, 1.0, 0.0), vfov_deg=35.0,
             dtype=jnp.float32):
        return cls(jnp.asarray(position, dtype), jnp.asarray(look_at, dtype),
                   jnp.asarray(up, dtype), jnp.asarray(vfov_deg, dtype))

    @classmethod
    def from_dict(cls, cam):
        return cls.make(cam["position"], cam["look_at"],
                        cam.get("up", (0.0, 1.0, 0.0)), cam["vfov_deg"])


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def camera_rays(cam: Camera, width, height, i, j, u_px):
    """Generate primary rays.

    i, j: (N,) pixel column/row; u_px: (N, 2) subpixel jitter.
    Returns (origins, directions) (N, 3). Row 0 is the top of the image
    (same convention as the oracle).
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
    return o, _normalize(d)
