"""Gradient-hardened primitives for geometry differentiation.

Hair-parameter gradients never differentiate the geometry terms, but
control-point / strand-endpoint gradients do — and the renderer's shading
math is full of expressions whose VALUE is safely gated by `where` while
their DERIVATIVE is inf/NaN on the gated lanes (norm(0), sqrt(0),
atan2(0, 0), asin(±1)). `where` does NOT protect gradients: the vjp
multiplies NaN by the 0-mask and NaN wins. Every such site routes through
these helpers; values are bit-identical to the unhardened forms, only the
gradient is zeroed on the degenerate measure-zero set.

Reference analogue: none — the C++ renderer has no autodiff (SURVEY.md
§2); this is a differentiable-rendering requirement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_normalize(v, eps=1e-12):
    """v / max(||v||, eps) along the last axis, finite gradients at 0.

    Values bit-identical to `v / jnp.maximum(jnp.linalg.norm(v, axis=-1,
    keepdims=True), eps)`; gradients are zero where ||v|| <= eps.
    """
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = n2 > eps * eps
    n = jnp.sqrt(jnp.where(safe, n2, 1.0))
    return jnp.where(safe, v / n,
                     jax.lax.stop_gradient(v) * (1.0 / eps))
