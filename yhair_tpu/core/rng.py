"""Counter-based sampling RNG.

The reference seeds a PCG32 per pixel [U:libs/yocto/yocto_math.h rng_state]
(SURVEY.md §2.1); the TPU-native equivalent is threefry keys folded from
(pixel, sample) counters so any pixel/sample's stream is reproducible
independent of sharding or evaluation order (SURVEY.md §5 checkpoint row).

The integrator consumes a flat uniforms tensor with the SAME layout as the
oracle (oracle/pathtrace.py): [2 pixel-jitter + 2 lens dims, then 12 dims
per bounce: 4 BSDF, 1 RR, 1 light select, 2 env NEE, 2 area-light NEE,
2 reserved].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

D_PIXEL = 4
D_BOUNCE = 12


def n_uniform_dims(max_depth: int) -> int:
    return D_PIXEL + D_BOUNCE * max_depth


def sample_uniforms(key: jax.Array, n_rays: int, max_depth: int,
                    dtype=jnp.float32) -> jax.Array:
    """(n_rays, n_uniform_dims) uniforms for one ray batch."""
    return jax.random.uniform(key, (n_rays, n_uniform_dims(max_depth)),
                              dtype=dtype)


def pixel_sample_key(base: jax.Array, pixel_index: jax.Array,
                     sample_index) -> jax.Array:
    """Reproducible per-(pixel, sample) key — fold order is part of the
    checkpoint format (resume must regenerate identical streams)."""
    k = jax.random.fold_in(base, sample_index)
    return jax.random.fold_in(k, pixel_index)
