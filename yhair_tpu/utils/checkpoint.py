"""Checkpoint / resume for progressive renders and inverse-rendering runs.

Reference status: quasi-checkpointing only (the viewer's progressive
accumulation buffer; the CLI saves just the final image — SURVEY.md §5).
Here it is a first-class subsystem: because every sample's RNG stream is
counter-derived from (pixel, sample) ids, saving `(accum, next_sample)`
makes resume BIT-exact — re-rendering sample k on any host/device count
reproduces the same radiance (tested in tests/test_checkpoint.py).

Format: a single .npz with an explicit version field.
"""

from __future__ import annotations

import os

import numpy as np

FORMAT_VERSION = 1


def save_render_state(path, accum, next_sample, seed, meta=None):
    """accum: (H, W, 3) SUM of per-sample radiance for samples
    [0, next_sample); divide by next_sample for the current image."""
    tmp = str(path) + ".tmp.npz"
    np.savez_compressed(
        tmp, version=FORMAT_VERSION, accum=np.asarray(accum, np.float64),
        next_sample=int(next_sample), seed=int(seed),
        meta=np.asarray(repr(meta or {})))
    os.replace(tmp, path)


def load_render_state(path):
    with np.load(path, allow_pickle=False) as z:
        assert int(z["version"]) == FORMAT_VERSION, "checkpoint version"
        return {
            "accum": z["accum"],
            "next_sample": int(z["next_sample"]),
            "seed": int(z["seed"]),
        }


def save_train_state(path, params, opt_state, step, seed):
    """Inverse-rendering state: parameter pytree + optimizer moments."""
    import jax
    flat_p, tree_p = jax.tree.flatten(params)
    flat_o, _tree_o = jax.tree.flatten(opt_state)
    tmp = str(path) + ".tmp.npz"
    np.savez_compressed(
        tmp, version=FORMAT_VERSION, step=int(step), seed=int(seed),
        n_params=len(flat_p),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(flat_p)},
        **{f"o{i}": np.asarray(x) for i, x in enumerate(flat_o)})
    os.replace(tmp, path)


def load_train_state(path, params_tree, opt_state_tree):
    """Restore into the given pytree structures (from a fresh init)."""
    import jax
    with np.load(path, allow_pickle=False) as z:
        assert int(z["version"]) == FORMAT_VERSION
        n_p = int(z["n_params"])
        flat_p = [z[f"p{i}"] for i in range(n_p)]
        flat_o = []
        i = 0
        while f"o{i}" in z:
            flat_o.append(z[f"o{i}"])
            i += 1
        params = jax.tree.unflatten(jax.tree.structure(params_tree), flat_p)
        opt_state = jax.tree.unflatten(jax.tree.structure(opt_state_tree),
                                       flat_o)
        return params, opt_state, int(z["step"]), int(z["seed"])
