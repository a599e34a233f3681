"""NaN debugging & finite-checks (SURVEY.md §5 sanitizers row).

The reference renderer has no sanitizers in-repo (threads own disjoint
pixel rows; correctness by construction). The functional-JAX equivalents:

  * `enable_debug_nans()` — flips `jax_debug_nans`: every primitive whose
    output contains NaN raises with a traceback to the producing op
    (re-runs the offending computation op-by-op). Wired to the CLIs'
    `--debug-nans` flag. Caveat: atan2-style composites create gated NaN
    INTERMEDIATES by design; the renderer's hot paths were scrubbed of
    those (core/safemath.py, bsdf/hair.py guards) exactly so this flag
    is usable end-to-end.
  * `assert_finite(tree, name)` — chex finite-assertion on a pytree,
    active when YHAIR_CHECK_FINITE=1 (or after `enable_finite_checks()`).
    train_step_fn calls it on losses/gradients, so a production inverse
    run can turn on cheap last-line checks without the op-by-op cost of
    debug_nans.
"""

from __future__ import annotations

import os

_finite_checks = os.environ.get("YHAIR_CHECK_FINITE") == "1"


def enable_debug_nans() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)


def enable_finite_checks(on: bool = True) -> None:
    global _finite_checks
    _finite_checks = on


def finite_checks_enabled() -> bool:
    return _finite_checks


def assert_finite(tree, name: str) -> None:
    """Finite-check on a pytree (no-op unless enabled; safe under jit).

    Concrete values go through chex directly; traced values reduce to
    one boolean checked host-side via jax.debug.callback (chex value
    assertions cannot inspect tracers)."""
    if not _finite_checks:
        return
    import jax
    import jax.numpy as jnp
    from jax.core import Tracer

    leaves = jax.tree.leaves(tree)
    if not leaves:
        return
    if not any(isinstance(x, Tracer) for x in leaves):
        import chex

        chex.assert_tree_all_finite(tree, custom_message=name)
        return
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()

    def _check(ok_val, name=name):
        if not bool(ok_val):
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_check, ok)
