"""Ray-Bezier intersection: oracle recursion vs JAX fixed-depth vs
tessellation (VERDICT r3 next-round #4).

Checks: (1) the oracle's culled recursion equals the exhaustive chord
scan (cull soundness); (2) the JAX fixed-depth path matches the oracle
to f32; (3) gradients of t w.r.t. control points match f64 finite
differences; (4) the chord t-error converges as depth grows, and the
exact-derivative tangent is comparable to the chord tangent (measured
honestly: the recovered curve parameter carries the same discretization
error, so "exact" evaluation at it is NOT automatically better — the
real wins over pre-tessellation are control-point differentiability and
zero segment storage; see geometry/bezier.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle import bezier as ob
from oracle.geometry import bezier_to_segments, intersect_segments
from yhair_tpu.geometry import bezier as jb


def _curves(rng, n):
    base = rng.normal(size=(n, 1, 3)) * 0.3
    cp = base + np.cumsum(rng.normal(size=(n, 4, 3)) * 0.15, axis=1)
    r0 = np.full(n, 0.02)
    r1 = np.full(n, 0.008)
    return cp, r0, r1


def _rays(rng, n, cp=None):
    o = rng.normal(size=(n, 3)) * 1.5
    if cp is None:
        tgt = rng.normal(size=(n, 3)) * 0.2
    else:
        # aim at jittered points on the curves so hits are plentiful
        ci = rng.integers(0, cp.shape[0], n)
        ts = rng.random(n)
        from oracle.bezier import bezier_point
        tgt = bezier_point(cp[ci], ts) + rng.normal(size=(n, 3)) * 0.01
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_oracle_cull_is_sound():
    """Recursive-with-culling == exhaustive tessellated chord scan."""
    rng = np.random.default_rng(0)
    cp, r0, r1 = _curves(rng, 6)
    o, d = _rays(rng, 64)
    depth = 3
    res = ob.intersect_curves(o, d, cp, r0, r1, depth=depth)

    p0s, p1s, r0s, r1s = [], [], [], []
    for ci in range(cp.shape[0]):
        a, b, ra, rb = bezier_to_segments(cp[ci], r0[ci], r1[ci],
                                          n_seg=1 << depth)
        p0s.append(a)
        p1s.append(b)
        r0s.append(ra)
        r1s.append(rb)
    flat = intersect_segments(o, d, np.concatenate(p0s),
                              np.concatenate(p1s), np.concatenate(r0s),
                              np.concatenate(r1s))
    np.testing.assert_array_equal(res["hit"], flat["hit"])
    m = res["hit"]
    np.testing.assert_allclose(res["t"][m], flat["t"][m], rtol=1e-12)
    np.testing.assert_array_equal(res["curve"][m],
                                  flat["seg"][m] // (1 << depth))


def test_jax_matches_oracle():
    rng = np.random.default_rng(1)
    cp, r0, r1 = _curves(rng, 5)
    o, d = _rays(rng, 128)
    depth = 3
    res = ob.intersect_curves(o, d, cp, r0, r1, depth=depth)
    t, curve, u, hit = jb.nearest_hit(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(cp, jnp.float32), jnp.asarray(r0, jnp.float32),
        jnp.asarray(r1, jnp.float32), depth=depth)
    hit = np.asarray(hit)
    # f32 capsule boundaries can flip ultra-grazing hits; require near-
    # total agreement and exact agreement elsewhere
    agree = hit == res["hit"]
    assert agree.mean() > 0.99, f"hit mismatch {(~agree).sum()}"
    m = hit & res["hit"]
    np.testing.assert_allclose(np.asarray(t)[m], res["t"][m], rtol=2e-4)
    np.testing.assert_allclose(np.asarray(u)[m], res["u"][m], atol=2e-3)
    assert (np.asarray(curve)[m] == res["curve"][m]).all()


def test_grad_t_wrt_control_points():
    """d t / d cp via JAX AD vs f64 central differences on the oracle."""
    rng = np.random.default_rng(2)
    cp, r0, r1 = _curves(rng, 8)
    o, d = _rays(rng, 160)
    depth = 3
    res = ob.intersect_curves(o, d, cp, r0, r1, depth=depth)
    # pick a solidly interior hit (|h| < 0.7) so the finite difference
    # doesn't straddle the capsule boundary
    hits = np.nonzero(res["hit"] & (np.abs(res["h"]) < 0.7))[0]
    assert hits.size >= 1
    ri = int(hits[0])
    ci = int(res["curve"][ri])

    def t_of(cp32):
        t, _, _, _ = jb.nearest_hit(
            jnp.asarray(o[ri:ri + 1], jnp.float32),
            jnp.asarray(d[ri:ri + 1], jnp.float32),
            cp32, jnp.asarray(r0, jnp.float32),
            jnp.asarray(r1, jnp.float32), depth=depth)
        return t[0]

    g = np.asarray(jax.grad(t_of)(jnp.asarray(cp, jnp.float32)))
    eps = 1e-5
    for k in (0, 1, 2, 3):
        for ax in range(3):
            cp_p = cp.copy()
            cp_p[ci, k, ax] += eps
            cp_m = cp.copy()
            cp_m[ci, k, ax] -= eps
            tp = ob.intersect_curves(o[ri:ri + 1], d[ri:ri + 1], cp_p,
                                     r0, r1, depth=depth)["t"][0]
            tm = ob.intersect_curves(o[ri:ri + 1], d[ri:ri + 1], cp_m,
                                     r0, r1, depth=depth)["t"][0]
            fd = (tp - tm) / (2 * eps)
            np.testing.assert_allclose(g[ci, k, ax], fd, rtol=5e-2,
                                       atol=5e-4)


def test_depth_convergence_and_tangent_accuracy():
    """Chord t-error ~ O(4^-depth); exact tangent beats chord tangent."""
    rng = np.random.default_rng(3)
    cp, r0, r1 = _curves(rng, 4)
    o, d = _rays(rng, 96, cp=cp)
    ref = ob.intersect_curves(o, d, cp, r0, r1, depth=8)
    m_ref = ref["hit"]

    errs = {}
    tan_chord_err = {}
    for depth in (2, 3, 4):
        res = ob.intersect_curves(o, d, cp, r0, r1, depth=depth)
        m = res["hit"] & m_ref & (res["curve"] == ref["curve"])
        errs[depth] = np.median(np.abs(res["t"][m] - ref["t"][m]))
        # chord tangent = tessellated-segment tangent at the same hit
        n_seg = 1 << depth
        leaf = np.clip((res["u"][m] * n_seg).astype(int), 0, n_seg - 1)
        ts0 = leaf / n_seg
        ts1 = (leaf + 1) / n_seg
        ch = (ob.bezier_point(cp[res["curve"][m]], ts1)
              - ob.bezier_point(cp[res["curve"][m]], ts0))
        ch = ch / np.linalg.norm(ch, axis=-1, keepdims=True)
        exact = ob.bezier_deriv(cp[res["curve"][m]], res["u"][m])
        exact = exact / np.linalg.norm(exact, axis=-1, keepdims=True)
        ref_tan = ob.bezier_deriv(cp[ref["curve"][m]], ref["u"][m])
        ref_tan = ref_tan / np.linalg.norm(ref_tan, axis=-1,
                                           keepdims=True)
        tan_chord_err[depth] = (
            np.median(np.degrees(np.arccos(np.clip(
                np.sum(ch * ref_tan, -1), -1, 1)))),
            np.median(np.degrees(np.arccos(np.clip(
                np.sum(exact * ref_tan, -1), -1, 1)))))

    # t error decreases monotonically with subdivision depth
    assert errs[3] < errs[2], errs
    assert errs[4] < errs[3], errs
    assert errs[4] < errs[2] * 0.7, errs
    # exact-derivative and chord tangents are comparable (within 2x):
    # both carry the O(2^-depth) parameter-recovery error
    for depth in (2, 3, 4):
        chord_deg, exact_deg = tan_chord_err[depth]
        assert exact_deg < chord_deg * 2.0, (depth, tan_chord_err[depth])
        assert exact_deg < 4.0, (depth, exact_deg)
