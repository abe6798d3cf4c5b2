"""Adaptive gravity continuation (sim.lattice.adaptive_continuation).

The driver must: try the full load first (no cost on easy problems),
halve the increment after a rejected stage, re-double after fast stages,
total the Newton spend of every stage including rejected ones, and report
+inf when continuation stalls before gs=1.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.sim.lattice import (LatticeScene,
                                            adaptive_continuation,
                                            quasistatic_to_tol)

TOL = 1e-4


def _fake_solver(max_jump):
    """Stage solver that 'converges' (k=2) iff the load increment from the
    carried state is <= max_jump. State x is a scalar tracking gs_done."""
    def solve_at(x, gs):
        ok = (gs - x) <= max_jump + 1e-6
        xn = jnp.where(ok, gs, x)
        fn = jnp.where(ok, jnp.asarray(TOL / 2, jnp.float32),
                       jnp.asarray(jnp.inf, jnp.float32))
        return xn, jnp.int32(2), fn
    return solve_at


def test_easy_problem_pays_one_stage():
    x, k, fn = adaptive_continuation(_fake_solver(1.0),
                                     jnp.asarray(0.0, jnp.float32),
                                     TOL, max_newton_stage=20)
    assert float(x) == 1.0
    assert int(k) == 2          # exactly one stage, no continuation tax
    assert float(fn) <= TOL


def test_halving_then_redoubling():
    # max_jump 0.3: gs=1 rejected, 0.5 rejected, 0.25 ok, then the fast-
    # stage doubling retries 0.5 jumps (rejected) before finishing in 0.25s
    x, k, fn = adaptive_continuation(_fake_solver(0.3),
                                     jnp.asarray(0.0, jnp.float32),
                                     TOL, max_newton_stage=20)
    assert float(x) == 1.0
    assert float(fn) <= TOL
    # 4 accepted stages of 0.25 + a handful of rejected probes
    assert 8 <= int(k) <= 30


def test_warm_start_retries_same_load():
    # A stage solver that steadily grinds the residual down by 4x per call
    # but cannot reach tol inside one stage budget: the driver must retry
    # the SAME load warm-started from the failed state (not halve the
    # increment away the progress) — the measured failure mode on the 37k
    # cantilever, whose first full-load attempt hit fn=9.9e-4 at the
    # 100-iteration budget and was thrown away by the pre-fix driver.
    def grind(x, gs):
        fn = jnp.maximum(x / 4.0, jnp.asarray(TOL / 2, jnp.float32))
        return fn, jnp.int32(5), fn

    x, k, fn, trace = adaptive_continuation(
        grind, jnp.asarray(1.0, jnp.float32), TOL, max_newton_stage=20,
        return_trace=True)
    assert float(fn) <= TOL
    trace = np.asarray(trace)
    rows = trace[~np.isnan(trace[:, 0])]
    # every attempt stayed at the full load; no halving spiral
    np.testing.assert_allclose(rows[:, 0], 1.0)
    assert int(k) == 5 * len(rows)


def test_stall_reports_inf():
    def never(x, gs):
        return x, jnp.int32(3), jnp.asarray(jnp.inf, jnp.float32)

    x, k, fn = adaptive_continuation(never, jnp.asarray(0.0, jnp.float32),
                                     TOL, max_newton_stage=20)
    assert np.isinf(float(fn))
    assert float(x) == 0.0      # original state preserved


def test_auto_matches_single_shot_on_easy_lattice():
    m = meshlib.beam(3, 3, 10, dx=0.05)
    sc = LatticeScene(m)
    x1, k1, f1 = jax.jit(lambda x: quasistatic_to_tol(
        sc, x, use_pallas=False))(sc.x0)
    x2, k2, f2 = jax.jit(lambda x: quasistatic_to_tol(
        sc, x, use_pallas=False, load_steps="auto"))(sc.x0)
    assert int(k1) == int(k2)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)
