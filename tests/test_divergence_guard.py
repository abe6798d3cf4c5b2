"""NaN/divergence backstops in the solver loops (VERDICT r2 weak #1).

Every Newton while_loop must exit — and report non-convergence, never
silent success — when the residual goes non-finite or grows far above its
running minimum. Without the guard a NaN residual exits `fn > tol` looking
exactly like convergence, and a diverging-but-finite solve keeps feeding
growing values into the smoother polynomial / Pallas kernels (the suspected
kitten+latmg TPU worker-fault trigger, CLAUDE.md).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.solvers import cg as cgmod
from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol


def test_newton_cond_logic():
    cond = cgmod.newton_cond(tol=1e-4, max_newton=10, blowup=1e3)

    def c(k, fn, fmin):
        return bool(cond((None, jnp.int32(k), jnp.float32(fn),
                          jnp.float32(fmin))))

    assert c(0, 1.0, 1.0)                 # healthy: keep iterating
    assert not c(0, 1e-5, 1e-5)           # converged
    assert not c(10, 1.0, 1.0)            # budget exhausted
    assert not c(0, jnp.nan, 1.0)         # NaN residual: exit
    assert not c(0, jnp.inf, 1.0)         # inf residual: exit
    assert not c(0, 2e6, 1.0)             # grew 2e6 x over running min: exit
    assert c(0, 999.0, 1.0)               # transients stay allowed: continue


def test_newton_exit_norm_flags_nonfinite():
    assert np.isinf(float(cgmod.newton_exit_norm(jnp.float32(jnp.nan))))
    assert np.isinf(float(cgmod.newton_exit_norm(jnp.float32(jnp.inf))))
    assert float(cgmod.newton_exit_norm(jnp.float32(0.5))) == 0.5


def test_newton_exit_norm_flags_blowup_exit():
    """With fmin given, a blowup-guard exit must report +inf: retry logic
    (adaptive_continuation warm-start) and fn<=tol checks must never see a
    diverged solve as a large-but-recoverable finite residual."""
    fn = jnp.float32(2e6)
    fmin = jnp.float32(1.0)
    assert np.isinf(float(cgmod.newton_exit_norm(fn, fmin)))
    # healthy exits pass through untouched (incl. line-search transients)
    assert float(cgmod.newton_exit_norm(jnp.float32(999.0), fmin)) == 999.0
    assert float(cgmod.newton_exit_norm(jnp.float32(1e-5), fmin)) \
        == np.float32(1e-5)


def test_nan_start_exits_immediately_not_as_converged():
    m = meshlib.beam(3, 3, 8, dx=0.05)
    sc = LatticeScene(m)
    xbad = sc.x0.at[0, 0, 0, 0].set(jnp.nan)
    x, k, fn = jax.jit(
        lambda x: quasistatic_to_tol(sc, x, max_newton=10,
                                     use_pallas=False))(xbad)
    assert int(k) == 0
    # reported as +inf, NOT as a tolerance-satisfying NaN
    assert np.isinf(float(fn))


def test_guard_does_not_disturb_healthy_solve():
    m = meshlib.beam(3, 3, 8, dx=0.05)
    sc = LatticeScene(m)
    x, k, fn = jax.jit(
        lambda x: quasistatic_to_tol(sc, x, max_newton=50,
                                     use_pallas=False))(sc.x0)
    assert float(fn) <= 1e-4
    assert int(k) < 50


def test_cg_exits_on_nonfinite_residual():
    # operator that injects NaN on the first matvec: PCG must not spin its
    # full iteration budget on garbage
    n = 16

    def matvec(p):
        return p * jnp.nan

    b = jnp.ones((n,), jnp.float32)
    x, iters = cgmod.pcg_operator(matvec, lambda r: r, b, iterations=500,
                                  tol=1e-12, return_iters=True)
    assert int(iters) <= 3
