"""Device-resident conjugate gradient on block-ELL operators.

The reference CG (/root/reference/exp1/quasi_simulation/object.py:931-1019)
reads two scalars back to the host EVERY iteration (`.numpy()[0]` at :942,
:961, :971) and drives the loop in Python. Here the whole solve is a single
`lax.while_loop` with the convergence test on device scalars — zero host
round-trips, jit-fusable into the surrounding Newton step.

Semantics match the reference: relative tolerance on ||r||^2 against the
initial residual, early exit when p.Ap < 1e-10, fixed max iterations;
`init_x` reproduces PerformConjugateGradient_WithInitX (object.py:975-1019).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import ell

EPSILON = 1e-7  # reference object.py:18

# Newton divergence backstop: exit when the residual norm grows this factor
# above its running minimum. A diverging-but-finite solve otherwise keeps
# feeding growing values into the smoother polynomial / Pallas kernels until
# something overflows, and a NaN residual would exit the plain `fn > tol`
# condition looking exactly like convergence. The factor is deliberately
# HUGE: Newton globalized by an ENERGY line search has legitimate residual
# transients of 1e3-1e4x (measured on the kitten: rest residual 3e-4, first
# accepted step 0.77 — then convergence), so the guard must only catch
# trajectories headed for float overflow, not non-monotone residuals.
NEWTON_BLOWUP = 1e6


def newton_cond(tol, max_newton, blowup: float = NEWTON_BLOWUP):
    """Guarded Newton while_loop condition over carries (x, k, fn, fmin).

    Stops on: convergence (fn <= tol), budget (k >= max_newton), non-finite
    residual, or divergence (fn > blowup * running-min). Bodies must append
    ``jnp.minimum(fmin, fn_new)`` as the 4th carry element."""
    def cond(c):
        _, k, fn, fmin = c
        return ((fn > tol) & (k < max_newton) & jnp.isfinite(fn)
                & (fn <= blowup * fmin))
    return cond


def newton_exit_norm(fn, fmin=None, blowup: float = NEWTON_BLOWUP):
    """Map a non-finite final residual to +inf so callers' `fn <= tol`
    convergence checks cannot mistake a NaN exit for success.

    When `fmin` (the running-minimum carry from newton_cond bodies) is
    given, a blowup-guard exit (fn > blowup * fmin) ALSO maps to +inf:
    divergence must not present as a large-but-finite residual — retry
    logic (adaptive_continuation's warm-start triage) would otherwise
    commit the diverged state and grind on it."""
    bad = ~jnp.isfinite(fn)
    if fmin is not None:
        bad = bad | (fn > blowup * fmin)
    return jnp.where(bad, jnp.inf, fn)


def ew_eta(fn_new, fn_old, gamma: float = 0.9, alpha: float = 2.0,
           floor: float = 0.1, cap: float = 0.8):
    """Next Eisenstat-Walker forcing term (choice 2): eta_{k+1} =
    gamma * (||F_{k+1}|| / ||F_k||)^alpha, clamped to [floor, cap].

    Inexact Newton only needs the linear solve as accurate as the nonlinear
    model is trustworthy; a FIXED inner tolerance oversolves far from the
    solution (measured on the kitten latmg: per-Newton PCG iterations
    [31, 22, 5, 5, 17, 18, 31] at fixed eta=0.1 — the capped first steps
    buy Newton progress the next linearization throws away). Callers pass
    eta^2 as pcg_operator's tol (which is relative on ||r||^2).

    The floor matches the fixed default (cg_tol=1e-2 on ||r||^2 == eta=0.1)
    so E-W never solves TIGHTER than the tuned fixed setting — an earlier
    floor of 0.01 made near-convergence steps 100x stricter than baseline
    and gave back half the early-step savings (kitten A/B)."""
    r = jnp.where(fn_old > 0.0, fn_new / jnp.maximum(fn_old, 1e-30), 1.0)
    return jnp.clip(gamma * r ** alpha, floor, cap)


def _normalize_rhs(b):
    """Scale the RHS to unit norm so the solvers' absolute small-denominator
    guards (pap >= eps, ||r||^2 > EPSILON) are scale-free; returns
    (b_normalized, scale_back, inv_scale) with scale_back = 0 for an all-zero
    RHS (the solution is exactly zero and the solve must be a no-op)."""
    rr_b = ell.vdot(b, b)
    ok_b = rr_b > 0.0
    inv_scale = jnp.sqrt(jnp.where(ok_b, rr_b, 1.0))
    return b / inv_scale, jnp.where(ok_b, inv_scale, 0.0), inv_scale


def cg_operator(matvec, b, iterations: int = 10, tol: float = 1e-5, x0=None):
    """CG on an abstract linear operator (used matrix-free: matvec is the
    jax.linearize'd Hessian-vector product of the force — the explicit matrix
    never exists; see SURVEY.md section 2.2 'matrix-free Hessian-vector
    product').

    Runs on a normalized RHS (see pcg_operator) so the absolute small-
    denominator guards are scale-free."""
    b, scale_back, inv_scale = _normalize_rhs(b)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0 / inv_scale
        r = b - matvec(x)

    rs0 = ell.vdot(r, r)

    def cond(carry):
        x, r, p, rs, k, alive = carry
        return (alive & (k <= iterations) & (rs > tol * rs0)
                & (rs0 > EPSILON) & jnp.isfinite(rs))

    def body(carry):
        x, r, p, rs, k, alive = carry
        ap = matvec(p)
        pap = ell.vdot(p, ap)
        ok = pap >= 1e-10
        alpha = jnp.where(ok, rs / jnp.where(ok, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = ell.vdot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, k + 1, alive & ok)

    carry = (x, r, r, rs0, jnp.int32(1), jnp.bool_(True))
    x, r, p, rs, k, alive = jax.lax.while_loop(cond, body, carry)
    return x * scale_back


def pcg_operator(matvec, minv, b, iterations: int = 50, tol: float = 1e-5,
                 return_iters: bool = False, flexible: bool = False):
    """Preconditioned CG on an abstract operator.

    minv: callable applying the preconditioner (e.g. a batched 3x3 block-
    diagonal solve). Tolerance is relative on ||r||^2 like the reference CG.

    flexible=True uses the Polak-Ribiere beta (z_new . (r_new - r_old)) —
    required when minv is non-stationary, e.g. a V-cycle whose coarsest level
    is itself an inner CG solve (LatticeMG coarse_cg).

    The solve runs on a normalized RHS b/||b|| (result scaled back): the
    small-denominator guards (pap >= 1e-12, ||r||^2 > EPSILON) are absolute,
    and on a small-magnitude system — e.g. the multigrid coarsest-level
    solve of an almost-converged Newton step, where ||b||^2 ~ 1e-7 — they
    otherwise shut the solver off entirely (the r3 kitten-divergence bug:
    coarse_cg=8 and =64 returned bit-identical garbage because the inner CG
    never ran)."""
    b, scale_back, _ = _normalize_rhs(b)
    x = jnp.zeros_like(b)
    r = b
    z = minv(r)
    p = z
    rz = ell.vdot(r, z)
    rr0 = ell.vdot(r, r)

    def cond(carry):
        x, r, p, z, rz, k, alive = carry
        rr = ell.vdot(r, r)
        return (alive & (k <= iterations) & (rr > tol * rr0)
                & (rr0 > EPSILON) & jnp.isfinite(rr))

    def body(carry):
        x, r, p, z, rz, k, alive = carry
        ap = matvec(p)
        pap = ell.vdot(p, ap)
        ok = pap >= 1e-12
        alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
        x = x + alpha * p
        r_new = r - alpha * ap
        z_new = minv(r_new)
        rz_new = ell.vdot(r_new, z_new)
        if flexible:
            # beta = z_new.(r_new - r_old)/rz with r_new - r_old = -alpha*Ap
            beta = -alpha * ell.vdot(z_new, ap) / rz
        else:
            beta = rz_new / rz
        p = z_new + beta * p
        return (x, r_new, p, z_new, rz_new, k + 1, alive & ok)

    carry = (x, r, p, z, rz, jnp.int32(1), jnp.bool_(True))
    out = jax.lax.while_loop(cond, body, carry)
    x = out[0] * scale_back
    if return_iters:
        return x, out[5]
    return x


def cg(op, values, b, iterations: int = 10, tol: float = 1e-5, x0=None):
    """Solve A x = b. Returns x after at most `iterations` steps.

    Normalized RHS (see pcg_operator) keeps the absolute guards scale-free."""
    full_vals = values * op.mask[..., None, None]

    def matvec(v):
        return ell.spmv(full_vals, op.nbr, op.mask, v)

    b, scale_back, inv_scale = _normalize_rhs(b)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0 / inv_scale
        r = b - matvec(x)

    rs0 = ell.vdot(r, r)

    def cond(carry):
        x, r, p, rs, k, alive = carry
        return (alive & (k <= iterations) & (rs > tol * rs0)
                & (rs0 > EPSILON) & jnp.isfinite(rs))

    def body(carry):
        x, r, p, rs, k, alive = carry
        p = jnp.where(k > 1, p, r)  # first iteration: p = r
        ap = matvec(p)
        pap = ell.vdot(p, ap)
        ok = pap >= 1e-10
        alpha = jnp.where(ok, rs / jnp.where(ok, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = ell.vdot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, k + 1, alive & ok)

    carry = (x, r, r, rs0, jnp.int32(1), jnp.bool_(True))
    x, r, p, rs, k, alive = jax.lax.while_loop(cond, body, carry)
    return x * scale_back
