"""Quasi-static solvers: Newton, Newton-Multigrid, FAS v0-v3, Adam, GD.

Functional TPU redesign of the reference solver methods on ``Object``
(/root/reference/exp1/quasi_simulation/object.py:1067-1511). Every solver is a
pure jitted step function over a params pytree; multi-step runs are a single
`lax.scan` dispatch collecting (energy, ||f||_inf) series on device — the
reference instead synchronizes and reads scalars back every few steps
(object.py:1238-1248).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import elastic, ell, transfer
from ..solvers import smoothers, cg as cgmod
from .scene import Scene


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def total_force(scene: Scene, params, x):
    """f = -grad E: elastic + gravity + pin springs (canonical order).

    Mirrors the gradient launches in NewtonMultigrid (object.py:1234-1236).
    """
    p0 = params["levels"][0]
    mat = scene.material
    f = elastic.force(x, p0["hexes"], p0["det"], p0["g"],
                      mat.lame_mu, mat.lame_la, x.shape[0])
    f = f + elastic.gravity_force(p0["mass"], mat.gravity, x.shape[0], x.dtype)
    f = f + elastic.pin_force(x, p0["pin_mask"], p0["pin_pos"], mat.control_mag)
    return f


def total_energy(scene: Scene, params, x):
    p0 = params["levels"][0]
    mat = scene.material
    e = elastic.energy(x, p0["hexes"], p0["det"], p0["g"], mat.lame_mu, mat.lame_la)
    e = e + elastic.gravity_energy(x, p0["mass"], mat.gravity)
    e = e + elastic.pin_energy(x, p0["pin_mask"], p0["pin_pos"], mat.control_mag)
    return e


def assemble_elastic(scene: Scene, params, li: int, x):
    """Elastic Hessian of level li via the gather-based (scatter-free)
    assembly (ops.elastic.assemble_hessian_ell_gather)."""
    p = params["levels"][li]
    lvl = scene.level(li)
    mat = scene.material
    return elastic.assemble_hessian_ell_gather(
        x, p["hexes"], p["det"], p["g"], mat.lame_mu, mat.lame_la,
        p["contrib_idx"], p["contrib_mask"], lvl.n_verts, lvl.K)


def assemble_fine(scene: Scene, params, x, include_pins=True):
    """Fine-level Hessian in block-ELL, pin springs on the diagonal.

    The pin diagonal mirrors MF_value_fixed (object.py:791-793); elastic blocks
    are summed on top (object.py:1249).
    """
    p0 = params["levels"][0]
    mat = scene.material
    vals = assemble_elastic(scene, params, 0, x)
    if include_pins:
        pin_diag = (mat.control_mag * p0["pin_mask"])[:, None, None] * jnp.eye(3, dtype=x.dtype)
        vals = ell.add_to_diag(vals, p0["diag_slot"], pin_diag)
    return vals


def assemble_coarse_rediscretized(scene: Scene, params, li: int, xc,
                                  with_fix_diag: bool):
    """Re-discretized coarse Hessian at restricted positions (FAS path,
    object.py:1344,1499-1501)."""
    p = params["levels"][li]
    mat = scene.material
    vals = assemble_elastic(scene, params, li, xc)
    if with_fix_diag and li == 1:
        fd = params["transfers"][0]["fix_diag"]
        vals = ell.add_to_diag(vals, p["diag_slot"],
                               fd[:, None, None] * jnp.eye(3, dtype=xc.dtype))
    return vals


def galerkin_chain(scene: Scene, params, values0, spd: bool = True):
    """[A_0, A_1, ...]: coarse operators by Galerkin products + SPD projection
    (object.py:1258-1264)."""
    out = [values0]
    for li in range(1, scene.n_levels):
        t = params["transfers"][li - 1]
        lvl = scene.level(li)
        vc = transfer.galerkin(out[-1], t["g_src"], t["g_dst"], t["g_w"],
                               lvl.n_verts, lvl.K)
        if spd:
            vc = ell.spd_project(vc, scene.material.spd_eps)
        out.append(vc)
    return out


# ---------------------------------------------------------------------------
# V-cycle
# ---------------------------------------------------------------------------

def vcycle(scene: Scene, params, values_list, b, gs_iterations: int = 3,
           level: int = 0):
    """Recursive V-cycle (reference VCycle/downSample/upSample/finish,
    object.py:1021-1040, 1216-1226), functionally: returns the correction dx."""
    op = scene.make_op(level, params)
    vals = values_list[level]
    dx = smoothers.gauss_seidel(op, vals, b, iterations=gs_iterations)
    if level == scene.n_levels - 1:
        return dx
    full = vals * op.mask[..., None, None]
    r = b - ell.spmv(full, op.nbr, op.mask, dx)
    t = params["transfers"][level]
    bc = transfer.restrict(t["r_idx"], t["r_w"], r)          # Ut_hat
    dxc = vcycle(scene, params, values_list, bc, gs_iterations, level + 1)
    x_acc = dx + transfer.prolong(t["p_idx"], t["p_w"], dxc)  # Us_hat
    b2 = b - ell.spmv(full, op.nbr, op.mask, x_acc)
    dx2 = smoothers.gauss_seidel(op, vals, b2, iterations=gs_iterations)
    return x_acc + dx2


# ---------------------------------------------------------------------------
# Step functions
# ---------------------------------------------------------------------------

def newton_step(scene: Scene, params, x):
    """Single-level Newton with 5 CG iterations (reference Newton,
    object.py:1127-1160)."""
    f = total_force(scene, params, x)
    vals = assemble_fine(scene, params, x)
    op = scene.make_op(0, params)
    dx = cgmod.cg(op, vals, f, iterations=scene.solver.cg_iterations,
                  tol=scene.solver.cg_tol)
    return x + dx, f


def newton_multigrid_step(scene: Scene, params, x):
    """Newton step preconditioned by one V-cycle on Galerkin coarse operators
    (reference NewtonMultigrid, object.py:1230-1296)."""
    f = total_force(scene, params, x)
    values0 = assemble_fine(scene, params, x)
    values = galerkin_chain(scene, params, values0)
    dx = vcycle(scene, params, values, f,
                gs_iterations=scene.solver.gs_iterations)
    return x + dx, f


def fas_step(scene: Scene, params, x, variant: int = 3):
    """One FAS two-level cycle (reference FASv0..v3, object.py:1308-1511).

    v0: elastic only, SPD on, coarse CG-with-init + tau correction.
    v1: elastic only, SPD on, coarse Jacobi on restricted-position Hessian.
    v2: full forces, no SPD, no coarse pin treatment.
    v3: full forces, no SPD, coarse pin diagonal via interpolated weights.
    """
    if scene.n_levels < 2:
        raise ValueError("FAS needs a >=2-level hierarchy; this scene has "
                         f"{scene.n_levels} (increase SolverConfig.n_levels "
                         "or use a larger mesh).")
    elastic_only = variant in (0, 1)
    use_spd = variant in (0, 1)
    p0 = params["levels"][0]
    mat = scene.material

    def forces(xx):
        if elastic_only:
            return elastic.force(xx, p0["hexes"], p0["det"], p0["g"],
                                 mat.lame_mu, mat.lame_la, xx.shape[0])
        return total_force(scene, params, xx)

    vals0 = assemble_fine(scene, params, x, include_pins=not elastic_only)
    if use_spd:
        vals0 = ell.spd_project(vals0, mat.spd_eps)
    b = forces(x)
    op0 = scene.make_op(0, params)
    dx = smoothers.gauss_seidel(op0, vals0, b, iterations=1)
    x = x + dx

    t = params["transfers"][0]
    xc = transfer.restrict(t["r_idx"], t["r_w_norm"], x)      # Ut (normalized)
    r = forces(x)                                             # fresh gradient
    bc = transfer.restrict(t["r_idx"], t["r_w"], r)           # Ut_hat

    valsc = assemble_coarse_rediscretized(
        scene, params, 1, xc, with_fix_diag=(variant == 3))
    if use_spd:
        valsc = ell.spd_project(valsc, mat.spd_eps)
    op1 = scene.make_op(1, params)

    if variant == 0:
        # tau correction: solve A_c e = bc + A_c xc starting from xc, take the
        # error e - xc up (object.py:1349-1363).
        fullc = valsc * op1.mask[..., None, None]
        bc_tau = bc + ell.spmv(fullc, op1.nbr, op1.mask, xc)
        sol = cgmod.cg(op1, valsc, bc_tau,
                       iterations=scene.solver.coarse_cg_iterations,
                       tol=scene.solver.cg_tol, x0=xc)
        e = sol - xc
        x = x + transfer.prolong(t["p_idx"], t["p_w"], e)     # Us_noOrder_hat
    else:
        dxc = smoothers.jacobi(op1, valsc, bc,
                               iterations=scene.solver.jacobi_iterations)
        x = x + transfer.prolong(t["p_idx"], t["p_w"], dxc)   # Us_hat
    return x, r


# ---------------------------------------------------------------------------
# First-order baselines (reference Adam / gradientDescent, object.py:1067-1125)
# ---------------------------------------------------------------------------

def adam_run(scene: Scene, params, x, iterations=1000, lr=1e-3,
             beta1=0.9, beta2=0.999, eps=1e-8):
    def body(carry, step):
        x, m, v = carry
        gneg = -total_force(scene, params, x)   # gradient
        m = beta1 * m + (1 - beta1) * gneg
        v = beta2 * v + (1 - beta2) * gneg * gneg
        mh = m / (1 - beta1 ** (step + 1))
        vh = v / (1 - beta2 ** (step + 1))
        x = x - lr * mh / (jnp.sqrt(vh) + eps)
        fi = ell.inf_norm(gneg)
        return (x, m, v), fi

    init = (x, jnp.zeros_like(x), jnp.zeros_like(x))
    (x, _, _), series = jax.lax.scan(body, init, jnp.arange(iterations, dtype=jnp.float32))
    return x, series


def gradient_descent_run(scene: Scene, params, x, iterations=100, lr=1e-3,
                         backtracks=20):
    """GD with backtracking line search on total energy (object.py:1097-1125)."""
    def body(x, _):
        f = total_force(scene, params, x)
        e0 = total_energy(scene, params, x)

        def ls_body(carry):
            alpha, _, i = carry
            return (alpha * 0.2, total_energy(scene, params, x + alpha * 0.2 * f), i + 1)

        def ls_cond(carry):
            alpha, e, i = carry
            return (e >= e0) & (i < backtracks)

        alpha, e, _ = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.float32(lr), total_energy(scene, params, x + lr * f), jnp.int32(0)))
        x = jnp.where(e < e0, 1.0, 0.0) * (x + alpha * f) + jnp.where(e < e0, 0.0, 1.0) * x
        return x, ell.inf_norm(f)

    return jax.lax.scan(body, x, None, length=iterations)


# ---------------------------------------------------------------------------
# High-level driver
# ---------------------------------------------------------------------------

class QuasiStaticSim:
    """User-facing equivalent of the reference `Object` solver API."""

    def __init__(self, scene: Scene):
        self.scene = scene
        self.x = scene.x0
        self._jit_cache = {}

    def _runner(self, kind: str, **kw):
        key = (kind, tuple(sorted(kw.items())))
        if key in self._jit_cache:
            return self._jit_cache[key]
        scene = self.scene

        if kind == "newton":
            step = lambda p, x: newton_step(scene, p, x)
        elif kind == "newton_mg":
            step = lambda p, x: newton_multigrid_step(scene, p, x)
        elif kind == "fas":
            v = kw["variant"]
            step = lambda p, x: fas_step(scene, p, x, variant=v)
        else:
            raise ValueError(kind)

        @functools.partial(jax.jit, static_argnums=2)
        def run(p, x, n):
            def body(x, _):
                x, f = step(p, x)
                metrics = (total_energy(scene, p, x), ell.inf_norm(f))
                return x, metrics
            return jax.lax.scan(body, x, None, length=n)

        self._jit_cache[key] = run
        return run

    def newton(self, iterations=100):
        run = self._runner("newton")
        self.x, (e, fn) = run(self.scene.params, self.x, iterations)
        return e, fn

    def newton_multigrid(self, iterations=100):
        run = self._runner("newton_mg")
        self.x, (e, fn) = run(self.scene.params, self.x, iterations)
        return e, fn

    def fas(self, iterations=100, variant=3):
        run = self._runner("fas", variant=variant)
        self.x, (e, fn) = run(self.scene.params, self.x, iterations)
        return e, fn

    def adam(self, iterations=1000, lr=1e-3):
        f = jax.jit(lambda p, x: adam_run(self.scene, p, x, iterations, lr))
        self.x, series = f(self.scene.params, self.x)
        return series

    def gradient_descent(self, iterations=100, lr=1e-3):
        f = jax.jit(lambda p, x: gradient_descent_run(self.scene, p, x, iterations, lr))
        self.x, series = f(self.scene.params, self.x)
        return series

    def force_inf_norm(self):
        f = total_force(self.scene, self.scene.params, self.x)
        return float(ell.inf_norm(f))
