"""Dynamic implicit-Euler FEM simulation (the reference's interactive sim).

TPU-native redesign of exp1/simulation (/root/reference/exp1/simulation/
object.py:1286-1329 `Object.render` + hexagon.py / cublas.py dynamic kernels):

per frame:
  predictor   v *= damping; x += v dt           (Basic_Update_Kernel)
  assemble    H = pin/drag diag + m/h^2 I + elastic Hessian
              f = elastic + gravity + pins + drag + inertia
  solve       H dx = f  (5 CG iterations in the reference, object.py:1321)
  update      x += dx;  v = (x - x_old)/dt      (updateVelocity)

Here the whole frame is one jitted function; `step_to_tol` additionally wraps
the Newton solve in a device-resident while_loop until ||f||_inf <= tol — the
driver's benchmark metric (BASELINE.md: ms/timestep to ||f||inf <= 1e-4).

Drag constraints (mouse picking, reference Control_Kernel/Fixed_Update_Kernel,
exp1/simulation/cublas.py:274-287) enter as a (mask, target) pair in the state;
see sim/picking.py for the host-side ray selection that produces them.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DynamicsConfig
from ..ops import elastic, ell, transfer
from ..solvers import cg as cgmod, smoothers
from .scene import Scene
from . import quasistatic as qs


class DynState(NamedTuple):
    x: jnp.ndarray          # (N, 3) positions (canonical order)
    v: jnp.ndarray          # (N, 3) velocities
    drag_mask: jnp.ndarray  # (N,)  1.0 where temporarily grabbed
    drag_pos: jnp.ndarray   # (N, 3) grab targets


def init_state(scene: Scene) -> DynState:
    x0 = scene.x0
    return DynState(x=x0, v=jnp.zeros_like(x0),
                    drag_mask=jnp.zeros(x0.shape[0], dtype=x0.dtype),
                    drag_pos=x0)


def _dyn_force(scene: Scene, params, st: DynState, x, x_tilde, inv_dt,
               gravity_scale=1.0):
    """Full implicit-Euler residual force at x (canonical order)."""
    p0 = params["levels"][0]
    mat = scene.material
    # scatter-free assembly (exact parity with elastic.force, tested)
    f = elastic.force_gather(x, p0["hexes"], p0["det"], p0["g"],
                             mat.lame_mu, mat.lame_la,
                             p0["vc_idx"], p0["vc_mask"], x.shape[0])
    f = f + gravity_scale * elastic.gravity_force(
        p0["mass"], mat.gravity, x.shape[0], x.dtype)
    f = f + elastic.pin_force(x, p0["pin_mask"], p0["pin_pos"], mat.control_mag)
    f = f + mat.control_mag * st.drag_mask[:, None] * (st.drag_pos - x)
    f = f + elastic.inertia_force(x, x_tilde, p0["mass"], inv_dt)
    return f


def _dyn_hessian(scene: Scene, params, st: DynState, x, inv_dt):
    """H = elastic + (pin|drag) control diag + m/h^2 diag
    (reference Hessian_Diag_Kernel + Hessian_Mass_Kernel + elastic)."""
    p0 = params["levels"][0]
    mat = scene.material
    vals = qs.assemble_elastic(scene, params, 0, x)
    ctrl = mat.control_mag * jnp.maximum(p0["pin_mask"], st.drag_mask)
    diag = (ctrl + p0["mass"] * inv_dt * inv_dt)[:, None, None] * jnp.eye(3, dtype=x.dtype)
    return ell.add_to_diag(vals, p0["diag_slot"], diag)


def fas_dynamic_cycle(scene: Scene, params, st: DynState, x, x_tilde, inv_dt,
                      gravity_scale=1.0):
    """One two-level FAS cycle on the full implicit-Euler residual.

    The reference runs FAS inside the dynamic stepper too
    (/root/reference/exp1/simulation/object.py:1175-1240: fine GS(1), restrict
    solution Ut_noOrder + fresh residual Ut_hat, re-discretized coarse Hessian,
    tau-corrected CG-with-init, prolongate the error Us_noOrder_hat). Here the
    residual additionally carries the inertia/drag terms so the cycle solves
    the actual dynamic step, and the coarse operator gets the restricted
    control+mass diagonal (the reference's compute_fix_hessian treatment,
    cublas.py:234-243, extended to the mass term).
    """
    mat = scene.material
    p0 = params["levels"][0]
    p1 = params["levels"][1]
    t = params["transfers"][0]
    eye = jnp.eye(3, dtype=x.dtype)

    def resid(xx):
        return _dyn_force(scene, params, st, xx, x_tilde, inv_dt,
                          gravity_scale=gravity_scale)

    # fine: dynamic Hessian + one colored-GS sweep
    vals0 = _dyn_hessian(scene, params, st, x, inv_dt)
    op0 = scene.make_op(0, params)
    dx = smoothers.gauss_seidel(op0, vals0, resid(x), iterations=1)
    x = x + dx

    # restrict solution (normalized weights) and fresh residual (hat weights)
    xc = transfer.restrict(t["r_idx"], t["r_w_norm"], x)
    r = resid(x)
    bc = transfer.restrict(t["r_idx"], t["r_w"], r)

    # coarse: re-discretized elastic + conservatively restricted ctrl/mass diag
    vals_c = qs.assemble_elastic(scene, params, 1, xc)
    ctrl_f = (mat.control_mag * jnp.maximum(p0["pin_mask"], st.drag_mask)
              + p0["mass"] * inv_dt * inv_dt)
    ctrl_c = transfer.restrict(t["r_idx"], t["r_w"], ctrl_f[:, None])[:, 0]
    vals_c = ell.add_to_diag(vals_c, p1["diag_slot"],
                             ctrl_c[:, None, None] * eye)
    op1 = scene.make_op(1, params)

    # tau-corrected coarse solve seeded at xc: solve A_c u = bc + A_c xc,
    # prolongate the error u - xc (reference CG_WithInitX + z_axpby pattern)
    fullc = vals_c * op1.mask[..., None, None]
    bc_tau = bc + ell.spmv(fullc, op1.nbr, op1.mask, xc)
    sol = cgmod.cg(op1, vals_c, bc_tau,
                   iterations=scene.solver.coarse_cg_iterations,
                   tol=scene.solver.cg_tol, x0=xc)
    x = x + transfer.prolong(t["p_idx"], t["p_w"], sol - xc)
    return x, r


def step(scene: Scene, params, st: DynState,
         dyn: DynamicsConfig = DynamicsConfig()) -> DynState:
    """One frame, reference-parity: predictor + single Newton(5 CG) solve."""
    inv_dt = 1.0 / dyn.dt
    x_old = st.x
    v = st.v * dyn.damping
    x = st.x + v * dyn.dt
    x_tilde = x

    vals = _dyn_hessian(scene, params, st, x, inv_dt)
    f = _dyn_force(scene, params, st, x, x_tilde, inv_dt)
    op = scene.make_op(0, params)
    dx = cgmod.cg(op, vals, f, iterations=scene.solver.cg_iterations,
                  tol=scene.solver.cg_tol)
    x = x + dx
    v = (x - x_old) * inv_dt
    return st._replace(x=x, v=v)


def step_to_tol(scene: Scene, params, st: DynState,
                dyn: DynamicsConfig = DynamicsConfig(),
                tol: float = 1e-4, max_newton: int = 20,
                use_multigrid: bool = True, matrix_free: bool = False,
                use_fas: bool = False, gravity_scale=1.0,
                dt=None, damping=None, x_init=None):
    """One frame with Newton iterations until ||f||_inf <= tol (device loop).

    This is the benchmark path (BASELINE.md metric). Returns (state, n_newton,
    final ||f||_inf).

    matrix_free=True solves each Newton system with CG on the *linearized
    force* (jax.linearize Hessian-vector products) — the Hessian is never
    assembled; this is the SURVEY.md section 2.2 matrix-free design and the
    fastest single-chip path.

    use_fas=True replaces each Newton linear solve with one nonlinear
    two-level FAS cycle on the dynamic residual (fas_dynamic_cycle; reference
    exp1/simulation/object.py:1175). Needs a >=2-level scene.

    `dt`/`damping` override the config values and may be TRACED scalars —
    nothing on this path bakes dt into static tables, so frame_adaptive can
    substep at dt/2^h inside one compiled program.

    `x_init` (optional) seeds the Newton iteration at a caller-provided
    state instead of the inertia predictor x_tilde — e.g. a learned-solver
    prediction (exp3 warm start; the inertia anchor stays the predictor, so
    the solved PROBLEM is identical and only the starting point changes).
    """
    dt = dyn.dt if dt is None else dt
    damping = dyn.damping if damping is None else damping
    inv_dt = 1.0 / dt
    x_old = st.x
    v = st.v * damping
    x = st.x + v * dt
    x_tilde = x
    if x_init is not None:
        x = x_init
    op = scene.make_op(0, params)

    def resid(xx):
        return _dyn_force(scene, params, st, xx, x_tilde, inv_dt,
                          gravity_scale=gravity_scale)

    p0 = params["levels"][0]
    mat = scene.material

    def body(carry):
        xx, k, _, fmin = carry
        if use_fas:
            xx, f = fas_dynamic_cycle(scene, params, st, xx, x_tilde, inv_dt,
                                      gravity_scale=gravity_scale)
            fn = ell.inf_norm(resid(xx))
            return (xx, k + 1, fn, jnp.minimum(fmin, fn))
        f = resid(xx)
        if matrix_free:
            # closed-form HVP + scatter-free gather assembly
            # (ops.elastic.hvp_gather): replaces jax.linearize through the
            # force — the linearized force re-traces the gather/scatter
            # pair, and the TPU scatter with duplicate indices serializes
            # (VERDICT r3 missing #4). The non-elastic residual terms are
            # linear with constant diagonal, added analytically below.
            ctrl = (mat.control_mag * jnp.maximum(p0["pin_mask"], st.drag_mask)
                    + p0["mass"] * inv_dt * inv_dt)

            def matvec(p):
                hp = elastic.hvp_gather(
                    xx, p, p0["hexes"], p0["det"], p0["g"],
                    mat.lame_mu, mat.lame_la,
                    p0["vc_idx"], p0["vc_mask"], xx.shape[0])
                return hp + ctrl[:, None] * p

            # block-Jacobi preconditioner: elastic diag + control + mass
            diag = elastic.hessian_diag_gather(
                xx, p0["hexes"], p0["det"], p0["g"],
                mat.lame_mu, mat.lame_la,
                p0["vc_idx"], p0["vc_mask"], xx.shape[0])
            diag = diag + ctrl[:, None, None] * jnp.eye(3, dtype=xx.dtype)
            minv = lambda r: ell.solve3x3(diag, r)
            dx = cgmod.pcg_operator(matvec, minv, f,
                                    iterations=scene.solver.pcg_iterations,
                                    tol=scene.solver.pcg_tol)
        elif use_multigrid:
            # MG-preconditioned CG: one V-cycle (symmetric GS smoothing, so
            # the preconditioner is SPD) as M^{-1} inside PCG — O(1)-ish
            # iteration counts independent of mesh diameter.
            vals = _dyn_hessian(scene, params, st, xx, inv_dt)
            values = qs.galerkin_chain(scene, params, vals)
            full0 = values[0] * op.mask[..., None, None]
            matvec = lambda p: ell.spmv(full0, op.nbr, op.mask, p)
            minv = lambda r: qs.vcycle(scene, params, values, r,
                                       gs_iterations=1)
            dx = cgmod.pcg_operator(matvec, minv, f,
                                    iterations=scene.solver.cg_iterations * 2,
                                    tol=scene.solver.pcg_tol)
        else:
            vals = _dyn_hessian(scene, params, st, xx, inv_dt)
            dx = cgmod.cg(op, vals, f, iterations=scene.solver.cg_iterations,
                          tol=scene.solver.cg_tol)
        xx = xx + dx
        fn = ell.inf_norm(resid(xx))
        return (xx, k + 1, fn, jnp.minimum(fmin, fn))

    fn0 = ell.inf_norm(resid(x))
    x, k, fn, fmin = jax.lax.while_loop(
        cgmod.newton_cond(tol, max_newton), body,
        (x, jnp.int32(0), fn0, fn0))
    v = (x - x_old) * inv_dt
    return st._replace(x=x, v=v), k, cgmod.newton_exit_norm(fn, fmin)


def frame_adaptive(scene: Scene, params, st: DynState,
                   dyn: DynamicsConfig = DynamicsConfig(),
                   tol: float = 1e-4, max_newton: int = 20,
                   use_multigrid: bool = True, matrix_free: bool = False,
                   use_fas: bool = False, max_halvings: int = 3,
                   gravity_scale=1.0):
    """step_to_tol with ADAPTIVE TIME SUBSTEPPING on the unstructured path
    (see sim.lattice.frame_adaptive for the protocol and rationale): a frame
    whose Newton budget exits above tol — or diverges, which
    newton_exit_norm maps to +inf — is redone from the original state with
    2^h substeps of dt/2^h each, up to 2^max_halvings. Implicit Euler's
    solve gets strictly easier as the m/dt^2 proximal term grows, so every
    frame converges while advancing exactly dyn.dt of physical time.
    Returns (state, max Newton over accepted substeps, worst substep exit
    norm, n_substeps)."""
    def run_at(n_sub):
        n_f = n_sub.astype(st.x.dtype)
        dt = dyn.dt / n_f
        damp = dyn.damping ** (1.0 / n_f)

        def body(c):
            s, i, kmax, fworst = c
            s2, k, fn = step_to_tol(scene, params, s, dyn, tol, max_newton,
                                    use_multigrid, matrix_free, use_fas,
                                    gravity_scale=gravity_scale,
                                    dt=dt, damping=damp)
            return (s2, i + 1, jnp.maximum(kmax, k),
                    jnp.maximum(fworst, fn))

        s, _, kmax, fworst = jax.lax.while_loop(
            lambda c: (c[1] < n_sub) & (c[3] <= tol),
            body, (st, jnp.int32(0), jnp.int32(0),
                   jnp.zeros((), st.x.dtype)))
        return s, kmax, fworst

    def cond(c):
        h, _, _, fworst, _ = c
        return (fworst > tol) & (h <= max_halvings)

    def body(c):
        h = c[0]
        n_sub = jnp.int32(1) << h
        s, kmax, fworst = run_at(n_sub)
        return (h + 1, s, kmax, fworst, n_sub)

    _, s, kmax, fworst, n_sub = jax.lax.while_loop(
        cond, body, (jnp.int32(0), st, jnp.int32(0),
                     jnp.full((), jnp.inf, st.x.dtype), jnp.int32(1)))
    return s, kmax, fworst, n_sub


class DynamicSim:
    """User-facing dynamic simulator (reference exp1/simulation main loop)."""

    def __init__(self, scene: Scene, dyn: DynamicsConfig = DynamicsConfig()):
        self.scene = scene
        self.dyn = dyn
        self.state = init_state(scene)
        self._step = jax.jit(lambda p, s: step(scene, p, s, dyn))
        self._step_tol = None

    def frame(self):
        self.state = self._step(self.scene.params, self.state)
        return self.state

    def frame_to_tol(self, tol=1e-4, max_newton=20, use_multigrid=True):
        key = (tol, max_newton, use_multigrid)
        if self._step_tol is None or self._step_tol[0] != key:
            fn = jax.jit(lambda p, s: step_to_tol(
                self.scene, p, s, self.dyn, tol, max_newton, use_multigrid))
            self._step_tol = (key, fn)
        self.state, k, fn_inf = self._step_tol[1](self.scene.params, self.state)
        return self.state, k, fn_inf

    def set_drag(self, mask, targets):
        self.state = self.state._replace(
            drag_mask=jnp.asarray(mask, dtype=self.state.x.dtype),
            drag_pos=jnp.asarray(targets, dtype=self.state.x.dtype))

    def clear_drag(self):
        self.state = self.state._replace(
            drag_mask=jnp.zeros_like(self.state.drag_mask))
