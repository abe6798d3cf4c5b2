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
from ..ops import elastic, ell
from ..solvers import cg as cgmod
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


def _dyn_force(scene: Scene, params, st: DynState, x, x_tilde, inv_dt):
    """Full implicit-Euler residual force at x (canonical order)."""
    p0 = params["levels"][0]
    mat = scene.material
    f = elastic.force(x, p0["hexes"], p0["det"], p0["g"],
                      mat.lame_mu, mat.lame_la, x.shape[0])
    f = f + elastic.gravity_force(p0["mass"], mat.gravity, x.shape[0], x.dtype)
    f = f + elastic.pin_force(x, p0["pin_mask"], p0["pin_pos"], mat.control_mag)
    f = f + mat.control_mag * st.drag_mask[:, None] * (st.drag_pos - x)
    f = f + -(p0["mass"] * inv_dt * inv_dt)[:, None] * (x - x_tilde)
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
                use_multigrid: bool = True, matrix_free: bool = False):
    """One frame with Newton iterations until ||f||_inf <= tol (device loop).

    This is the benchmark path (BASELINE.md metric). Returns (state, n_newton,
    final ||f||_inf).

    matrix_free=True solves each Newton system with CG on the *linearized
    force* (jax.linearize Hessian-vector products) — the Hessian is never
    assembled; this is the SURVEY.md section 2.2 matrix-free design and the
    fastest single-chip path.
    """
    inv_dt = 1.0 / dyn.dt
    x_old = st.x
    v = st.v * dyn.damping
    x = st.x + v * dyn.dt
    x_tilde = x
    op = scene.make_op(0, params)

    def resid(xx):
        return _dyn_force(scene, params, st, xx, x_tilde, inv_dt)

    def cond(carry):
        xx, k, fn = carry
        return (fn > tol) & (k < max_newton)

    p0 = params["levels"][0]
    mat = scene.material

    def body(carry):
        xx, k, _ = carry
        f = resid(xx)
        if matrix_free:
            _, jvp_fn = jax.linearize(resid, xx)
            # block-Jacobi preconditioner: elastic diag + control + mass
            diag = elastic.hessian_diag(xx, p0["hexes"], p0["det"], p0["g"],
                                        mat.lame_mu, mat.lame_la, xx.shape[0])
            ctrl = (mat.control_mag * jnp.maximum(p0["pin_mask"], st.drag_mask)
                    + p0["mass"] * inv_dt * inv_dt)
            diag = diag + ctrl[:, None, None] * jnp.eye(3, dtype=xx.dtype)
            minv = lambda r: ell.solve3x3(diag, r)
            dx = cgmod.pcg_operator(lambda p: -jvp_fn(p), minv, f,
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
        return (xx, k + 1, ell.inf_norm(resid(xx)))

    x, k, fn = jax.lax.while_loop(cond, body, (x, jnp.int32(0),
                                               ell.inf_norm(resid(x))))
    v = (x - x_old) * inv_dt
    return st._replace(x=x, v=v), k, fn


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
