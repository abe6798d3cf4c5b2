"""Mass-spring cloth simulation (implicit Euler, single level).

TPU-native redesign of /root/reference/exp1/cloth_simulation/object.py:

* Procedural (res_x+1) x (res_y+1) grid with 3 edge families — horizontal,
  vertical, shear diagonal (object.py:27-44).
* The COO layout the reference builds by edge hashing (object.py:101-144,
  4 block slots per edge + diagonal offsets) becomes a block-ELL topology
  with a precomputed (edge -> 4 slots) scatter map.
* Frame step (object.py:657-677 `render`): predictor, H = m/h^2 I + spring
  Hessian, f = spring + gravity + inertia, 5 CG iterations, velocity update.
  (The reference's cloth path has no active pin/drag handling — its pin code
  is commented out; we support an optional pin mask as an extension.)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ClothConfig
from ..ops import spring, ell
from ..solvers import cg as cgmod, smoothers


class ClothScene:
    """Static topology + device params for a cloth grid."""

    def __init__(self, cfg: ClothConfig = ClothConfig(), pins=None):
        self.cfg = cfg
        rx, ry = cfg.res_x, cfg.res_y
        nvx, nvy = rx + 1, ry + 1
        n = nvx * nvy

        def vid(i, j):
            return i * nvx + j

        edges = []
        # horizontal, vertical, shear (object.py:30-43)
        for i in range(nvy):
            for j in range(rx):
                edges.append((vid(i, j), vid(i, j + 1)))
        for j in range(nvx):
            for i in range(ry):
                edges.append((vid(i, j), vid(i + 1, j)))
        for i in range(ry):
            for j in range(rx):
                edges.append((vid(i, j), vid(i + 1, j + 1)))
        edges = np.asarray(edges, dtype=np.int64)
        e = edges.shape[0]

        # positions: grid in the x-z plane at y = 1 (hanging under gravity)
        ii, jj = np.meshgrid(np.arange(nvy), np.arange(nvx), indexing="ij")
        x0 = np.stack([
            jj.reshape(-1) * cfg.size / rx,
            np.ones(n),
            ii.reshape(-1) * cfg.size / ry,
        ], axis=-1).astype(np.float32)

        # ELL adjacency from edges (+ self)
        pairs = np.concatenate([
            np.stack([edges[:, 0], edges[:, 1]], 1),
            np.stack([edges[:, 1], edges[:, 0]], 1),
            np.stack([np.arange(n), np.arange(n)], 1),
        ])
        pairs = np.unique(pairs, axis=0)
        r, c = pairs[:, 0], pairs[:, 1]
        deg = np.bincount(r, minlength=n)
        K = int(deg.max())
        nbr = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, K))
        mask = np.zeros((n, K), dtype=bool)
        start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(deg, out=start[1:])
        slot = np.arange(pairs.shape[0]) - start[r]
        nbr[r, slot] = c.astype(np.int32)
        mask[r, slot] = True
        diag_slot = slot[r == c].astype(np.int32)

        def find_slot(rr, cc):
            return np.argmax(nbr[rr] == np.asarray(cc, np.int32)[:, None], axis=1)

        i0, i1 = edges[:, 0], edges[:, 1]
        edge_slot = np.stack([
            i0 * K + find_slot(i0, i0),
            i0 * K + find_slot(i0, i1),
            i1 * K + find_slot(i1, i0),
            i1 * K + find_slot(i1, i1),
        ], axis=1).astype(np.int32)

        self.n_verts = n
        self.n_edges = e
        self.K = K
        pin_mask = np.zeros(n, dtype=np.float32)
        if pins is not None:
            pin_mask[np.asarray(pins, dtype=np.int64)] = 1.0

        l0 = np.linalg.norm(x0[edges[:, 0]] - x0[edges[:, 1]], axis=-1)
        # lumped mass: uniform (cloth reference uses per-vertex mass from grid)
        mass = np.full(n, 1.0 / n, dtype=np.float32)

        self.params = dict(
            x0=jnp.asarray(x0),
            edges=jnp.asarray(edges.astype(np.int32)),
            l0=jnp.asarray(l0.astype(np.float32)),
            mass=jnp.asarray(mass),
            nbr=jnp.asarray(nbr),
            mask=jnp.asarray(mask.astype(np.float32)),
            diag_slot=jnp.asarray(diag_slot),
            edge_slot=jnp.asarray(edge_slot),
            pin_mask=jnp.asarray(pin_mask),
            pin_pos=jnp.asarray(x0),
        )
        # single color: CG-only solves (no coloring needed for cloth)
        self.color_offsets = (0, n)

    def make_op(self):
        p = self.params
        return smoothers.EllOperator(p["nbr"], p["mask"], p["diag_slot"],
                                     self.color_offsets)


class ClothState(NamedTuple):
    x: jnp.ndarray
    v: jnp.ndarray
    drag_mask: jnp.ndarray   # (N,) 1.0 where grabbed (reference more_fixed)
    drag_pos: jnp.ndarray    # (N, 3) grab targets


def init_state(scene: ClothScene) -> ClothState:
    x0 = scene.params["x0"]
    return ClothState(x=x0, v=jnp.zeros_like(x0),
                      drag_mask=jnp.zeros(x0.shape[0], x0.dtype),
                      drag_pos=x0)


def _frame_diag(scene: ClothScene, params, st: ClothState, inv_dt):
    """m/h^2 + pin/drag control, as 3x3 diagonal blocks (the single source
    for both the fixed-iteration and to-tolerance frame solvers)."""
    cfg = scene.cfg
    return ((params["mass"] * inv_dt * inv_dt
             + cfg.control_mag * jnp.maximum(params["pin_mask"],
                                             st.drag_mask))[:, None, None]
            * jnp.eye(3, dtype=st.x.dtype))


def _frame_force(scene: ClothScene, params, st: ClothState, xx, x_tilde,
                 inv_dt, gravity):
    """Implicit-step residual: spring + gravity + pin/drag penalty + inertia
    (reference cloth render assembly, object.py:657-677)."""
    cfg = scene.cfg
    f = spring.force(xx, params["edges"], params["l0"], cfg.k, scene.n_verts)
    f = f.at[:, 1].add(params["mass"] * gravity)
    f = f + cfg.control_mag * params["pin_mask"][:, None] \
        * (params["pin_pos"] - xx)
    f = f + cfg.control_mag * st.drag_mask[:, None] * (st.drag_pos - xx)
    return f - (params["mass"] * inv_dt * inv_dt)[:, None] * (xx - x_tilde)


def step(scene: ClothScene, params, st: ClothState,
         gravity: float = -9.8 / 2.0) -> ClothState:
    """One cloth frame (reference cloth render, object.py:657-677)."""
    cfg = scene.cfg
    inv_dt = 1.0 / cfg.dt
    x_old = st.x
    v = st.v * cfg.damping
    x = st.x + v * cfg.dt
    x_tilde = x

    vals = spring.assemble_hessian_ell(
        x, params["edges"], params["l0"], cfg.k, params["edge_slot"],
        scene.n_verts, scene.K)
    vals = ell.add_to_diag(vals, params["diag_slot"],
                           _frame_diag(scene, params, st, inv_dt))
    f = _frame_force(scene, params, st, x, x_tilde, inv_dt, gravity)

    op = scene.make_op()
    dx = cgmod.cg(op, vals, f, iterations=5, tol=1e-5)
    x = x + dx
    v = (x - x_old) * inv_dt
    return st._replace(x=x, v=v)


def step_to_tol(scene: ClothScene, params, st: ClothState,
                tol: float = 1e-4, max_newton: int = 20,
                cg_iterations: int = 30, gravity: float = -9.8 / 2.0):
    """One cloth frame solved to ||f||_inf <= tol (the benchmark metric's
    guarantee, like lattice.step_to_tol) instead of the reference's fixed
    5-CG-iteration frame (object.py:657-677 runs CG once and moves on).
    Newton re-assembles the spring Hessian each iteration — the mass-spring
    Hessian is position-dependent (H = (k - k l0/|d|) I + (k l0/|d|^3) d d^T).
    Returns (state, newton_iters, f_inf)."""
    cfg = scene.cfg
    inv_dt = 1.0 / cfg.dt
    x_old = st.x
    v = st.v * cfg.damping
    x = st.x + v * cfg.dt
    x_tilde = x
    op = scene.make_op()
    diag_ctrl = _frame_diag(scene, params, st, inv_dt)

    def resid(xx):
        return _frame_force(scene, params, st, xx, x_tilde, inv_dt, gravity)

    def body(c):
        xx, k, _, fmin = c
        vals = spring.assemble_hessian_ell(
            xx, params["edges"], params["l0"], cfg.k, params["edge_slot"],
            scene.n_verts, scene.K)
        vals = ell.add_to_diag(vals, params["diag_slot"], diag_ctrl)
        f = resid(xx)
        # block-Jacobi PCG (like every other path): the spring Hessian's
        # stiff modes stall plain CG just above tol — unpreconditioned 30-
        # iteration CG plateaued a 17x17 cloth at fn ~ 1.3e-4 for 20 Newton
        full_vals = vals * op.mask[..., None, None]
        matvec = lambda v: ell.spmv(full_vals, op.nbr, op.mask, v)
        diag = vals[jnp.arange(scene.n_verts), params["diag_slot"]]
        minv = lambda r: ell.solve3x3(diag, r)
        dx = cgmod.pcg_operator(matvec, minv, f,
                                iterations=cg_iterations, tol=1e-2)
        xx = xx + dx
        fn = ell.inf_norm(resid(xx))
        return (xx, k + 1, fn, jnp.minimum(fmin, fn))

    fn0 = ell.inf_norm(resid(x))
    x, k, fn, fmin = jax.lax.while_loop(
        cgmod.newton_cond(tol, max_newton), body,
        (x, jnp.int32(0), fn0, fn0))
    v = (x - x_old) * inv_dt
    return st._replace(x=x, v=v), k, cgmod.newton_exit_norm(fn, fmin)


class ClothSim:
    def __init__(self, cfg: ClothConfig = ClothConfig(), pins=None):
        self.scene = ClothScene(cfg, pins=pins)
        self.state = init_state(self.scene)
        self._step = jax.jit(lambda p, s: step(self.scene, p, s))

    def frame(self) -> ClothState:
        self.state = self._step(self.scene.params, self.state)
        return self.state

    def set_drag(self, mask, targets):
        self.state = self.state._replace(
            drag_mask=jnp.asarray(mask, dtype=self.state.x.dtype),
            drag_pos=jnp.asarray(targets, dtype=self.state.x.dtype))

    def clear_drag(self):
        self.state = self.state._replace(
            drag_mask=jnp.zeros_like(self.state.drag_mask))

    def triangles(self):
        """Render/pick triangles of the cloth grid (2 per quad)."""
        import numpy as np
        rx, ry = self.scene.cfg.res_x, self.scene.cfg.res_y
        tris = []
        for i in range(ry):
            for j in range(rx):
                a = i * (rx + 1) + j
                b = a + 1
                c = a + (rx + 1)
                d = c + 1
                tris += [[a, b, c], [b, d, c]]
        return np.asarray(tris, np.int32)
