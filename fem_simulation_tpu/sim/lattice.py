"""Structured-lattice dynamic simulation: the single-chip speed-of-light path.

Same physics as sim/dynamic.py (reference exp1/simulation render loop), but
every field lives on the bounding vertex lattice (X, Y, Z, 3) and the elastic
force / Hessian-vector products are pure stencil computations
(ops.stencil.elastic_force_lattice): static shifted slices and adds, no
gather or scatter anywhere in the hot loop. The Newton solve is matrix-free
CG on jax.linearize JVPs.

Best for meshes that fill a good fraction of their bounding box (the
benchmark beam fills 100%); unstructured shapes fall back to sim/dynamic.py.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DynamicsConfig, MaterialConfig
from ..ops import stencil, ell
from ..ops import boxes as boxlib
from ..ops import pallas_lattice as plat
from ..solvers import cg as cgmod
from .. import mesh as meshlib
from .. import hierarchy as hl


def _use_pallas(flag):
    if flag is None:
        return jax.default_backend() == "tpu"
    return flag


def _hess_diag(scene, xx, pallas):
    """Vertex-diagonal Hessian blocks; fused Pallas kernel on TPU (the XLA
    einsum chain costs ~82 ms/eval at 66k verts — VERDICT r1 scaling bug)."""
    return scene.elastic_diag(xx, pallas)


class LatState(NamedTuple):
    x: jnp.ndarray           # (X, Y, Z, 3)
    v: jnp.ndarray
    drag_mask: jnp.ndarray   # (X, Y, Z) 1.0 where grabbed
    drag_pos: jnp.ndarray    # (X, Y, Z, 3) grab targets


class LatticeScene:
    """Lattice embedding of a voxel mesh + per-vertex fields."""

    def __init__(self, mesh: meshlib.HexMesh,
                 material: MaterialConfig = MaterialConfig(), pins=None,
                 use_boxes: bool = True, box_threshold: float = 0.5,
                 box_quantum=None):
        self.mesh = mesh
        self.material = material
        lvl = hl.build_level_topology(mesh.x, mesh.ijk, mesh.hexes, mesh.dx)
        self.lvl = lvl
        self.shape, lat, vert_of_lat, self.fill = stencil.build_lattice_map(lvl)
        self.lat = jnp.asarray(lat)

        # cell mask from hex min corners
        cell_shape = tuple(s - 1 for s in self.shape)
        cmask = np.zeros(cell_shape, np.float32)
        lo = lvl.ijk.min(axis=0)
        cidx = lvl.ijk[lvl.hexes[:, 0].astype(np.int64)] - lo
        cmask[cidx[:, 0], cidx[:, 1], cidx[:, 2]] = 1.0
        self.cell_mask = jnp.asarray(cmask)

        self.g_tab, self.det = stencil.lattice_material_tables(mesh.dx)

        # vertex fields on the lattice
        vmask = np.zeros(self.shape, np.float32)
        vmask[lat[:, 0], lat[:, 1], lat[:, 2]] = 1.0
        self.vert_mask = jnp.asarray(vmask)

        # lumped mass: each corner of each real cell gets det*8 (cell volume)
        cell_vol = float(self.det * 8.0) * material.density
        m = np.zeros(self.shape, np.float32)
        for (di, dj, dk) in stencil._CORNERS:
            m[di:di + cell_shape[0], dj:dj + cell_shape[1],
              dk:dk + cell_shape[2]] += cmask * cell_vol
        self.mass = jnp.asarray(m)

        self.x0 = stencil.field_to_lattice(jnp.asarray(lvl.x0), self.lat,
                                           self.shape)
        # pins: top slab by default (reference object.py:762-773)
        if pins is None or len(pins) == 0:
            y = lvl.x0[:, 1]
            pin_ids = np.nonzero(y >= y.max() - mesh.dx - 1e-5)[0]
        else:
            # pins given in original mesh vertex order -> canonical
            perm, _ = hl.color_sort(mesh.ijk)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.size)
            pin_ids = inv[np.asarray(pins, np.int64)]
        pm = np.zeros(self.shape, np.float32)
        pl = lat[pin_ids]
        pm[pl[:, 0], pl[:, 1], pl[:, 2]] = 1.0
        self.pin_mask = jnp.asarray(pm)
        self.pin_pos = self.x0

        # Low-fill fast path: cover the real cells with tight boxes and run
        # every elastic op box-by-box when that at least halves the padded
        # compute volume (ops/boxes.py; VERDICT r2 missing #4 — shells and
        # thin shapes used to fall off onto the ~100x-slower unstructured
        # path). Solid beams cover themselves with one full-grid box
        # (ratio 1.0) and keep the single-kernel flagship path untouched.
        # The cover only pays once TPU tile padding (8-sublane, 128-lane)
        # stops dominating — i.e. on bboxes tens of cells across, exactly
        # the reference demo scale; tiny scenes keep one dense grid.
        q = boxlib.TILE if box_quantum is None else tuple(box_quantum)
        full_cost = boxlib._perm_cost(self.shape, q)
        bxs, cover_cost = boxlib.build_box_cover(cmask, quantum=q)
        self.box_cost_ratio = cover_cost / max(full_cost, 1)
        self.boxes = bxs if (use_boxes and len(bxs) > 1
                             and self.box_cost_ratio < box_threshold) \
            else None
        if self.boxes is None and use_boxes:
            # Global axis permutation as a degenerate one-box cover: when the
            # grid's natural orientation wastes tile padding (the voxelized
            # kitten is (34,51,30) — z=30 pads to 128 lanes, 4.7x the true
            # volume; permuted to (30,34,51) the padded volume drops 1.6x),
            # run every elastic op through a single full-grid box with the
            # cost-optimal permutation. Unlike the multi-box cover there is
            # no partition-sum or halo overhead — just one transpose pair
            # per op — so any padded-cost win engages it. Exactness is the
            # same F -> FP invariance argument as per-box permutation
            # (ops/boxes.py module docstring).
            cell_ext = tuple(s - 1 for s in self.shape)
            perm, pcost = boxlib.best_perm(cell_ext, q)
            if perm != (0, 1, 2) and pcost < 0.95 * full_cost:
                self.boxes = [boxlib.Box(c0=(0, 0, 0), c1=cell_ext,
                                         perm=perm)]
                self.box_cost_ratio = pcost / max(full_cost, 1)

    # -- elastic ops (dense grid or box cover) ------------------------------
    def _pallas_ok(self, pallas, cm):
        # Dense grid: honor the caller exactly (unchanged fast path). Boxes:
        # short-lane Pallas kernels faulted the TPU worker (CLAUDE.md), so a
        # box whose lane extent is small takes the XLA stencil instead.
        return pallas and (self.boxes is None or cm.shape[2] >= 16)

    def elastic_force(self, x, pallas):
        """Raw elastic force on the vertex grid (no gravity/pins/inertia).

        The kernels take DISPLACEMENTS u = x - x0 (the identity part of F
        is analytic — forming F from absolute positions sets a coordinate-
        magnitude-dependent f32 noise floor; ops/stencil.py has the
        measured 38x story). All four elastic ops below subtract the rest
        grid here, once, so callers keep passing positions."""
        mat = self.material
        x = x - self.x0

        def kern(cm, xx):
            if self._pallas_ok(pallas, cm):
                return jnp.transpose(plat.force_cf(
                    jnp.transpose(xx, (3, 0, 1, 2)), cm, self.mesh.dx,
                    mat.lame_mu, mat.lame_la), (1, 2, 3, 0))
            return stencil.elastic_force_lattice(xx, cm, self.g_tab,
                                                 self.det, mat.lame_mu,
                                                 mat.lame_la)
        if self.boxes is None:
            return kern(self.cell_mask, x)
        return boxlib.box_vertex_op(kern, self.boxes, self.cell_mask, x,
                                    out_trailing=(3,))

    def elastic_energy(self, x, pallas):
        mat = self.material
        x = x - self.x0

        def kern(cm, xx):
            if self._pallas_ok(pallas, cm):
                return plat.elastic_energy_lattice(xx, cm, self.mesh.dx,
                                                   mat.lame_mu, mat.lame_la)
            return stencil.elastic_energy_lattice(xx, cm, self.g_tab,
                                                  self.det, mat.lame_mu,
                                                  mat.lame_la)
        if self.boxes is None:
            return kern(self.cell_mask, x)
        return boxlib.box_scalar_op(kern, self.boxes, self.cell_mask, x)

    def elastic_diag(self, x, pallas):
        mat = self.material
        x = x - self.x0

        def kern(cm, xx):
            if self._pallas_ok(pallas, cm):
                return plat.hess_diag_lattice(xx, cm, self.mesh.dx,
                                              mat.lame_mu, mat.lame_la)
            return stencil.elastic_hessian_diag_lattice(
                xx, cm, self.g_tab, self.det, mat.lame_mu, mat.lame_la)
        if self.boxes is None:
            return kern(self.cell_mask, x)
        return boxlib.box_vertex_op(kern, self.boxes, self.cell_mask, x,
                                    out_trailing=(3, 3))

    def elastic_hvp_fn(self, x, pallas):
        """matvec(p) = (elastic Hessian at x) @ p, i.e. -d(elastic_force).

        Analytic fused Pallas kernel where the lane extent allows; boxes
        below the lane gate use the JVP of the stencil force (negated to
        the Hessian sign convention of plat.hvp_cf)."""
        mat = self.material
        x = x - self.x0

        def kern(cm, xx, pp):
            if self._pallas_ok(pallas, cm):
                return jnp.transpose(plat.hvp_cf(
                    jnp.transpose(xx, (3, 0, 1, 2)),
                    jnp.transpose(pp, (3, 0, 1, 2)), cm, self.mesh.dx,
                    mat.lame_mu, mat.lame_la), (1, 2, 3, 0))
            _, t = jax.jvp(
                lambda xe: stencil.elastic_force_lattice(
                    xe, cm, self.g_tab, self.det, mat.lame_mu, mat.lame_la),
                (xx,), (pp,))
            return -t
        if self.boxes is None:
            return lambda p: kern(self.cell_mask, x, p)
        return lambda p: boxlib.box_vertex_op(
            kern, self.boxes, self.cell_mask, x, p, out_trailing=(3,))

    def init_state(self) -> LatState:
        return LatState(x=self.x0, v=jnp.zeros_like(self.x0),
                        drag_mask=jnp.zeros(self.shape, self.x0.dtype),
                        drag_pos=self.x0)

    # residual force of the implicit step at x, given predictor x_tilde
    def dyn_force(self, x, x_tilde, inv_dt, drag_mask=None, drag_pos=None,
                  use_pallas=None, gravity_scale=1.0):
        mat = self.material
        # fused Pallas kernel on TPU: ~11x the XLA einsum chain on v5e
        f = self.elastic_force(x, _use_pallas(use_pallas))
        f = f.at[..., 1].add(self.mass * mat.gravity * gravity_scale)
        f = f + mat.control_mag * self.pin_mask[..., None] * (self.pin_pos - x)
        if drag_mask is not None:
            f = f + mat.control_mag * drag_mask[..., None] * (drag_pos - x)
        f = f - (self.mass * inv_dt * inv_dt)[..., None] * (x - x_tilde)
        return f * self.vert_mask[..., None]

    def total_energy(self, x, use_pallas=None, gravity_scale=1.0):
        """Quasi-static total energy: elastic + gravity + pin penalty
        (reference compute_elastic_energy + compute_gravity_energy,
        /root/reference/exp1/quasi_simulation/quai_hexagon.py:28-64)."""
        mat = self.material
        e_el = self.elastic_energy(x, _use_pallas(use_pallas))
        e_g = -jnp.sum(self.mass * mat.gravity * gravity_scale * x[..., 1])
        d = (x - self.pin_pos) * self.vert_mask[..., None]
        e_pin = 0.5 * mat.control_mag * jnp.sum(
            self.pin_mask[..., None] * d * d)
        return e_el + e_g + e_pin


def step_to_tol(scene: LatticeScene, st: LatState,
                dyn: DynamicsConfig = DynamicsConfig(),
                tol: float = 1e-4, max_newton: int = 20,
                cg_iterations: int = 60, cg_tol: float = 1e-2,
                use_pallas=None, dt=None, damping=None,
                gravity_scale=1.0, return_cg: bool = False):
    """One frame: predictor + matrix-free Newton with block-Jacobi PCG.

    On TPU the elastic force and Hessian-vector products run as fused Pallas
    kernels (ops.pallas_lattice); the analytic HVP kernel replaces
    jax.linearize.

    `dt`/`damping` override the config values and may be TRACED scalars —
    frame_adaptive exploits this to substep a frame at dt/2^h inside one
    compiled program. `gravity_scale` (traced OK) scales the gravity load —
    the excited benchmark oscillates it per frame so every frame solves a
    genuinely different equilibrium. `return_cg=True` appends the frame's
    total PCG matvec count to the return (the benchmark's FLOP model needs
    the measured HVP count, not the CG budget).
    """
    pallas = _use_pallas(use_pallas)
    dt = dyn.dt if dt is None else dt
    damping = dyn.damping if damping is None else damping
    inv_dt = 1.0 / dt
    mat = scene.material
    x_old = st.x
    v = st.v * damping
    x = st.x + v * dt
    x_tilde = x

    def resid(xx):
        return scene.dyn_force(xx, x_tilde, inv_dt,
                               drag_mask=st.drag_mask, drag_pos=st.drag_pos,
                               use_pallas=pallas,
                               gravity_scale=gravity_scale)

    eye = jnp.eye(3, dtype=st.x.dtype)
    ctrl = (mat.control_mag * jnp.maximum(scene.pin_mask, st.drag_mask)
            + scene.mass * inv_dt * inv_dt
            # empty lattice rows get identity so the 3x3 solve is benign
            + (1.0 - scene.vert_mask))

    vmask3 = scene.vert_mask[..., None]

    def ie_energy(xe):
        """Implicit-Euler incremental potential (resid == -grad of this):
        elastic + gravity + pin/drag penalties + inertia proximal term."""
        e = scene.total_energy(xe, pallas, gravity_scale=gravity_scale)
        dd = (xe - st.drag_pos) * vmask3
        e = e + 0.5 * mat.control_mag * jnp.sum(
            st.drag_mask[..., None] * dd * dd)
        di = (xe - x_tilde) * vmask3
        return e + 0.5 * inv_dt * inv_dt * jnp.sum(
            scene.mass[..., None] * di * di)

    # fused single-launch Newton iteration (residual + diag + block-Jacobi
    # PCG + trial-step residual norm in one Pallas kernel): per-launch
    # overhead dominates small grids — the unfused path costs ~8 launches
    # per CG iteration plus 3 per residual eval, and 86% of the 2k-default
    # benchmark frame was launch overhead (BENCH_r04 mfu 0.135)
    fused = pallas and scene.boxes is None and plat.fused_pcg_ok(scene.shape)
    if fused:
        # frame-constant affine residual decomposition: f(x) =
        # f_el(u) + s - rc*u with u = x - x0 (see _make_newton_kernel);
        # rc is the exact SUM of penalty/inertia coefficients, distinct
        # from ctrl's max(pin, drag) Hessian shift
        rc = (mat.control_mag * (scene.pin_mask + st.drag_mask)
              + scene.mass * inv_dt * inv_dt)
        s_aff = (mat.control_mag * (scene.pin_mask[..., None] * scene.pin_pos
                                    + st.drag_mask[..., None] * st.drag_pos)
                 + (scene.mass * inv_dt * inv_dt)[..., None] * x_tilde)
        s_aff = s_aff.at[..., 1].add(scene.mass * mat.gravity
                                     * gravity_scale)
        s_cf = jnp.transpose(s_aff - rc[..., None] * scene.x0,
                             (3, 0, 1, 2))

    def body(c):
        xx, k, fn_prev, fmin, cg_tot = c
        if fused:
            dx_cf, f_cf, fn_full, cg_k = plat.fused_newton(
                jnp.transpose(xx - scene.x0, (3, 0, 1, 2)), s_cf,
                scene.cell_mask, ctrl, rc, scene.vert_mask, scene.mesh.dx,
                mat.lame_mu, mat.lame_la,
                iterations=cg_iterations, tol=cg_tol)
            dx = jnp.transpose(dx_cf, (1, 2, 3, 0))
            f = jnp.transpose(f_cf, (1, 2, 3, 0))
        else:
            f = resid(xx)
            if pallas:
                hvp = scene.elastic_hvp_fn(xx, True)

                def matvec(p):
                    return (hvp(p) + ctrl[..., None] * p) * vmask3
            else:
                _, jvp_fn = jax.linearize(resid, xx)
                matvec = lambda p: -jvp_fn(p)
            diag = (_hess_diag(scene, xx, pallas)
                    + ctrl[..., None, None] * eye)
            minv = lambda r: ell.solve3x3(diag, r) * vmask3
            dx, cg_k = cgmod.pcg_operator(matvec, minv, f,
                                          iterations=cg_iterations,
                                          tol=cg_tol, return_iters=True)
        # pcg's iteration carry starts at 1: matvecs executed = cg_k - 1
        cg_tot = cg_tot + cg_k - 1
        x_full = xx + dx * vmask3
        if not fused:
            fn_full = ell.inf_norm(resid(x_full))
        # Rescue: dynamics takes full Newton steps (the common case — the
        # mass shift keeps the system SPD and the step contracts). A fast-
        # swinging body under StVK can still blow a full step up (measured:
        # the rocker.obj pendulum hits fn=inf at frame 8, |v| jumping 0.8 ->
        # 62). When the full step grows the residual wildly or non-finitely,
        # redo it as an Armijo backtrack on the incremental potential —
        # guaranteed descent of a bounded-below energy, so the frame cannot
        # diverge. Costs nothing on the good path (one lax.cond branch).
        bad = (~jnp.isfinite(fn_full)
               | (fn_full > 30.0 * jnp.maximum(fn_prev, tol)))

        def rescue(_):
            x_ls = armijo_step(ie_energy, xx, f, dx, vmask3)
            return x_ls, ell.inf_norm(resid(x_ls))

        xx, fn = jax.lax.cond(bad, rescue,
                              lambda _: (x_full, fn_full), None)
        return (xx, k + 1, fn, jnp.minimum(fmin, fn), cg_tot)

    cond4 = cgmod.newton_cond(tol, max_newton)
    fn0 = ell.inf_norm(resid(x))
    x, k, fn, fmin, cg_tot = jax.lax.while_loop(
        lambda c: cond4(c[:4]), body,
        (x, jnp.int32(0), fn0, fn0, jnp.int32(0)))
    v = (x - x_old) * inv_dt
    out = st._replace(x=x, v=v), k, cgmod.newton_exit_norm(fn, fmin)
    return out + (cg_tot,) if return_cg else out


def frame_adaptive(scene: LatticeScene, st: LatState,
                   dyn: DynamicsConfig = DynamicsConfig(),
                   tol: float = 1e-4, max_newton: int = 20,
                   cg_iterations: int = 60, cg_tol: float = 1e-2,
                   use_pallas=None, max_halvings: int = 3,
                   gravity_scale=1.0):
    """One frame of dyn.dt total duration with ADAPTIVE TIME SUBSTEPPING.

    The blowup rescue in step_to_tol keeps violent frames finite, but a
    fast-swinging StVK body can still exhaust the Newton budget above tol
    (measured: the rocker.obj pendulum's hardest frames exit at ~1e-2 with
    25 Newton). Implicit Euler's nonlinear solve gets strictly easier as dt
    shrinks (the m/dt^2 proximal term dominates), so when any substep fails
    to reach tol the WHOLE frame is redone from the original state with
    twice as many substeps of half the length — up to 2^max_halvings. The
    accepted frame advances exactly dyn.dt of physical time; damping is
    applied once per substep at damping^(1/n) so n substeps compose to the
    frame's configured decay.

    Everything is one compiled program (nested lax.while_loops over a
    traced dt); the common case costs one extra residual comparison.

    Returns (state, max Newton iters over accepted substeps, worst substep
    exit norm, n_substeps used). The reference has no analog (its frames
    run a fixed 5 CG iterations and simply go unstable on such kicks,
    exp1/simulation/object.py:1286-1329).
    """
    def run_at(n_sub):
        n_f = n_sub.astype(st.x.dtype)
        dt = dyn.dt / n_f
        damp = dyn.damping ** (1.0 / n_f)

        def body(c):
            s, i, kmax, fworst = c
            s2, k, fn = step_to_tol(scene, s, dyn, tol, max_newton,
                                    cg_iterations, cg_tol, use_pallas,
                                    dt=dt, damping=damp,
                                    gravity_scale=gravity_scale)
            return (s2, i + 1, jnp.maximum(kmax, k),
                    jnp.maximum(fworst, fn))

        # stop early once any substep misses tol — the frame will be redone
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


class LatticeDynamicSim:
    def __init__(self, mesh: meshlib.HexMesh,
                 material: MaterialConfig = MaterialConfig(),
                 dyn: DynamicsConfig = DynamicsConfig(), pins=None):
        self.scene = LatticeScene(mesh, material, pins=pins)
        self.dyn = dyn
        self.state = self.scene.init_state()

    def positions(self):
        """Current positions in canonical (color-sorted) vertex order."""
        return stencil.field_from_lattice(self.state.x, self.scene.lat)

    def frame_to_tol(self, tol=1e-4, max_newton=20):
        fn = jax.jit(lambda s: step_to_tol(self.scene, s, self.dyn, tol,
                                           max_newton))
        self.state, k, f = fn(self.state)
        return self.state, k, f

    def frame_adaptive_to_tol(self, tol=1e-4, max_newton=20,
                              max_halvings=3):
        """frame_to_tol with adaptive time substepping: violent frames that
        exhaust the Newton budget are redone at dt/2^h until every substep
        converges. Returns (state, k, fn, n_substeps)."""
        fn = jax.jit(lambda s: frame_adaptive(self.scene, s, self.dyn, tol,
                                              max_newton,
                                              max_halvings=max_halvings))
        self.state, k, f, n = fn(self.state)
        return self.state, k, f, n

    def set_drag(self, mask_canonical, targets_canonical):
        """Drag constraints given in canonical vertex order (Picker output)."""
        sc = self.scene
        dm = stencil.field_to_lattice(
            jnp.asarray(mask_canonical)[:, None], sc.lat, sc.shape)[..., 0]
        dp = stencil.field_to_lattice(jnp.asarray(targets_canonical),
                                      sc.lat, sc.shape)
        self.state = self.state._replace(drag_mask=dm, drag_pos=dp)

    def clear_drag(self):
        self.state = self.state._replace(
            drag_mask=jnp.zeros_like(self.state.drag_mask))


def armijo_step(energy_fn, xx, f, dx, vmask3, n_back: int = 16,
                c1: float = 1e-4):
    """Backtracking line search on the quasi-static energy (f = -grad E).

    The reference's Newton takes full steps and relies on SPD-projecting
    every assembled Hessian block (cublas.py spd_matrix33f); the matrix-free
    lattice path has no assembled blocks to project, so globalization comes
    from energy descent instead: truncated Newton-CG direction + Armijo
    backtracking (falling back to steepest descent when CG returns a
    non-descent direction under an indefinite Hessian)."""
    d = dx * vmask3
    gTd = -ell.vdot(f, d)
    bad = gTd >= 0.0
    d = jnp.where(bad, f, d)
    gTd = jnp.where(bad, -ell.vdot(f, f), gTd)
    e0 = energy_fn(xx)

    def cond(carry):
        t, done, k = carry
        return (~done) & (k < n_back)

    def body(carry):
        t, done, k = carry
        e1 = energy_fn(xx + t * d)
        ok = e1 <= e0 + c1 * t * gTd
        return (jnp.where(ok, t, t * 0.5), ok, k + 1)

    t, done, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1.0, xx.dtype), jnp.bool_(False),
                     jnp.int32(0)))
    return xx + jnp.where(done, t, 0.0) * d


def newton_update(xx, f, dx, vmask3, fn_prev, energy_fn, resid_inf,
                  line_search: bool, fn_full=None):
    """Shared quasi-static Newton step acceptance: take the FULL step when
    it reduces the residual, Armijo-backtrack on the energy only when it
    grows. `fn_full` may carry a precomputed ||f(x + dx)||_inf (the fused
    Newton kernel computes it in-launch) to skip the residual re-eval.

    Unconditional Armijo stalls near tolerance: a Newton step at
    ||f|| ~ 1e-4 decreases the energy by ~||f||^2/K ~ 1e-8, far below the
    f32 evaluation noise of the TOTAL energy (a single sum over all cells,
    ~1e-4 at 74k vertices), so the backtracking loop cannot measure descent,
    halves t to nothing, and returns a zero step — measured: the 74k-beam
    latmg quasi-static crept at a 1.6e-4 residual for its whole 100-Newton
    budget while the residual-acceptance variant converges. Full steps on
    residual decrease are exactly the quadratic-convergence regime; the
    energy line search still guards the indefinite large-deformation
    region, where diverging steps DO grow the residual."""
    x_full = xx + dx * vmask3
    if fn_full is None:
        fn_full = resid_inf(x_full)
    if not line_search:
        return x_full, fn_full

    def fallback(_):
        x_ls = armijo_step(energy_fn, xx, f, dx, vmask3)
        return x_ls, resid_inf(x_ls)

    return jax.lax.cond(fn_full <= fn_prev,
                        lambda _: (x_full, fn_full), fallback, None)


def adaptive_continuation(solve_at, x, tol: float, max_newton_stage: int,
                          max_stages: int = 64, fast_k: int | None = None,
                          dgs0: float = 1.0, min_dgs: float = 1.0 / 256.0,
                          return_trace: bool = False):
    """Adaptive incremental loading: march gravity_scale 0 -> 1 with a
    step-doubling/halving trust region on the load increment.

    Fixed `load_steps=K` continuation makes the user hand-tune K per
    problem (the 37k deep-bend cantilever needed --load-steps 8 and 481
    Newton in round 2). Here each stage solves at gs = gs_done + dgs with
    a bounded Newton budget; success commits the stage (and doubles dgs if
    it converged fast). A failed stage — budget exhausted, divergence-guard
    exit, or NaN — is triaged by how much it reduced the residual:

    * substantial progress (fn halved vs the previous attempt at this gs):
      WARM-START — retry the same load from the failed state. This is the
      decisive case in practice: the 37k cantilever's first full-load
      attempt reaches fn=9.9e-4 at the 100-iteration budget (measured
      stage trace) and converges in a handful more; rejecting it instead
      cascades into a full halving spiral where every mid-range load
      plateaus and the continuation stalls outright.
    * plateau (no meaningful reduction): reject — halve dgs and retry from
      the last committed state.

    Easy problems pay nothing: the first stage tries gs=1 outright.

    solve_at(x, gs) -> (x, k, fn) is the guarded Newton stage solver
    (lattice or MG); returned k totals ALL stages including rejected ones
    (honest accounting). Returns (x, k_total, fn_final); with
    return_trace=True also a (max_stages, 3) array of per-stage
    (gs_attempted, newton_iters, fn) rows (nan-padded) for diagnostics."""
    if fast_k is None:
        fast_k = max(max_newton_stage // 4, 4)

    def cond(c):
        gs_done, dgs, xx, x_good, ktot, n, fn, fn_prev, _ = c
        return (gs_done < 1.0) & (n < max_stages) & (dgs >= min_dgs)

    def body(c):
        gs_done, dgs, xx, x_good, ktot, n, _, fn_prev, trace = c
        dgs_c = jnp.minimum(dgs, 1.0 - gs_done)
        gs = gs_done + dgs_c
        xn, k, fn = solve_at(xx, gs)
        ok = fn <= tol
        # warm-start retry: the attempt halved the residual vs the previous
        # attempt at this same load — keep grinding it instead of rejecting
        warm = (~ok) & jnp.isfinite(fn) & (fn <= 0.5 * fn_prev)
        x_good = jnp.where(ok, xn, x_good)
        xx = jnp.where(ok | warm, xn, x_good)
        gs_done = jnp.where(ok, gs, gs_done)
        dgs = jnp.where(ok,
                        jnp.where(k <= fast_k, dgs * 2.0, dgs),
                        jnp.where(warm, dgs, dgs * 0.5))
        # fn_prev tracks attempts at ONE load value; reset when gs changes
        fn_prev = jnp.where(warm, fn, jnp.inf)
        trace = trace.at[n].set(
            jnp.stack([gs, k.astype(trace.dtype), fn]))
        return (gs_done, dgs, xx, x_good, ktot + k, n + 1, fn, fn_prev,
                trace)

    f32 = x.dtype
    trace0 = jnp.full((max_stages, 3), jnp.nan, f32)
    inf = jnp.asarray(jnp.inf, f32)
    gs_done, dgs, x, x_good, ktot, n, fn, fn_prev, trace = \
        jax.lax.while_loop(
            cond, body, (jnp.asarray(0.0, f32), jnp.asarray(dgs0, f32), x,
                         x, jnp.int32(0), jnp.int32(0), inf, inf, trace0))
    # fn is the last stage's residual; if continuation stalled before
    # gs=1 report +inf so callers see non-convergence
    x = jnp.where(gs_done >= 1.0, x, x_good)
    fn = jnp.where(gs_done >= 1.0, fn, jnp.inf)
    if return_trace:
        return x, ktot, fn, trace
    return x, ktot, fn


def quasistatic_to_tol(scene: LatticeScene, x, tol: float = 1e-4,
                       max_newton: int = 50, cg_iterations: int = 60,
                       cg_tol: float = 1e-2, use_pallas=None,
                       line_search: bool = True,
                       load_steps: int | str = 1,
                       return_trace: bool = False,
                       cg_forcing: str | None = None,
                       return_cg: bool = False):
    """Quasi-static Newton to ||f||_inf <= tol on the lattice (the fast-path
    equivalent of QuasiStaticSim.newton* for lattice-friendly meshes): same
    machinery as step_to_tol with no inertia/predictor. Returns (x, k, fn).

    load_steps > 1 enables gravity continuation (incremental loading): solve
    at gravity scales i/K in sequence, warm-starting each stage from the
    previous solution — the standard globalization for large-deformation
    statics (e.g. a long cantilever sagging to a deep bend). Each increment
    stays near its own equilibrium where the StVK Hessian is positive
    definite, instead of marching Newton through the strongly indefinite
    region between rest and the final sag. max_newton is the budget PER
    load step; the returned k sums all stages.

    load_steps="auto" uses adaptive_continuation instead of a fixed
    schedule — no hand-tuned K, rejected stages halve the increment.

    cg_forcing="ew" replaces the fixed inner CG tolerance with the
    Eisenstat-Walker adaptive forcing term (solvers.cg.ew_eta): loose inner
    solves while Newton is far from the solution, tight only near
    convergence — cuts the oversolved early/late CG iterations a fixed
    tolerance pays for (measured per-Newton PCG trace on the kitten:
    [31, 22, 5, 5, 17, 18, 31] at fixed eta=0.1)."""
    pallas = _use_pallas(use_pallas)
    mat = scene.material

    eye = jnp.eye(3, dtype=x.dtype)
    ctrl = (mat.control_mag * scene.pin_mask + (1.0 - scene.vert_mask))
    vmask3 = scene.vert_mask[..., None]

    def resid(xx, gs):
        return scene.dyn_force(xx, xx, 0.0, use_pallas=pallas,
                               gravity_scale=gs)

    # fused single-launch Newton iteration on small dense grids (see
    # step_to_tol / ops.pallas_lattice._make_newton_kernel)
    fused = pallas and scene.boxes is None and plat.fused_pcg_ok(scene.shape)

    def solve_at(x0, gs):
        if fused:
            # affine residual decomposition at this load scale:
            # f(x) = f_el(u) + s - rc u, u = x - x0
            rc = mat.control_mag * scene.pin_mask
            s_aff = mat.control_mag * scene.pin_mask[..., None] \
                * scene.pin_pos
            s_aff = s_aff.at[..., 1].add(scene.mass * mat.gravity * gs)
            s_cf = jnp.transpose(s_aff - rc[..., None] * scene.x0,
                                 (3, 0, 1, 2))

        def body(c):
            xx, k, fn_prev, fmin, eta, cg_tot = c
            # cg_forcing="ew": Eisenstat-Walker adaptive inner tolerance
            # (pcg's tol is relative on ||r||^2, hence eta^2)
            tol_rr = eta * eta if cg_forcing == "ew" else cg_tol
            fn_full = None
            if fused:
                dx_cf, f_cf, fn_full, cg_k = plat.fused_newton(
                    jnp.transpose(xx - scene.x0, (3, 0, 1, 2)), s_cf,
                    scene.cell_mask, ctrl, rc, scene.vert_mask,
                    scene.mesh.dx, mat.lame_mu, mat.lame_la,
                    iterations=cg_iterations, tol=tol_rr)
                dx = jnp.transpose(dx_cf, (1, 2, 3, 0))
                f = jnp.transpose(f_cf, (1, 2, 3, 0))
            else:
                f = resid(xx, gs)
                if pallas:
                    hvp = scene.elastic_hvp_fn(xx, True)

                    def matvec(p):
                        return (hvp(p) + ctrl[..., None] * p) * vmask3
                else:
                    _, jvp_fn = jax.linearize(lambda xe: resid(xe, gs), xx)
                    matvec = lambda p: -jvp_fn(p)
                diag = (_hess_diag(scene, xx, pallas)
                        + ctrl[..., None, None] * eye)
                minv = lambda r: ell.solve3x3(diag, r) * vmask3
                dx, cg_k = cgmod.pcg_operator(matvec, minv, f,
                                              iterations=cg_iterations,
                                              tol=tol_rr, return_iters=True)
            xx, fn = newton_update(
                xx, f, dx, vmask3, fn_prev,
                lambda xe: scene.total_energy(xe, pallas, gravity_scale=gs),
                lambda xe: ell.inf_norm(resid(xe, gs)), line_search,
                fn_full=fn_full)
            if cg_forcing == "ew":
                eta = cgmod.ew_eta(fn, fn_prev)
            return (xx, k + 1, fn, jnp.minimum(fmin, fn), eta,
                    cg_tot + cg_k - 1)

        fn0 = ell.inf_norm(resid(x0, gs))
        cond4 = cgmod.newton_cond(tol, max_newton)
        xo, k, fn, fmin, _, cg_tot = jax.lax.while_loop(
            lambda c: cond4(c[:4]), body,
            (x0, jnp.int32(0), fn0, fn0, jnp.asarray(0.5, x0.dtype),
             jnp.int32(0)))
        out = xo, k, cgmod.newton_exit_norm(fn, fmin)
        return out + (cg_tot,) if return_cg else out

    if return_cg:
        # single-shot only (see lattice_mg.quasistatic_to_tol_mg)
        assert load_steps == 1 and not return_trace
        return solve_at(x, 1.0)
    return _run_load_schedule(solve_at, x, tol, max_newton, load_steps,
                              return_trace=return_trace)


def _run_load_schedule(solve_at, x, tol, max_newton, load_steps,
                       return_trace: bool = False):
    """Shared tail of the quasi-static drivers: single-shot, fixed K-stage
    gravity continuation, or adaptive ("auto") continuation."""
    if load_steps == "auto":
        return adaptive_continuation(solve_at, x, tol, max_newton,
                                     return_trace=return_trace)
    assert not return_trace, "return_trace requires load_steps='auto'"
    if load_steps <= 1:
        return solve_at(x, 1.0)

    def scan_body(carry, gs):
        xc, ktot = carry
        xc, k, fn = solve_at(xc, gs)
        return (xc, ktot + k), fn

    scales = jnp.linspace(1.0 / load_steps, 1.0, load_steps)
    (x, ktot), fns = jax.lax.scan(scan_body, (x, jnp.int32(0)), scales)
    return x, ktot, fns[-1]
