"""Distributed GMG-preconditioned Newton on the structured lattice (GSPMD).

Two distributed lattice paths exist side by side:

* ``parallel/lattice_halo.py`` — explicit z-slab blocks + ``ppermute`` halo
  exchange with fused Pallas local kernels and a block-Jacobi preconditioner
  (the hand-scheduled path: 4 vertex planes of ICI traffic per matvec, the
  1-ring-stencil minimum).
* THIS module — the multigrid path. Fine-lattice fields are sharded over the
  mesh's ``sp`` axis along z (``with_sharding_constraint``) while every
  stencil/transfer op stays the plain single-chip jnp code: XLA's SPMD
  partitioner inserts exactly the plane halo exchanges that lattice_halo.py
  spells out by hand. Levels whose z extent drops below a few planes per
  device are REPLICATED instead (coarse-grid agglomeration — the standard
  distributed-multigrid design): their compute is O(N / 8^level), and one
  all-gather of a tiny grid per V-cycle beats latency-bound halo exchanges
  on near-empty planes.

The solver is literally ``sim/lattice_mg.py`` — :class:`DistLatticeMG` only
overrides the ``constrain`` sharding hook, so the single-chip and
distributed paths cannot drift apart (the same property the block-ELL /
stencil lockstep tests enforce elsewhere).

The reference has no distributed counterpart (SURVEY.md section 2.3:
everything pins ``cuda:0``); this is the TPU framework's own scaling
contract.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DynamicsConfig
from ..ops import pallas_lattice as plat
from ..sim.lattice import LatState, LatticeScene, _use_pallas
from ..sim.lattice_mg import (LatticeMG, quasistatic_to_tol_mg,
                              step_to_tol_mg)


def _cell_slabs(cell_mask, n_sp: int):
    """(D, Cx, Cy, z_loc+1) extended local cell slabs for a level whose
    vertex z-extent Z (= Cz+1) divides n_sp. Device d's extended vertex
    block covers global planes [d*z_loc-1, (d+1)*z_loc], i.e. z_loc+1 local
    cell planes; local plane c (global zc = d*z_loc-1+c) is real iff the
    device owns its lower vertex plane (c >= 1) — each global cell is
    computed by exactly one device, so the halo fold is a partition sum."""
    cm = np.asarray(cell_mask)
    Cx, Cy, Cz = cm.shape
    z_loc = (Cz + 1) // n_sp
    slabs = np.zeros((n_sp, Cx, Cy, z_loc + 1), np.float32)
    for d in range(n_sp):
        for c in range(1, z_loc + 1):
            zc = d * z_loc - 1 + c
            if zc < Cz:
                slabs[d, :, :, c] = cm[:, :, zc]
    return jnp.asarray(slabs)


class DistLatticeMG(LatticeMG):
    """LatticeMG whose per-level fields carry GSPMD sharding constraints.

    z is the sharded axis (matching the z-slab decomposition of
    parallel/lattice_halo.py); levels with fewer than
    ``min_planes_per_dev`` vertex planes per device are replicated.

    Transfers, smoother vector ops, and CG reductions stay plain GSPMD jnp
    code (XLA inserts the collectives). The per-level MATVEC and DIAG —
    the hot ops — are where GSPMD used to forfeit the fused Pallas kernels
    (they are opaque to the SPMD partitioner, which would all-gather every
    operand). ``use_pallas`` (default: on TPU) now routes sharded levels
    through a ``shard_map`` wrapper instead: ghost-plane ``ppermute``
    exchange + the SAME local Pallas kernels as parallel/lattice_halo.py +
    boundary fold — 4 vertex planes of ICI per matvec, the 1-ring minimum.
    Replicated coarse levels keep the XLA stencil path (their z extents
    are short, exactly where Pallas is gated off single-chip too).
    """

    def __init__(self, scene: LatticeScene, mesh: Mesh, axis: str = "sp",
                 min_planes_per_dev: int = 4, use_pallas=None,
                 min_lane_cells: int = 16, **kw):
        self.mesh = mesh
        self.axis = axis
        self.pallas_halo = _use_pallas(use_pallas)
        # base class runs the XLA stencil path everywhere it builds ops
        # itself (replicated coarse levels); sharded levels are overridden
        # in _level_matvec_diag below.
        kw["use_pallas"] = False
        n_sp = mesh.shape[axis]
        # even-z hierarchy: every level's z extent is a multiple of n_sp.
        # GSPMD SILENTLY REPLICATES a constraint whose dim doesn't divide the
        # mesh axis (verified on jax 0.9: uneven with_sharding_constraint
        # compiles but the result sharding degrades to P()), and the default
        # odd-padded grids never divide an even device count.
        kw.setdefault("z_multiple", n_sp)
        super().__init__(scene, **kw)
        self.level_specs = []
        self._level_cell_slabs = {}
        self._level_pallas = {}
        for li, lvl in enumerate(self.levels):
            z_planes = lvl.vert_mask.shape[2]
            sharded = (z_planes >= min_planes_per_dev * n_sp
                       and z_planes % n_sp == 0)
            self.level_specs.append(
                P(None, None, axis) if sharded else P())
            # EVERY sharded level runs its matvec/diag through the
            # shard_map plane-halo wrapper (r5): left to the GSPMD
            # partitioner, the XLA stencil's shifted slices (size Z-1 on a
            # Z-extent sharded axis — never divisible by the mesh) fall
            # back to FULL all-gathers of the level field, ~1.9 MB of
            # in-loop traffic per program on the 4,4,33 microscope
            # (COLLECTIVES.md r4). The wrapper's ghost-plane ppermutes are
            # the 1-ring minimum regardless of which local kernel runs.
            if sharded:
                self._level_cell_slabs[li] = _cell_slabs(lvl.cell_mask, n_sp)
                # Lane gate for the LOCAL KERNEL choice only: the body's
                # local cell lane extent is z_planes/n_sp + 1; short-lane
                # Pallas kernels faulted the TPU worker (CLAUDE.md), so
                # gated levels run the local XLA stencil inside the same
                # wrapper instead. ``min_lane_cells`` exists for CPU
                # interpret-mode tests (operator-parity passes 1).
                self._level_pallas[li] = (
                    self.pallas_halo
                    and z_planes // n_sp + 1 >= min_lane_cells)

    def constrain(self, li, a):
        spec = self.level_specs[li]
        full = P(*(tuple(spec) + (None,) * (a.ndim - 3)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, full))

    # -- Pallas matvec/diag on sharded levels (shard_map + plane halo) -----
    def _level_matvec_diag(self, li, lvl, x_l):
        if li not in self._level_cell_slabs:
            return super()._level_matvec_diag(li, lvl, x_l)
        mesh, axis = self.mesh, self.axis
        D = mesh.shape[axis]
        mat = self.scene.material
        mu, la, dx = mat.lame_mu, mat.lame_la, lvl.dx
        # displacement form (ops/stencil.py precision note): the local
        # Pallas kernels take u = x - rest; subtract the level's analytic
        # rest grid BEFORE the shard_map (GSPMD shards the subtraction)
        x_l = x_l - self.x0_levels[li]
        cell_slabs = self._level_cell_slabs[li]
        perm_up = [(i, i + 1) for i in range(D - 1)]
        perm_dn = [(i + 1, i) for i in range(D - 1)]

        def _extend(x):
            # local (X, Y, z_loc, C) -> ghost-padded (X, Y, z_loc+2, C):
            # bottom ghost = left neighbor's top owned plane, and vice versa
            lo = jax.lax.ppermute(x[:, :, -1], axis, perm_up)
            hi = jax.lax.ppermute(x[:, :, 0], axis, perm_dn)
            return jnp.concatenate([lo[:, :, None], x, hi[:, :, None]],
                                   axis=2)

        def _fold(f):
            # ghost-plane partial outputs belong to the neighbor's boundary
            # owned plane (each cell computed on exactly one device)
            from_left = jax.lax.ppermute(f[:, :, -1], axis, perm_up)
            from_right = jax.lax.ppermute(f[:, :, 0], axis, perm_dn)
            f = f[:, :, 1:-1]
            return f.at[:, :, 0].add(from_left).at[:, :, -1].add(from_right)

        if self._level_pallas[li]:
            def _local_hvp(x, p, cmb):
                xe = jnp.transpose(_extend(x), (3, 0, 1, 2))
                pe = jnp.transpose(_extend(p), (3, 0, 1, 2))
                hp = jnp.transpose(plat.hvp_cf(xe, pe, cmb[0], dx, mu, la),
                                   (1, 2, 3, 0))
                return _fold(hp)

            def _local_diag(x, cmb):
                d = plat.hess_diag_lattice(_extend(x), cmb[0], dx, mu, la)
                return _fold(d)
        else:
            # local XLA stencil on the ghost-extended slab: same math, no
            # Pallas (short-lane levels / CPU) — still zero partitioner
            # involvement, so no all-gather fallback
            from ..ops import stencil

            def _local_force(xe, cmb, lvl=lvl):
                return stencil.elastic_force_lattice(
                    xe, cmb, lvl.g_tab, lvl.det, mu, la)

            def _local_hvp(x, p, cmb):
                xe = _extend(x)
                pe = _extend(p)
                _, t = jax.jvp(lambda xz: _local_force(xz, cmb[0]),
                               (xe,), (pe,))
                return _fold(-t)

            def _local_diag(x, cmb, lvl=lvl):
                d = stencil.elastic_hessian_diag_lattice(
                    _extend(x), cmb[0], lvl.g_tab, lvl.det, mu, la)
                return _fold(d)

        # check_vma=False: pallas_call emits ShapeDtypeStruct outputs with
        # no varying-mesh-axes annotation, which the vma checker rejects
        v_spec = P(None, None, axis, None)
        mv = shard_map(_local_hvp, mesh=mesh,
                       in_specs=(v_spec, v_spec, P(axis, None, None, None)),
                       out_specs=v_spec, check_vma=False)
        dg = shard_map(_local_diag, mesh=mesh,
                       in_specs=(v_spec, P(axis, None, None, None)),
                       out_specs=P(None, None, axis, None, None),
                       check_vma=False)

        def matvec(p, x_l=x_l, lvl=lvl):
            hp = mv(x_l, p, cell_slabs)
            return (hp + lvl.ctrl[..., None] * p) * lvl.vert_mask[..., None]

        return matvec, dg(x_l, cell_slabs)


    # -- explicit inter-level transfers (shard_map + plane halo) -----------
    # Left to GSPMD, every V-cycle's sharded->replicated restriction (and
    # the partitioner's choices around it) cost ~15 all-gathers of the
    # coarse field PER CG ITERATION (~1.9 MB static in-loop traffic on the
    # 4,4,33 microscope, COLLECTIVES.md r4) riding the slowest ICI link.
    # These overrides do what the matvec wrapper already does: local
    # restriction/prolongation with the 1-plane ppermute halo, plus exactly
    # ONE explicit all-gather of the (8x smaller) coarse field when the
    # next level is replicated — the coarse-grid-agglomeration minimum.

    def _restrict(self, li, r):
        if self.level_specs[li] == P():          # fine level replicated
            return super()._restrict(li, r)
        from ..ops import stencil
        mesh, axis = self.mesh, self.axis
        D = mesh.shape[axis]
        sharded_c = self.level_specs[li + 1] != P()
        perm_up = [(i, i + 1) for i in range(D - 1)]
        v_spec = P(None, None, axis, None)

        def body(rl):
            # rl: (X, Y, z_loc, C) local; the left ghost is global plane
            # zd0-1 (device 0 receives ZEROS from ppermute == the zero BC).
            # Coarse plane K reads fine 2K-1..2K+1, all inside the
            # ghost-extended slab; z_loc is even on every level
            # (z_multiple=D), so coarse ownership splits evenly.
            lo = jax.lax.ppermute(rl[:, :, -1], axis, perm_up)
            ext = jnp.concatenate([lo[:, :, None], rl], axis=2)
            y = stencil._conv_half(stencil._conv_half(ext, 0), 1)
            y = stencil._conv_half(y, 2)
            rc = y[::2, ::2, 1::2]
            if sharded_c:
                return rc
            return jax.lax.all_gather(rc, axis, axis=2, tiled=True)

        rc = shard_map(body, mesh=mesh, in_specs=(v_spec,),
                       out_specs=(v_spec if sharded_c else P()),
                       check_vma=False)(r)
        return self._pad_coarse(li, rc)

    def _prolong(self, li, xc):
        if self.level_specs[li] == P():          # fine level replicated
            return super()._prolong(li, xc)
        from ..ops import stencil
        mesh, axis = self.mesh, self.axis
        D = mesh.shape[axis]
        src = self.levels[li].vert_mask.shape
        sx, sy, sz = src
        xc = xc[:(sx + 1) // 2, :(sy + 1) // 2, :sz // 2]
        sharded_c = self.level_specs[li + 1] != P()
        z_loc = sz // D
        zc_loc = sz // 2 // D
        perm_dn = [(i + 1, i) for i in range(D - 1)]
        v_spec = P(None, None, axis, None)

        def z_then_xy(loc):
            # loc: (Xc, Yc, zc_loc+1, C) — coarse planes [K0, K0+zc_loc],
            # one past the owned range (the global top plays the zero BC,
            # matching prolong_lat's even-z semantics). Device-local fine
            # plane i (global zd0+i, zd0 even): even i = loc[i//2], odd i =
            # 0.5*(loc[(i-1)//2] + loc[(i+1)//2]) — the plain prolong rule.
            Xc, Yc, _, C = loc.shape
            z = jnp.zeros((Xc, Yc, 2 * (zc_loc + 1), C), loc.dtype)
            z = z.at[:, :, ::2].set(loc)
            z = stencil._conv_half(z, 2)[:, :, :z_loc]
            out = jnp.zeros((sx, sy, z_loc, C), z.dtype)
            out = out.at[::2, ::2].set(z)
            return stencil._conv_half(stencil._conv_half(out, 0), 1)

        if sharded_c:
            def body(xcl):
                # right ghost = neighbor's first plane; last device gets
                # zeros (the global zero BC)
                hi = jax.lax.ppermute(xcl[:, :, 0], axis, perm_dn)
                return z_then_xy(jnp.concatenate([xcl, hi[:, :, None]],
                                                 axis=2))
            in_spec = v_spec
        else:
            def body(xc_full):
                d = jax.lax.axis_index(axis)
                xcp = jnp.pad(xc_full, [(0, 0), (0, 0), (0, 1), (0, 0)])
                loc = jax.lax.dynamic_slice_in_dim(
                    xcp, d * zc_loc, zc_loc + 1, axis=2)
                return z_then_xy(loc)
            in_spec = P()

        return shard_map(body, mesh=mesh, in_specs=(in_spec,),
                         out_specs=v_spec, check_vma=False)(xc)


def _state_sharding(mesh: Mesh, axis: str, z: int):
    """Input-state shardings. The UNPADDED scene z extent usually does not
    divide the mesh axis (device_put rejects uneven shards) — commit the
    inputs replicated then; the constraints inside the solver (on the padded,
    divisible internal fields) do the actual distribution."""
    if z % mesh.shape[axis] == 0:
        s_v = NamedSharding(mesh, P(None, None, axis, None))
        s_m = NamedSharding(mesh, P(None, None, axis))
    else:
        s_v = s_m = NamedSharding(mesh, P())
    return LatState(x=s_v, v=s_v, drag_mask=s_m, drag_pos=s_v), s_v


def make_dist_mg_step(scene: LatticeScene, mesh: Mesh, axis: str = "sp",
                      n_levels: int = 3, tol: float = 1e-4,
                      max_newton: int = 20,
                      dyn: DynamicsConfig = DynamicsConfig(), **mg_kw):
    """Distributed dynamic step: (jitted step, place) where
    ``step(state) -> (state, newton_iters, f_inf)`` runs the GMG-
    preconditioned implicit-Euler frame with fine levels z-sharded over
    ``axis`` and ``place(state)`` commits a host state to that sharding."""
    mg = DistLatticeMG(scene, mesh, axis=axis, n_levels=n_levels,
                       dt=dyn.dt, **mg_kw)
    st_shard, _ = _state_sharding(mesh, axis, scene.vert_mask.shape[2])

    @jax.jit
    def step(st):
        return step_to_tol_mg(scene, mg, st, dyn=dyn, tol=tol,
                              max_newton=max_newton)

    def place(st: LatState) -> LatState:
        return jax.device_put(st, st_shard)

    return step, place


def make_dist_mg_quasistatic(scene: LatticeScene, mesh: Mesh,
                             axis: str = "sp", n_levels: int = 3,
                             tol: float = 1e-4, max_newton: int = 50,
                             **mg_kw):
    """Distributed quasi-static solve: (jitted solve, place) where
    ``solve(x) -> (x, newton_iters, f_inf)``; x is (X, Y, Z, 3) z-sharded."""
    mg = DistLatticeMG(scene, mesh, axis=axis, n_levels=n_levels,
                       dt=None, **mg_kw)
    _, s_v = _state_sharding(mesh, axis, scene.vert_mask.shape[2])

    @jax.jit
    def solve(x):
        return quasistatic_to_tol_mg(scene, mg, x, tol=tol,
                                     max_newton=max_newton)

    def place(x):
        return jax.device_put(x, s_v)

    return solve, place
