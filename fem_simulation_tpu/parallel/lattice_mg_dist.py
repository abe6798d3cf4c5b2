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
        for li, lvl in enumerate(self.levels):
            z_planes = lvl.vert_mask.shape[2]
            sharded = (z_planes >= min_planes_per_dev * n_sp
                       and z_planes % n_sp == 0)
            self.level_specs.append(
                P(None, None, axis) if sharded else P())
            # Lane gate: the shard_map body's local CELL lane extent is
            # z_planes/n_sp + 1 (slab cells + the ghost-plane cell row);
            # short-lane Pallas kernels faulted the TPU worker (CLAUDE.md)
            # and the single-chip paths gate on a 16-CELL lane extent
            # (sim/lattice.py _pallas_ok, lattice_mg.py) — sharded levels
            # must not reintroduce ungated short-lane launches. Gated
            # levels keep the GSPMD XLA stencil path. ``min_lane_cells``
            # exists for CPU interpret-mode tests (the operator-parity test
            # passes 1 to exercise the wrapper on a small beam) — leave the
            # TPU default alone.
            if (sharded and self.pallas_halo
                    and z_planes // n_sp + 1 >= min_lane_cells):
                self._level_cell_slabs[li] = _cell_slabs(lvl.cell_mask, n_sp)

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

        def _local_hvp(x, p, cmb):
            xe = jnp.transpose(_extend(x), (3, 0, 1, 2))
            pe = jnp.transpose(_extend(p), (3, 0, 1, 2))
            hp = jnp.transpose(plat.hvp_cf(xe, pe, cmb[0], dx, mu, la),
                               (1, 2, 3, 0))
            return _fold(hp)

        def _local_diag(x, cmb):
            d = plat.hess_diag_lattice(_extend(x), cmb[0], dx, mu, la)
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
