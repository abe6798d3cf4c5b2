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

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DynamicsConfig
from ..sim.lattice import LatState, LatticeScene
from ..sim.lattice_mg import (LatticeMG, quasistatic_to_tol_mg,
                              step_to_tol_mg)


class DistLatticeMG(LatticeMG):
    """LatticeMG whose per-level fields carry GSPMD sharding constraints.

    z is the sharded axis (matching the z-slab decomposition of
    parallel/lattice_halo.py); levels with fewer than
    ``min_planes_per_dev`` vertex planes per device are replicated.

    Forces ``use_pallas=False``: Pallas kernels are opaque to the SPMD
    partitioner (a sharded operand would force an all-gather around every
    kernel call); the XLA stencil path partitions into local stencils +
    halo exchanges automatically. The Pallas hot loop stays available on
    the explicit-halo path (lattice_halo.make_dist_step).
    """

    def __init__(self, scene: LatticeScene, mesh: Mesh, axis: str = "sp",
                 min_planes_per_dev: int = 4, **kw):
        self.mesh = mesh
        self.axis = axis
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
        for lvl in self.levels:
            z_planes = lvl.vert_mask.shape[2]
            sharded = (z_planes >= min_planes_per_dev * n_sp
                       and z_planes % n_sp == 0)
            self.level_specs.append(
                P(None, None, axis) if sharded else P())

    def constrain(self, li, a):
        spec = self.level_specs[li]
        full = P(*(tuple(spec) + (None,) * (a.ndim - 3)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, full))


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
