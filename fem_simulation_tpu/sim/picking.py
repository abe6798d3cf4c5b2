"""Mouse picking / dragging: host-side ray selection feeding drag constraints.

TPU-native replacement for the reference's GPU picking kernels
(/root/reference/exp1/simulation/cublas.py:240-299 `selectKernel` /
`Control_Kernel` / `Fixed_Update_Kernel` and object.py:1239-1283): ray-triangle
intersection is a tiny host-side numpy computation here (selection is a UI
event, not a hot path), producing the (drag_mask, drag_pos) arrays the dynamic
sim consumes (sim/dynamic.py DynState).

API mirrors the reference Window callbacks: select(origin, dir) /
move_select(origin, dir) / clear (reference render/window.py:100-120).
"""
from __future__ import annotations

import numpy as np


def ray_triangles(origin: np.ndarray, direction: np.ndarray,
                  x: np.ndarray, tris: np.ndarray):
    """Moller-Trumbore over all triangles; returns (hit_mask, t) per triangle
    (reference selectKernel, exp1/simulation/cublas.py:240-272)."""
    v0 = x[tris[:, 0]]
    e1 = x[tris[:, 1]] - v0
    e2 = x[tris[:, 2]] - v0
    p = np.cross(np.broadcast_to(direction, e1.shape), e2)
    det = np.einsum("td,td->t", e1, p)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tv = origin[None, :] - v0
    u = np.einsum("td,td->t", tv, p) * inv
    q = np.cross(tv, e1)
    v = (q @ direction) * inv
    t = np.einsum("td,td->t", q, e2) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-8)
    return hit, t


class Picker:
    """Stateful drag controller for a DynamicSim.

    select(): pick the surface vertex nearest the closest ray hit, grab every
    vertex within radius (reference Control_Kernel dist^2 < 0.002).
    move_select(): move grab targets along the view ray (Fixed_Update_Kernel,
    clamped drag vector like object.py:1288-1296).
    """

    def __init__(self, sim, tris_mesh_order: np.ndarray,
                 grab_radius2: float = 0.002, max_drag: float = 0.5):
        self.sim = sim
        self.scene = sim.scene
        if hasattr(self.scene, "hier"):     # FEM scene: remap to canonical ids
            self.tris = self.scene.hier.mesh2idx[tris_mesh_order]
            self._pin = np.asarray(self.scene.params["levels"][0]["pin_mask"])
        else:                                # cloth: identity ordering
            self.tris = np.asarray(tris_mesh_order)
            self._pin = np.asarray(self.scene.params["pin_mask"])
        self.grab_radius2 = grab_radius2
        self.max_drag = max_drag
        self.select_vertex = -1

    def _x(self):
        return np.asarray(self.sim.state.x)

    def select(self, origin, direction) -> bool:
        origin = np.asarray(origin, dtype=np.float64)
        direction = np.asarray(direction, dtype=np.float64)
        direction = direction / np.linalg.norm(direction)
        x = self._x()
        hit, t = ray_triangles(origin, direction, x, self.tris)
        if not hit.any():
            self.select_vertex = -1
            return False
        best = np.argmin(np.where(hit, t, np.inf))
        tri = self.tris[best]
        # nearest corner of the hit triangle by point-line distance
        # (reference Squared_VE_Distance, exp1/simulation/cpu_function.py:43-49)
        pts = x[tri]
        d = pts - origin[None, :]
        along = d @ direction
        perp2 = np.einsum("ij,ij->i", d, d) - along ** 2
        self.select_vertex = int(tri[np.argmin(perp2)])
        return True

    def move_select(self, origin, direction):
        if self.select_vertex < 0:
            return
        origin = np.asarray(origin, dtype=np.float64)
        direction = np.asarray(direction, dtype=np.float64)
        direction = direction / np.linalg.norm(direction)
        x = self._x()
        sel = x[self.select_vertex]
        target = origin + float((sel - origin) @ direction) * direction
        drag = target - sel
        n = float(np.linalg.norm(drag))
        if n > self.max_drag:
            drag = drag * (self.max_drag / n)
        d2 = np.einsum("ij,ij->i", x - sel[None, :], x - sel[None, :])
        mask = ((d2 < self.grab_radius2) & (self._pin == 0)).astype(np.float32)
        targets = x + drag[None, :]
        self.sim.set_drag(mask, targets)

    def clear(self):
        self.select_vertex = -1
        self.sim.clear_drag()
