"""Mesh ingestion: OBJ loading, voxelization into hex meshes, surface extraction.

TPU-native replacement for the reference's pyvista path
(/root/reference/exp1/quasi_simulation/object.py:28-79): the reference reads an OBJ
with pyvista and voxelizes it (`pv.voxelize(mesh, density=dx)`), then permutes each
cell's corners into its own convention. Here voxelization is a vectorized numpy
ray-parity test (host-side, init-only), and the hex corner convention is fixed from
the start: local corner index = 4*di + 2*dj + dk for offset (di,dj,dk) in {0,1}^3
(matching the trilinear shape-function table layout, object.py:700-722).

Everything in this module is host-side preprocessing (numpy only).
"""
from __future__ import annotations

import dataclasses
import numpy as np

# Local corner offsets, index = 4*di + 2*dj + dk.
CORNER_OFFSETS = np.array(
    [[i, j, k] for i in range(2) for j in range(2) for k in range(2)], dtype=np.int64
)

# The six quad faces of a hex in local corner indices, oriented outward.
# Face normal axes: -x, +x, -y, +y, -z, +z.
_HEX_FACES = np.array(
    [
        [0, 1, 3, 2],  # -x
        [4, 6, 7, 5],  # +x
        [0, 4, 5, 1],  # -y
        [2, 3, 7, 6],  # +y
        [0, 2, 6, 4],  # -z
        [1, 5, 7, 3],  # +z
    ],
    dtype=np.int64,
)


@dataclasses.dataclass
class HexMesh:
    """A voxel hex mesh on an axis-aligned lattice.

    Attributes:
      x: (N, 3) float32 vertex rest positions.
      hexes: (H, 8) int32 corner vertex ids, local index = 4*di+2*dj+dk.
      ijk: (N, 3) int64 lattice coordinates of each vertex (x = origin + ijk*dx).
      dx: lattice spacing.
      origin: (3,) float lattice origin (min corner of bounding box).
    """
    x: np.ndarray
    hexes: np.ndarray
    ijk: np.ndarray
    dx: float
    origin: np.ndarray

    @property
    def n_verts(self) -> int:
        return self.x.shape[0]

    @property
    def n_hexes(self) -> int:
        return self.hexes.shape[0]


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: returns (verts (V,3) float64, tris (T,3) int64).

    Polygons with >3 vertices are fan-triangulated.
    """
    verts, tris = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    s = tok.split("/")[0]
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for t in range(1, len(idx) - 1):
                    tris.append([idx[0], idx[t], idx[t + 1]])
    return np.asarray(verts, dtype=np.float64), np.asarray(tris, dtype=np.int64)


def _points_inside(points: np.ndarray, verts: np.ndarray, tris: np.ndarray,
                   chunk: int = 4096) -> np.ndarray:
    """Ray-parity inside test for many points against a triangle mesh.

    Casts a ray along +x from each point and counts crossings (watertight-ish;
    equivalent in spirit to pyvista's enclosed-point selection used by
    pv.voxelize, reference object.py:30). Vectorized over (points x tris) in chunks.
    """
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    # Slightly off-axis ray direction avoids grazing shared edges/diagonals
    # of the quad faces (which would double-count crossings).
    d = np.array([1.0, 5.7721566e-4, 3.1415927e-4])
    d /= np.linalg.norm(d)
    # Constant direction: precompute pvec = d x e2 per tri.
    pvec = np.cross(np.broadcast_to(d, e1.shape), e2)
    det = np.einsum("td,td->t", e1, pvec)
    ok = np.abs(det) > 1e-12
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)

    inside = np.zeros(points.shape[0], dtype=bool)
    for s in range(0, points.shape[0], chunk):
        p = points[s:s + chunk]                      # (P,3)
        tvec = p[:, None, :] - v0[None, :, :]        # (P,T,3)
        u = np.einsum("ptd,td->pt", tvec, pvec) * inv_det
        qvec = np.cross(tvec, e1[None, :, :])
        v = (qvec @ d) * inv_det                      # (P,T); d=(1,0,0) -> qvec[...,0]
        t = np.einsum("ptd,td->pt", qvec, e2) * inv_det
        hit = ok[None, :] & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-10)
        inside[s:s + chunk] = (hit.sum(axis=1) % 2) == 1
    return inside


def voxelize(verts: np.ndarray, tris: np.ndarray, dx: float) -> HexMesh:
    """Voxelize a triangle surface into a hex lattice at spacing dx.

    Selects lattice cells whose centers fall inside the surface (the same
    criterion as pv.voxelize with check_surface=False, reference object.py:30).
    """
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    origin = lo
    n_cells = np.maximum(np.ceil((hi - lo) / dx).astype(np.int64), 1)
    ii, jj, kk = np.meshgrid(*[np.arange(n) for n in n_cells], indexing="ij")
    cells = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    centers = origin + (cells + 0.5) * dx
    keep = _points_inside(centers, verts, tris)
    return hex_mesh_from_cells(cells[keep], dx, origin)


def hex_mesh_from_cells(cells: np.ndarray, dx: float, origin: np.ndarray) -> HexMesh:
    """Build a HexMesh from integer lattice cell coordinates (C, 3)."""
    cells = np.asarray(cells, dtype=np.int64)
    corners = cells[:, None, :] + CORNER_OFFSETS[None, :, :]     # (C, 8, 3)
    flat = corners.reshape(-1, 3)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    hexes = inv.reshape(-1, 8).astype(np.int32)
    x = (origin[None, :] + uniq * dx).astype(np.float32)
    return HexMesh(x=x, hexes=hexes, ijk=uniq, dx=float(dx),
                   origin=np.asarray(origin, dtype=np.float64))


def beam(nx: int, ny: int, nz: int, dx: float = 0.05,
         origin=(0.0, 0.0, 0.0)) -> HexMesh:
    """Procedural solid beam of nx*ny*nz voxels (bundled-mesh replacement)."""
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    cells = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    return hex_mesh_from_cells(cells, dx, np.asarray(origin, dtype=np.float64))


def load_hex_mesh(scene_mesh_path: str | None, dx: float,
                  beam_shape=(8, 8, 24)) -> HexMesh:
    """Load-or-generate entry point used by sims and benchmarks."""
    if scene_mesh_path is None:
        return beam(*beam_shape, dx=dx)
    v, t = load_obj(scene_mesh_path)
    return voxelize(v, t, dx)


def surface_triangles(hexes: np.ndarray) -> np.ndarray:
    """Extract boundary faces as triangles for rendering/picking.

    A face is boundary iff it appears exactly once across all hexes (the
    reference's dict-hashing, object.py:47-79). Returns (F, 3) int32 with
    outward orientation.
    """
    faces = hexes[:, _HEX_FACES]                     # (H, 6, 4)
    flat = faces.reshape(-1, 4)
    key = np.sort(flat, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = flat[counts[inv] == 1]
    tris = np.concatenate([boundary[:, [0, 1, 2]], boundary[:, [0, 2, 3]]], axis=0)
    return tris.astype(np.int32)
