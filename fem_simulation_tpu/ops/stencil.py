"""Structured-lattice stencil SpMV: the gather-free fast path.

A voxel hex mesh embedded in its bounding lattice makes the FEM matrix a
27-point *stencil*: y[i,j,k] = sum_o A_o[i,j,k] @ x[i+oi, j+oj, k+ok]. On TPU
this is the speed-of-light formulation — every stencil offset is a static
slice (XLA pads/fuses; no gather, no scatter, perfectly vectorized), and it
sidesteps Mosaic's dynamic_gather restriction (single-vreg sources only)
that blocks a general gather-based Pallas SpMV (see ops/pallas_kernels.py).

Cost: lattice embedding wastes memory on empty cells (fill fraction of the
bounding box). Use for dense-ish shapes (beams, blocks near 100%; voxelized
organic shapes typically 30-60%).

Layout: x_lat (X, Y, Z, 3) zero-padded by 1 on every side; values_lat
(27, X, Y, Z, 3, 3) with offset index o = (oi+1)*9 + (oj+1)*3 + (ok+1).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

OFFSETS = np.array([[i, j, k]
                    for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
                   dtype=np.int64)


def build_lattice_map(lvl):
    """Map a LevelTopology onto its bounding lattice.

    Returns (shape, lat_of_vert (N,3) int32 zero-based, vert_of_lat (X,Y,Z)
    int32 with -1 holes, fill fraction).
    """
    ijk = lvl.ijk
    real = ijk[:, 0] > -(10 ** 5)  # exclude phantom padding rows
    lo = ijk[real].min(axis=0)
    hi = ijk[real].max(axis=0)
    shape = tuple((hi - lo + 1).tolist())
    lat = np.where(real[:, None], ijk - lo, 0).astype(np.int32)
    vert_of_lat = np.full(shape, -1, dtype=np.int32)
    idx = np.nonzero(real)[0]
    vert_of_lat[lat[idx, 0], lat[idx, 1], lat[idx, 2]] = idx
    fill = real.sum() / float(np.prod(shape))
    return shape, lat, vert_of_lat, fill


def values_to_lattice(values, nbr, mask, lvl, lat_map):
    """Scatter block-ELL values into the (27, X, Y, Z, 3, 3) stencil tensor."""
    shape, lat, vert_of_lat, _ = lat_map
    n, K = nbr.shape
    vals_lat = np.zeros((27,) + shape + (3, 3), dtype=np.float32)
    v = np.asarray(values)
    nb = np.asarray(nbr)
    mk = np.asarray(mask) > 0
    ii, kk = np.nonzero(mk)
    jj = nb[ii, kk]
    off = lvl.ijk[jj] - lvl.ijk[ii] + 1         # in {0,1,2}^3
    o = off[:, 0] * 9 + off[:, 1] * 3 + off[:, 2]
    p = lat[ii]
    vals_lat[o, p[:, 0], p[:, 1], p[:, 2]] = v[ii, kk]
    return jnp.asarray(vals_lat)


def field_to_lattice(x, lat, shape):
    out = jnp.zeros(shape + (x.shape[-1],), x.dtype)
    return out.at[lat[:, 0], lat[:, 1], lat[:, 2]].set(x)


def field_from_lattice(x_lat, lat):
    return x_lat[lat[:, 0], lat[:, 1], lat[:, 2]]


@jax.jit
def spmv_stencil(vals_lat, x_lat):
    """y = A @ x on the lattice: 27 shifted multiply-accumulates, no gather.

    vals_lat: (27, X, Y, Z, 3, 3); x_lat: (X, Y, Z, 3).
    """
    xp = jnp.pad(x_lat, ((1, 1), (1, 1), (1, 1), (0, 0)))
    X, Y, Z, _ = x_lat.shape
    y = jnp.zeros_like(x_lat)
    o = 0
    for di in (0, 1, 2):
        for dj in (0, 1, 2):
            for dk in (0, 1, 2):
                xs = jax.lax.dynamic_slice(
                    xp, (di, dj, dk, 0), (X, Y, Z, 3))
                y = y + _einsum("xyzji,xyzi->xyzj", vals_lat[o], xs)
                o += 1
    return y


# ---------------------------------------------------------------------------
# Structured elastic force (uniform lattice): the gather-free hot path
# ---------------------------------------------------------------------------

_CORNERS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def lattice_material_tables(dx: float):
    """On a uniform lattice J = (dx/2) I exactly, so the material shape
    gradients are constant across cells: g[i, q, :] = S[i, q, :] * 2/dx,
    det = (dx/2)^3 (reference prepare_kernal specialization)."""
    from .elastic import shape_func_grad
    S = shape_func_grad()                       # (8, 8, 3)
    g = jnp.asarray(S) * (2.0 / dx)
    det = (dx / 2.0) ** 3
    return g, det


def _cell_slices(x_lat):
    """The 8 corner fields of every cell as shifted static slices."""
    X, Y, Z, _ = x_lat.shape
    return [x_lat[di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1]
            for (di, dj, dk) in _CORNERS]


def elastic_force_lattice(u_lat, cell_mask, g, det, mu, la):
    """Elastic force on the vertex lattice; all data movement is static
    shifted slices/adds (no gather, no scatter).

    u_lat: (X, Y, Z, 3) DISPLACEMENTS from the rest lattice (u = x - x0);
    cell_mask: (X-1, Y-1, Z-1) 1.0 on real cells.

    Displacement form: F = I + sum_i u_i g_iq^T. On the uniform lattice the
    rest map is linear, so F(rest) = I holds EXACTLY and the identity is
    added analytically instead of summed numerically. Forming F from
    absolute positions sums 8 terms of magnitude |x| * (2/dx) that cancel
    to O(1) — measured f32 force noise 4.8e-5 on a 12.8-unit-long 74k beam
    (growing with coordinate magnitude), which stalled Newton at a
    ~1.2e-4 residual floor; the u-form evaluates the same force to 1.3e-6.
    """
    xs = _cell_slices(u_lat)                   # 8 x (Cx, Cy, Cz, 3)
    # F[c, q, r, d] = I + sum_i us_i[c, r] g[i, q, d]
    F = sum(_einsum("xyzr,qd->xyzqrd", xs[i], g[i]) for i in range(8))
    F = F + jnp.eye(3, dtype=u_lat.dtype)
    Ft = jnp.swapaxes(F, -1, -2)
    E = 0.5 * (_einsum("xyzqab,xyzqbc->xyzqac", Ft, F)
               - jnp.eye(3, dtype=u_lat.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    M = 2.0 * mu * E + la * trE[..., None, None] * jnp.eye(3, dtype=u_lat.dtype)
    P = _einsum("xyzqab,xyzqbc->xyzqac", F, M)
    Pm = P * cell_mask[..., None, None, None]
    out = jnp.zeros_like(u_lat)
    X, Y, Z, _ = u_lat.shape
    for i, (di, dj, dk) in enumerate(_CORNERS):
        # f_i = -det * sum_q P @ g[i, q]
        fi = -det * _einsum("xyzqrd,qd->xyzr", Pm, g[i])
        out = out.at[di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1].add(fi)
    return out


def elastic_energy_lattice(u_lat, cell_mask, g, det, mu, la):
    """StVK energy from DISPLACEMENTS (u = x - x0; see
    elastic_force_lattice for the precision rationale)."""
    xs = _cell_slices(u_lat)
    F = sum(_einsum("xyzr,qd->xyzqrd", xs[i], g[i]) for i in range(8))
    F = F + jnp.eye(3, dtype=u_lat.dtype)
    Ft = jnp.swapaxes(F, -1, -2)
    E = 0.5 * (_einsum("xyzqab,xyzqbc->xyzqac", Ft, F)
               - jnp.eye(3, dtype=u_lat.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    psi = mu * jnp.sum(E * E, axis=(-2, -1)) + 0.5 * la * trE * trE
    return jnp.sum(psi * cell_mask[..., None] * det)


def elastic_hessian_diag_lattice(u_lat, cell_mask, g, det, mu, la):
    """Vertex-diagonal 3x3 Hessian blocks on the lattice (stencil form of
    ops.elastic.hessian_diag): 8 shifted adds of per-cell corner blocks.
    Takes DISPLACEMENTS (see elastic_force_lattice)."""
    xs = _cell_slices(u_lat)
    F = sum(_einsum("xyzr,qd->xyzqrd", xs[i], g[i]) for i in range(8))
    F = F + jnp.eye(3, dtype=u_lat.dtype)
    Ft = jnp.swapaxes(F, -1, -2)
    E = 0.5 * (_einsum("xyzqab,xyzqbc->xyzqac", Ft, F)
               - jnp.eye(3, dtype=u_lat.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    M = 2.0 * mu * E + la * trE[..., None, None] * jnp.eye(3, dtype=u_lat.dtype)
    C = _einsum("xyzqrc,xyzqsc->xyzqrs", F, F)
    X, Y, Z, _ = u_lat.shape
    out = jnp.zeros(u_lat.shape[:3] + (3, 3), u_lat.dtype)
    eye = jnp.eye(3, dtype=u_lat.dtype)
    cm = cell_mask[..., None, None]
    for i, (di, dj, dk) in enumerate(_CORNERS):
        u = _einsum("xyzqrc,qc->xyzqr", F, g[i])          # u_i = F g_i
        s1 = _einsum("qc,xyzqcd,qd->xyzq", g[i], M, g[i])
        gg_q = _einsum("qc,qc->q", g[i], g[i])
        Hd = det * (_einsum("xyzq,ji->xyzji", s1, eye)
                    + (mu + la) * _einsum("xyzqj,xyzqi->xyzji", u, u)
                    + mu * _einsum("q,xyzqji->xyzji", gg_q, C))
        out = out.at[di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1].add(Hd * cm)
    return out


# ---------------------------------------------------------------------------
# Structured multigrid transfers: separable trilinear stencils
# ---------------------------------------------------------------------------
# On the lattice, trilinear prolongation is zero-interleaving followed by a
# separable [1/2, 1, 1/2] convolution per axis; restriction (hat) is its
# exact adjoint: convolve, then take every other sample. Requires odd grid
# dims (pad the lattice map up front). No gather/scatter anywhere.

def _conv_half(x, axis):
    """y = x + 0.5 * (shift_left + shift_right) along `axis` (zero BCs)."""
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(1, None)
    hi[axis] = slice(None, -1)
    y = x
    y = y.at[tuple(hi)].add(0.5 * x[tuple(lo)])
    y = y.at[tuple(lo)].add(0.5 * x[tuple(hi)])
    return y


def prolong_lat(xc, shape=None):
    """Trilinear prolongation. Default: (Xc, Yc, Zc, C) -> (2Xc-1, ...).

    shape (3-tuple) overrides the fine spatial dims per axis; each entry must
    be 2n-1 (odd grids, the default) or 2n (even grids — used by the
    distributed multigrid, whose sharded z axis must divide the device count
    so it is padded to an even multiple instead of to odd; the last fine
    plane then interpolates only its single existing coarse neighbor, which
    is exact because that plane is padding). restrict_lat is the adjoint in
    both cases (subsampling [::2] keeps ceil(n/2) planes for either parity).
    """
    Xc, Yc, Zc, C = xc.shape
    if shape is None:
        shape = (2 * Xc - 1, 2 * Yc - 1, 2 * Zc - 1)
    for n, s in zip((Xc, Yc, Zc), shape):
        assert s in (2 * n - 1, 2 * n), (xc.shape, shape)
    z = jnp.zeros(tuple(shape) + (C,), xc.dtype)
    z = z.at[::2, ::2, ::2].set(xc)
    for ax in range(3):
        z = _conv_half(z, ax)
    return z


def restrict_lat(xf):
    """Adjoint of prolong_lat ("hat" restriction): convolve then subsample."""
    y = xf
    for ax in range(3):
        y = _conv_half(y, ax)
    return y[::2, ::2, ::2]
