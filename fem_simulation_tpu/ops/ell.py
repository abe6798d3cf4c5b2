"""Block-ELL sparse linear algebra (3x3 blocks) for hex-lattice FEM matrices.

TPU-native replacement for the reference's vendored/patched warp.sparse BSR
module (/root/reference/exp1/quasi_simulation/sparse.py): every row of a hex
lattice FEM matrix has at most 27 block entries, so the matrix is a dense
(N, K, 3, 3) value tensor plus an (N, K) neighbor table. SpMV is then
gather + einsum + sum over K — no sort, no scatter, no dynamic nnz, and the
L/D/U split the reference maintains as three separate BSR matrices
(object.py:499-599) becomes three static masks over the same tensor.

Also provides the batched 3x3 utilities that replace reference Warp kernels:
solve3x3 (cublas.py:58-92, a 3-iteration CG — here an exact adjugate solve) and
spd_project (cublas.py:115-127, wp.eig3 — here a batched cyclic Jacobi
eigensolver).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# f32 einsums on TPU default to bf16 MXU passes; the physics path needs full
# float32 accumulation (CG to 1e-4 on O(1) forces), so pin HIGHEST precision.
import functools as _functools
import jax as _jax
_einsum = _functools.partial(jnp.einsum, precision=_jax.lax.Precision.HIGHEST)
_mm = _functools.partial(jnp.matmul, precision=_jax.lax.Precision.HIGHEST)


def spmv(values: jnp.ndarray, nbr: jnp.ndarray, mask: jnp.ndarray,
         x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with A in block-ELL form.

    Args:
      values: (N, K, 3, 3); nbr: (N, K) int; mask: (N, K) 0/1; x: (N, 3).
    """
    xg = x[nbr] * mask[..., None]                 # (N, K, 3)
    return _einsum("nkji,nki->nj", values, xg)


def spmv_rows(values, nbr, mask, x, r0: int, r1: int) -> jnp.ndarray:
    """Row-sliced SpMV: y[r0:r1] = (A @ x)[r0:r1] with a static slice.

    Used by the colored Gauss-Seidel sweep — color classes are contiguous index
    ranges, so the per-color sub-SpMV the reference rebuilds matrices for
    (object.py:897-908, offset bsr_set_from_triplets + bsr_mv) is a static slice.
    """
    v = jax.lax.slice_in_dim(values, r0, r1, axis=0)
    nb = jax.lax.slice_in_dim(nbr, r0, r1, axis=0)
    mk = jax.lax.slice_in_dim(mask, r0, r1, axis=0)
    xg = x[nb] * mk[..., None]
    return _einsum("nkji,nki->nj", v, xg)


def diag_blocks(values: jnp.ndarray, diag_slot: jnp.ndarray) -> jnp.ndarray:
    """Extract (N, 3, 3) diagonal blocks."""
    n = values.shape[0]
    return values[jnp.arange(n), diag_slot]


def add_to_diag(values: jnp.ndarray, diag_slot: jnp.ndarray,
                blocks: jnp.ndarray) -> jnp.ndarray:
    """values[i, diag_slot[i]] += blocks[i]."""
    n = values.shape[0]
    return values.at[jnp.arange(n), diag_slot].add(blocks)


def solve3x3(A: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Batched exact 3x3 solve via the adjugate (replaces the reference's
    3-iteration CG 'division', cublas.py:58-92). A: (..., 3, 3), b: (..., 3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    inv_det = det / (det * det + eps)
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def _jacobi_rotation(A, V, p: int, q: int):
    """One cyclic-Jacobi rotation zeroing A[p, q] (batched).

    Fully unrolled elementwise updates — no rotation-matrix matmuls.
    Batched (N, 3, 3) @ (N, 3, 3) products lower to MXU dot_generals with
    ~0.1% utilization and were measured at 190 ms per 66k-vertex multigrid
    solve on v5e; the explicit row/column update formulas keep the whole
    eigensolve on the VPU."""
    r = 3 - p - q                       # the untouched index
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]
    # theta from the standard Jacobi formula, safe when apq ~ 0.
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    arp = A[..., r, p]
    arq = A[..., r, q]
    app_n = app - t * apq
    aqq_n = aqq + t * apq
    arp_n = c * arp - s * arq
    arq_n = s * arp + c * arq
    zero = jnp.zeros_like(apq)
    A = (A.at[..., p, p].set(app_n).at[..., q, q].set(aqq_n)
          .at[..., p, q].set(zero).at[..., q, p].set(zero)
          .at[..., r, p].set(arp_n).at[..., p, r].set(arp_n)
          .at[..., r, q].set(arq_n).at[..., q, r].set(arq_n))
    vp = V[..., :, p]
    vq = V[..., :, q]
    V = (V.at[..., :, p].set(c[..., None] * vp - s[..., None] * vq)
          .at[..., :, q].set(s[..., None] * vp + c[..., None] * vq))
    return A, V


def eigh3x3(A: jnp.ndarray, sweeps: int = 6):
    """Batched symmetric 3x3 eigendecomposition by cyclic Jacobi.

    Returns (w, V) with A ~= V diag(w) V^T. Deterministic and fully
    vectorized — replaces wp.eig3 (reference cublas.py:121).
    """
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape).copy()
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def spd_project(values: jnp.ndarray, eps: float,
                rel_floor: float = 0.0) -> jnp.ndarray:
    """Clamp negative eigenvalues of each 3x3 block to +eps
    (reference spd_matrix33f, cublas.py:115-127).

    rel_floor > 0 additionally floors every eigenvalue at
    rel_floor * max|eigenvalue| of its block: a near-singular indefinite
    block otherwise turns solve3x3 into a huge ill-scaled step (observed as
    the multigrid smoother exploding on large-deformation cantilevers where
    the StVK Hessian diagonal loses definiteness)."""
    shape = values.shape
    A = values.reshape(-1, 3, 3)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    w, V = eigh3x3(A)
    if rel_floor > 0.0:
        wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        w = jnp.maximum(w, rel_floor * wmax + eps)
    else:
        w = jnp.where(w < 0.0, eps, w)
    # V diag(w) V^T as a sum of scaled outer products (elementwise; a
    # batched tiny einsum here would land on the MXU at ~0.1% utilization)
    out = sum(w[:, j, None, None] * V[:, :, None, j] * V[:, None, :, j]
              for j in range(3))
    return out.reshape(shape)


def eigvals3x3_sym(A: jnp.ndarray):
    """Closed-form eigenvalues of symmetric 3x3 blocks (trigonometric
    method, Smith 1961): (..., 3, 3) -> (lmin, lmax), each (...).

    Purely elementwise — unlike the cyclic-Jacobi eigh3x3 it emits no
    batched tiny matmuls (which are badly MXU-shaped and measured 190 ms
    per 66k-vertex solve when used in the multigrid smoother)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    ps = jnp.where(p > 1e-30, p, 1.0)
    # det((A - qI)/p) / 2
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb / (2.0 * ps * ps * ps), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    return lmin, lmax


def spd_shift3x3(A: jnp.ndarray, rel_floor: float = 1e-3,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Shift each symmetric 3x3 block by max(0, floor - lmin) * I so its
    spectrum sits above floor = rel_floor * |lmax| + eps.

    A cheap (elementwise) alternative to spd_project for preconditioner
    blocks: an eigenvalue shift regularizes exactly like clamping but needs
    no eigenvectors, so there are no tiny batched matmuls on the TPU hot
    path. Slightly stronger than clamping (ALL eigenvalues move up by the
    shift), which is harmless for a smoother."""
    lmin, lmax = eigvals3x3_sym(A)
    shift = jnp.maximum(0.0, rel_floor * jnp.abs(lmax) + eps - lmin)
    return A + shift[..., None, None] * jnp.eye(3, dtype=A.dtype)


def inf_norm(x: jnp.ndarray) -> jnp.ndarray:
    """max |component| (reference Inf_norm, cublas.py:44-54)."""
    return jnp.max(jnp.abs(x))


def vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b)
