"""Jacobi and 8-color symmetric Gauss-Seidel smoothers on block-ELL operators.

TPU-native redesign of the reference smoothers
(/root/reference/exp1/quasi_simulation/object.py:869-929):

* The reference stores L/D/U as three BSR matrices and, inside every GS sweep,
  REBUILDS a per-color sub-matrix with an offset bsr_set_from_triplets before a
  sub-SpMV (object.py:897-908) — a GPU workaround. Here color classes are
  contiguous index ranges of the canonical ordering, so the per-color update is
  a statically-sliced row SpMV over a masked view of one ELL tensor; the whole
  sweep is unrolled at trace time (8 colors, static slices).
* The reference's "division" by the 3x3 diagonal block is a 3-iteration CG
  (cublas.py:58-92); here it is an exact adjugate solve (ops.ell.solve3x3).

One GS iteration = backward sweep then forward sweep, exactly the reference's
order: x_bwd = (D+U)^{-1} (b - L x_prev), x_fwd = (D+L)^{-1} (b - U x_bwd).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import ell


class EllOperator:
    """Static wrapper holding the ELL topology masks for one level.

    Masks are derived once from the neighbor table; `values` vary per assembly
    and are passed to each call (pytree-friendly: this object stays static).
    """

    def __init__(self, nbr, mask, diag_slot, color_offsets):
        self.nbr = nbr                      # (N, K) int32
        self.mask = mask                    # (N, K) float
        row = jnp.arange(nbr.shape[0], dtype=nbr.dtype)[:, None]
        self.lower = mask * (nbr < row)     # strictly below diagonal
        self.upper = mask * (nbr > row)
        self.offdiag = self.lower + self.upper
        self.diag_slot = diag_slot
        self.color_offsets = tuple(int(c) for c in color_offsets)  # static

    @property
    def n_colors(self):
        return len(self.color_offsets) - 1


def jacobi(op: EllOperator, values, b, iterations: int = 2, x0=None):
    """Damped-free block Jacobi from x0=0 (reference PerformJacobi,
    object.py:869-884): x <- D^{-1} (b - (L+U) x)."""
    D = ell.diag_blocks(values, op.diag_slot)
    x = jnp.zeros_like(b) if x0 is None else x0
    for _ in range(iterations):
        r = b - ell.spmv(values * op.offdiag[..., None, None], op.nbr, op.mask, x)
        x = ell.solve3x3(D, r)
    return x


def _sweep(op: EllOperator, values, D, b_eff, reverse: bool):
    """One colored sweep: solve colors sequentially, each color in parallel.

    b_eff must already exclude the "other triangle" contribution; within the
    sweep we subtract the same-triangle coupling from already-solved colors.
    """
    tri_mask = op.lower if not reverse else op.upper
    vals_tri = values * tri_mask[..., None, None]
    x = jnp.zeros_like(b_eff)
    colors = range(op.n_colors)
    if reverse:
        colors = reversed(list(colors))
    for c in colors:
        r0, r1 = op.color_offsets[c], op.color_offsets[c + 1]
        if r1 == r0:
            continue
        rhs = jax.lax.slice_in_dim(b_eff, r0, r1, axis=0) - ell.spmv_rows(
            vals_tri, op.nbr, op.mask, x, r0, r1)
        Dc = jax.lax.slice_in_dim(D, r0, r1, axis=0)
        xc = ell.solve3x3(Dc, rhs)
        x = jax.lax.dynamic_update_slice_in_dim(x, xc, r0, axis=0)
    return x


def gauss_seidel(op: EllOperator, values, b, iterations: int = 1, x0=None):
    """Colored symmetric GS (reference PerformGaussSeidel, object.py:886-929).

    Per iteration: backward sweep using L x_prev, then forward sweep using
    U x_bwd. Starts from x0 (zero by default, matching dev_delta_x.zero_()).
    """
    D = ell.diag_blocks(values, op.diag_slot)
    vals_low = values * op.lower[..., None, None]
    vals_up = values * op.upper[..., None, None]
    x = jnp.zeros_like(b) if x0 is None else x0
    for _ in range(iterations):
        b_bwd = b - ell.spmv(vals_low, op.nbr, op.mask, x)
        x = _sweep(op, values, D, b_bwd, reverse=True)
        b_fwd = b - ell.spmv(vals_up, op.nbr, op.mask, x)
        x = _sweep(op, values, D, b_fwd, reverse=False)
    return x
