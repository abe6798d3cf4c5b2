"""Pallas TPU kernels for the hot sparse ops.

Block-ELL SpMV in a **lanes layout**: vectors live as (3, N) with vertices on
the lane axis, the neighbor gather uses Mosaic's `tpu.dynamic_gather`
(lowered from same-shape `jnp.take_along_axis(x, idx, axis=1)` — the one
gather shape TPU supports), and the 3x3 block contraction unrolls into 9
fused multiply-adds over full (N,)-lane vectors per stencil slot. The slot
loop (K <= 27) streams the value planes; everything stays in VMEM.

This is the TPU-native dual of the reference's BSR SpMV
(/root/reference/exp1/quasi_simulation/sparse.py:1144-1259): instead of one
CUDA thread per row walking a CSR row, every *stencil slot* is a full-width
vector op across all rows at once — the natural shape for a 8x128 VPU.

STATUS (measured on v5e): the kernel is exact in interpret mode, but Mosaic's
`tpu.dynamic_gather` currently only supports gather sources within a single
vreg ("Not implemented: Multiple source vregs along gather dimension"), so
arbitrary-width neighbor gathers cannot lower to real TPU hardware yet. The
production fast paths are therefore (a) ops.ell.spmv (XLA gather+einsum) for
unstructured meshes and (b) ops.stencil.spmv_stencil (27 static shifts, no
gather at all) for lattice-embedded meshes. This module stays as the
interpret-mode reference and will light up when Mosaic grows wide gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ell as ell_ops


def _spmv_lanes_kernel(nbr_ref, vals_ref, x_ref, y_ref):
    """nbr: (K, N) int32; vals: (K, 9, N); x: (3, N); y: (3, N)."""
    K = nbr_ref.shape[0]
    x = x_ref[:]                              # (3, N)
    acc0 = jnp.zeros_like(x[0])
    acc1 = jnp.zeros_like(x[0])
    acc2 = jnp.zeros_like(x[0])
    for k in range(K):                        # static unroll over the stencil
        idx = nbr_ref[k, :]                   # (N,)
        idx3 = jnp.broadcast_to(idx[None, :], x.shape)
        xg = jnp.take_along_axis(x, idx3, axis=1)   # tpu.dynamic_gather
        v = vals_ref[k]                       # (9, N)
        acc0 += v[0] * xg[0] + v[1] * xg[1] + v[2] * xg[2]
        acc1 += v[3] * xg[0] + v[4] * xg[1] + v[5] * xg[2]
        acc2 += v[6] * xg[0] + v[7] * xg[1] + v[8] * xg[2]
    y_ref[0, :] = acc0
    y_ref[1, :] = acc1
    y_ref[2, :] = acc2


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_lanes(vals_T, nbr_T, x_T, interpret: bool = False):
    """y_T = A @ x in lanes layout.

    Args:
      vals_T: (K, 9, N) masked block values, vals_T[k, 3*j+i, n] = A[n,k][j,i].
      nbr_T:  (K, N) int32 neighbor ids (padding = self with zero blocks).
      x_T:    (3, N).
    Returns y_T: (3, N).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, _, n = vals_T.shape
    return pl.pallas_call(
        _spmv_lanes_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), x_T.dtype),
        interpret=interpret,
    )(nbr_T, vals_T, x_T)


def to_lanes(values, nbr, mask, pad_to: int = 128):
    """Convert (N, K, 3, 3) + (N, K) ELL to the lanes layout (pads N)."""
    n, K = nbr.shape
    npad = (-n) % pad_to
    vm = values * mask[..., None, None]
    vals_T = jnp.transpose(vm.reshape(n, K, 9), (1, 2, 0))      # (K, 9, N)
    nbr_T = jnp.transpose(nbr, (1, 0))                          # (K, N)
    if npad:
        vals_T = jnp.pad(vals_T, ((0, 0), (0, 0), (0, npad)))
        nbr_T = jnp.pad(nbr_T, ((0, 0), (0, npad)))
    return vals_T, nbr_T, n


def spmv(values, nbr, mask, x, interpret: bool | None = None):
    """Pallas lanes SpMV with transparent layout conversion (testing API).

    For production use, keep operands in lanes layout across iterations and
    call spmv_lanes directly — the conversion here is per-call overhead.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    vals_T, nbr_T, n = to_lanes(values, nbr, mask)
    x_T = jnp.transpose(x, (1, 0))
    if x_T.shape[1] != nbr_T.shape[1]:
        x_T = jnp.pad(x_T, ((0, 0), (0, nbr_T.shape[1] - x_T.shape[1])))
    y_T = spmv_lanes(vals_T, nbr_T, x_T, interpret=interpret)
    return jnp.transpose(y_T[:, :n], (1, 0))
