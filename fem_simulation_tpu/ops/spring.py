"""Mass-spring cloth kernels (energy / gradient / Hessian).

TPU-native redesign of /root/reference/exp1/cloth_simulation/triangle.py:
one batched computation over all edges, scatter-add instead of atomics.
Hessian per edge (triangle.py:47-63):
    H = (k - k l0/|d|) I + (k l0 / |d|^3) d d^T
scattered as [+H, -H; -H, +H] into the 2x2 vertex block pattern.
"""
from __future__ import annotations

import jax.numpy as jnp


def rest_lengths(x, edges):
    d = x[edges[:, 0]] - x[edges[:, 1]]
    return jnp.linalg.norm(d, axis=-1)


def energy(x, edges, l0, k):
    d = x[edges[:, 0]] - x[edges[:, 1]]
    dl = jnp.linalg.norm(d, axis=-1) - l0
    return 0.5 * k * jnp.sum(dl * dl)


def force(x, edges, l0, k, n_verts):
    """Spring force = -dE/dx (triangle.py:24-34 adds k(l0/|d|-1) d with +/-)."""
    d = x[edges[:, 0]] - x[edges[:, 1]]
    ln = jnp.linalg.norm(d, axis=-1)
    coef = k * (l0 / ln - 1.0)
    f = coef[:, None] * d
    out = jnp.zeros((n_verts, 3), dtype=x.dtype)
    out = out.at[edges[:, 0]].add(f)
    out = out.at[edges[:, 1]].add(-f)
    return out


def hessian_blocks(x, edges, l0, k):
    """Per-edge 3x3 Hessian block H (the [0,0] block; off-diagonals are -H)."""
    d = x[edges[:, 0]] - x[edges[:, 1]]
    ln = jnp.linalg.norm(d, axis=-1)
    a = k * l0 / ln
    b = a / (ln * ln)
    eye = jnp.eye(3, dtype=x.dtype)
    return (k - a)[:, None, None] * eye + b[:, None, None] * d[:, None, :] * d[:, :, None]


def assemble_hessian_ell(x, edges, l0, k, edge_slot, n_verts, K,
                         base_values=None):
    """Scatter per-edge Hessians into block-ELL.

    edge_slot: (E, 4) flat slots for blocks (i,i), (i,j), (j,i), (j,j)
    (the reference's 4-wide offset table, cloth object.py:105,135-143).
    """
    H = hessian_blocks(x, edges, l0, k)
    if base_values is None:
        vals = jnp.zeros((n_verts * K, 3, 3), dtype=x.dtype)
    else:
        vals = base_values.reshape(n_verts * K, 3, 3)
    signs = jnp.array([1.0, -1.0, -1.0, 1.0], dtype=x.dtype)
    contrib = H[:, None, :, :] * signs[None, :, None, None]   # (E, 4, 3, 3)
    vals = vals.at[edge_slot.reshape(-1)].add(contrib.reshape(-1, 3, 3))
    return vals.reshape(n_verts, K, 3, 3)
