"""Multigrid transfer operators: restriction, prolongation, Galerkin product.

Replaces the reference's 8 BSR interpolation matrices and their bsr_mv /
bsr_mm applications (/root/reference/exp1/quasi_simulation/object.py:245-447,
1021-1035, 1258-1264). Interpolation blocks are scalar multiples of I, so we
store scalar weight tables and apply them as weighted gathers / segment sums.
"""
from __future__ import annotations

import jax.numpy as jnp

# f32 einsums on TPU default to bf16 MXU passes; the physics path needs full
# float32 accumulation (CG to 1e-4 on O(1) forces), so pin HIGHEST precision.
import functools as _functools
import jax as _jax
_einsum = _functools.partial(jnp.einsum, precision=_jax.lax.Precision.HIGHEST)


def prolong(p_idx, p_w, xc):
    """x_f = P @ x_c : weighted gather, no scatter (fine side rows <= 8 wide).

    Equivalent to bsr_mv(Us_*, x_c, ...) (object.py:1032,1209).
    """
    return _einsum("fk,fkc->fc", p_w, xc[p_idx])


def restrict(r_idx, r_w, xf):
    """x_c = R @ x_f = P^T x_f : weighted gather on coarse rows.

    Equivalent to bsr_mv(Ut_*, x_f, ...) (object.py:1027,1190).
    """
    return _einsum("ck,ckd->cd", r_w, xf[r_idx])


def galerkin(values_fine, g_src, g_dst, g_w, n_coarse: int, Kc: int):
    """A_c = P^T A P via the precomputed gather-multiply-scatter plan.

    Replaces bsr_mm(Ut_hat, bsr_mm(A, Us_hat)) + block reorder
    (object.py:1259-1261) with a single deterministic scatter-add.
    """
    src = values_fine.reshape(-1, 3, 3)[g_src]        # (M, 3, 3)
    contrib = g_w[:, None, None] * src
    out = jnp.zeros((n_coarse * Kc, 3, 3), dtype=values_fine.dtype)
    out = out.at[g_dst].add(contrib)
    return out.reshape(n_coarse, Kc, 3, 3)
