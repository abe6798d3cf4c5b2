"""Batched StVK hexahedral FEM kernels (energy / gradient / Hessian).

TPU-native redesign of the reference Warp kernels
(/root/reference/exp1/quasi_simulation/quai_hexagon.py):

* ``compute_elastic_energy`` (quai_hexagon.py:28-55): one CUDA thread per
  (hex, quadrature) with an atomic-add reduction. Here: one batched einsum over
  all (hex, quad) pairs and a deterministic ``jnp.sum``.
* ``compute_partial_elastic_energy_X`` (quai_hexagon.py:109-159): atomic-sub
  scatter of P(F)-based forces. Here: vmapped einsum + one scatter-add.
* ``compute_elastic_hessian`` (quai_hexagon.py:69-106): 64 threads/hex, each
  re-deriving dF/dE/dP chains per coordinate direction. Here: the directional
  derivative is expanded analytically into a closed form,

    H[a,b] = sum_q det_q * ( (g_a^T M g_b) I + mu * u_b u_a^T
                             + mu * (g_a . g_b) F F^T + la * u_a u_b^T )

  with M = 2 mu E + la tr(E) I and u_a = F g_a, which is exactly the reference's
  dP expansion evaluated for all 3 directions at once — so the whole element
  Hessian is a handful of large batched einsums on the MXU/VPU, no atomics.

All functions are pure and jit-safe; shapes are static per scene.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# f32 einsums on TPU default to bf16 MXU passes; the physics path needs full
# float32 accumulation (CG to 1e-4 on O(1) forces), so pin HIGHEST precision.
import functools as _functools
import jax as _jax
_einsum = _functools.partial(jnp.einsum, precision=_jax.lax.Precision.HIGHEST)
_mm = _functools.partial(jnp.matmul, precision=_jax.lax.Precision.HIGHEST)

# Corner sign table, local corner index = 4*di + 2*dj + dk (mesh.CORNER_OFFSETS),
# mapped to reference-element coordinates in {-1, +1}^3 (reference object.py:702-709).
_SIGNS = np.array(
    [[2 * i - 1, 2 * j - 1, 2 * k - 1]
     for i in range(2) for j in range(2) for k in range(2)],
    dtype=np.float64,
)

# 2x2x2 Gauss points at +-1/sqrt(3) in the same layout (reference object.py:713-720).
_QUAD = _SIGNS / np.sqrt(3.0)


def shape_func_grad() -> np.ndarray:
    """S[i, q, d] = dN_i/dxi_d at Gauss point q (reference cpu_function.py:4-10).

    N_i(xi) = prod_d (1 + h_id xi_d) / 2.
    """
    S = np.zeros((8, 8, 3))
    for i in range(8):
        for q in range(8):
            for d in range(3):
                val = _SIGNS[i, d] / 2.0
                for e in range(3):
                    if e != d:
                        val *= (1.0 + _SIGNS[i, e] * _QUAD[q, e]) / 2.0
                S[i, q, d] = val
    return S.astype(np.float32)


def prepare(x0: jnp.ndarray, hexes: jnp.ndarray):
    """Rest-state element data (reference prepare_kernal, quai_hexagon.py:4-18).

    Returns:
      det: (H, 8) |dX/dxi| per quad point.
      g:   (H, 8, 8, 3) material shape gradients g[e, q, i] = J^{-T}_eq S[i, q]
           (so that F = sum_i x_i (g_i)^T).
      vol: (H,) element volumes = sum_q det (reference cublas.py Sum_8).
    """
    S = jnp.asarray(shape_func_grad())
    xe = x0[hexes]                                     # (H, 8, 3)
    # J[r, c] = dX_r/dxi_c = sum_i x_i[r] S[i, q, c]
    J = _einsum("hir,iqc->hqrc", xe, S)
    det = jnp.linalg.det(J)
    Jinv = jnp.linalg.inv(J)                           # (H, 8, 3, 3)
    g = _einsum("iqd,hqdc->hqic", S, Jinv)          # g_i = S_i @ J^{-1}
    vol = jnp.sum(det, axis=1)
    return det, g, vol


def lumped_mass(vol: jnp.ndarray, hexes: jnp.ndarray, n_verts: int,
                density: float = 1.0) -> jnp.ndarray:
    """Lumped vertex mass: each corner gets the full cell volume
    (reference prepare_mass, quai_hexagon.py:20-26 adds vol per corner)."""
    m = jnp.zeros((n_verts,), dtype=vol.dtype)
    contrib = jnp.broadcast_to(vol[:, None] * density, hexes.shape).reshape(-1)
    return m.at[hexes.reshape(-1)].add(contrib)


def _deformation(x: jnp.ndarray, hexes: jnp.ndarray, g: jnp.ndarray):
    """F[h, q] = sum_i x_i (g_i)^T  -> (H, 8, 3, 3)."""
    xe = x[hexes]
    return _einsum("hir,hqic->hqrc", xe, g)


def energy(x, hexes, det, g, mu, la) -> jnp.ndarray:
    """Total StVK energy: Psi = mu ||E||_F^2 + la/2 tr(E)^2 per quad point."""
    F = _deformation(x, hexes, g)
    Ft = jnp.swapaxes(F, -1, -2)
    E = 0.5 * (_mm(Ft, F) - jnp.eye(3, dtype=x.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    psi = mu * jnp.sum(E * E, axis=(-2, -1)) + 0.5 * la * trE * trE
    return jnp.sum(psi * det)


def _pk1(F, mu, la):
    """First Piola-ish stress the reference uses: P = F (2 mu E + la tr(E) I)."""
    Ft = jnp.swapaxes(F, -1, -2)
    E = 0.5 * (_mm(Ft, F) - jnp.eye(3, dtype=F.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    M = 2.0 * mu * E + la * trE[..., None, None] * jnp.eye(3, dtype=F.dtype)
    return _mm(F, M), E, M


def force(x, hexes, det, g, mu, la, n_verts) -> jnp.ndarray:
    """Elastic force = -dE/dx, scattered to vertices.

    Matches compute_partial_elastic_energy_X (quai_hexagon.py:109-133), which
    atomically *subtracts* P g_i det into the gradient buffer — i.e. the buffer
    holds forces, not gradients.
    """
    F = _deformation(x, hexes, g)
    P, _, _ = _pk1(F, mu, la)
    # f[h, i] = - sum_q det * P @ g_i
    f = -_einsum("hq,hqrc,hqic->hir", det, P, g)
    out = jnp.zeros((n_verts, 3), dtype=x.dtype)
    return out.at[hexes.reshape(-1)].add(f.reshape(-1, 3))


def vertex_contrib_map(hexes, n_verts: int):
    """Host-side inverse incidence map: for each vertex, the flat indices of
    its (hex, corner) contributions in an (H*8, ...) per-corner array.

    Converts the force/HVP scatter-add (`out.at[hexes].add(f)` — on TPU a
    serialized scatter with duplicate indices, measured to dominate the
    unstructured step) into a fixed-width GATHER: every vertex of a hex
    mesh belongs to at most 8 hexes, so the map is (N, 8) + mask. The
    TPU-preferred dual of the reference's hex_update_offset
    (/root/reference/exp1/quasi_simulation/object.py:563-569), at the
    vertex level instead of the matrix-slot level.
    """
    flat = np.asarray(hexes).reshape(-1)
    n = flat.shape[0]
    order = np.argsort(flat, kind="stable")
    sorted_v = flat[order]
    # rank within each vertex's group
    first = np.searchsorted(sorted_v, sorted_v)
    pos = np.arange(n) - first
    assert pos.max() < 8, "hex mesh vertex valence exceeded 8"
    idx = np.zeros((n_verts, 8), np.int32)
    mask = np.zeros((n_verts, 8), np.float32)
    idx[sorted_v, pos] = order.astype(np.int32)
    mask[sorted_v, pos] = 1.0
    return idx, mask


def _corner_gather(fc, cidx, cmask, n_verts):
    """Sum per-corner contributions (H*8, 3) onto vertices via the inverse
    map — the scatter-free reduction."""
    return jnp.sum(fc[cidx] * cmask[..., None], axis=1)


def force_gather(x, hexes, det, g, mu, la, cidx, cmask, n_verts):
    """`force` with the scatter-add replaced by the vertex_contrib_map
    gather (bit-compatible reduction order is NOT guaranteed vs `force`,
    but both are deterministic; parity tested to f32 tolerance)."""
    F = _deformation(x, hexes, g)
    P, _, _ = _pk1(F, mu, la)
    f = -_einsum("hq,hqrc,hqic->hir", det, P, g)
    return _corner_gather(f.reshape(-1, 3), cidx, cmask, n_verts)


def hvp_corners(x, p, hexes, det, g, mu, la):
    """Closed-form StVK Hessian-vector product, per element corner.

    Directional derivative of -force along p (so the result is H @ p of the
    ENERGY Hessian, the matvec CG needs):
      dF = sum_i p_i g_i^T
      dE = (dF^T F + F^T dF) / 2
      dM = 2 mu dE + la tr(dE) I
      dP = dF M + F dM
      (H p)_a = sum_q det dP g_a
    Replaces jax.linearize through `force` — same math the fused Pallas
    lattice kernel uses (ops/pallas_lattice.py), here as batched einsums
    for arbitrary hex meshes. Returns (H, 8, 3) corner contributions.
    """
    F = _deformation(x, hexes, g)
    dF = _deformation(p, hexes, g)
    _, E, M = _pk1(F, mu, la)
    dFtF = _mm(jnp.swapaxes(dF, -1, -2), F)
    dE = 0.5 * (dFtF + jnp.swapaxes(dFtF, -1, -2))
    trdE = jnp.trace(dE, axis1=-2, axis2=-1)
    dM = 2.0 * mu * dE + la * trdE[..., None, None] * jnp.eye(3, dtype=x.dtype)
    dP = _mm(dF, M) + _mm(F, dM)
    return _einsum("hq,hqrc,hqic->hir", det, dP, g)


def hvp_gather(x, p, hexes, det, g, mu, la, cidx, cmask, n_verts):
    """H @ p assembled scatter-free through the vertex_contrib_map."""
    hp = hvp_corners(x, p, hexes, det, g, mu, la)
    return _corner_gather(hp.reshape(-1, 3), cidx, cmask, n_verts)


def hessian_blocks(x, hexes, det, g, mu, la) -> jnp.ndarray:
    """Element Hessian blocks H[h, a, b] (3x3 each), exact StVK Hessian.

    Closed form of the reference's per-direction dP chain
    (quai_hexagon.py:93-106); see module docstring for the derivation.
    Returns (H, 8, 8, 3, 3) with H[h, a, b][j, i] = d f_a[j] / d x_b[i]
    (of the *energy gradient*, i.e. positive-definite near minima).
    """
    F = _deformation(x, hexes, g)
    _, E, M = _pk1(F, mu, la)
    u = _einsum("hqrc,hqic->hqir", F, g)            # u_a = F g_a, (H,8q,8a,3)
    s1 = _einsum("hqic,hqcd,hqjd->hqij", g, M, g)   # g_a^T M g_b
    gg = _einsum("hqic,hqjc->hqij", g, g)           # g_a . g_b
    C = _einsum("hqrc,hqsc->hqrs", F, F)            # F F^T

    eye = jnp.eye(3, dtype=x.dtype)
    H = _einsum("hq,hqab,ji->habji", det, s1, eye)
    H += mu * _einsum("hq,hqbj,hqai->habji", det, u, u)
    H += mu * _einsum("hq,hqab,hqji->habji", det, gg, C)
    H += la * _einsum("hq,hqaj,hqbi->habji", det, u, u)
    return H


def assemble_hessian_ell(x, hexes, det, g, mu, la, hex_slot, n_verts, K,
                         base_values=None) -> jnp.ndarray:
    """Scatter element Hessians into the block-ELL matrix (N*K, 3, 3) flat.

    Replaces the atomic_add at quai_hexagon.py:106 with one deterministic
    scatter-add through the precomputed (hex, a, b) -> flat-slot map
    (reference hex_update_offset, object.py:563-569).
    """
    H = hessian_blocks(x, hexes, det, g, mu, la)
    if base_values is None:
        vals = jnp.zeros((n_verts * K, 3, 3), dtype=x.dtype)
    else:
        vals = base_values.reshape(n_verts * K, 3, 3)
    vals = vals.at[hex_slot.reshape(-1)].add(H.reshape(-1, 3, 3))
    return vals.reshape(n_verts, K, 3, 3)


def assemble_hessian_ell_gather(x, hexes, det, g, mu, la,
                                contrib_idx, contrib_mask, n_verts, K,
                                base_values=None) -> jnp.ndarray:
    """Gather-based assembly: each ELL entry sums its (<=8) element-block
    contributions through a precomputed inverse map — no scatter at all
    (the TPU-preferred dual of hex_update_offset)."""
    H = hessian_blocks(x, hexes, det, g, mu, la).reshape(-1, 3, 3)
    gathered = H[contrib_idx] * contrib_mask[..., None, None]   # (N*K, C, 3, 3)
    vals = jnp.sum(gathered, axis=1)
    if base_values is not None:
        vals = vals + base_values.reshape(n_verts * K, 3, 3)
    return vals.reshape(n_verts, K, 3, 3)


def _hessian_diag_corners(x, hexes, det, g, mu, la):
    """(H, 8, 3, 3) per-corner diagonal-block contributions (see
    hessian_diag)."""
    F = _deformation(x, hexes, g)
    _, E, M = _pk1(F, mu, la)
    u = _einsum("hqrc,hqic->hqir", F, g)
    s1 = _einsum("hqic,hqcd,hqid->hqi", g, M, g)
    gg = _einsum("hqic,hqic->hqi", g, g)
    C = _einsum("hqrc,hqsc->hqrs", F, F)
    eye = jnp.eye(3, dtype=x.dtype)
    Hd = _einsum("hq,hqa,ji->haji", det, s1, eye)
    Hd += (mu + la) * _einsum("hq,hqaj,hqai->haji", det, u, u)
    Hd += mu * _einsum("hq,hqa,hqji->haji", det, gg, C)
    return Hd


def hessian_diag(x, hexes, det, g, mu, la, n_verts) -> jnp.ndarray:
    """Vertex-diagonal 3x3 blocks of the elastic Hessian only (a=b slice of
    hessian_blocks): H_aa = sum_q det ( (g_a^T M g_a) I + mu u_a u_a^T
    + mu |g_a|^2 F F^T + la u_a u_a^T ). Cheap (8 blocks/hex vs 64) —
    feeds the block-Jacobi preconditioner of the matrix-free CG."""
    Hd = _hessian_diag_corners(x, hexes, det, g, mu, la)
    out = jnp.zeros((n_verts, 3, 3), dtype=x.dtype)
    return out.at[hexes.reshape(-1)].add(Hd.reshape(-1, 3, 3))


def hessian_diag_gather(x, hexes, det, g, mu, la, cidx, cmask,
                        n_verts) -> jnp.ndarray:
    """hessian_diag assembled scatter-free through vertex_contrib_map."""
    Hd = _hessian_diag_corners(x, hexes, det, g, mu, la).reshape(-1, 3, 3)
    return jnp.sum(Hd[cidx] * cmask[..., None, None], axis=1)


# ---------------------------------------------------------------------------
# Simple per-vertex energy terms (gravity, pins, inertia)
# ---------------------------------------------------------------------------

def gravity_energy(x, m, g_const):
    """-m g y (reference compute_gravity_energy, quai_hexagon.py:57-64)."""
    return -jnp.sum(m * g_const * x[:, 1])


def gravity_force(m, g_const, n_verts, dtype=jnp.float32):
    f = jnp.zeros((n_verts, 3), dtype=dtype)
    return f.at[:, 1].add(m * g_const)


def pin_energy(x, pin_mask, pin_pos, control_mag):
    d = pin_pos - x
    return 0.5 * control_mag * jnp.sum(pin_mask * jnp.sum(d * d, axis=-1))


def pin_force(x, pin_mask, pin_pos, control_mag):
    """control_mag * (pin_pos - x) on pinned vertices (quai_hexagon.py:161-172)."""
    return control_mag * pin_mask[:, None] * (pin_pos - x)


def inertia_force(x, x_tilde, m, inv_dt):
    """-m/h^2 (x - x_tilde): implicit-Euler inertia term of the residual
    FORCE (f = -grad E), matching the inline term in sim/dynamic.py
    (reference compute_Inertia_Gradient_Kernel negated,
    exp1/simulation/hexagon.py:174-179 — the reference accumulates gradients,
    this framework accumulates forces)."""
    return -(m * inv_dt * inv_dt)[:, None] * (x - x_tilde)


def inertia_energy(x, x_tilde, m, inv_dt):
    d = x - x_tilde
    return 0.5 * inv_dt * inv_dt * jnp.sum(m * jnp.sum(d * d, axis=-1))
