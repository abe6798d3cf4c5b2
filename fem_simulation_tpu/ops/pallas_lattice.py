"""Pallas TPU kernels: fused structured-lattice StVK force and Hessian-vector
product.

These are the framework's hot ops on the lattice path. The XLA versions
(ops.stencil.elastic_force_lattice) materialize the (q, 3, 3, cells) F/E/M/P
intermediates in HBM between einsums (~10 ms per force eval at 19k vertices
on v5e); here the whole per-quad-point chain lives in VMEM inside one kernel,
unrolled over the 8 quadrature points and 3x3 components as elementwise VPU
ops on (Cx, Cy, Cz) cell fields. No gathers anywhere (only static shifted
slices), so this lowers cleanly where gather-based SpMV kernels cannot
(see ops/pallas_kernels.py).

Layout: channel-first (3, X, Y, Z); Z is the minor (lane) axis. All
kernels take DISPLACEMENT fields u = x - x0 (rest = the analytic lattice):
F = I + sum_i u_i g_iq^T with the identity added analytically, which keeps
the f32 force-evaluation noise independent of the coordinate magnitude
(ops.stencil.elastic_force_lattice documents the measured 38x difference).

The HVP kernel is the analytic directional derivative of the force — used
directly by the lattice CG instead of jax.linearize, so no AD-through-Pallas
is needed:
  dF = sum_i p_i g_i^T
  dE = (dF^T F + F^T dF)/2
  dP = dF M + F (2 mu dE + la tr(dE) I)
  (H p)_i = det * sum_q dP g_iq      (positive-definite convention)
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .elastic import shape_func_grad

_CORNERS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]

# -- roofline work model ------------------------------------------------------
# Useful f32 FLOPs per ACTIVE cell per kernel invocation, counted from the
# unrolled arithmetic below (mults+adds per quad point, x 8 quad points;
# tile-padding work is excluded so MFU measures honest utilization):
#   force (_chain, p=None):  F 138 + E 57 + trE 2 + M 15 + P 45
#                            + emit 8x3x8 = 192            -> 449/q
#   hvp   (_chain, p):       force terms (no P) + dF 135 + dE 108 + trdE 2
#                            + dM 15 + dP 99 + emit 192    -> 763/q
#   diag  (_make_diag_kernel): F 138 + E 57 + trE 2 + M 15 + G 30
#                            + 8x(v 15 + aMa 26 + 6ch 45)  -> 930/q
# bench.py multiplies these by active-cell counts and measured eval counts
# to print achieved FLOP/s vs the VPU peak (the chain is elementwise — the
# MXU never runs here by design).
FORCE_FLOPS_PER_CELL = 449 * 8
HVP_FLOPS_PER_CELL = 763 * 8
DIAG_FLOPS_PER_CELL = 930 * 8


def _g_table(dx: float) -> np.ndarray:
    return np.asarray(shape_func_grad(), np.float32) * np.float32(2.0 / dx)


def _chain(x, cm, g, det, mu, la, p, emit):
    """Shared per-quad-point chain. x, p: (3, X, Y, Z) jnp values; cm:
    (Cx, Cy, Cz). Calls emit(i, r, field) for every corner contribution as
    soon as it is computed (keeps VMEM live-set small)."""
    X, Y, Z = x.shape[1:]
    xs = [[x[r, di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1]
           for r in range(3)] for (di, dj, dk) in _CORNERS]
    if p is not None:
        ps = [[p[r, di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1]
               for r in range(3)] for (di, dj, dk) in _CORNERS]

    for q in range(8):
        # F[r][c] = delta_rc + sum_i us[i][r] * g[i, q, c]  (displacement
        # form: inputs are u = x - x0, the identity is analytic — forming F
        # from absolute positions cancels |x|*(2/dx)-sized terms and sets a
        # coordinate-magnitude-dependent f32 noise floor; see
        # ops.stencil.elastic_force_lattice)
        F = [[sum(xs[i][r] * float(g[i, q, c]) for i in range(8))
              + (1.0 if r == c else 0.0)
              for c in range(3)] for r in range(3)]
        # E = (F^T F - I)/2 ; M = 2 mu E + la tr(E) I
        E = [[0.5 * (sum(F[r][a] * F[r][b] for r in range(3))
                     - (1.0 if a == b else 0.0))
              for b in range(3)] for a in range(3)]
        trE = E[0][0] + E[1][1] + E[2][2]
        M = [[2.0 * mu * E[a][b] + (la * trE if a == b else 0.0)
              for b in range(3)] for a in range(3)]
        if p is None:
            # P = F M
            P = [[sum(F[r][b] * M[b][c] for b in range(3))
                  for c in range(3)] for r in range(3)]
            sgn = -det
        else:
            # dF, dE, dM, dP
            dF = [[sum(ps[i][r] * float(g[i, q, c]) for i in range(8))
                   for c in range(3)] for r in range(3)]
            dE = [[0.5 * sum(dF[r][a] * F[r][b] + F[r][a] * dF[r][b]
                             for r in range(3))
                   for b in range(3)] for a in range(3)]
            trdE = dE[0][0] + dE[1][1] + dE[2][2]
            dM = [[2.0 * mu * dE[a][b] + (la * trdE if a == b else 0.0)
                   for b in range(3)] for a in range(3)]
            P = [[sum(dF[r][b] * M[b][c] + F[r][b] * dM[b][c]
                      for b in range(3))
                  for c in range(3)] for r in range(3)]
            sgn = det
        # corner forces: emit sgn * sum_c P[r][c] g[i, q, c], masked
        for i in range(8):
            for r in range(3):
                contrib = sum(P[r][c] * float(g[i, q, c]) for c in range(3))
                emit(i, r, (sgn * contrib) * cm)


def _chain_into(out_ref, x, cm, g, det, mu, la, p=None):
    """Zero out_ref (3, X, Y, Z) and accumulate the force (p=None) or HVP
    (p given) chain into it via ref-slice read-modify-writes."""
    X, Y, Z = x.shape[1:]
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def emit(i, r, field):
        di, dj, dk = _CORNERS[i]
        sl = (r, slice(di, di + X - 1), slice(dj, dj + Y - 1),
              slice(dk, dk + Z - 1))
        out_ref[sl] = out_ref[sl] + field

    _chain(x, cm, g, det, mu, la, p, emit)


def _diag_into(out_ref, x, cm, g, det, mu, la):
    """Zero out_ref (6, X, Y, Z) and accumulate the 6 symmetric channels of
    the vertex-diagonal Hessian blocks (the _make_diag_kernel math:
    D_i[r][s] = det * (delta_rs a^T M a + (mu+la) v_r v_s + mu |a|^2 G))."""
    X, Y, Z = x.shape[1:]
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    xs = [[x[r, di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1]
           for r in range(3)] for (di, dj, dk) in _CORNERS]
    for q in range(8):
        F = [[sum(xs[i][r] * float(g[i, q, c]) for i in range(8))
              + (1.0 if r == c else 0.0)
              for c in range(3)] for r in range(3)]
        E = [[0.5 * (sum(F[r][a] * F[r][b] for r in range(3))
                     - (1.0 if a == b else 0.0))
              for b in range(3)] for a in range(3)]
        trE = E[0][0] + E[1][1] + E[2][2]
        M = [[2.0 * mu * E[a][b] + (la * trE if a == b else 0.0)
              for b in range(3)] for a in range(3)]
        G = {}
        for (r, s) in _DIAG_RS:
            G[(r, s)] = sum(F[r][b] * F[s][b] for b in range(3))
        for i in range(8):
            a = [float(g[i, q, c]) for c in range(3)]
            gg = a[0] * a[0] + a[1] * a[1] + a[2] * a[2]
            v = [sum(F[r][c] * a[c] for c in range(3)) for r in range(3)]
            aMa = sum(a[b] * M[b][c] * a[c]
                      for b in range(3) for c in range(3))
            di, dj, dk = _CORNERS[i]
            for ch, (r, s) in enumerate(_DIAG_RS):
                contrib = (mu + la) * v[r] * v[s] + (mu * gg) * G[(r, s)]
                if r == s:
                    contrib = contrib + aMa
                sl = (ch, slice(di, di + X - 1), slice(dj, dj + Y - 1),
                      slice(dk, dk + Z - 1))
                out_ref[sl] = out_ref[sl] + (det * contrib) * cm


def _make_energy_kernel(g, det, mu, la):
    """Per-cell StVK energy sum over quad points: psi_cell = det * sum_q
    (mu ||E||^2 + la/2 tr(E)^2), masked. Output (Cx, Cy, Cz)."""
    def kernel(x_ref, cm_ref, out_ref):
        x = x_ref[:]
        cm = cm_ref[:]
        X, Y, Z = x.shape[1:]
        xs = [[x[r, di:di + X - 1, dj:dj + Y - 1, dk:dk + Z - 1]
               for r in range(3)] for (di, dj, dk) in _CORNERS]
        acc = None
        for q in range(8):
            # displacement form (see _chain): F = I + sum_i u_i g_iq^T
            F = [[sum(xs[i][r] * float(g[i, q, c]) for i in range(8))
                  + (1.0 if r == c else 0.0)
                  for c in range(3)] for r in range(3)]
            E = [[0.5 * (sum(F[r][a] * F[r][b] for r in range(3))
                         - (1.0 if a == b else 0.0))
                  for b in range(3)] for a in range(3)]
            trE = E[0][0] + E[1][1] + E[2][2]
            ee = sum(E[a][b] * E[a][b] for a in range(3) for b in range(3))
            psi = mu * ee + 0.5 * la * trE * trE
            acc = psi if acc is None else acc + psi
        out_ref[:] = (det * acc) * cm
    return kernel


@functools.partial(jax.jit, static_argnames=("dx", "mu", "la", "interpret"))
def _run_energy(x_cf, cm, dx: float, mu: float, la: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _g_table(dx)
    det = float((dx / 2.0) ** 3)
    kernel = _make_energy_kernel(g, det, mu, la)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cm.shape, x_cf.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cf, cm)


def elastic_energy_lattice(x_lat, cell_mask, dx: float, mu: float, la: float,
                           interpret: bool | None = None):
    """Fused total StVK elastic energy (drop-in for
    ops.stencil.elastic_energy_lattice)."""
    if interpret is None:
        interpret = _interpret_default()
    x_cf = jnp.transpose(x_lat, (3, 0, 1, 2))
    # cell-output kernel: x-chunks partition cells exactly (no overlap sum)
    total = 0.0
    for (c0, c1) in _chunk_ranges(*cell_mask.shape):
        total = total + jnp.sum(_run_energy(
            x_cf[:, c0:c1 + 1], cell_mask[c0:c1],
            float(dx), float(mu), float(la), interpret))
    return total


_DIAG_RS = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def _make_diag_kernel(g, det, mu, la):
    """Vertex-diagonal 3x3 Hessian blocks, 6 unique symmetric channels.

    Per (cell, q, corner i) with a := g[i, q, :], v := F a, G := F F^T:
      D_i[r][s] = det * (delta_rs (a^T M a) + (mu+la) v_r v_s
                         + mu |a|^2 G[r][s])
    — same math as ops.stencil.elastic_hessian_diag_lattice, fused in VMEM
    (the XLA version costs ~82 ms/eval at 66k verts on v5e; this ~1 ms)."""
    def kernel(x_ref, cm_ref, out_ref):
        _diag_into(out_ref, x_ref[:], cm_ref[:], g, det, mu, la)
    return kernel


@functools.partial(jax.jit, static_argnames=("dx", "mu", "la", "interpret"))
def _run_diag(x_cf, cm, dx: float, mu: float, la: float, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _g_table(dx)
    det = float((dx / 2.0) ** 3)
    kernel = _make_diag_kernel(g, det, mu, la)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6,) + x_cf.shape[1:], x_cf.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cf, cm)


def hess_diag_lattice(x_lat, cell_mask, dx: float, mu: float, la: float,
                      interpret: bool | None = None):
    """Fused Hessian vertex-diagonal: (X, Y, Z, 3) -> (X, Y, Z, 3, 3).
    Drop-in for ops.stencil.elastic_hessian_diag_lattice."""
    if interpret is None:
        interpret = _interpret_default()
    d6 = _chunked_vert_op(
        lambda xk, cmk, _: _run_diag(xk, cmk, float(dx), float(mu),
                                     float(la), interpret),
        jnp.transpose(x_lat, (3, 0, 1, 2)), cell_mask,
        budget=_chunk_padded_vol_diag())
    d6 = jnp.transpose(d6, (1, 2, 3, 0))        # (X, Y, Z, 6)
    rows = [jnp.stack([d6[..., 0], d6[..., 1], d6[..., 2]], axis=-1),
            jnp.stack([d6[..., 1], d6[..., 3], d6[..., 4]], axis=-1),
            jnp.stack([d6[..., 2], d6[..., 4], d6[..., 5]], axis=-1)]
    return jnp.stack(rows, axis=-2)             # (X, Y, Z, 3, 3)


def _make_kernel(g, det, mu, la, hvp: bool):
    def kernel(*refs):
        if hvp:
            x_ref, p_ref, cm_ref, out_ref = refs
            p = p_ref[:]
        else:
            x_ref, cm_ref, out_ref = refs
            p = None
        # accumulate via ref-slice read-modify-write inside the chain's
        # q-loop (static slices only; value-side .at[].add would lower to an
        # unsupported scatter-add; eager emission keeps the live set small)
        _chain_into(out_ref, x_ref[:], cm_ref[:], g, det, mu, la, p)
    return kernel


@functools.partial(jax.jit, static_argnames=("dx", "mu", "la", "hvp",
                                             "interpret"))
def _run(x_cf, cm, p_cf, dx: float, mu: float, la: float, hvp: bool,
         interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _g_table(dx)
    det = float((dx / 2.0) ** 3)
    kernel = _make_kernel(g, det, mu, la, hvp)
    args = (x_cf, p_cf, cm) if hvp else (x_cf, cm)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_cf.shape, x_cf.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _interpret_default():
    return jax.default_backend() != "tpu"


# -- x-axis chunking ---------------------------------------------------------
# The kernels hold the whole grid in VMEM (no Pallas grid): ideal for the
# long-thin beam shapes (a 17x17x257 beam pads to ~0.6 MB per field), but a
# cubic grid like the voxelized kitten (50^3, lane dim padded 50->128) blows
# the register allocator (measured: 253 MB of spill slots vs 128 MB VMEM in
# _run_diag). Cells are 1-ring-local in x, so the fix is overlapping x-slabs
# at the JAX level: chunk c gets vertex planes [c0, c1] and cell planes
# [c0, c1); vertex-field outputs are partial at the shared boundary planes
# and summed into place (the single-chip analog of the z-slab halo fold in
# parallel/lattice_halo.py). Beam shapes stay single-chunk.

# Padded f32 elements per field per chunk. Calibrated on v5e: the 66k-vert
# beam tile (17 x 24 x 384 = 157k) compiles for force/hvp and is the
# flagship fast path (must stay single-chunk); the kitten tile
# (34 x 56 x 128 = 243k) spills 253 MB in _run_diag. The diag kernel's
# live set is ~2x the force/hvp one (an 18-plane kitten chunk still spilled
# 121 MB), so it gets its own smaller budget — the extra launches are
# negligible (one diag per Newton linearization vs tens of hvp matvecs).
#
# Other TPU generations re-hit the register-spill cliff at different sizes;
# the budgets scale with the device's VMEM (queried per device_kind below)
# and are overridable outright via FEM_TPU_CHUNK_VOL /
# FEM_TPU_CHUNK_VOL_DIAG for re-calibration (VERDICT r2 weak #6).
_CHUNK_PADDED_VOL_V5E = 160_000
_CHUNK_PADDED_VOL_DIAG_V5E = 64_000

# VMEM MiB per core by device_kind substring; v5e (128 MiB) is the
# calibration baseline. Unknown kinds use the conservative 16 MiB older-
# generation figure (pallas_guide.md "~16 MB/core") — over-chunking only
# costs extra kernel launches, under-chunking costs a silent spill cliff.
_VMEM_MIB = {"v5 lite": 128, "v5litepod": 128, "v5e": 128,
             "v6 lite": 128, "v6e": 128, "v5p": 128, "v4": 128,
             "v3": 16, "v2": 16}


def _budgets():
    import os
    scale = 1.0
    try:
        if jax.default_backend() == "tpu":
            kind = jax.devices()[0].device_kind.lower()
            mib = next((v for k, v in _VMEM_MIB.items() if k in kind), 16)
            scale = mib / 128.0
    except Exception:
        pass
    # env overrides apply PER BUDGET: setting only one must not reset the
    # other to the unscaled v5e constant (on a 16 MiB device that would
    # re-trigger the spill cliff the VMEM scaling exists to prevent)
    env = os.environ.get("FEM_TPU_CHUNK_VOL")
    env_d = os.environ.get("FEM_TPU_CHUNK_VOL_DIAG")
    return (int(env) if env else int(_CHUNK_PADDED_VOL_V5E * scale),
            int(env_d) if env_d else int(_CHUNK_PADDED_VOL_DIAG_V5E * scale))


def _chunk_padded_vol():
    return _budgets()[0]


def _chunk_padded_vol_diag():
    return _budgets()[1]


def _round_up(n, m):
    return -(-n // m) * m


def _chunk_ranges(n_cells_x: int, y: int, z: int, budget: int | None = None):
    """[(c0, c1)] cell-plane ranges; single range when the padded per-field
    volume fits the budget.

    y/z are CELL counts, but the resident fields are VERTEX-shaped
    (y+1, z+1) and Mosaic tiles the trailing dims to (8, 128) — a beam with
    z = 512 cells holds 513 vertex lanes padded to 640 (+25%), y = 16 cells
    holds 17 sublanes padded to 24 (+50%). Budgeting on the raw cell dims
    under-counted exactly when a +1 crossed a tile multiple: the 131k-vert
    (16,16,512) beam computed 139k "padded" (under the 160k budget) while
    the true resident field is 261k, and the hvp kernel blew the 100 MiB
    scoped-VMEM stack at compile time (103.46M). Measured fix: padding the
    VERTEX dims chunks that shape in 2 and keeps the 66k flagship
    (17x24x384 = 157k) single-chunk."""
    if budget is None:
        budget = _chunk_padded_vol()
    plane = _round_up(y + 1, 8) * _round_up(z + 1, 128)
    padded = (n_cells_x + 1) * plane
    if padded <= budget:
        return [(0, n_cells_x)]
    # Size chunks from the budget DIRECTLY: chunk [c0, c1) holds c1-c0+1
    # vertex planes. The previous form derived a chunk COUNT from
    # total/budget and split x evenly, which let the +1 overlap plane push
    # every chunk past the budget when the yz plane is large — measured on
    # the 1.1M-vert (33,33,1025) grid: per=4 gave 230k-element chunks
    # against the 160k budget and the hvp kernel blew the scoped-VMEM stack
    # by 312K at compile (117.71M vs 117.40M); per=2 (this formula) fits.
    # per=1 (2-plane chunks) is the x-chunking floor: a single yz plane
    # over budget cannot be split along x at all.
    per = max(budget // plane - 1, 1)
    return [(i, min(i + per, n_cells_x))
            for i in range(0, n_cells_x, per)]


def _chunked_vert_op(run_one, x_cf, cm, extra_cf=None, budget=None):
    """Apply a verts->verts 1-ring kernel in overlapping x-slabs.

    run_one(x_chunk, cm_chunk, extra_chunk) -> (C, c1-c0+1, Y, Z) with C
    output channels; boundary vertex planes of each chunk hold partial sums
    that add up across chunks."""
    Xc = cm.shape[0]
    ranges = _chunk_ranges(Xc, cm.shape[1], cm.shape[2], budget)
    if len(ranges) == 1:
        return run_one(x_cf, cm, extra_cf)
    out = None
    for (c0, c1) in ranges:
        xk = x_cf[:, c0:c1 + 1]
        ek = None if extra_cf is None else extra_cf[:, c0:c1 + 1]
        ok = run_one(xk, cm[c0:c1], ek)
        if out is None:
            out = jnp.zeros(ok.shape[:1] + (Xc + 1,) + ok.shape[2:],
                            ok.dtype)
        out = out.at[:, c0:c1 + 1].add(ok)
    return out


# -- fused PCG megakernel ----------------------------------------------------
# The whole preconditioned-CG linear solve of one Newton step in ONE kernel
# launch: build the 3x3 vertex-diagonal (6 symmetric channels), then loop
# matvec (the analytic stencil HVP) + block-Jacobi preconditioner (adjugate
# solve, ell.solve3x3 math) + the dot/axpy algebra with the convergence test
# on in-kernel scalars. r/p/dx live in VMEM scratch for the entire solve —
# zero HBM round-trips between iterations.
#
# Why: at the benchmark's 2k-vertex default the unfused path costs ~8 kernel
# launches per CG iteration (hvp Pallas + solve3x3/axpy/dot XLA fusions
# through a lax.while_loop) and per-launch overhead eats 86% of the frame
# (BENCH_r04 mfu 0.135 vs 0.554 for the same kernels at 19k). Semantics
# mirror solvers.cg.pcg_operator exactly (normalized RHS, EPSILON/pap
# guards, iteration-count convention) — tests assert parity.
#
# Only the single-box dense-grid path uses this, gated on the diag chunk
# budget (the in-kernel live set peaks in the diag chain); bigger grids and
# box covers keep the unfused path.

def _sym_solve(d, r0, r1, r2, vm, eps=1e-12):
    """Adjugate solve of the 6-channel symmetric 3x3 field d (ell.solve3x3
    math specialized to symmetry), masked by vm."""
    a, b, c, dd, e, f = (d[i] for i in range(6))
    c00 = dd * f - e * e
    c01 = e * c - b * f
    c02 = b * e - dd * c
    det = a * c00 + b * c01 + c * c02
    c11 = a * f - c * c
    c12 = b * c - a * e
    c22 = a * dd - b * b
    inv_det = det / (det * det + eps)
    z0 = (c00 * r0 + c01 * r1 + c02 * r2) * inv_det * vm
    z1 = (c01 * r0 + c11 * r1 + c12 * r2) * inv_det * vm
    z2 = (c02 * r0 + c12 * r1 + c22 * r2) * inv_det * vm
    return z0, z1, z2


def _pcg_in_kernel(tol, b, u_ref, cm, ctrl, vm,
                   dx_ref, r_ref, p_ref, ap_ref, d_ref,
                   g, det, mu, la, iterations):
    """Shared in-kernel PCG loop: solve (H(u) + diag(ctrl)) dx = b with the
    block-Jacobi preconditioner from the (already built, ctrl-shifted)
    6-channel d_ref. Leaves the solution in dx_ref; returns the iteration
    count (pcg_operator's convention: matvecs executed = k - 1).
    Semantics mirror solvers.cg.pcg_operator exactly (normalized RHS,
    EPSILON/pap guards)."""
    from ..solvers.cg import EPSILON

    # -- normalized RHS (solvers.cg._normalize_rhs) --
    rr_b = jnp.sum(b * b)
    ok_b = rr_b > 0.0
    inv_scale = jnp.sqrt(jnp.where(ok_b, rr_b, 1.0))
    scale_back = jnp.where(ok_b, inv_scale, 0.0)
    r_ref[:] = b / inv_scale
    dx_ref[:] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    d6 = d_ref[:]
    r = r_ref[:]
    z0, z1, z2 = _sym_solve(d6, r[0], r[1], r[2], vm)
    z = jnp.stack([z0, z1, z2])
    p_ref[:] = z
    rz0 = jnp.sum(r * z)
    rr0 = jnp.sum(r * r)

    def cond(c):
        rz, rr, k, alive = c
        return (alive & (k <= iterations) & (rr > tol * rr0)
                & (rr0 > EPSILON) & jnp.isfinite(rr))

    def body(c):
        rz, rr, k, alive = c
        # matvec: analytic stencil HVP + ctrl, masked (step_to_tol)
        _chain_into(ap_ref, u_ref[:], cm, g, det, mu, la, p_ref[:])
        p = p_ref[:]
        ap = (ap_ref[:] + ctrl[None] * p) * vm[None]
        pap = jnp.sum(p * ap)
        ok = pap >= 1e-12
        alpha = jnp.where(ok, rz / jnp.where(ok, pap, 1.0), 0.0)
        dx_ref[:] = dx_ref[:] + alpha * p
        r_new = r_ref[:] - alpha * ap
        r_ref[:] = r_new
        d6 = d_ref[:]
        z0, z1, z2 = _sym_solve(d6, r_new[0], r_new[1], r_new[2], vm)
        z_new = jnp.stack([z0, z1, z2])
        rz_new = jnp.sum(r_new * z_new)
        beta = rz_new / rz
        p_ref[:] = z_new + beta * p
        return (rz_new, jnp.sum(r_new * r_new), k + 1, alive & ok)

    _, _, k, _ = jax.lax.while_loop(
        cond, body, (rz0, rr0, jnp.int32(1), ok_b))
    dx_ref[:] = dx_ref[:] * scale_back
    return k


def _make_pcg_kernel(g, det, mu, la, iterations):
    def kernel(tol_ref, u_ref, f_ref, cm_ref, ctrl_ref, vm_ref,
               dx_ref, k_ref, r_ref, p_ref, ap_ref, d_ref):
        cm = cm_ref[:]
        vm = vm_ref[:]
        ctrl = ctrl_ref[:]
        # vertex-diagonal Hessian blocks + ctrl (pins + mass/dt^2 +
        # empty-row identity) on the diagonal
        _diag_into(d_ref, u_ref[:], cm, g, det, mu, la)
        for ch, (r, s) in enumerate(_DIAG_RS):
            if r == s:
                d_ref[ch] = d_ref[ch] + ctrl
        k = _pcg_in_kernel(tol_ref[0, 0], f_ref[:], u_ref, cm, ctrl, vm,
                           dx_ref, r_ref, p_ref, ap_ref, d_ref,
                           g, det, mu, la, iterations)
        k_ref[0, 0] = k
    return kernel


def _make_newton_kernel(g, det, mu, la, iterations):
    """One full Newton iteration of the implicit step in ONE launch:
      f   = elastic_force(u) + s - rc u      (masked)   -> f_ref (output)
      d6  = hess_diag(u) + ctrl I                        -> scratch
      dx  = PCG((H(u) + diag(ctrl)) dx = f)              -> dx_ref (output)
      fn  = ||f(u + dx)||_inf                            -> fn_ref (output)
    s is the frame-constant affine part of the residual (gravity + pin/drag
    targets + inertia anchor, minus rc*x0 so the kernel works on
    displacements); rc is the residual's exact linear coefficient
    (pin + drag + mass/dt^2 — SUM, unlike ctrl's max(pin, drag) Hessian
    shift, sim/lattice.py step_to_tol). The caller keeps the blowup-rescue
    branch outside (it needs f and dx, both outputs here)."""
    def kernel(tol_ref, u_ref, s_ref, cm_ref, ctrl_ref, rc_ref, vm_ref,
               dx_ref, f_ref, fn_ref, k_ref, r_ref, p_ref, ap_ref, d_ref):
        cm = cm_ref[:]
        vm = vm_ref[:]
        ctrl = ctrl_ref[:]
        rc = rc_ref[:]
        # residual at u (force chain + affine terms), masked
        _chain_into(f_ref, u_ref[:], cm, g, det, mu, la)
        f = (f_ref[:] + s_ref[:] - rc[None] * u_ref[:]) * vm[None]
        f_ref[:] = f
        # diag + ctrl shift
        _diag_into(d_ref, u_ref[:], cm, g, det, mu, la)
        for ch, (r, s) in enumerate(_DIAG_RS):
            if r == s:
                d_ref[ch] = d_ref[ch] + ctrl
        k = _pcg_in_kernel(tol_ref[0, 0], f, u_ref, cm, ctrl, vm,
                           dx_ref, r_ref, p_ref, ap_ref, d_ref,
                           g, det, mu, la, iterations)
        k_ref[0, 0] = k
        # trial full step: residual norm at u + dx (masked step)
        ap_ref[:] = u_ref[:] + dx_ref[:] * vm[None]
        _chain_into(r_ref, ap_ref[:], cm, g, det, mu, la)
        f_new = (r_ref[:] + s_ref[:] - rc[None] * ap_ref[:]) * vm[None]
        fn_ref[0, 0] = jnp.max(jnp.abs(f_new))
    return kernel


@functools.partial(jax.jit, static_argnames=("dx", "mu", "la", "iterations",
                                             "interpret"))
def _run_pcg(tol, u_cf, f_cf, cm, ctrl, vm, dx: float, mu: float, la: float,
             iterations: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _g_table(dx)
    det = float((dx / 2.0) ** 3)
    kernel = _make_pcg_kernel(g, det, mu, la, iterations)
    vshape = u_cf.shape[1:]
    dt_ = u_cf.dtype
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(u_cf.shape, dt_),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM(u_cf.shape, dt_),      # r
                        pltpu.VMEM(u_cf.shape, dt_),      # p
                        pltpu.VMEM(u_cf.shape, dt_),      # ap
                        pltpu.VMEM((6,) + vshape, dt_)],  # diag6
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(tol, dt_), (1, 1)), u_cf, f_cf, cm, ctrl, vm)


@functools.partial(jax.jit, static_argnames=("dx", "mu", "la", "iterations",
                                             "interpret"))
def _run_newton(tol, u_cf, s_cf, cm, ctrl, rc, vm, dx: float, mu: float,
                la: float, iterations: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _g_table(dx)
    det = float((dx / 2.0) ** 3)
    kernel = _make_newton_kernel(g, det, mu, la, iterations)
    vshape = u_cf.shape[1:]
    dt_ = u_cf.dtype
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(u_cf.shape, dt_),     # dx
                   jax.ShapeDtypeStruct(u_cf.shape, dt_),     # f at u
                   jax.ShapeDtypeStruct((1, 1), dt_),         # fn_full
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],  # k
        scratch_shapes=[pltpu.VMEM(u_cf.shape, dt_),      # r
                        pltpu.VMEM(u_cf.shape, dt_),      # p
                        pltpu.VMEM(u_cf.shape, dt_),      # ap
                        pltpu.VMEM((6,) + vshape, dt_)],  # diag6
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(tol, dt_), (1, 1)), u_cf, s_cf, cm, ctrl,
      rc, vm)


def fused_newton(u_cf, s_cf, cell_mask, ctrl, rc, vert_mask, dx: float,
                 mu: float, la: float, iterations: int = 50, tol=1e-5,
                 interpret: bool | None = None):
    """One-launch Newton iteration on the dense lattice (_make_newton_kernel).

    u_cf: (3, X, Y, Z) displacement; s_cf: affine residual part (already
    channel-first, includes the -rc*x0 shift); ctrl: Hessian diagonal shift;
    rc: residual linear coefficient. Returns (dx_cf, f_cf, fn_full, k)."""
    if interpret is None:
        interpret = _interpret_default()
    dxc, fc, fn, k = _run_newton(tol, u_cf, s_cf, cell_mask, ctrl, rc,
                                 vert_mask, float(dx), float(mu), float(la),
                                 int(iterations), interpret)
    return dxc, fc, fn[0, 0], k[0, 0]


def fused_pcg_ok(vert_shape) -> bool:
    """True when the fused PCG kernel may run on this dense vertex grid:
    the in-kernel live set peaks in the diag chain, so the gate is the diag
    chunk budget (the fused solve cannot be x-chunked — r/p/dx state is
    global across the grid)."""
    X, Y, Z = vert_shape
    return X * _round_up(Y, 8) * _round_up(Z, 128) <= _chunk_padded_vol_diag()


def fused_pcg(u_cf, f_cf, cell_mask, ctrl, vert_mask, dx: float, mu: float,
              la: float, iterations: int = 50, tol=1e-5,
              interpret: bool | None = None):
    """One-launch PCG solve of (H(u) + diag(ctrl)) dx = f on the dense
    lattice (block-Jacobi preconditioned; pcg_operator semantics).

    u_cf/f_cf: (3, X, Y, Z) displacement field and masked RHS; ctrl:
    (X, Y, Z) scalar diagonal shift; tol may be traced (Eisenstat-Walker).
    Returns (dx_cf, k) with pcg_operator's iteration convention
    (matvecs executed = k - 1)."""
    if interpret is None:
        interpret = _interpret_default()
    dx_cf, k = _run_pcg(tol, u_cf, f_cf, cell_mask, ctrl, vert_mask,
                        float(dx), float(mu), float(la), int(iterations),
                        interpret)
    return dx_cf, k[0, 0]


def force_cf(x_cf, cell_mask, dx: float, mu: float, la: float,
             interpret: bool | None = None):
    """Fused elastic force; x_cf (3, X, Y, Z) -> (3, X, Y, Z)."""
    if interpret is None:
        interpret = _interpret_default()
    return _chunked_vert_op(
        lambda xk, cmk, _: _run(xk, cmk, None, float(dx), float(mu),
                                float(la), False, interpret),
        x_cf, cell_mask)


def hvp_cf(x_cf, p_cf, cell_mask, dx: float, mu: float, la: float,
           interpret: bool | None = None):
    """Fused elastic Hessian-vector product (positive-definite convention)."""
    if interpret is None:
        interpret = _interpret_default()
    return _chunked_vert_op(
        lambda xk, cmk, pk: _run(xk, cmk, pk, float(dx), float(mu),
                                 float(la), True, interpret),
        x_cf, cell_mask, extra_cf=p_cf)
