import numpy as np
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import hierarchy as hl
from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.ops import ell
from fem_simulation_tpu.solvers import smoothers, cg as cgmod


@pytest.fixture(scope="module")
def system():
    """A small SPD block-ELL system from an actual FEM assembly."""
    from fem_simulation_tpu.ops import elastic
    m = meshlib.beam(3, 3, 4, dx=0.1)
    lvl = hl.build_level_topology(m.x, m.ijk, m.hexes, m.dx)
    x0 = jnp.asarray(lvl.x0)
    hexes = jnp.asarray(lvl.hexes)
    det, g, vol = elastic.prepare(x0, hexes)
    rng = np.random.default_rng(3)
    x = x0 + 0.01 * jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    vals = elastic.assemble_hessian_ell(
        x, hexes, det, g, 250.0, 0.0,
        jnp.asarray(lvl.hex_slot.reshape(-1)), lvl.n_verts, lvl.K)
    # make it solidly SPD: add c*I to the diagonal
    eye = 0.5 * jnp.eye(3)[None].repeat(lvl.n_verts, 0)
    vals = ell.add_to_diag(vals, jnp.asarray(lvl.diag_slot), eye)
    op = smoothers.EllOperator(jnp.asarray(lvl.nbr),
                               jnp.asarray(lvl.nbr_mask.astype(np.float32)),
                               jnp.asarray(lvl.diag_slot), lvl.color_offsets)
    b = jnp.asarray(rng.normal(size=(lvl.n_verts, 3)).astype(np.float32))
    return lvl, op, vals, b


def dense_of(lvl, vals):
    N, K = lvl.n_verts, lvl.K
    A = np.zeros((3 * N, 3 * N))
    v = np.asarray(vals)
    for i in range(N):
        for k in range(K):
            if lvl.nbr_mask[i, k]:
                j = lvl.nbr[i, k]
                A[3 * i:3 * i + 3, 3 * j:3 * j + 3] = v[i, k]
    return A


def test_spmv_matches_dense(system):
    lvl, op, vals, b = system
    A = dense_of(lvl, vals)
    y = ell.spmv(vals * op.mask[..., None, None], op.nbr, op.mask, b)
    np.testing.assert_allclose(np.asarray(y).reshape(-1),
                               A @ np.asarray(b).reshape(-1), rtol=1e-4, atol=1e-5)


def test_solve3x3():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 3, 3))
    A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)
    b = rng.normal(size=(50, 3))
    x = ell.solve3x3(jnp.asarray(A.astype(np.float32)), jnp.asarray(b.astype(np.float32)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-3, atol=1e-4)


def test_eigh3x3_and_spd_project():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(100, 3, 3))
    A = 0.5 * (A + np.transpose(A, (0, 2, 1)))
    w, V = ell.eigh3x3(jnp.asarray(A.astype(np.float32)))
    wr = np.sort(np.linalg.eigvalsh(A), axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(w), axis=1), wr, rtol=1e-3, atol=1e-4)
    # spd projection clamps negatives to eps
    P = np.asarray(ell.spd_project(jnp.asarray(A.astype(np.float32)), 1e-3))
    wp = np.linalg.eigvalsh(P)
    assert (wp > -1e-5).all()
    # blocks that were already SPD are unchanged
    spd = A @ np.transpose(A, (0, 2, 1)) + 0.1 * np.eye(3)
    P2 = np.asarray(ell.spd_project(jnp.asarray(spd.astype(np.float32)), 1e-3))
    np.testing.assert_allclose(P2, spd, rtol=2e-2, atol=2e-3)


def test_eigvals3x3_sym_and_spd_shift():
    """Closed-form symmetric 3x3 eigenvalue extremes == LAPACK; the shift
    regularizer makes every block comfortably positive definite."""
    rng = np.random.default_rng(2)
    A = rng.normal(size=(200, 3, 3))
    A = 0.5 * (A + np.transpose(A, (0, 2, 1)))
    # include degenerate blocks (zero, isotropic) among the samples
    A[0] = 0.0
    A[1] = np.eye(3) * 2.5
    lmin, lmax = ell.eigvals3x3_sym(jnp.asarray(A.astype(np.float32)))
    wr = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(lmin), wr[:, 0], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lmax), wr[:, 2], rtol=1e-3,
                               atol=1e-4)
    S = np.asarray(ell.spd_shift3x3(jnp.asarray(A.astype(np.float32)),
                                    rel_floor=1e-3))
    ws = np.linalg.eigvalsh(S)
    assert (ws[:, 0] >= 1e-3 * np.abs(wr[:, 2]) - 1e-5).all()
    # already-well-conditioned SPD blocks pass through unchanged
    spd = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)
    S2 = np.asarray(ell.spd_shift3x3(
        jnp.asarray(spd.astype(np.float32)), rel_floor=1e-3))
    np.testing.assert_allclose(S2, spd, rtol=1e-4, atol=2e-3)


def test_jacobi_matches_dense_iteration(system):
    """x_{k+1} = D^{-1} (b - (L+U) x_k) from x=0, 3 iterations."""
    lvl, op, vals, b = system
    A = dense_of(lvl, vals)
    N3 = A.shape[0]
    Dd = np.zeros_like(A)
    for i in range(lvl.n_verts):
        Dd[3*i:3*i+3, 3*i:3*i+3] = A[3*i:3*i+3, 3*i:3*i+3]
    off = A - Dd
    bn = np.asarray(b).reshape(-1)
    xr = np.zeros(N3)
    for _ in range(3):
        xr = np.linalg.solve(Dd, bn - off @ xr)
    x = smoothers.jacobi(op, vals, b, iterations=3)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), xr, rtol=1e-3, atol=1e-4)


def test_gauss_seidel_matches_dense_sweeps(system):
    """Our colored symmetric GS == dense (D+U)^-1 / (D+L)^-1 sweeps."""
    lvl, op, vals, b = system
    A = dense_of(lvl, vals)
    bn = np.asarray(b).reshape(-1)
    N3 = A.shape[0]
    D = np.zeros_like(A)
    L = np.zeros_like(A)
    U = np.zeros_like(A)
    for i in range(lvl.n_verts):
        for k in range(lvl.K):
            if lvl.nbr_mask[i, k]:
                j = lvl.nbr[i, k]
                blk = np.asarray(vals)[i, k]
                if j == i:
                    D[3*i:3*i+3, 3*j:3*j+3] = blk
                elif j < i:
                    L[3*i:3*i+3, 3*j:3*j+3] = blk
                else:
                    U[3*i:3*i+3, 3*j:3*j+3] = blk
    x_prev = np.zeros(N3)
    # backward: (D+U) x = b - L x_prev ; forward: (D+L) x' = b - U x
    xb = np.linalg.solve(D + U, bn - L @ x_prev)
    xf = np.linalg.solve(D + L, bn - U @ xb)
    x = smoothers.gauss_seidel(op, vals, b, iterations=1)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), xf, rtol=1e-3, atol=1e-4)


def test_gs_convergence(system):
    lvl, op, vals, b = system
    full = vals * op.mask[..., None, None]
    x = smoothers.gauss_seidel(op, vals, b, iterations=30)
    r = b - ell.spmv(full, op.nbr, op.mask, x)
    # elastic systems are ill-conditioned; GS alone converges slowly but surely
    assert float(jnp.linalg.norm(r)) < 0.15 * float(jnp.linalg.norm(b))
    x2 = smoothers.gauss_seidel(op, vals, b, iterations=60)
    r2 = b - ell.spmv(full, op.nbr, op.mask, x2)
    assert float(jnp.linalg.norm(r2)) < float(jnp.linalg.norm(r))


def test_cg_solves(system):
    lvl, op, vals, b = system
    A = dense_of(lvl, vals)
    ref = np.linalg.solve(A, np.asarray(b).reshape(-1))
    x = cgmod.cg(op, vals, b, iterations=400, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), ref, rtol=5e-3, atol=5e-3)


def test_cg_with_init(system):
    lvl, op, vals, b = system
    x0 = 0.9 * cgmod.cg(op, vals, b, iterations=400, tol=1e-12)
    x = cgmod.cg(op, vals, b, iterations=100, tol=1e-12, x0=x0)
    A = dense_of(lvl, vals)
    ref = np.linalg.solve(A, np.asarray(b).reshape(-1))
    np.testing.assert_allclose(np.asarray(x).reshape(-1), ref, rtol=5e-3, atol=5e-3)
