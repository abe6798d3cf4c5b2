import numpy as np
import pytest

from fem_simulation_tpu import hierarchy as hl
from fem_simulation_tpu import mesh as meshlib


@pytest.fixture(scope="module")
def beam():
    return meshlib.beam(4, 4, 8, dx=0.1)


@pytest.fixture(scope="module")
def hier(beam):
    return hl.build_hierarchy(beam, n_levels=2)


def test_coloring_is_proper(hier):
    """No two adjacent vertices (sharing a hex) have the same color."""
    lvl = hier.levels[0]
    col = hl.color_of(lvl.ijk)
    for h in lvl.hexes[:20]:
        cs = col[h.astype(np.int64)]
        assert len(set(cs.tolist())) == 8


def test_color_sorted_order(hier):
    lvl = hier.levels[0]
    col = hl.color_of(lvl.ijk)
    assert (np.diff(col) >= 0).all()
    off = lvl.color_offsets
    for c in range(8):
        assert (col[off[c]:off[c + 1]] == c).all()


def test_ell_topology(hier):
    lvl = hier.levels[0]
    # interior vertex degree = 27
    assert lvl.K <= 27
    # diag slot correct
    n = lvl.n_verts
    assert (lvl.nbr[np.arange(n), lvl.diag_slot] == np.arange(n)).all()
    # hex_slot maps (h,a,b) to the entry (row=hex[a], col=hex[b])
    h, a, b = 3, 2, 5
    r = lvl.hexes[h, a]
    c = lvl.hexes[h, b]
    flat = lvl.hex_slot[h, a, b]
    assert flat // lvl.K == r
    assert lvl.nbr[r, flat % lvl.K] == c
    # real columns are unique per row
    for i in range(0, n, 37):
        cols = lvl.nbr[i][lvl.nbr_mask[i]]
        assert len(set(cols.tolist())) == len(cols)


def test_coarsen_counts(hier):
    f, c = hier.levels[0], hier.levels[1]
    # 4x4x8 cells -> 2x2x4 coarse cells -> 3x3x5 vertices
    assert c.n_hexes == 2 * 2 * 4
    assert c.n_verts == 3 * 3 * 5
    assert c.dx == pytest.approx(2 * f.dx)


def test_transfer_weights(hier):
    t = hier.transfers[0]
    f = hier.levels[0]
    # Unnormalized row sums on the fine side are exactly 1 (partition of unity).
    np.testing.assert_allclose(t.p_w.sum(axis=1), 1.0, atol=1e-6)
    # Weights only from {1, .5, .25, .125}
    w = t.p_w[t.p_w > 0]
    assert set(np.round(w * 8).astype(int).tolist()) <= {1, 2, 4, 8}
    # Normalized coarse rows sum to 1.
    np.testing.assert_allclose(t.r_w_norm.sum(axis=1), 1.0, atol=1e-5)


def test_prolongation_reproduces_linear_fields(hier):
    """Trilinear interpolation is exact for affine functions."""
    t = hier.transfers[0]
    f, c = hier.levels[0], hier.levels[1]
    A = np.array([[1.0, 2.0, 3.0], [0.5, -1.0, 0.25], [0.0, 1.5, -2.0]])
    fc = c.x0 @ A.T + 7.0
    ff = f.x0 @ A.T + 7.0
    interp = np.einsum("fk,fkc->fc", t.p_w, fc[t.p_idx.astype(np.int64)])
    np.testing.assert_allclose(interp, ff, rtol=1e-4, atol=1e-5)


def test_restriction_is_transpose(hier):
    t = hier.transfers[0]
    f, c = hier.levels[0], hier.levels[1]
    rng = np.random.default_rng(0)
    xf = rng.normal(size=(f.n_verts, 3))
    xc = rng.normal(size=(c.n_verts, 3))
    # <P xc, xf> == <xc, P^T xf>
    pxc = np.einsum("fk,fkc->fc", t.p_w, xc[t.p_idx.astype(np.int64)])
    rxf = np.einsum("ck,ckd->cd", t.r_w, xf[t.r_idx.astype(np.int64)])
    assert np.allclose((pxc * xf).sum(), (xc * rxf).sum(), rtol=1e-10)


def test_galerkin_plan_matches_dense(hier):
    """A_c == P^T A P for a random symmetric ELL matrix."""
    t = hier.transfers[0]
    f, c = hier.levels[0], hier.levels[1]
    rng = np.random.default_rng(1)
    # random block values on the real fine entries, symmetrized
    Af = np.zeros((3 * f.n_verts, 3 * f.n_verts))
    vals = np.zeros((f.n_verts, f.K, 3, 3), dtype=np.float64)
    ii, kk = np.nonzero(f.nbr_mask)
    for i, k in zip(ii, kk):
        j = f.nbr[i, k]
        if j < i:
            continue
        B = rng.normal(size=(3, 3))
        vals[i, k] = B
        Af[3 * i:3 * i + 3, 3 * j:3 * j + 3] = B
        if j != i:
            kb = np.nonzero(f.nbr[j] == i)[0][0]
            vals[j, kb] = B.T
            Af[3 * j:3 * j + 3, 3 * i:3 * i + 3] = B.T

    # dense P (3N_f x 3N_c), scalar weights x I3
    P = np.zeros((3 * f.n_verts, 3 * c.n_verts))
    for i in range(f.n_verts):
        for s in range(8):
            w = t.p_w[i, s]
            if w > 0:
                J = t.p_idx[i, s]
                P[3 * i:3 * i + 3, 3 * J:3 * J + 3] = w * np.eye(3)
    Ac_dense = P.T @ Af @ P

    # plan
    src = vals.reshape(-1, 3, 3)[t.g_src]
    contrib = t.g_w[:, None, None] * src
    Ac = np.zeros((c.n_verts * c.K, 3, 3))
    np.add.at(Ac, t.g_dst, contrib)
    Ac = Ac.reshape(c.n_verts, c.K, 3, 3)

    Ac_full = np.zeros_like(Ac_dense)
    for i in range(c.n_verts):
        for k in range(c.K):
            if c.nbr_mask[i, k]:
                j = c.nbr[i, k]
                Ac_full[3 * i:3 * i + 3, 3 * j:3 * j + 3] = Ac[i, k]
    np.testing.assert_allclose(Ac_full, Ac_dense, atol=1e-8)


def test_derive_n_levels():
    m = meshlib.beam(8, 8, 24, dx=0.05)
    # min extent 0.4 -> log2(8) - 1 = 2
    assert hl.derive_n_levels(m) == 2
