import numpy as np
import pytest
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib, hierarchy as hl
from fem_simulation_tpu.ops import ell, elastic, stencil
from fem_simulation_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def system():
    m = meshlib.beam(3, 4, 6, dx=0.1)
    lvl = hl.build_level_topology(m.x, m.ijk, m.hexes, m.dx)
    det, g, vol = elastic.prepare(jnp.asarray(lvl.x0), jnp.asarray(lvl.hexes))
    x = jnp.asarray(lvl.x0) + 0.01
    vals = elastic.assemble_hessian_ell_gather(
        x, jnp.asarray(lvl.hexes), det, g, 250.0, 10.0,
        jnp.asarray(lvl.contrib_idx),
        jnp.asarray(lvl.contrib_mask.astype(np.float32)), lvl.n_verts, lvl.K)
    mask = jnp.asarray(lvl.nbr_mask.astype(np.float32))
    nbr = jnp.asarray(lvl.nbr)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(lvl.n_verts, 3)).astype(np.float32))
    ref = ell.spmv(vals * mask[..., None, None], nbr, mask, b)
    return lvl, vals, nbr, mask, b, ref


def test_stencil_spmv_matches(system):
    lvl, vals, nbr, mask, b, ref = system
    lm = stencil.build_lattice_map(lvl)
    assert lm[3] == pytest.approx(1.0)  # solid beam fills its bbox
    vl = stencil.values_to_lattice(vals, nbr, mask, lvl, lm)
    lat = jnp.asarray(lm[1])
    xb = stencil.field_to_lattice(b, lat, lm[0])
    got = stencil.field_from_lattice(stencil.spmv_stencil(vl, xb), lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_stencil_with_holes():
    """Voxel shape with interior holes still matches the ELL SpMV."""
    cells = np.array([[i, j, k] for i in range(3) for j in range(3)
                      for k in range(5) if not (i == 1 and j == 1 and k == 2)])
    m = meshlib.hex_mesh_from_cells(cells, 0.1, np.zeros(3))
    lvl = hl.build_level_topology(m.x, m.ijk, m.hexes, m.dx)
    det, g, _ = elastic.prepare(jnp.asarray(lvl.x0), jnp.asarray(lvl.hexes))
    x = jnp.asarray(lvl.x0) + 0.02
    vals = elastic.assemble_hessian_ell_gather(
        x, jnp.asarray(lvl.hexes), det, g, 250.0, 0.0,
        jnp.asarray(lvl.contrib_idx),
        jnp.asarray(lvl.contrib_mask.astype(np.float32)), lvl.n_verts, lvl.K)
    mask = jnp.asarray(lvl.nbr_mask.astype(np.float32))
    nbr = jnp.asarray(lvl.nbr)
    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(lvl.n_verts, 3)).astype(np.float32))
    ref = ell.spmv(vals * mask[..., None, None], nbr, mask, b)
    lm = stencil.build_lattice_map(lvl)
    vl = stencil.values_to_lattice(vals, nbr, mask, lvl, lm)
    lat = jnp.asarray(lm[1])
    xb = stencil.field_to_lattice(b, lat, lm[0])
    got = stencil.field_from_lattice(stencil.spmv_stencil(vl, xb), lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_lanes_interpret_matches(system):
    lvl, vals, nbr, mask, b, ref = system
    got = pk.spmv(vals, nbr, mask, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_mg_level_permuted_pallas_matches_xla():
    """LatticeMG._level_matvec_diag permutes grid axes before the fused
    Pallas kernels (longest extent -> lanes). The permuted interpret-mode
    kernels must match the XLA linearize path, INCLUDING on a grid whose
    natural z is below the lane gate (Pallas enabled only via permutation)."""
    import jax
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG

    m = meshlib.beam(18, 4, 4, dx=0.05)      # natural z=4 < lane gate 16
    sc = LatticeScene(m, use_boxes=False)
    rng = np.random.default_rng(3)
    x = sc.x0 + 0.01 * jnp.asarray(
        rng.normal(size=sc.x0.shape).astype(np.float32))

    mg_p = LatticeMG(sc, n_levels=1, dt=None, use_pallas=True)   # interpret
    mg_x = LatticeMG(sc, n_levels=1, dt=None, use_pallas=False)
    lvl = mg_p.levels[0]
    pad = [(0, lvl.vert_mask.shape[d] - x.shape[d]) for d in range(3)]
    xp = jnp.pad(x, pad + [(0, 0)])

    mv_p, diag_p = mg_p._level_matvec_diag(0, lvl, xp)
    mv_x, diag_x = mg_x._level_matvec_diag(0, lvl, xp)
    np.testing.assert_allclose(np.asarray(diag_p), np.asarray(diag_x),
                               atol=1e-4)
    p = jnp.asarray(rng.normal(size=xp.shape).astype(np.float32)) \
        * lvl.vert_mask[..., None]
    np.testing.assert_allclose(np.asarray(mv_p(p)), np.asarray(mv_x(p)),
                               atol=1e-3)


def test_chunk_ranges_respect_budget():
    """Every x-chunk's padded per-field VMEM volume must stay within the
    budget (chunks hold c1-c0+1 VERTEX planes — the +1 overlap previously
    pushed chunks past the budget on large yz planes: the 1.1M-vert
    (32,32,1024)-cell grid got 230k-element chunks against a 160k budget
    and blew the TPU scoped-VMEM stack at compile). Floor: per=1 when even
    two vertex planes exceed the budget."""
    from fem_simulation_tpu.ops.pallas_lattice import _chunk_ranges, _round_up

    for (cx, cy, cz), budget in [
        ((32, 32, 1024), 160_000),   # the measured 1.1M-vert OOM shape
        ((32, 32, 1024), 64_000),    # diag budget: per=1 floor (2 planes
                                     # = 92k > 64k; x-chunking cannot split
                                     # a single yz plane)
        ((33, 50, 29), 160_000),     # kitten-shaped
        ((16, 16, 256), 160_000),    # 66k flagship: must stay single-chunk
        ((50, 50, 50), 64_000),
    ]:
        plane = _round_up(cy + 1, 8) * _round_up(cz + 1, 128)
        ranges = _chunk_ranges(cx, cy, cz, budget)
        # coverage: contiguous, complete
        assert ranges[0][0] == 0 and ranges[-1][1] == cx
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0
        floor = 2 * plane > budget
        for (c0, c1) in ranges:
            vol = (c1 - c0 + 1) * plane
            if floor:
                assert c1 - c0 == 1 or (c0, c1) == ranges[-1]
            else:
                assert vol <= budget, ((cx, cy, cz), budget, (c0, c1), vol)
    assert _chunk_ranges(16, 16, 256, 160_000) == [(0, 16)]
