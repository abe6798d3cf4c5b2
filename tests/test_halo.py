import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib, hierarchy as hl
from fem_simulation_tpu.ops import ell, elastic
from fem_simulation_tpu.parallel.halo import (partition_slabs,
                                              make_dist_matvec, dist_cg)
from fem_simulation_tpu.parallel import make_device_mesh


@pytest.fixture(scope="module")
def setup():
    m = meshlib.beam(4, 4, 32, dx=0.1)   # long beam: clean z slabs
    lvl = hl.build_level_topology(m.x, m.ijk, m.hexes, m.dx)
    det, g, vol = elastic.prepare(jnp.asarray(lvl.x0), jnp.asarray(lvl.hexes))
    x = jnp.asarray(lvl.x0) + 0.01
    vals = elastic.assemble_hessian_ell_gather(
        x, jnp.asarray(lvl.hexes), det, g, 250.0, 0.0,
        jnp.asarray(lvl.contrib_idx),
        jnp.asarray(lvl.contrib_mask.astype(np.float32)), lvl.n_verts, lvl.K)
    vals = ell.add_to_diag(vals, jnp.asarray(lvl.diag_slot),
                           jnp.broadcast_to(2.0 * jnp.eye(3),
                                            (lvl.n_verts, 3, 3)))
    return lvl, vals


def test_partition_covers_all(setup):
    lvl, vals = setup
    part = partition_slabs(lvl, 8)
    owned = part.own_global[part.own_mask > 0]
    assert np.sort(owned).tolist() == list(range(lvl.n_verts))


def test_dist_spmv_matches_single(setup):
    lvl, vals = setup
    mesh = make_device_mesh(8, dp=1)
    mesh = jax.sharding.Mesh(mesh.devices.reshape(-1), ("sp",))
    part = partition_slabs(lvl, 8)
    matvec, scatter, gather = make_dist_matvec(part, mesh)

    vals_local = jnp.asarray(np.asarray(vals)[part.own_global])  # (D,n_own,K,3,3)
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.normal(size=(lvl.n_verts, 3)).astype(np.float32))
    ref = ell.spmv(vals * jnp.asarray(lvl.nbr_mask.astype(np.float32))[..., None, None],
                   jnp.asarray(lvl.nbr),
                   jnp.asarray(lvl.nbr_mask.astype(np.float32)), xg)
    y_sh = matvec(vals_local, scatter(xg))
    got = gather(y_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_dist_cg_matches_single(setup):
    lvl, vals = setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    part = partition_slabs(lvl, 8)
    matvec, scatter, gather = make_dist_matvec(part, mesh)
    vals_local = jnp.asarray(np.asarray(vals)[part.own_global])
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(lvl.n_verts, 3)).astype(np.float32))

    from fem_simulation_tpu.solvers import cg as cgmod
    from fem_simulation_tpu.solvers.smoothers import EllOperator
    op = EllOperator(jnp.asarray(lvl.nbr),
                     jnp.asarray(lvl.nbr_mask.astype(np.float32)),
                     jnp.asarray(lvl.diag_slot), lvl.color_offsets)
    ref = cgmod.cg(op, vals, b, iterations=40, tol=1e-12)

    b_sh = scatter(b) * jnp.asarray(part.own_mask)[..., None]
    x_sh = dist_cg(lambda p: matvec(vals_local, p), b_sh, mesh,
                   iterations=40)
    got = gather(x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-4)


def test_dist_newton_step_matches_single_chip():
    """Full distributed Newton dynamic step on the unstructured block-ELL
    path (halo.make_dist_newton_step): one implicit-Euler frame solved to
    tolerance over an 8-device z-slab mesh must converge and match the
    single-chip matrix-free step (sim/dynamic.py step_to_tol)."""
    from fem_simulation_tpu.config import SolverConfig
    from fem_simulation_tpu.sim import Scene, dynamic
    from fem_simulation_tpu.parallel.halo import (make_dist_newton_step,
                                                  slab_scatter, slab_gather)

    m = meshlib.beam(3, 3, 24, dx=0.1)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    lvl = scene.hier.levels[0]
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    part = partition_slabs(lvl, 8)
    step = make_dist_newton_step(scene, part, mesh, tol=1e-4)

    x_sh = slab_scatter(part, scene.x0)
    v_sh = jnp.zeros_like(x_sh)
    x2, v2, k, fn = jax.jit(step)(x_sh, v_sh)
    fn = float(np.asarray(fn).max())
    assert np.isfinite(np.asarray(x2)).all()
    assert fn <= 1e-4 * 1.01, f"distributed Newton missed tol: {fn:.3e}"
    assert int(np.asarray(k).max()) >= 1

    # single-chip reference: same predictor + matrix-free Newton to tol
    st = dynamic.init_state(scene)
    st2, k1, fn1 = dynamic.step_to_tol(scene, scene.params, st, tol=1e-4,
                                       max_newton=20, matrix_free=True)
    xg = slab_gather(part, x2, lvl.n_verts)
    err = np.abs(xg - np.asarray(st2.x)).max()
    assert err < 1e-3, f"distributed step deviates from single-chip: {err}"
