import numpy as np
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import MaterialConfig, SolverConfig
from fem_simulation_tpu.sim import Scene, QuasiStaticSim
from fem_simulation_tpu.sim import quasistatic as qs
from fem_simulation_tpu.ops import ell


@pytest.fixture(scope="module")
def scene():
    m = meshlib.beam(4, 4, 8, dx=0.1)
    return Scene(m, solver=SolverConfig(n_levels=2))


def test_galerkin_exactness(scene):
    """Coarse Galerkin operator action == R (A (P x)) for any x (pre-SPD)."""
    from fem_simulation_tpu.ops import transfer
    p = scene.params
    x = scene.x0 + 0.01
    vals0 = qs.assemble_fine(scene, p, x)
    t = p["transfers"][0]
    lvl1 = scene.level(1)
    vc = transfer.galerkin(vals0, t["g_src"], t["g_dst"], t["g_w"],
                           lvl1.n_verts, lvl1.K)
    op0 = scene.make_op(0)
    op1 = scene.make_op(1)
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=(lvl1.n_verts, 3)).astype(np.float32))
    lhs = ell.spmv(vc * op1.mask[..., None, None], op1.nbr, op1.mask, xc)
    xf = transfer.prolong(t["p_idx"], t["p_w"], xc)
    axf = ell.spmv(vals0 * op0.mask[..., None, None], op0.nbr, op0.mask, xf)
    rhs = transfer.restrict(t["r_idx"], t["r_w"], axf)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-3, atol=1e-4)


def test_newton_converges(scene):
    sim = QuasiStaticSim(scene)
    e, fn = sim.newton(60)
    e = np.asarray(e)
    fn = np.asarray(fn)
    # force norm decreases by >10x and energy settles
    assert fn[-1] < 0.1 * fn[0]
    assert e[-1] < e[0]
    assert np.isfinite(e).all()


def test_newton_multigrid_converges(scene):
    sim = QuasiStaticSim(scene)
    e, fn = sim.newton_multigrid(25)
    fn = np.asarray(fn)
    assert fn[-1] < 0.05 * fn[0]
    assert np.isfinite(fn).all()


def test_newton_mg_beats_newton(scene):
    """MG should reach a lower force norm in fewer steps (smoother is stronger
    than 5 CG iterations on this problem)."""
    sim1 = QuasiStaticSim(scene)
    _, fn1 = sim1.newton(20)
    sim2 = QuasiStaticSim(scene)
    _, fn2 = sim2.newton_multigrid(20)
    assert np.asarray(fn2)[-1] < np.asarray(fn1)[-1] * 1.5  # at least comparable


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_fas_variants_run(scene, variant):
    sim = QuasiStaticSim(scene)
    e, fn = sim.fas(10, variant=variant)
    assert np.isfinite(np.asarray(fn)).all()
    assert np.isfinite(np.asarray(e)).all()


def test_fas3_converges_linearly(scene):
    """The headline reference result: FAS force inf-norm decays linearly on a
    log plot (README.md:17-19). Check a sustained geometric decay rate."""
    sim = QuasiStaticSim(scene)
    _, fn = sim.fas(60, variant=3)
    fn = np.asarray(fn)
    assert fn[-1] < 1e-2 * fn[0]
    # geometric decay: log-residual roughly linear over the mid range
    logs = np.log10(fn[10:60])
    diffs = np.diff(logs)
    assert np.median(diffs) < -0.01  # strictly decaying on median


def test_adam_and_gd_run(scene):
    sim = QuasiStaticSim(scene)
    series = sim.adam(50, lr=1e-3)
    assert np.isfinite(np.asarray(series)).all()
    sim2 = QuasiStaticSim(scene)
    series2 = sim2.gradient_descent(10, lr=1e-4)
    assert np.isfinite(np.asarray(series2)).all()


def test_pinned_vertices_stay(scene):
    sim = QuasiStaticSim(scene)
    sim.newton_multigrid(30)
    p0 = scene.params["levels"][0]
    pin = np.asarray(p0["pin_mask"]) > 0
    drift = np.abs(np.asarray(sim.x - p0["pin_pos"]))[pin]
    # pin springs are soft (control_mag=100), so allow modest drift
    assert drift.max() < 0.1
