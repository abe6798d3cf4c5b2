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
    """The reference's core claim (README.md:17-19): at equal iteration
    count, Newton-MG reaches a STRICTLY lower force norm than single-level
    Newton. Compared at iteration 10, where the gap is structural
    (calibrated: ~7.1e-6 vs ~9.5e-5 on this beam) — by iteration ~15 BOTH
    solvers sit at the float32 residual plateau (~6-7e-6), so a later
    comparison would only compare noise floors."""
    sim1 = QuasiStaticSim(scene)
    _, fn1 = sim1.newton(10)
    sim2 = QuasiStaticSim(scene)
    _, fn2 = sim2.newton_multigrid(10)
    assert np.asarray(fn2)[-1] < np.asarray(fn1)[-1]


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_fas_variants_run(scene, variant):
    sim = QuasiStaticSim(scene)
    e, fn = sim.fas(10, variant=variant)
    assert np.isfinite(np.asarray(fn)).all()
    assert np.isfinite(np.asarray(e)).all()


def test_fas3_converges_linearly(scene):
    """The headline reference result: FAS force inf-norm decays linearly on a
    log plot (README.md:17-19). Pin the actual geometric rate: calibrated at
    ~0.5 decades/cycle on this beam until the f32 noise floor (~6e-6); assert
    a sustained >= 0.3 decades/cycle over the decaying segment."""
    sim = QuasiStaticSim(scene)
    _, fn = sim.fas(60, variant=3)
    fn = np.asarray(fn)
    assert fn[-1] < 1e-2 * fn[0]
    # decaying segment: cycles before the residual reaches the noise floor
    k = int(np.argmax(fn < 2e-5))
    if k == 0:
        k = fn.size
    assert k >= 5, f"decay segment too short to fit a rate: {k}"
    logs = np.log10(fn[:k])
    slope = np.polyfit(np.arange(logs.size), logs, 1)[0]
    assert slope <= -0.3, f"FAS decay {-slope:.3f} decades/cycle < 0.3"
    # and the tolerance is actually reached within 20 cycles
    assert fn[:20].min() <= 1e-4


def test_drag_study_mg_fastest(scene):
    """Reference `drag` study (object.py:1770-1852): on ONE fixed SPD
    Hessian at a dragged state, the V-cycle's linear residual decays fastest
    per iteration (calibrated: 1 V-cycle ~ 5e-7 rel, 1 GS sweep ~ 1e-2 rel,
    1 CG iter ~ 1e-1 rel)."""
    from fem_simulation_tpu.harness.compare import drag_study
    out = drag_study(lambda: Scene(meshlib.beam(4, 4, 8, dx=0.1),
                                   solver=SolverConfig(n_levels=2)),
                     iterations=6)
    gs, cg, mg = out["gs"], out["cg"], out["mg"]
    assert mg[0] == gs[0] == cg[0]          # same system
    # MG strictly fastest at every recorded iteration
    for i in (1, 2, 3):
        assert mg[i] < gs[i] and mg[i] < cg[i]
    # and dramatically so after one cycle (>2 decades better than GS:
    # calibrated 5.5e-4 vs 1.8e-1 on this beam)
    assert mg[1] < 5e-3 * gs[1]


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
