import numpy as np
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, DynamicsConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim, init_state


@pytest.fixture(scope="module")
def scene():
    m = meshlib.beam(4, 4, 8, dx=0.1)
    return Scene(m, solver=SolverConfig(n_levels=2))


def test_dynamic_frames_stable(scene):
    sim = DynamicSim(scene)
    for _ in range(20):
        st = sim.frame()
    x = np.asarray(st.x)
    assert np.isfinite(x).all()
    # the free end sags under gravity (pins are the top slab in +y)
    x0 = np.asarray(scene.x0)
    assert x[:, 1].min() < x0[:, 1].min() - 1e-4
    # no explosion
    assert np.abs(x - x0).max() < 1.0


def test_velocity_consistency(scene):
    """v == (x_new - x_old)/dt after each frame."""
    sim = DynamicSim(scene)
    x_old = np.asarray(sim.state.x)
    st = sim.frame()
    dt = sim.dyn.dt
    np.testing.assert_allclose(np.asarray(st.v),
                               (np.asarray(st.x) - x_old) / dt,
                               rtol=1e-3, atol=1e-5)


def test_step_to_tol_converges(scene):
    sim = DynamicSim(scene)
    for _ in range(3):
        st, k, fn = sim.frame_to_tol(tol=1e-4, max_newton=20)
        assert float(fn) <= 1e-4
        assert int(k) <= 20
    assert np.isfinite(np.asarray(st.x)).all()


def test_drag_pulls_vertices(scene):
    sim = DynamicSim(scene)
    n = scene.level(0).n_verts
    mask = np.zeros(n, dtype=np.float32)
    # grab a free (unpinned) vertex
    pin = np.asarray(scene.params["levels"][0]["pin_mask"])
    free = np.nonzero(pin == 0)[0][0]
    mask[free] = 1.0
    targets = np.asarray(scene.x0).copy()
    targets[free] += np.array([0.2, 0.0, 0.0], dtype=np.float32)
    sim.set_drag(mask, targets)
    for _ in range(30):
        st = sim.frame()
    moved = np.asarray(st.x)[free] - np.asarray(scene.x0)[free]
    assert moved[0] > 0.01  # pulled toward the drag target
    sim.clear_drag()
    assert float(sim.state.drag_mask.sum()) == 0.0


def test_matrix_free_matches_assembled(scene):
    """jax.linearize Hessian-vector PCG solves the same physics as the
    assembled-ELL CG path (fewer Newton iterations thanks to the block-Jacobi
    preconditioner; both states satisfy the tolerance)."""
    import jax
    from fem_simulation_tpu.sim import dynamic as dyn
    st = dyn.init_state(scene)
    st1, k1, f1 = jax.jit(lambda p, s: dyn.step_to_tol(
        scene, p, s, tol=1e-4, use_multigrid=False))(scene.params, st)
    st2, k2, f2 = jax.jit(lambda p, s: dyn.step_to_tol(
        scene, p, s, tol=1e-4, matrix_free=True))(scene.params, st)
    assert float(f1) <= 1e-4 and float(f2) <= 1e-4
    assert int(k2) <= int(k1)  # PCG should not be weaker
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st2.x), atol=1e-3)


def test_fas_dynamic_matches_cg(scene):
    """The dynamic FAS option (reference exp1/simulation/object.py:1175)
    solves the same implicit step as the CG path: both reach the tolerance
    and land on the same state."""
    import jax
    from fem_simulation_tpu.sim import dynamic as dyn
    st = dyn.init_state(scene)
    st1, k1, f1 = jax.jit(lambda p, s: dyn.step_to_tol(
        scene, p, s, tol=1e-4, use_multigrid=False))(scene.params, st)
    st2, k2, f2 = jax.jit(lambda p, s: dyn.step_to_tol(
        scene, p, s, tol=1e-4, max_newton=30, use_fas=True))(scene.params, st)
    assert float(f2) <= 1e-4, f"FAS missed tol: {float(f2):.3e}"
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st2.x), atol=1e-3)


def test_adaptive_substepping_unstructured_violent_kick():
    """dynamic.frame_adaptive: the violent-kick protocol (see
    tests/test_lattice.py) on the UNSTRUCTURED matrix-free path (VERDICT r3
    next #7 — previously only the lattice stepper could substep). Every
    frame must reach tol and at least one must engage substepping."""
    import jax
    from fem_simulation_tpu.sim import dynamic as dyn
    m = meshlib.beam(3, 3, 12, dx=0.05)
    sc = Scene(m, solver=SolverConfig(n_levels=1))
    st = dyn.init_state(sc)
    x = np.asarray(st.x)
    r = x - x.mean(0)
    omega = np.array([18.0, 0.0, 6.0], np.float32)
    v = np.cross(np.broadcast_to(omega, r.shape), r).astype(np.float32)
    st = st._replace(v=jnp.asarray(v))
    frame = jax.jit(lambda p, s: dyn.frame_adaptive(
        sc, p, s, tol=1e-4, max_newton=25, use_multigrid=False,
        matrix_free=True, max_halvings=4))
    n_subs = []
    for _ in range(6):
        st, k, fn, n_sub = frame(sc.params, st)
        assert float(fn) <= 1e-4, "every adaptive frame must converge"
        n_subs.append(int(n_sub))
    assert max(n_subs) > 1, "the kick must engage substepping"


def test_step_to_tol_x_init_warm_start(scene):
    """x_init seeds Newton without changing the solved problem: seeding at
    the PLAIN solve's own solution must converge immediately (0-1 Newton)
    to the same state — the exp3 warm-start contract."""
    import jax
    from fem_simulation_tpu.sim import dynamic as dyn
    st = dyn.init_state(scene)
    solve = jax.jit(lambda p, s, xi: dyn.step_to_tol(
        scene, p, s, tol=1e-4, max_newton=20, use_multigrid=False,
        matrix_free=True, x_init=xi))
    st1, k1, f1 = jax.jit(lambda p, s: dyn.step_to_tol(
        scene, p, s, tol=1e-4, max_newton=20, use_multigrid=False,
        matrix_free=True))(scene.params, st)
    st2, k2, f2 = solve(scene.params, st, st1.x)
    assert float(f2) <= 1e-4
    assert int(k2) <= 1 < int(k1)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               atol=1e-5)
