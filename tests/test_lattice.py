import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene, dynamic
from fem_simulation_tpu.sim.lattice import LatticeScene, LatticeDynamicSim, step_to_tol
from fem_simulation_tpu.ops import stencil, elastic


@pytest.fixture(scope="module")
def meshes():
    return meshlib.beam(4, 4, 8, dx=0.1)


def test_lattice_force_matches_unstructured(meshes):
    m = meshes
    scene_u = Scene(m, solver=SolverConfig(n_levels=1))
    scene_l = LatticeScene(m)
    rng = np.random.default_rng(0)
    x = scene_u.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene_u.x0.shape).astype(np.float32))

    # unstructured elastic force
    p0 = scene_u.params["levels"][0]
    f_u = elastic.force(x, p0["hexes"], p0["det"], p0["g"], 250.0, 0.0,
                        x.shape[0])
    # lattice elastic force (same canonical ordering via lat map)
    x_lat = stencil.field_to_lattice(x, scene_l.lat, scene_l.shape) \
        - scene_l.x0    # stencil kernels take displacements
    f_lat = stencil.elastic_force_lattice(x_lat, scene_l.cell_mask,
                                          scene_l.g_tab, scene_l.det,
                                          250.0, 0.0)
    f_l = stencil.field_from_lattice(f_lat, scene_l.lat)
    np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_u),
                               rtol=1e-3, atol=1e-5)


def test_lattice_energy_matches(meshes):
    m = meshes
    scene_u = Scene(m, solver=SolverConfig(n_levels=1))
    scene_l = LatticeScene(m)
    rng = np.random.default_rng(1)
    x = scene_u.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene_u.x0.shape).astype(np.float32))
    p0 = scene_u.params["levels"][0]
    e_u = elastic.energy(x, p0["hexes"], p0["det"], p0["g"], 250.0, 5.0)
    x_lat = stencil.field_to_lattice(x, scene_l.lat, scene_l.shape) \
        - scene_l.x0    # displacement form
    e_l = stencil.elastic_energy_lattice(x_lat, scene_l.cell_mask,
                                         scene_l.g_tab, scene_l.det,
                                         250.0, 5.0)
    assert float(e_l) == pytest.approx(float(e_u), rel=1e-4)


def test_lattice_mass_and_pins_match(meshes):
    m = meshes
    scene_u = Scene(m, solver=SolverConfig(n_levels=1))
    scene_l = LatticeScene(m)
    p0 = scene_u.params["levels"][0]
    m_l = stencil.field_from_lattice(scene_l.mass[..., None],
                                     scene_l.lat)[:, 0]
    np.testing.assert_allclose(np.asarray(m_l), np.asarray(p0["mass"]),
                               rtol=1e-4)
    pin_l = stencil.field_from_lattice(scene_l.pin_mask[..., None],
                                       scene_l.lat)[:, 0]
    np.testing.assert_allclose(np.asarray(pin_l), np.asarray(p0["pin_mask"]))


def test_lattice_step_matches_unstructured(meshes):
    """One tolerance-solved frame agrees with the unstructured matfree path."""
    m = meshes
    scene_u = Scene(m, solver=SolverConfig(n_levels=1))
    st_u = dynamic.init_state(scene_u)
    st1, k1, f1 = jax.jit(lambda s: dynamic.step_to_tol(
        scene_u, scene_u.params, s, tol=1e-4, matrix_free=True))(st_u)

    sim = LatticeDynamicSim(m)
    st2, k2, f2 = sim.frame_to_tol(tol=1e-4)
    x2 = np.asarray(sim.positions())
    np.testing.assert_allclose(x2, np.asarray(st1.x), atol=2e-5)
    assert float(f2) <= 1e-4


def test_lattice_sim_stable(meshes):
    sim = LatticeDynamicSim(meshes)
    for _ in range(5):
        st, k, f = sim.frame_to_tol()
        assert float(f) <= 1e-4
    assert np.isfinite(np.asarray(st.x)).all()


def test_lattice_mg_step(meshes):
    """GMG-preconditioned step converges and matches the plain-PCG step."""
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim import lattice as latmod
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG, step_to_tol_mg
    scene = LatticeScene(meshes)
    mg = LatticeMG(scene, n_levels=2)
    st = scene.init_state()
    st1, k1, f1 = jax.jit(lambda s: latmod.step_to_tol(scene, s, tol=1e-4))(st)
    st2, k2, f2 = jax.jit(lambda s: step_to_tol_mg(scene, mg, s, tol=1e-4))(st)
    assert float(f2) <= 1e-4
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x), atol=1e-3)


def test_lattice_mg_traced_dt_matches_baked(meshes):
    """A dt=None hierarchy + linearize(inv_dt) must reproduce the baked-dt
    hierarchy exactly: restriction is linear, so restricting (pin + m/dt^2)
    equals restricting pin and adding inv_dt^2 * restricted mass. This is
    the identity frame_adaptive_mg's traced-dt substepping rests on."""
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.config import DynamicsConfig
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG, step_to_tol_mg
    scene = LatticeScene(meshes)
    dyn = DynamicsConfig()
    mg_baked = LatticeMG(scene, n_levels=2, dt=dyn.dt)
    mg_none = LatticeMG(scene, n_levels=2, dt=None)
    st = scene.init_state()
    st1, k1, f1 = jax.jit(
        lambda s: step_to_tol_mg(scene, mg_baked, s, tol=1e-4))(st)
    st2, k2, f2 = jax.jit(
        lambda s: step_to_tol_mg(scene, mg_none, s, tol=1e-4,
                                 dt=jnp.float32(dyn.dt)))(st)
    assert float(f2) <= 1e-4
    assert int(k1) == int(k2)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               atol=1e-6)


def test_adaptive_substepping_mg_converges_violent_kick():
    """frame_adaptive_mg: the violent-kick protocol of
    test_adaptive_substepping_converges_violent_kick on the GMG-
    preconditioned dynamic path (VERDICT r3 next #7 — previously only the
    single-level lattice stepper could substep)."""
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG, frame_adaptive_mg
    m = meshlib.beam(3, 3, 12, dx=0.05)
    sc = LatticeScene(m)
    mg = LatticeMG(sc, n_levels=2, dt=None, use_pallas=False)
    st = sc.init_state()
    x = np.asarray(st.x)
    r = x - x.reshape(-1, 3).mean(0)
    omega = np.array([18.0, 0.0, 6.0], np.float32)
    v = np.cross(np.broadcast_to(omega, r.shape), r).astype(np.float32)
    st = st._replace(v=jnp.asarray(v) * sc.vert_mask[..., None])
    # the GMG step converges this kick within ~25 Newton even at full dt;
    # a tight per-substep budget is what forces the halving loop to engage
    # (the contract under test is the redo machinery, not MG's strength)
    frame = jax.jit(lambda s: frame_adaptive_mg(sc, mg, s, tol=1e-4,
                                                max_newton=6,
                                                max_halvings=4))
    n_subs = []
    for _ in range(6):
        st, k, fn, n_sub = frame(st)
        assert float(fn) <= 1e-4, "every adaptive MG frame must converge"
        n_subs.append(int(n_sub))
    assert max(n_subs) > 1, "the kick must engage substepping"


def test_lattice_transfers_adjoint():
    from fem_simulation_tpu.ops import stencil
    rng = np.random.default_rng(3)
    xc = jnp.asarray(rng.normal(size=(5, 4, 7, 3)).astype(np.float32))
    xf = jnp.asarray(rng.normal(size=(9, 7, 13, 3)).astype(np.float32))
    a = float(jnp.sum(stencil.prolong_lat(xc) * xf))
    b = float(jnp.sum(xc * stencil.restrict_lat(xf)))
    assert a == pytest.approx(b, rel=1e-5)


def test_lattice_step_pallas_interpret_matches():
    """Pallas (interpret) stepping == XLA stepping.

    Bounded on purpose: a FULL solve in interpret mode costs >10 min on one
    CPU (every force/HVP eval interpreted); two Newton iterations with a
    short CG budget exercise the same integration (force + HVP + diag fused
    kernels inside the while_loop) at ~1/50 the cost. Full-solve Pallas
    parity is covered on hardware by bench.py and the kernel-level tests
    below (test_pallas_hess_diag_matches / test_pallas_energy_matches)."""
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim import lattice as latmod
    scene = LatticeScene(meshlib.beam(3, 3, 5, dx=0.1))
    st = scene.init_state()
    kw = dict(tol=1e-12, max_newton=2, cg_iterations=5)
    st1, k1, f1 = jax.jit(lambda s: latmod.step_to_tol(
        scene, s, use_pallas=False, **kw))(st)
    st2, k2, f2 = jax.jit(lambda s: latmod.step_to_tol(
        scene, s, use_pallas=True, **kw))(st)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               atol=2e-5)
    assert int(k2) == int(k1) == 2
    assert np.isfinite(np.asarray(st2.x)).all()


def test_lattice_drag(meshes):
    sim = LatticeDynamicSim(meshes)
    n = sim.scene.lvl.n_verts
    pin = np.zeros(n, np.float32)
    free = 0
    mask = np.zeros(n, np.float32)
    mask[free] = 1.0
    targets = np.asarray(sim.positions()).copy()
    targets[free] += np.array([0.15, 0, 0], np.float32)
    sim.set_drag(mask, targets)
    for _ in range(3):
        st, k, f = sim.frame_to_tol()
    moved = np.asarray(sim.positions())[free]
    assert np.isfinite(moved).all()
    sim.clear_drag()
    assert float(sim.state.drag_mask.sum()) == 0


def test_lattice_quasistatic(meshes):
    """Lattice quasi-static Newton reaches the same equilibrium as the
    unstructured Newton-MG solver."""
    from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol
    from fem_simulation_tpu.sim import QuasiStaticSim
    from fem_simulation_tpu.config import SolverConfig
    from fem_simulation_tpu.ops import stencil
    scene = LatticeScene(meshes)
    x, k, f = jax.jit(lambda xx: quasistatic_to_tol(scene, xx, tol=1e-4))(scene.x0)
    assert float(f) <= 1e-4
    sim = QuasiStaticSim(Scene(meshes, solver=SolverConfig(n_levels=2)))
    sim.newton_multigrid(60)
    x_can = stencil.field_from_lattice(x, scene.lat)
    np.testing.assert_allclose(np.asarray(x_can), np.asarray(sim.x), atol=2e-3)


def test_mg_fine_level_scene_routing_matches_stencil():
    """LatticeMG's level-0 operator routed through the scene's box-aware
    elastic kernels (use_pallas=True — interpret mode on CPU) must equal
    the XLA stencil operator: same HVP action, same diagonal. This is the
    path that lets the V-cycle's fine smoothing ride the multi-box cover."""
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG
    m = meshlib.beam(3, 3, 18, dx=0.05)
    sc = LatticeScene(m)
    mg_p = LatticeMG(sc, n_levels=2, dt=None, use_pallas=True)
    mg_x = LatticeMG(sc, n_levels=2, dt=None, use_pallas=False)
    rng = np.random.default_rng(5)
    shape = mg_p.levels[0].vert_mask.shape + (3,)
    xp = jnp.pad(sc.x0, [(0, shape[0] - sc.x0.shape[0]),
                         (0, shape[1] - sc.x0.shape[1]),
                         (0, shape[2] - sc.x0.shape[2]), (0, 0)])
    xp = xp + 0.02 * jnp.asarray(rng.normal(size=shape).astype(np.float32)) \
        * mg_p.levels[0].vert_mask[..., None]
    p = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ops_p = mg_p.linearize(xp)
    ops_x = mg_x.linearize(xp)
    np.testing.assert_allclose(np.asarray(ops_p[0][0](p)),
                               np.asarray(ops_x[0][0](p)),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ops_p[0][1]),
                               np.asarray(ops_x[0][1]),
                               rtol=1e-4, atol=2e-3)


def test_lattice_quasistatic_ew_forcing(meshes):
    """Eisenstat-Walker adaptive CG forcing (cg_forcing='ew') reaches the
    same equilibrium as the fixed inner tolerance without degrading the
    Newton count beyond a small margin (looser early solves can add a
    Newton step or two; they must not derail convergence)."""
    from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol
    scene = LatticeScene(meshes)
    x1, k1, f1 = jax.jit(
        lambda xx: quasistatic_to_tol(scene, xx, tol=1e-4))(scene.x0)
    x2, k2, f2 = jax.jit(
        lambda xx: quasistatic_to_tol(scene, xx, tol=1e-4,
                                      cg_forcing="ew"))(scene.x0)
    assert float(f2) <= 1e-4
    assert int(k2) <= int(k1) + 5
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=2e-3)


def test_pallas_hess_diag_matches(meshes):
    """Fused Pallas Hessian-diagonal kernel == XLA stencil reference."""
    from fem_simulation_tpu.ops import pallas_lattice as plat
    scene = LatticeScene(meshes)
    rng = np.random.default_rng(7)
    x = scene.x0 + 0.03 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)) \
        * scene.vert_mask[..., None]
    u = x - scene.x0    # displacement form
    ref = stencil.elastic_hessian_diag_lattice(
        u, scene.cell_mask, scene.g_tab, scene.det, 250.0, 37.0)
    got = plat.hess_diag_lattice(u, scene.cell_mask, meshes.dx, 250.0, 37.0,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_energy_matches(meshes):
    """Fused Pallas energy kernel == XLA stencil reference."""
    from fem_simulation_tpu.ops import pallas_lattice as plat
    scene = LatticeScene(meshes)
    rng = np.random.default_rng(8)
    x = scene.x0 + 0.03 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)) \
        * scene.vert_mask[..., None]
    u = x - scene.x0    # displacement form
    ref = stencil.elastic_energy_lattice(u, scene.cell_mask, scene.g_tab,
                                         scene.det, 250.0, 37.0)
    got = plat.elastic_energy_lattice(u, scene.cell_mask, meshes.dx,
                                      250.0, 37.0, interpret=True)
    assert float(got) == pytest.approx(float(ref), rel=1e-4)


def test_lattice_quasistatic_mg(meshes):
    """GMG-preconditioned quasi-static Newton reaches the same equilibrium
    as the block-Jacobi-PCG quasi-static Newton."""
    from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG, quasistatic_to_tol_mg
    scene = LatticeScene(meshes)
    mg = LatticeMG(scene, n_levels=2, dt=None)
    x1, k1, f1 = jax.jit(
        lambda xx: quasistatic_to_tol(scene, xx, tol=1e-4))(scene.x0)
    x2, k2, f2 = jax.jit(
        lambda xx: quasistatic_to_tol_mg(scene, mg, xx, tol=1e-4))(scene.x0)
    assert float(f2) <= 1e-4
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=2e-3)


def test_pallas_x_chunking_matches_single(monkeypatch):
    """Overlapping x-slab chunking of the fused kernels (the VMEM guard for
    cubic grids like the voxelized kitten) == single-chunk results."""
    from fem_simulation_tpu.ops import pallas_lattice as plat
    scene = LatticeScene(meshlib.beam(4, 3, 3, dx=0.1))
    rng = np.random.default_rng(11)
    x = scene.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)) \
        * scene.vert_mask[..., None]
    p = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    x = x - scene.x0    # displacement form (both kernel families)
    x_cf = jnp.transpose(x, (3, 0, 1, 2))
    p_cf = jnp.transpose(p, (3, 0, 1, 2))
    args = (scene.cell_mask, scene.mesh.dx, 250.0, 37.0)

    # XLA stencil ops as reference (single-chunk Pallas == stencil is pinned
    # by test_pallas_hess_diag_matches/test_pallas_energy_matches and the
    # interpret stepping test; re-deriving them here would double the
    # interpret-mode compile bill)
    sargs = (scene.cell_mask, scene.g_tab, scene.det, 250.0, 37.0)
    ref_f = stencil.elastic_force_lattice(x, *sargs)
    _, jvp = jax.linearize(
        lambda xx: stencil.elastic_force_lattice(xx, *sargs), x)
    ref_h = -jvp(p)
    ref_d = stencil.elastic_hessian_diag_lattice(x, *sargs)
    ref_e = stencil.elastic_energy_lattice(x, *sargs)

    monkeypatch.setenv("FEM_TPU_CHUNK_VOL", "4096")  # force 2 chunks
    monkeypatch.setenv("FEM_TPU_CHUNK_VOL_DIAG", "4096")
    assert len(plat._chunk_ranges(*scene.cell_mask.shape)) == 2
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(plat.force_cf(x_cf, *args, interpret=True),
                                 (1, 2, 3, 0))),
        np.asarray(ref_f), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(
            plat.hvp_cf(x_cf, p_cf, *args, interpret=True), (1, 2, 3, 0))),
        np.asarray(ref_h), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(plat.hess_diag_lattice(x, *args, interpret=True)),
        np.asarray(ref_d), rtol=1e-4, atol=1e-5)
    assert float(plat.elastic_energy_lattice(x, *args, interpret=True)) \
        == pytest.approx(float(ref_e), rel=1e-4)


def test_lattice_quasistatic_mg_coarse_cg():
    """V-cycle with an inner-CG coarsest solve (non-stationary preconditioner
    -> flexible outer PCG) still reaches the block-Jacobi equilibrium.
    Small beam on purpose: correctness of the flexible-PCG + inner-CG wiring,
    not scaling (bench.py --quasistatic measures that on hardware)."""
    from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol
    from fem_simulation_tpu.sim.lattice_mg import LatticeMG, quasistatic_to_tol_mg
    scene = LatticeScene(meshlib.beam(3, 3, 7, dx=0.1))
    mg = LatticeMG(scene, n_levels=2, dt=None, coarse_cg=8)
    x1, k1, f1 = jax.jit(
        lambda xx: quasistatic_to_tol(scene, xx, tol=1e-4))(scene.x0)
    x2, k2, f2 = jax.jit(
        lambda xx: quasistatic_to_tol_mg(scene, mg, xx, tol=1e-4))(scene.x0)
    assert float(f2) <= 1e-4
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=2e-3)


def test_elastic_force_translation_invariance():
    """Displacement-form kernels (ops/stencil.py, ops/pallas_lattice.py):
    the elastic force is a function of u = x - x0 only, so translating the
    mesh origin ~1000 units must leave it unchanged up to the STATE
    quantization (x = x0 + du rounds du at ulp(|origin|) ~ 6e-5 before the
    kernel ever runs; the subtraction u = x - x0 itself is exactly
    rounded). The old position-form kernels formed F from absolute
    coordinates, whose f32 evaluation noise scaled as |x|*(2/dx)*8eps
    ~ 2e-2 at this origin — 4x over this test's
    threshold (measured state-quantization diff here: 2.6e-3) — and stalled Newton at a ~1.2e-4 floor on a 12.8-unit beam
    at origin ZERO."""
    cells = np.array([[i, j, k] for i in range(3) for j in range(3)
                      for k in range(8)])
    rng = np.random.default_rng(21)
    u = 0.02 * rng.normal(size=(4 * 4 * 9, 3)).astype(np.float32)
    outs = []
    for origin in (np.zeros(3), np.array([173.0, -58.0, 940.0])):
        m = meshlib.hex_mesh_from_cells(cells, 0.05, origin)
        sc = LatticeScene(m)
        du = stencil.field_to_lattice(jnp.asarray(u), sc.lat, sc.shape) \
            * sc.vert_mask[..., None]
        f = sc.elastic_force(sc.x0 + du, pallas=False)
        e = sc.elastic_energy(sc.x0 + du, pallas=False)
        outs.append((np.asarray(f), float(e)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=5e-3)
    assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-2)


def test_dynamic_rescue_survives_violent_kick():
    """A full Newton step on a fast-swinging StVK body can diverge (the
    rocker.obj pendulum hit fn=inf at frame 8 pre-rescue); the incremental-
    potential Armijo rescue in step_to_tol must keep every frame finite."""
    from fem_simulation_tpu.sim.lattice import step_to_tol
    m = meshlib.beam(3, 3, 12, dx=0.05)
    sc = LatticeScene(m)
    st = sc.init_state()
    # violent rigid-rotation kick about the pinned top slab
    x = np.asarray(st.x)
    r = x - x.reshape(-1, 3).mean(0)
    omega = np.array([18.0, 0.0, 6.0], np.float32)
    v = np.cross(np.broadcast_to(omega, r.shape), r).astype(np.float32)
    st = st._replace(v=jnp.asarray(v) * sc.vert_mask[..., None])
    step = jax.jit(lambda s: step_to_tol(sc, s, tol=1e-4, max_newton=25,
                                         use_pallas=False))
    for _ in range(6):
        st, k, fn = step(st)
        assert np.isfinite(np.asarray(st.x)).all()
        assert np.isfinite(np.asarray(st.v)).all()


def test_adaptive_substepping_converges_violent_kick():
    """frame_adaptive: the same violent kick, but every frame must now reach
    the tolerance (the rescue alone keeps frames finite yet can exhaust the
    Newton budget at ~1e-2); at least one frame must actually engage
    substepping (n_sub > 1), and the advanced physical time per frame is
    dyn.dt regardless of n_sub."""
    from fem_simulation_tpu.sim.lattice import frame_adaptive
    m = meshlib.beam(3, 3, 12, dx=0.05)
    sc = LatticeScene(m)
    st = sc.init_state()
    x = np.asarray(st.x)
    r = x - x.reshape(-1, 3).mean(0)
    omega = np.array([18.0, 0.0, 6.0], np.float32)
    v = np.cross(np.broadcast_to(omega, r.shape), r).astype(np.float32)
    st = st._replace(v=jnp.asarray(v) * sc.vert_mask[..., None])
    frame = jax.jit(lambda s: frame_adaptive(sc, s, tol=1e-4, max_newton=25,
                                             use_pallas=False,
                                             max_halvings=4))
    n_subs = []
    for _ in range(6):
        st, k, fn, n_sub = frame(st)
        assert float(fn) <= 1e-4, "every adaptive frame must converge"
        n_subs.append(int(n_sub))
    assert max(n_subs) > 1, "the kick must engage substepping"


def test_fused_pcg_matches_pcg_operator():
    """ops.pallas_lattice.fused_pcg (one-launch diag + block-Jacobi PCG +
    stencil HVP megakernel, interpret mode on CPU) == the unfused
    solvers.cg.pcg_operator path of step_to_tol: same iteration count
    (pcg_operator's k convention), same solution, zero-RHS no-op. One
    compiled call signature on purpose — tol is a traced input — because
    the interpret-mode while_loop compile is the expensive part."""
    from fem_simulation_tpu.ops import pallas_lattice as plat
    from fem_simulation_tpu.ops import ell
    from fem_simulation_tpu.solvers import cg as cgmod
    sc = LatticeScene(meshlib.beam(3, 3, 5, dx=0.1))
    assert sc.boxes is None and plat.fused_pcg_ok(sc.shape)
    rng = np.random.default_rng(7)
    x = sc.x0 + 0.01 * jnp.asarray(
        rng.standard_normal(sc.x0.shape).astype(np.float32)) \
        * sc.vert_mask[..., None]
    inv_dt = 1.0 / 0.033
    mat = sc.material
    ctrl = (mat.control_mag * sc.pin_mask + sc.mass * inv_dt * inv_dt
            + (1.0 - sc.vert_mask))
    vmask3 = sc.vert_mask[..., None]
    f = sc.dyn_force(x, x, inv_dt, use_pallas=False)

    hvp = sc.elastic_hvp_fn(x, False)
    matvec = lambda p: (hvp(p) + ctrl[..., None] * p) * vmask3
    diag = sc.elastic_diag(x, False) \
        + ctrl[..., None, None] * jnp.eye(3, dtype=x.dtype)
    minv = lambda r: ell.solve3x3(diag, r) * vmask3
    dx_ref, k_ref = cgmod.pcg_operator(matvec, minv, f, iterations=20,
                                       tol=1e-2, return_iters=True)

    fused = jax.jit(lambda ff, tol: plat.fused_pcg(
        jnp.transpose(x - sc.x0, (3, 0, 1, 2)),
        jnp.transpose(ff, (3, 0, 1, 2)), sc.cell_mask, ctrl, sc.vert_mask,
        sc.mesh.dx, mat.lame_mu, mat.lame_la, iterations=20, tol=tol))
    dx_f, k_f = fused(f, 1e-2)
    dx_f = jnp.transpose(dx_f, (1, 2, 3, 0))
    assert int(k_f) == int(k_ref)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-6)
    # zero RHS: the solve is a no-op (scale_back = 0) and exits immediately
    dx0, k0 = fused(jnp.zeros_like(f), 1e-2)
    assert float(jnp.max(jnp.abs(dx0))) == 0.0
    assert int(k0) == 1
    # tighter traced tol runs more iterations (same compiled program)
    _, k_tight = fused(f, 1e-6)
    assert int(k_tight) > int(k_f)


def test_mg_lmax_cache_linearize():
    """LatticeMG.lmax_cache: cached Chebyshev bounds are the per-linearize
    estimates x the drift margin, linearize(lmax_cache=...) carries them
    into ops verbatim, and the cached-bound quasi-static MG solve still
    converges to the uncached equilibrium."""
    from fem_simulation_tpu.sim.lattice_mg import (LatticeMG,
                                                   quasistatic_to_tol_mg)
    sc = LatticeScene(meshlib.beam(3, 3, 7, dx=0.1))
    mg = LatticeMG(sc, n_levels=2, dt=None)
    assert mg.chebyshev
    xp = jnp.pad(sc.x0, [(0, mg.pad_shape[0] - sc.x0.shape[0]),
                         (0, mg.pad_shape[1] - sc.x0.shape[1]),
                         (0, mg.pad_shape[2] - sc.x0.shape[2]), (0, 0)])
    ops_raw = mg.linearize(xp)
    cache = mg.lmax_cache(xp)
    np.testing.assert_allclose(
        np.asarray(cache),
        np.asarray(jnp.stack([o[3] for o in ops_raw])) * 1.2, rtol=1e-6)
    ops_cached = mg.linearize(xp, lmax_cache=cache)
    for li, op in enumerate(ops_cached):
        assert float(op[3]) == pytest.approx(float(cache[li]))
    x2, k2, f2 = jax.jit(
        lambda xx: quasistatic_to_tol_mg(sc, mg, xx, tol=1e-4))(sc.x0)
    assert float(f2) <= 1e-4
