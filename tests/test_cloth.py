import numpy as np
import pytest

from fem_simulation_tpu.config import ClothConfig
from fem_simulation_tpu.sim.cloth import ClothSim, ClothScene
from fem_simulation_tpu.ops import spring

import jax
import jax.numpy as jnp


def test_cloth_topology_counts():
    cfg = ClothConfig(res_x=4, res_y=4)
    s = ClothScene(cfg)
    # edges: rx*(ry+1) + ry*(rx+1) + rx*ry  (reference object.py:28)
    assert s.n_edges == 4 * 5 + 4 * 5 + 16
    assert s.n_verts == 25
    # interior vertex degree: 4 struct + 2 diag + self = 7 -> K >= 7
    assert s.K >= 7


def test_spring_force_is_minus_grad():
    cfg = ClothConfig(res_x=3, res_y=3)
    s = ClothScene(cfg)
    p = s.params
    rng = np.random.default_rng(0)
    x = p["x0"] + 0.03 * jnp.asarray(rng.normal(size=p["x0"].shape).astype(np.float32))
    gradfn = jax.grad(lambda xx: spring.energy(xx, p["edges"], p["l0"], cfg.k))
    f = spring.force(x, p["edges"], p["l0"], cfg.k, s.n_verts)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(gradfn(x)),
                               rtol=1e-3, atol=1e-4)


def test_spring_hessian_matches_autodiff():
    cfg = ClothConfig(res_x=2, res_y=2)
    s = ClothScene(cfg)
    p = s.params
    rng = np.random.default_rng(1)
    x = p["x0"] + 0.05 * jnp.asarray(rng.normal(size=p["x0"].shape).astype(np.float32))
    H = jax.jacfwd(jax.grad(
        lambda xx: spring.energy(xx, p["edges"], p["l0"], cfg.k)))(x)
    H = np.asarray(H)  # (N,3,N,3)
    vals = spring.assemble_hessian_ell(x, p["edges"], p["l0"], cfg.k,
                                       p["edge_slot"], s.n_verts, s.K)
    v = np.asarray(vals)
    nbr = np.asarray(p["nbr"])
    mask = np.asarray(p["mask"])
    dense = np.zeros((s.n_verts, 3, s.n_verts, 3))
    for i in range(s.n_verts):
        for k in range(s.K):
            if mask[i, k]:
                dense[i, :, nbr[i, k], :] += v[i, k]
    np.testing.assert_allclose(dense, H, rtol=2e-2, atol=2e-3)


def test_cloth_falls_and_is_stable():
    sim = ClothSim(ClothConfig(res_x=8, res_y=8))
    y0 = float(np.asarray(sim.state.x)[:, 1].mean())
    for _ in range(30):
        st = sim.frame()
    x = np.asarray(st.x)
    assert np.isfinite(x).all()
    assert x[:, 1].mean() < y0  # fell under gravity


def test_cloth_pins_hold():
    cfg = ClothConfig(res_x=8, res_y=8)
    pins = [0, 8]  # two corners of the first row
    sim = ClothSim(cfg, pins=pins)
    x0 = np.asarray(sim.state.x).copy()
    for _ in range(60):
        st = sim.frame()
    x = np.asarray(st.x)
    # pinned corners stay near their targets; the middle sags
    assert np.linalg.norm(x[pins] - x0[pins], axis=-1).max() < 0.2
    assert x[:, 1].min() < x0[:, 1].min() - 0.05


def test_cloth_drag_and_picker():
    from fem_simulation_tpu.sim.picking import Picker
    sim = ClothSim(ClothConfig(res_x=8, res_y=8), pins=[0, 8])
    pk = Picker(sim, sim.triangles(), grab_radius2=0.01)
    # ray straight down onto the cloth center
    origin = np.array([0.5, 2.0, 0.5])
    assert pk.select(origin, np.array([0.0, -1.0, 0.0]))
    pk.move_select(origin + np.array([0.1, 0.0, 0.0]),
                   np.array([0.0, -1.0, 0.0]))
    assert float(sim.state.drag_mask.sum()) > 0
    for _ in range(10):
        st = sim.frame()
    assert np.isfinite(np.asarray(st.x)).all()
    pk.clear()
    assert float(sim.state.drag_mask.sum()) == 0


def test_cloth_step_to_tol():
    """Every frame solved to the benchmark tolerance (bench --cloth path):
    the residual must actually satisfy tol and Newton re-assembly must keep
    the state finite over multiple frames."""
    import jax
    from fem_simulation_tpu.sim import cloth as clothmod
    cfg = ClothConfig(res_x=8, res_y=8)
    scene = clothmod.ClothScene(cfg, pins=[0, 8])
    st = clothmod.init_state(scene)
    step = jax.jit(lambda p, s: clothmod.step_to_tol(scene, p, s, tol=1e-4))
    for _ in range(5):
        st, k, fn = step(scene.params, st)
    assert float(fn) <= 1e-4 * 1.01
    assert int(k) >= 1
    assert np.isfinite(np.asarray(st.x)).all()
