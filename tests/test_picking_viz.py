import numpy as np
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim
from fem_simulation_tpu.sim.picking import Picker, ray_triangles


@pytest.fixture(scope="module")
def setup():
    m = meshlib.beam(3, 3, 6, dx=0.1)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    sim = DynamicSim(scene)
    tris = meshlib.surface_triangles(m.hexes)
    return m, scene, sim, tris


def test_ray_triangles_hits_box(setup):
    m, scene, sim, tris = setup
    # ray through the beam center along +x
    c = m.x.mean(axis=0)
    origin = c - np.array([10.0, 0, 0])
    hit, t = ray_triangles(origin, np.array([1.0, 0, 0]), m.x.astype(np.float64), tris)
    assert hit.sum() >= 2  # entry and exit faces


def test_picker_select_and_drag(setup):
    m, scene, sim, tris = setup
    pk = Picker(sim, tris, grab_radius2=0.02)
    c = m.x.mean(axis=0)
    origin = c - np.array([10.0, 0, 0])
    assert pk.select(origin, np.array([1.0, 0, 0]))
    assert pk.select_vertex >= 0
    pk.move_select(origin + np.array([0, 0.05, 0]), np.array([1.0, 0, 0]))
    assert float(sim.state.drag_mask.sum()) > 0
    # run frames with drag active; stable
    for _ in range(5):
        st = sim.frame()
    assert np.isfinite(np.asarray(st.x)).all()
    pk.clear()
    assert float(sim.state.drag_mask.sum()) == 0


def test_render_png_and_plot(tmp_path, setup):
    m, scene, sim, tris = setup
    from fem_simulation_tpu.utils.viz import render_surface, plot_convergence
    x = scene.to_mesh_order(sim.state.x)
    p = tmp_path / "mesh.png"
    render_surface(x, tris, str(p), title="beam")
    assert p.exists() and p.stat().st_size > 1000
    p2 = tmp_path / "conv.png"
    plot_convergence({"a": np.geomspace(1, 1e-5, 20)}, str(p2))
    assert p2.exists()
