import numpy as np
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim, DynState
from fem_simulation_tpu.render import Camera, HeadlessWindow
from fem_simulation_tpu.utils import io as ioutil


@pytest.fixture(scope="module")
def scene():
    return Scene(meshlib.beam(3, 3, 6, dx=0.1), solver=SolverConfig(n_levels=2))


def test_checkpoint_resume_dynamic(scene, tmp_path):
    sim = DynamicSim(scene)
    for _ in range(5):
        sim.frame()
    p = str(tmp_path / "ckpt.npz")
    ioutil.checkpoint_sim(p, sim)
    sim2 = DynamicSim(scene)
    ioutil.resume_sim(p, sim2)
    np.testing.assert_allclose(np.asarray(sim2.state.x), np.asarray(sim.state.x))
    np.testing.assert_allclose(np.asarray(sim2.state.v), np.asarray(sim.state.v))
    # resumed sim continues deterministically
    a = sim.frame()
    b = sim2.frame()
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)


def test_save_load_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": [jnp.ones(4), {"c": jnp.zeros((2, 2))}]}
    p = str(tmp_path / "tree.npz")
    ioutil.save_pytree(p, tree)
    like = {"a": jnp.zeros((2, 3)),
            "b": [jnp.zeros(4), {"c": jnp.ones((2, 2))}]}
    out = ioutil.load_pytree(p, like)
    np.testing.assert_allclose(np.asarray(out["a"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(out["b"][1]["c"]), np.zeros((2, 2)))
    bad = {"a": jnp.zeros((3, 2)), "b": [jnp.zeros(4), {"c": jnp.ones((2, 2))}]}
    with pytest.raises(ValueError):
        ioutil.load_pytree(p, bad)


def test_metrics_logger(tmp_path):
    csvp = str(tmp_path / "m.csv")
    jl = str(tmp_path / "m.jsonl")
    log = ioutil.MetricsLogger(csv_path=csvp, jsonl_path=jl)
    for i in range(3):
        log.log(i, energy=1.0 / (i + 1), f_inf=10.0 ** -i)
    log.close()
    assert len(log.get("energy")) == 3
    assert open(csvp).read().count("\n") == 4   # header + 3 rows
    assert open(jl).read().count("\n") == 3


def test_camera_unproject_center():
    cam = Camera(position=(0, 0, 3), target=(0, 0, 0))
    o, d = cam.unproject(400, 300, 800, 600)
    np.testing.assert_allclose(o, [0, 0, 3], atol=1e-9)
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    cam.rotate(0.3, 0.1)
    cam.pan(0.1, 0.1)
    cam.zoom(0.2)
    assert np.isfinite(cam.view()).all()
    assert np.isfinite(cam.proj()).all()


def test_headless_window_loop_and_gif(scene, tmp_path):
    sim = DynamicSim(scene)
    tris = meshlib.surface_triangles(scene.mesh.hexes)
    win = HeadlessWindow(320, 240)
    win.set_frame_source(lambda: (scene.to_mesh_order(sim.state.x), tris))
    calls = []

    def render(pause):
        calls.append(pause)
        if not pause:
            sim.frame()

    win.inject_pause_toggle()   # start paused
    win.loop(render, max_frames=2, capture_every=1)
    win.inject_pause_toggle()
    win.loop(render, max_frames=6, capture_every=2)
    assert calls[:2] == [True, True]
    assert len(win.frames) >= 3
    gif = tmp_path / "out.gif"
    win.save_gif(str(gif), fps=5)
    assert gif.exists() and gif.stat().st_size > 500


def test_profiling_time_fn(scene):
    from fem_simulation_tpu.utils.profiling import time_fn
    import jax.numpy as jnp
    f = lambda x: x * 2.0
    t = time_fn(f, (jnp.ones(10),), iters=3, warmup=1)
    assert t >= 0
