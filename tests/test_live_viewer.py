"""Live viewer (render/live.py): the full browser API driven headlessly.

The page is a dumb terminal — every endpoint the JS calls is exercised here
with urllib: /mesh, /state (base64 vertex stream), /pick select/move/clear
(server-side Camera.unproject + Picker, the reference's mouse-drag path,
window.py:100-120), /pause. No browser required.
"""
import base64
import json
import time
import urllib.request

import numpy as np
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.render.live import LiveViewer
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def viewer():
    m = meshlib.beam(3, 3, 6, dx=0.1)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    sim = DynamicSim(scene)
    v = LiveViewer(sim, meshlib.surface_triangles(m.hexes),
                   grab_radius2=0.02)
    url = v.start()
    yield v, url, m
    v.stop()


def test_page_and_mesh(viewer):
    v, url, m = viewer
    with urllib.request.urlopen(url, timeout=30) as r:
        page = r.read().decode()
    assert "canvas" in page and "/pick" in page
    mi = _get(url + "mesh")
    assert mi["n_verts"] == m.n_verts
    tris = np.asarray(mi["tris"]).reshape(-1, 3)
    assert tris.min() >= 0 and tris.max() < m.n_verts
    assert mi["radius"] > 0


def test_state_streams_and_sim_advances(viewer):
    v, url, m = viewer
    s0 = _get(url + "state")
    x = np.frombuffer(base64.b64decode(s0["x_b64"]), np.float32)
    assert x.shape[0] == 3 * m.n_verts
    assert np.isfinite(x).all()
    deadline = time.time() + 120          # first frame waits out the compile
    while time.time() < deadline:
        s1 = _get(url + "state")
        if s1["frame"] > s0["frame"]:
            break
        time.sleep(0.5)
    assert s1["frame"] > s0["frame"], "sim thread did not advance"


def test_pick_drag_clear(viewer):
    v, url, m = viewer
    mi = _get(url + "mesh")
    c = mi["center"]
    cam = {"position": [c[0], c[1], c[2] + 4 * mi["radius"]],
           "target": c, "up": [0, 1, 0], "fov_deg": 45.0}
    # click dead center: the ray goes through the mesh center -> must hit
    r = _post(url + "pick", {"mode": "select", "sx": 400, "sy": 300,
                             "w": 800, "h": 600, "cam": cam})
    assert r["hit"] and r["vertex"] >= 0
    r2 = _post(url + "pick", {"mode": "move", "sx": 430, "sy": 300,
                              "w": 800, "h": 600, "cam": cam})
    assert r2["hit"]
    assert float(np.asarray(v.sim.state.drag_mask).sum()) > 0
    _post(url + "pick", {"mode": "clear"})
    assert float(np.asarray(v.sim.state.drag_mask).sum()) == 0


def test_pause_toggle(viewer):
    v, url, m = viewer
    p0 = _get(url + "state")["paused"]
    assert _post(url + "pause", {})["paused"] == (not p0)
    assert _post(url + "pause", {})["paused"] == p0
