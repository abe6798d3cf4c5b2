"""exp1 dynamic: interactive-style implicit-Euler simulation with drag.

Equivalent of /root/reference/exp1/simulation/main.py (win.loop(obj.render))
— headless: runs frames, scripts a drag interaction, writes a GIF.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim
from fem_simulation_tpu.sim.picking import Picker
from fem_simulation_tpu.render import HeadlessWindow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--gif", default="/tmp/dynamic.gif")
    args = ap.parse_args()

    m = meshlib.load_hex_mesh(args.mesh, args.dx)
    scene = Scene(m, solver=SolverConfig())
    sim = DynamicSim(scene)
    tris = meshlib.surface_triangles(m.hexes)
    picker = Picker(sim, tris, grab_radius2=0.02)

    win = HeadlessWindow(640, 640)
    win.camera.position = m.x.mean(axis=0) + np.array([0.0, 0.3, 2.0])
    win.camera.target = m.x.mean(axis=0)
    win.set_frame_source(lambda: (scene.to_mesh_order(sim.state.x), tris))
    win.setSelect(picker.select, picker.move_select, picker.clear)

    def render(pause):
        if not pause:
            sim.frame()

    # scripted interaction: click + drag mid-run, release near the end
    win.inject_click(320, 320)
    win.inject_drag(320, 280)
    win.loop(render, max_frames=args.frames, capture_every=2)
    win.inject_release()

    win.save_gif(args.gif)
    print(f"wrote {args.gif} ({len(win.frames)} frames)")


if __name__ == "__main__":
    main()
