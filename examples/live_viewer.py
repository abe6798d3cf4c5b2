"""Interactive live viewer: the reference's GLFW demo loop, in a browser.

Equivalent of /root/reference/exp1/simulation/main.py (Window + mouse
select/drag + Space pause) for a TPU host with no GL: the dynamic FEM sim
steps continuously on the device while a localhost page renders the surface
and feeds mouse drags back into the solver's drag constraints.

    python examples/live_viewer.py                 # procedural beam
    python examples/live_viewer.py --mesh kitten.obj --dx 0.04

then open the printed URL. LMB on the mesh drags it; LMB elsewhere orbits;
wheel zooms; Space pauses.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.render.live import LiveViewer
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.dynamic import DynamicSim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--beam", default="8,8,24")
    ap.add_argument("--port", type=int, default=8799)
    args = ap.parse_args()

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.load_hex_mesh(args.mesh, args.dx, beam_shape=shape,
                              normalize=args.mesh is not None)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    sim = DynamicSim(scene)
    viewer = LiveViewer(sim, meshlib.surface_triangles(m.hexes),
                        port=args.port)
    url = viewer.start()
    print(f"live viewer on {url}  ({m.n_verts} verts) — Ctrl-C to stop",
          flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        viewer.stop()


if __name__ == "__main__":
    main()
