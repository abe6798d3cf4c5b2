"""exp1 quasi-static 2-level render loop: one cheap multigrid cycle per frame.

Equivalent of the reference's quasi-static interactive demo
(/root/reference/exp1/quasi_simulation/object.py:1167-1214 `render`): every
frame runs ONE two-level cycle — colored-GS(1) on the fine grid, restrict the
solution (Ut_noOrder) and the fresh full residual (Ut_hat), re-discretized
coarse Hessian with the interpolated pin treatment (compute_fix_hessian),
Jacobi/CG on the coarse grid, prolongate the correction (Us_hat) — so the
mesh visibly relaxes toward equilibrium across frames instead of being
solved to tolerance up front. That per-frame cycle is exactly `fas_step`
variant 3 (sim/quasistatic.py), jitted once and dispatched per frame.

Headless: writes a GIF of the relaxation plus the ||f||_inf series.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.ops import ell
from fem_simulation_tpu.render import HeadlessWindow
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.sim.quasistatic import fas_step, total_force


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--beam", default="8,8,24")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--gif", default="/tmp/render_loop.gif")
    args = ap.parse_args()

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.load_hex_mesh(args.mesh, args.dx, beam_shape=shape)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    tris = meshlib.surface_triangles(m.hexes)

    x = scene.x0

    @jax.jit
    def frame_cycle(p, x):
        x, f = fas_step(scene, p, x, variant=3)
        return x, ell.inf_norm(f)

    win = HeadlessWindow(480, 480)
    win.camera.position = m.x.mean(axis=0) + np.array([0.0, 0.3, 2.2])
    win.camera.target = m.x.mean(axis=0)
    state = {"x": x, "fn": []}
    win.set_frame_source(lambda: (scene.to_mesh_order(state["x"]), tris))

    def render(pause):
        if not pause:
            state["x"], fn = frame_cycle(scene.params, state["x"])
            state["fn"].append(float(fn))

    win.loop(render, max_frames=args.frames, capture_every=3)
    win.save_gif(args.gif)

    fn_final = float(ell.inf_norm(total_force(scene, scene.params, state["x"])))
    print(f"wrote {args.gif} ({len(win.frames)} frames); "
          f"||f||inf {state['fn'][0]:.3e} -> {fn_final:.3e} "
          f"after {args.frames} per-frame cycles")


if __name__ == "__main__":
    main()
