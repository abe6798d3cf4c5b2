"""exp1 quasi-static: Newton-Multigrid / FAS benchmark on a hex mesh.

Equivalent of /root/reference/exp1/quasi_simulation/main.py — construct the
scene, run a solver, plot convergence. Use --mesh path/to.obj to voxelize an
OBJ like the reference (dragon.obj); default is the bundled procedural beam.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene, QuasiStaticSim
from fem_simulation_tpu.utils import viz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--solver", default="newton_mg",
                    choices=["newton", "newton_mg", "fas0", "fas1", "fas2",
                             "fas3", "adam", "gd", "lattice"])
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--out", default="/tmp/exp1")
    args = ap.parse_args()

    m = meshlib.load_hex_mesh(args.mesh, args.dx)
    print(f"{m.n_verts} verts, {m.n_hexes} hexes")
    scene = Scene(m, solver=SolverConfig())
    sim = QuasiStaticSim(scene)

    if args.solver == "lattice":
        # structured fast path (Pallas kernels on TPU)
        import jax
        import numpy as np
        from fem_simulation_tpu.sim.lattice import (LatticeScene,
                                                    quasistatic_to_tol)
        from fem_simulation_tpu.ops import stencil
        ls = LatticeScene(m)
        x, k, f = jax.jit(lambda xx: quasistatic_to_tol(
            ls, xx, tol=1e-4, max_newton=args.iterations))(ls.x0)
        print(f"lattice Newton: {int(k)} iterations, ||f||_inf = {float(f):.3e}")
        sim.x = scene.from_mesh_order(scene.to_mesh_order(
            stencil.field_from_lattice(x, ls.lat)))
        e = fn = np.asarray([float(f)])
    elif args.solver == "newton":
        e, fn = sim.newton(args.iterations)
    elif args.solver == "newton_mg":
        e, fn = sim.newton_multigrid(args.iterations)
    elif args.solver.startswith("fas"):
        e, fn = sim.fas(args.iterations, variant=int(args.solver[3]))
    elif args.solver == "adam":
        fn = sim.adam(args.iterations)
        e = fn
    else:
        fn = sim.gradient_descent(args.iterations)
        e = fn

    fn = np.asarray(fn)
    print(f"||f||_inf: {fn[0]:.4e} -> {fn[-1]:.4e}")
    viz.show(scene, sim, e, fn, args.out)
    for li in range(scene.n_levels):
        viz.render_level(scene, li, f"{args.out}_level{li}.png")
    print(f"wrote {args.out}_*.png")


if __name__ == "__main__":
    main()
