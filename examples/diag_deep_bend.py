"""Deep-bend cantilever diagnostics: adaptive-continuation stage trace.

The 37k-vert cantilever (``--beam 16,16,128 --pins zmin``) is the repo's
hardest quasi-static problem — the StVK Hessian goes indefinite along the
Newton path (an experiment the reference never attempts; its quasi-static
demos hang soft objects from top pins, exp1/quasi_simulation/main.py). This
probe runs one solve with ``load_steps='auto'`` and prints the per-stage
(gravity_scale, newton_iters, ||f||_inf) trace so continuation behavior
(warm-start retries, halving, redoubling) is visible.

Also the pinned repro for the former TPU worker fault: long diverging
continuation runs used to crash the axon worker; with the warm-start fix
both solvers complete clean (r3 batch logs: lattice 126 Newton, latmg 719).
If a crash reappears, bisect with --no-pallas (isolates the Pallas kernels)
and fixed --load-steps K (isolates the adaptive loop length).
"""
import argparse
import time

import jax

from fem_simulation_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.sim.lattice import LatticeScene, quasistatic_to_tol
from fem_simulation_tpu.sim.lattice_mg import LatticeMG, quasistatic_to_tol_mg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="lattice",
                    choices=["lattice", "latmg"])
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--load-steps", default="auto",
                    type=lambda s: s if s == "auto" else int(s))
    ap.add_argument("--beam", default="16,16,128")
    args = ap.parse_args()

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.05)
    pins = np.nonzero(m.ijk[:, 2] == m.ijk[:, 2].min())[0]
    ls = LatticeScene(m, pins=pins)
    use_pallas = False if args.no_pallas else None
    if args.solver == "latmg":
        mg = LatticeMG(ls, n_levels=2, dt=None, coarse_cg=8,
                       use_pallas=use_pallas)
        solve = lambda xx, **kw: quasistatic_to_tol_mg(
            ls, mg, xx, tol=1e-4, max_newton=100, **kw)
    else:
        solve = lambda xx, **kw: quasistatic_to_tol(
            ls, xx, tol=1e-4, max_newton=100, use_pallas=use_pallas, **kw)
    print("verts", m.n_verts, "backend", jax.default_backend(), flush=True)

    t0 = time.time()
    if args.load_steps == "auto":
        x, k, fn, tr = jax.jit(lambda xx: solve(
            xx, load_steps="auto", return_trace=True))(ls.x0)
        tr = np.asarray(tr)
    else:
        x, k, fn = jax.jit(lambda xx: solve(
            xx, load_steps=args.load_steps))(ls.x0)
        tr = None
    print("wall %.1fs  k %d  fn %g" % (time.time() - t0, int(k), float(fn)),
          flush=True)
    if tr is not None:
        for row in tr[~np.isnan(tr[:, 0])]:
            print("gs %.5f  k %3d  fn %.3e" % (row[0], row[1], row[2]),
                  flush=True)


if __name__ == "__main__":
    main()
