"""exp2: train the multigrid interpolation matrix, then compare vs classic.

Equivalent of /root/reference/exp2/{P,p_hat}/quasi_simulation/main.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, TrainInterpConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.models.train_interp import InterpTrainer
from fem_simulation_tpu.utils.viz import plot_convergence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="P", choices=["P", "p_hat"])
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--unroll", type=int, default=1,
                    help="cycles unrolled in the loss (1 = the reference's "
                         "single taped cycle; >1 trains the iterated map — "
                         "see examples/exp2_scale_run.py)")
    ap.add_argument("--out", default="/tmp/exp2")
    args = ap.parse_args()

    m = meshlib.beam(6, 6, 12, dx=0.05)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    tr = InterpTrainer(scene, TrainInterpConfig(mode=args.mode,
                                                unroll=args.unroll))
    hist = tr.train(args.iterations)
    print(f"loss: {hist[0]:.4e} -> {hist[-1]:.4e}")
    tr.save(f"{args.out}_weights.npz")

    out = tr.compare(iterations=5)
    plot_convergence(out, f"{args.out}_compare.png",
                     title=f"classic vs trained interpolation ({args.mode})")
    print(f"wrote {args.out}_weights.npz, {args.out}_compare.png")


if __name__ == "__main__":
    main()
