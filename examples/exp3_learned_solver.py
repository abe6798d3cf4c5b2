"""exp3: train a GNN to replace the implicit solve, then roll it out.

Equivalent of /root/reference/exp3/simulation/main.py (train + test_render).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, TrainSolverConfig
from fem_simulation_tpu.sim import Scene, dynamic
from fem_simulation_tpu.models.train_solver import SolverNetTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--train-iters", type=int, default=2000)
    ap.add_argument("--multilevel", action="store_true")
    ap.add_argument("--absolute", action="store_true",
                    help="regress absolute x (reference parity) instead of dx")
    ap.add_argument("--rollout-frames", type=int, default=30)
    ap.add_argument("--model-out", default="/tmp/exp3_model.pkl")
    args = ap.parse_args()

    m = meshlib.beam(4, 4, 8, dx=0.1)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    cfg = TrainSolverConfig(frames=args.frames)
    tr = SolverNetTrainer(scene, cfg, multilevel=args.multilevel,
                          predict_delta=not args.absolute)
    losses = tr.train(iterations=args.train_iters)
    print(f"MSE: {losses[:10].mean():.3e} -> {losses[-10:].mean():.3e}")
    tr.save(args.model_out)

    # learned rollout: net replaces the solver per frame (test_render)
    st = dynamic.init_state(scene)
    res = []
    for _ in range(args.rollout_frames):
        st = tr.learned_step(st)
        res.append(tr.evaluate_residual(st.x, st))
    print("learned-stepper residual inf-norms:",
          np.asarray(res)[:5], "...", np.asarray(res)[-3:])


if __name__ == "__main__":
    main()
