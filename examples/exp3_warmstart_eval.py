"""exp3 learned solver as a WARM START — the measured payoff (VERDICT r3
missing #3).

The recorded exp3 quality was the one-shot residual of the net prediction
(1.5e-1 vs the solver's 3.8e-5 — an initializer, not a solver). This script
measures the initializer's actual value: Newton iterations (and ms/frame) of
`step_to_tol` seeded at the net prediction vs the plain inertia predictor,
over a held-out rollout at the trained scale. The trajectory advances with
the plain solution so both solvers face identical problems each frame
(reference test_render protocol, exp3/simulation/object.py:1656-1679, which
only ever REPLACES the solver with the net).

Run on the real TPU after examples/exp3_scale_run.py:
    python examples/exp3_warmstart_eval.py [--net results/exp3_scale_net.pkl]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, TrainSolverConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.models.train_solver import SolverNetTrainer
from fem_simulation_tpu.utils.io import MetricsLogger

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    from fem_simulation_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default=os.path.join(ROOT, "results",
                                                  "exp3_scale_net.pkl"))
    ap.add_argument("--beam", default="16,16,72",
                    help="must match the training mesh")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--multilevel", action="store_true",
                    help="the net at --net is a MultiLevel3")
    ap.add_argument("--seed", type=int, default=123,
                    help="held-out rollout seed (training data used 0)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    tag = "_ml" if args.multilevel else ""
    out = args.out or os.path.join(ROOT, "results",
                                   f"exp3_warmstart{tag}")

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.05)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    print(f"mesh: beam{shape} = {scene.level(0).n_verts} verts", flush=True)

    tr = SolverNetTrainer(scene, TrainSolverConfig(),
                          multilevel=args.multilevel, predict_delta=True)
    tr.load(args.net)

    stats = tr.warmstart_stats(frames=args.frames, seed=args.seed)
    k_p, k_w = stats["k_plain"], stats["k_warm"]
    print("per-frame Newton (plain):", k_p.tolist(), flush=True)
    print("per-frame Newton (warm): ", k_w.tolist(), flush=True)
    print(f"total Newton: plain {int(k_p.sum())} vs warm {int(k_w.sum())} "
          f"({int(k_p.sum()) - int(k_w.sum())} saved, "
          f"{100 * (1 - k_w.sum() / max(k_p.sum(), 1)):.1f}%)", flush=True)
    print(f"ms/frame: plain {stats['ms_plain']:.2f} vs warm "
          f"{stats['ms_warm']:.2f} (incl. net forward)", flush=True)
    print(f"worst frame residual: plain {stats['fn_plain'].max():.2e} "
          f"warm {stats['fn_warm'].max():.2e}", flush=True)

    log = MetricsLogger(csv_path=f"{out}_metrics.csv")
    log.log(0, n_verts=scene.level(0).n_verts, frames=args.frames,
            seed=args.seed,
            newton_plain=int(k_p.sum()), newton_warm=int(k_w.sum()),
            newton_saved_pct=float(100 * (1 - k_w.sum()
                                          / max(k_p.sum(), 1))),
            ms_plain=float(stats["ms_plain"]),
            ms_warm=float(stats["ms_warm"]),
            fn_worst_plain=float(stats["fn_plain"].max()),
            fn_worst_warm=float(stats["fn_warm"].max()))
    log.close()
    print(f"wrote {out}_metrics.csv")


if __name__ == "__main__":
    main()
