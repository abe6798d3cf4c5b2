"""exp3 at reference scale: 20,000 training iterations over 30-frame
rollouts on a >= 19k-vertex mesh (the reference's own hyperparameters,
/root/reference/exp3/simulation/hyperparameters.py:4 train_times=20000,
frames=30; training loop object.py:1464-1481).

Device-resident: data-gen is a lax.scan rollout and the 20k-step Adam loop
runs as chunked lax.scan dispatches (models/train_solver.py) — a handful of
device programs instead of 20k tunnel round-trips, with every dispatch kept
under the TPU worker's long-dispatch kill.
Artifacts land in results/: net weights, loss curve, and the reference's
own quality metric — the residual inf-norm of the net prediction used AS
the implicit-step solution (object.py:1486-1495), vs the per-frame solver
residual (test_render, object.py:1656-1679).

Run on the real TPU: python examples/exp3_scale_run.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, TrainSolverConfig
from fem_simulation_tpu.sim import Scene, dynamic
from fem_simulation_tpu.models.train_solver import SolverNetTrainer
from fem_simulation_tpu.utils.io import MetricsLogger
from fem_simulation_tpu.utils.viz import plot_convergence


def main():
    import jax
    from fem_simulation_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=20000)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--beam", default="16,16,72",
                    help="17x17x73 = 21k verts, reference demo scale")
    ap.add_argument("--multilevel", action="store_true")
    ap.add_argument("--loss", default="mse", choices=["mse", "residual"],
                    help="mse = reference parity (||pred - x*||^2); "
                         "residual = train on the implicit-step force "
                         "residual of the prediction (the eval metric) — "
                         "the r3 gap diagnosis ablation")
    ap.add_argument("--dispatch-chunk", type=int, default=None,
                    help="training iterations per device dispatch (keep "
                         "each dispatch under the TPU worker's ~5 min "
                         "kill, CLAUDE.md). Default 2000 for the mse loss; "
                         "200 for loss=residual, whose per-iteration cost "
                         "is ~10x (a full unstructured force eval + grad "
                         "per sample — the 2000-iter chunk crashed the "
                         "worker at 21k verts)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.dispatch_chunk is None:
        args.dispatch_chunk = 200 if args.loss == "residual" else 2000
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "exp3_scale"
        + ("_ml" if args.multilevel else "")
        + ("_resloss" if args.loss == "residual" else ""))

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.05)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    n = scene.level(0).n_verts
    print(f"mesh: beam{shape} = {n} verts", flush=True)

    cfg = TrainSolverConfig(frames=args.frames, train_times=args.iterations,
                            loss=args.loss)
    tr = SolverNetTrainer(scene, cfg, multilevel=args.multilevel,
                          predict_delta=True)
    t0 = time.time()
    losses = tr.train(args.iterations, dispatch_chunk=args.dispatch_chunk)
    t1 = time.time()
    print(f"train: {args.iterations} iters / {args.frames} frames in "
          f"{t1 - t0:.1f}s (mse {losses[0]:.3e} -> {losses[-1]:.3e})",
          flush=True)
    tr.save(f"{out}_net.pkl")
    plot_convergence({"mse": losses[:: max(len(losses) // 2000, 1)]},
                     f"{out}_loss.png", xlabel="iteration (subsampled)",
                     title=f"exp3 training, {n} verts")

    # net-vs-solver residual on a fresh rollout frame (reference eval +
    # test_render): step the dynamic sim a few frames with the real solver,
    # then compare the net's one-shot prediction for the next frame.
    st = dynamic.init_state(scene)
    step = jax.jit(lambda s: dynamic.step_to_tol(
        scene, scene.params, s, tol=1e-4, max_newton=10))
    for _ in range(3):
        st, k, fn = step(st)
    solver_resid = float(np.asarray(fn))
    from fem_simulation_tpu.config import DynamicsConfig
    dyn = DynamicsConfig()
    x_tilde = st.x + st.v * dyn.damping * dyn.dt
    net_resid = tr.evaluate_residual(x_tilde, st)
    print(f"residual inf-norm: solver {solver_resid:.3e} "
          f"vs net one-shot {net_resid:.3e}", flush=True)

    log = MetricsLogger(csv_path=f"{out}_metrics.csv")
    log.log(0, n_verts=n, iterations=args.iterations, frames=args.frames,
            seconds=t1 - t0, mse_first=float(losses[0]),
            mse_last=float(losses[-1]), solver_resid=solver_resid,
            net_resid=net_resid)
    log.close()
    print(f"wrote {out}_net.pkl, {out}_loss.png, {out}_metrics.csv")


if __name__ == "__main__":
    main()
