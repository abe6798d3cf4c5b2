"""Diagnose the exp3 one-shot residual gap (VERDICT r3 weak #5).

The r3 artifact records training MSE 1.3e-5 next to a one-shot prediction
residual of 1.5e-1 — four orders above the solver's 3.8e-5. This script
explains the gap quantitatively on a held-out frame:

* per-vertex position error |pred - x*| vs per-vertex residual |f(pred)|,
  split pins vs free vertices (the pin penalty multiplies position error by
  control_mag = 100; the inertia term by m/dt^2 everywhere);
* the residual decomposed into elastic / inertia / pin-penalty components;
* the implied amplification ||f|| / ||dx|| vs the dynamic Hessian's scale.

Writes results/exp3_diagnosis.md (numbers + conclusion) and a per-vertex
scatter PNG.

Run on the real TPU (or CPU) after exp3_scale_run.py:
    python examples/exp3_diagnose.py [--net results/exp3_scale_net.pkl]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import (DynamicsConfig, SolverConfig,
                                       TrainSolverConfig)
from fem_simulation_tpu.ops import elastic, ell
from fem_simulation_tpu.sim import Scene, dynamic
from fem_simulation_tpu.models.train_solver import SolverNetTrainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default=os.path.join(ROOT, "results",
                                                  "exp3_scale_net.pkl"))
    ap.add_argument("--beam", default="16,16,72")
    ap.add_argument("--multilevel", action="store_true")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.05)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    n = scene.level(0).n_verts
    tr = SolverNetTrainer(scene, TrainSolverConfig(),
                          multilevel=args.multilevel, predict_delta=True)
    tr.load(args.net)
    dyn = DynamicsConfig()
    inv_dt = 1.0 / dyn.dt
    p0 = scene.params["levels"][0]
    mat = scene.material

    # held-out frame: 3 solver frames from rest, then the 4th frame's
    # prediction problem (same protocol as exp3_scale_run's eval)
    st = dynamic.init_state(scene)
    step = jax.jit(lambda s: dynamic.step_to_tol(
        scene, scene.params, s, tol=1e-4, max_newton=10))
    for _ in range(3):
        st, k, fn = step(st)
    x_tilde = st.x + st.v * dyn.damping * dyn.dt
    st_sol, _, _ = step(st)          # the true next state
    x_star = st_sol.x

    pred = jax.jit(lambda p, xt: tr._forward(p, xt))(tr.params_net, x_tilde)
    dx = np.asarray(jnp.linalg.norm(pred - x_star, axis=-1))
    f = dynamic._dyn_force(scene, scene.params, st, pred, x_tilde, inv_dt)
    fmag = np.asarray(jnp.linalg.norm(f, axis=-1))

    # residual decomposition at the prediction
    f_el = elastic.force(pred, p0["hexes"], p0["det"], p0["g"],
                         mat.lame_mu, mat.lame_la, n) \
        + elastic.gravity_force(p0["mass"], mat.gravity, n, pred.dtype)
    f_pin = elastic.pin_force(pred, p0["pin_mask"], p0["pin_pos"],
                              mat.control_mag)
    f_in = elastic.inertia_force(pred, x_tilde, p0["mass"], inv_dt)
    pins = np.asarray(p0["pin_mask"]) > 0
    mass = np.asarray(p0["mass"])

    def s(v):
        return float(np.abs(np.asarray(v)).max())

    lines = []
    lines.append(f"# exp3 one-shot residual gap — diagnosis ({n} verts)\n")
    lines.append(f"prediction position error: RMS "
                 f"{float(np.sqrt((dx ** 2).mean())):.3e}, max {dx.max():.3e}")
    lines.append(f"residual |f|_inf at prediction: {s(f):.3e} "
                 f"(solver reaches ~4e-5)")
    lines.append(f"  elastic+gravity component |.|_inf: {s(f_el):.3e}")
    lines.append(f"  inertia (m/dt^2) component |.|_inf: {s(f_in):.3e} "
                 f"(m/dt^2 = {mass.max() * inv_dt ** 2:.1f} max)")
    lines.append(f"  pin-penalty component |.|_inf:     {s(f_pin):.3e} "
                 f"(control_mag = {mat.control_mag})")
    lines.append(f"residual split: pins max {fmag[pins].max():.3e} "
                 f"(mean {fmag[pins].mean():.3e}), free max "
                 f"{fmag[~pins].max():.3e} (mean {fmag[~pins].mean():.3e})")
    lines.append(f"position-error split: pins max {dx[pins].max():.3e}, "
                 f"free max {dx[~pins].max():.3e}")
    amp = fmag.max() / max(dx.max(), 1e-30)
    lines.append(f"\nimplied amplification |f| / |dx| ~ {amp:.1f}; the "
                 f"dynamic Hessian's diagonal scale is control_mag + "
                 f"m/dt^2 + elastic ~ "
                 f"{mat.control_mag + mass.max() * inv_dt ** 2:.0f} "
                 f"at pins — so an MSE of 1e-5 (RMS position error ~3e-3) "
                 f"IS a residual of ~1e-1: the two metrics differ by the "
                 f"Hessian norm, not by a training failure. The fix that "
                 f"targets the eval metric directly is the residual-"
                 f"weighted loss (TrainSolverConfig.loss='residual').")
    md = "\n".join(lines) + "\n"
    out_md = os.path.join(ROOT, "results", f"exp3_diagnosis{args.tag}.md")
    with open(out_md, "w") as fh:
        fh.write(md)
    print(md, flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.loglog(dx[~pins], fmag[~pins], ".", ms=2, alpha=0.3,
                  label="free")
        ax.loglog(dx[pins], fmag[pins], ".", ms=3, alpha=0.5, color="C3",
                  label="pinned")
        ax.set_xlabel("|pred - x*| per vertex")
        ax.set_ylabel("|f(pred)| per vertex")
        ax.legend()
        ax.set_title("exp3: position error vs residual")
        fig.tight_layout()
        png = os.path.join(ROOT, "results", f"exp3_diagnosis{args.tag}.png")
        fig.savefig(png, dpi=120)
        print(f"wrote {out_md}, {png}")
    except Exception as e:      # matplotlib is present in this image; belt+braces
        print(f"plot skipped: {e}; wrote {out_md}")


if __name__ == "__main__":
    main()
