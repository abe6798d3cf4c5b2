"""Benchmark: ms per dynamic timestep to ||f||_inf <= 1e-4 (BASELINE.md metric).

Runs the implicit-Euler dynamic sim (reference exp1/simulation render loop,
/root/reference/exp1/simulation/object.py:1286-1329) on the bundled beam mesh
from rest. Every frame runs Newton iterations until the full implicit residual
satisfies ||f||_inf <= tol (device-resident while_loop) — *stronger* than the
reference's fixed 5-CG-iteration frame.

Frames are scanned inside ONE jit dispatch (how a production sim runs), and
per-frame time is the slope between two scan lengths — this removes the
per-dispatch host<->TPU tunnel latency (~33 ms here) that would otherwise
dominate and measures actual device throughput. Every frame's residual is
checked on the host afterwards.

North star (BASELINE.md): >=10 timesteps/sec => 100 ms/step budget.
vs_baseline = 100 / measured_ms (>1 beats the north star).

Prints ONE JSON line.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None, help="OBJ path (default: procedural beam)")
    ap.add_argument("--no-normalize", action="store_true",
                    help="keep the OBJ's native units (default: rescale the "
                         "largest extent to 1 — material constants assume "
                         "unit-scale meshes, BASELINE.md)")
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--beam", default="8,8,24")
    ap.add_argument("--shell", default=None,
                    help="X,Y,Z,T hollow-box voxel shape (walls T cells "
                         "thick) — the low-bbox-fill stress shape for the "
                         "box-cover lattice path (ops/boxes.py); overrides "
                         "--beam/--mesh")
    ap.add_argument("--cloth", default=None,
                    help="RX[,RY] mass-spring cloth grid (reference "
                         "exp1/cloth_simulation, 64x64): ms per implicit "
                         "frame solved to tolerance; overrides every mesh "
                         "option")
    ap.add_argument("--frames", type=int, default=600,
                    help="dynamic-bench scan length. The default grew 120 "
                         "-> 600 when the fused single-launch PCG cut the "
                         "2k-default frame under ~0.1 ms: the slope window "
                         "(frames - frames/5) must carry device time well "
                         "above the ~2-4 ms tunnel-dispatch jitter or the "
                         "slope goes negative and the bench falls back to "
                         "the amortized (dispatch-inflated) number")
    ap.add_argument("--steady", action="store_true",
                    help="no excitation: constant gravity from rest (the "
                         "pre-r4 protocol). A top-pinned beam SETTLES — by "
                         "steady state most frames run zero Newton "
                         "iterations and the bench measures convergence "
                         "checking, not solving (r3: newton_mean 0.47). "
                         "Default is a persistently-excited workload")
    ap.add_argument("--excite-period", type=int, default=16,
                    help="frames per gravity-oscillation cycle: gravity is "
                         "scaled by cos(2 pi t / period), so the load swings "
                         "+g -> -g and back and EVERY frame solves a "
                         "genuinely different equilibrium (newton_mean >= 1 "
                         "asserted; 16 keeps zero idle frames on the default "
                         "2k beam — measured newton_mean 1.54; stiffer/"
                         "smaller scenes may need 8)")
    ap.add_argument("--tol", type=float, default=None,
                    help="force-residual tolerance (default 1e-4; cloth "
                         "defaults to 2.5e-4 — measured f32 noise floor of "
                         "the k=1000 mass-spring force: one ulp of position "
                         "moves ||f||_inf by ~1e-4, verified by an f64 run "
                         "converging in 2 Newton where f32 plateaus)")
    ap.add_argument("--max-newton", type=int, default=20,
                    help="per-frame Newton budget for the dynamic step "
                         "(20 suffices through 66k verts; 131k+ needs more)")
    ap.add_argument("--adaptive-substep", action="store_true",
                    help="redo frames whose Newton budget misses tol at "
                         "dt/2^h (frame_adaptive) — violent free-swinging "
                         "configs (e.g. the rocker pendulum) converge every "
                         "frame instead of exiting at ~1e-2; supported on "
                         "every dynamic path (lattice, latmg, matfree/cg/"
                         "mg/fas)")
    ap.add_argument("--amortized", action="store_true",
                    help="headline = total wall / frames of one scanned "
                         "dispatch (includes the ~33 ms tunnel dispatch and "
                         "the expensive early from-rest frames; the pre-r3 "
                         "headline). Default is slope timing: per-frame "
                         "cost between two scan lengths — the device's "
                         "steady-state production throughput with the "
                         "fixed dispatch latency cancelled exactly; both "
                         "numbers are reported either way")
    ap.add_argument("--quasistatic", action="store_true",
                    help="measure one full quasi-static solve from rest to "
                         "||f||inf<=tol instead of dynamic timesteps — the "
                         "regime where the reference's multigrid-vs-single-"
                         "level claim lives (README.md:17-19); supports "
                         "--solver lattice|latmg")
    ap.add_argument("--pins", default="top", choices=["top", "zmin"],
                    help="pinned vertices: 'top' = whole top y-slab "
                         "(reference default, object.py:762-773 — every "
                         "vertex is near a pin, so even plain PCG has a "
                         "short effective diameter); 'zmin' = one end face "
                         "(cantilever: conditioning degrades with beam "
                         "length, the multigrid stress test)")
    ap.add_argument("--mg-levels", type=int, default=3)
    ap.add_argument("--mg-coarse-cg", type=int, default=0,
                    help="coarsest-level inner CG iterations for latmg "
                         "(0 = Chebyshev sweeps, the measured-faster "
                         "default on top-pinned problems)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the XLA stencil path even on TPU (A/B knob "
                         "for isolating Pallas-kernel effects)")
    ap.add_argument("--mg-no-spd", action="store_true",
                    help="skip SPD projection of the latmg smoother blocks "
                         "(A/B knob; projection is needed for indefinite "
                         "large-deformation Hessians)")
    ap.add_argument("--fmg", action="store_true",
                    help="full-multigrid (nested iteration) start for "
                         "--quasistatic: solve the coarsest level first, "
                         "prolong displacements as each finer level's "
                         "initial guess (sim.lattice_mg.quasistatic_fmg). "
                         "Composes with --solver: lattice = single-level "
                         "fine corrector (deep bends), latmg = GMG-PCG fine "
                         "corrector; --load-steps applies at the coarsest "
                         "level only")
    ap.add_argument("--cg-forcing", default=None, choices=["ew"],
                    help="Eisenstat-Walker adaptive inner-CG tolerance for "
                         "--quasistatic (loose solves far from the "
                         "solution, tight near convergence; replaces the "
                         "fixed cg_tol — cuts oversolved CG iterations on "
                         "hard irregular meshes)")
    ap.add_argument("--load-steps", default=1,
                    type=lambda s: s if s == "auto" else int(s),
                    help="gravity-continuation increments for --quasistatic "
                         "(incremental loading; needed on deep-sag "
                         "cantilevers where single-shot Newton wanders the "
                         "indefinite StVK region); 'auto' = adaptive "
                         "step-doubling/halving continuation")
    ap.add_argument("--box-threshold", type=float, default=0.5,
                    help="engage the box-cover lattice path when its padded "
                         "compute volume is below this fraction of the dense "
                         "grid's (ops/boxes.py; 0 disables). A/B knob: the "
                         "voxelized kitten covers at 0.57 — just above the "
                         "default — so --box-threshold 0.6 trades tighter "
                         "boxes against per-box kernel overhead there")
    ap.add_argument("--solver", default="lattice",
                    choices=["lattice", "latmg", "matfree", "cg", "mg", "fas"],
                    help="stepping path: structured-lattice matrix-free CG "
                         "(default; falls back to matfree when the mesh "
                         "fills <60%% of its bounding box), unstructured "
                         "matrix-free CG, assembled CG, V-cycle, or "
                         "nonlinear FAS cycles")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fem_simulation_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    if args.cloth is not None:
        if args.quasistatic or args.solver != "lattice" or args.pins != "top":
            raise SystemExit("--cloth is a dynamic mass-spring benchmark; "
                             "it supports none of --quasistatic/--solver/"
                             "--pins")
        if args.tol is None:
            args.tol = 2.5e-4   # f32 noise floor of the k=1000 spring force
        return bench_cloth(args)
    if args.tol is None:
        args.tol = 1e-4

    from fem_simulation_tpu import mesh as meshlib
    from fem_simulation_tpu.config import SolverConfig
    from fem_simulation_tpu.sim import Scene, dynamic

    if args.shell is not None:
        sx, sy, sz, t = (int(s) for s in args.shell.split(","))
        m = meshlib.shell(sx, sy, sz, thickness=t, dx=args.dx)
    else:
        shape = tuple(int(s) for s in args.beam.split(","))
        m = meshlib.load_hex_mesh(args.mesh, args.dx, beam_shape=shape,
                                  normalize=(args.mesh is not None
                                             and not args.no_normalize))
    pins = _make_pins(args, m)

    if args.quasistatic:
        return bench_quasistatic(args, m, pins)

    solver = args.solver
    if solver in ("lattice", "latmg"):
        from fem_simulation_tpu.sim.lattice import LatticeScene
        from fem_simulation_tpu.sim import lattice as latmod
        lscene = LatticeScene(m, pins=pins,
                              box_threshold=args.box_threshold)
        if lscene.fill < 0.05 and lscene.boxes is None:
            # The fused Pallas lattice kernels beat the unstructured path by
            # ~2 orders of magnitude per site (428 vs ~3 ms/step on the
            # voxelized kitten), and the box cover (ops/boxes.py) keeps the
            # lattice path cheap on low-fill shapes; only shapes where even
            # the cover cannot cut the padded volume fall back.
            solver = "matfree"

    # persistently-excited workload (default): gravity scaled per frame by
    # cos(2 pi t / period) — the load swings +g -> -g and every frame solves
    # a different equilibrium, so the bench measures SOLVING (newton_mean is
    # asserted >= 1 at the end), not residual-checking on a settled beam
    def gs_schedule(n):
        if args.steady:
            return jnp.ones((n,), np.float32)
        t = jnp.arange(n, dtype=np.float32)
        return jnp.cos(2.0 * np.pi * t / args.excite_period)

    roofline = None
    if solver in ("lattice", "latmg"):
        st0 = lscene.init_state()
        if solver == "latmg":
            from fem_simulation_tpu.sim.lattice_mg import (
                LatticeMG, step_to_tol_mg, frame_adaptive_mg)
            lmg_kw = dict(n_levels=args.mg_levels,
                          coarse_cg=args.mg_coarse_cg,
                          spd_smoother=not args.mg_no_spd,
                          use_pallas=False if args.no_pallas else None)
            if args.adaptive_substep:
                # dt=None hierarchy: the traced-substep inertia term is
                # added per level inside linearize (frame_adaptive_mg)
                lmg_kw["dt"] = None
            lmg = LatticeMG(lscene, **lmg_kw)
            if not args.adaptive_substep:
                roofline = _make_roofline_mg(lscene, lmg)
        elif not args.no_pallas and not args.adaptive_substep:
            roofline = _make_roofline(lscene)

        def make_run(n):
            @jax.jit
            def run(p, st):
                del p
                def body(st, gs):
                    cg = jnp.int32(0)
                    if solver == "latmg":
                        if args.adaptive_substep:
                            st2, k, fn, _ = frame_adaptive_mg(
                                lscene, lmg, st, tol=args.tol,
                                max_newton=args.max_newton, gravity_scale=gs)
                        else:
                            st2, k, fn, cg = step_to_tol_mg(
                                lscene, lmg, st, tol=args.tol,
                                max_newton=args.max_newton, gravity_scale=gs,
                                return_cg=True)
                    elif args.adaptive_substep:
                        st2, k, fn, _ = latmod.frame_adaptive(
                            lscene, st, tol=args.tol, max_newton=args.max_newton,
                            use_pallas=False if args.no_pallas else None,
                            gravity_scale=gs)
                    else:
                        st2, k, fn, cg = latmod.step_to_tol(
                            lscene, st, tol=args.tol, max_newton=args.max_newton,
                            use_pallas=False if args.no_pallas else None,
                            gravity_scale=gs, return_cg=True)
                    return st2, (k, fn, cg)
                return jax.lax.scan(body, st, gs_schedule(n))
            return run
        params = None
    else:
        # pins flow through to the unstructured path too (Scene takes
        # mesh-order vertex ids like LatticeScene); previously --pins zmin
        # with matfree/cg/mg/fas silently benchmarked the top-pinned problem
        scene = Scene(m, solver=SolverConfig(n_levels=2), pins=pins)
        st0 = dynamic.init_state(scene)
        params = scene.params

        def make_run(n):
            @jax.jit
            def run(p, st):
                def body(st, gs):
                    kw = dict(tol=args.tol, max_newton=args.max_newton,
                              use_multigrid=(solver == "mg"),
                              matrix_free=(solver == "matfree"),
                              use_fas=(solver == "fas"), gravity_scale=gs)
                    if args.adaptive_substep:
                        st2, k, fn, _ = dynamic.frame_adaptive(
                            scene, p, st, **kw)
                    else:
                        st2, k, fn = dynamic.step_to_tol(scene, p, st, **kw)
                    return st2, (k, fn, jnp.int32(0))
                return jax.lax.scan(body, st, gs_schedule(n))
            return run

    return _time_and_print(args, make_run, params, st0, roofline=roofline)


def _time_and_print(args, make_run, params, st0,
                    metric_name=None, extra=None, roofline=None):
    """Shared dynamic-bench tail: slope timing (default) — per-frame cost
    between two scan lengths, cancelling the fixed ~33 ms tunnel dispatch
    AND the expensive early from-rest frames exactly, at the price of
    compiling a second (short) program. --amortized compiles only the long
    program and reports total/frames (the conservative pre-r3 headline; use
    it for configs whose single compile is already ~15 min through the
    tunnel).

    The 3 timing repeats are index-paired into 3 slope samples and the
    spread (max - min) is reported: the r3 headline drifted 0.026 vs 0.056
    ms between runs of the SAME binary with no way to see it in one JSON
    line. `roofline` (frames, newton_counts, cg_counts) -> (flops, bytes)
    turns measured work counts into achieved FLOP/s and HBM traffic vs the
    device peaks (_roofline_stats)."""
    if metric_name is None:
        # encode the workload (excited = per-frame gravity oscillation, the
        # r4 default — a settled steady-state beam benchmarks convergence
        # CHECKING, newton_mean 0.47 in r3) and the ENFORCED tolerance
        base = ("ms_per_timestep" if args.steady
                else "ms_per_timestep_excited")
        metric_name = (f"{base}_to_f_inf_1e-4" if args.tol == 1e-4
                       else f"{base}_to_f_inf_{args.tol:g}")
    def timed(run):
        out = run(params, st0)
        _ = np.asarray(out[1][1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st, (ks, fns, cgs) = run(params, st0)
            fns = np.asarray(fns)          # axon tunnel: readback is the sync
            ts.append(time.perf_counter() - t0)
        return ts, np.asarray(ks), fns, np.asarray(cgs)

    result = {}
    ts_big, ks, fns, cgs = timed(make_run(args.frames))
    t_big = min(ts_big)
    # per-frame Newton counts diagnose conditioning (e.g. a floppy OBJ needs
    # more Newton/frame than a stiff beam at the same vertex count) — and
    # prove the excited workload actually solves every frame
    result["newton_max"] = int(ks.max())
    result["newton_mean"] = round(float(ks.mean()), 2)
    ms_amort = t_big / args.frames * 1000.0
    result["amortized_ms"] = round(ms_amort, 3)
    ms = ms_amort
    work = (t_big, args.frames, ks, cgs)
    # slope needs a meaningfully shorter second run: with <10 frames the
    # difference is dominated by dispatch noise (or divides by zero at
    # --frames 2), so fall back to the amortized headline there
    if not args.amortized and args.frames >= 10:
        n_small = max(args.frames // 5, 2)
        ts_small, ks_s, _, cgs_s = timed(make_run(n_small))
        dn = args.frames - n_small
        ms = (t_big - min(ts_small)) / dn * 1000.0
        reps = [(tb - tsm) / dn * 1000.0
                for tb, tsm in zip(ts_big, ts_small)]
        result["slope_ms"] = round(ms, 3)
        result["slope_ms_repeats"] = [round(v, 3) for v in reps]
        result["slope_spread_ms"] = round(max(reps) - min(reps), 3)
        if ms <= 0:   # tunnel-latency noise exceeded the device time
            ms = ms_amort
            if roofline is not None:
                # dispatch-inflated denominator — still report the model
                # rates rather than dropping mfu/hbm_frac on the floor
                fl_b, by_b = roofline(args.frames, ks, cgs)
                result.update(_roofline_stats(fl_b, by_b, t_big))
        elif roofline is not None:
            fl_b, by_b = roofline(args.frames, ks, cgs)
            fl_s, by_s = roofline(n_small, ks_s, cgs_s)
            result.update(_roofline_stats(fl_b - fl_s, by_b - by_s,
                                          t_big - min(ts_small)))
    elif roofline is not None:
        fl_b, by_b = roofline(args.frames, ks, cgs)
        result.update(_roofline_stats(fl_b, by_b, t_big))
    assert fns.max() <= args.tol * 1.01, f"tolerance missed: {fns.max():.3e}"
    if not args.steady:
        # the excited workload's contract: every frame is a real solve
        assert ks.mean() >= 1.0, \
            f"excitation too weak: newton_mean {ks.mean():.2f} < 1"
    print(json.dumps({
        "metric": metric_name,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 3),
        **result,
        **(extra or {}),
    }))
    return 0


# Public single-chip peaks by device_kind substring: (HBM bytes/s, f32 VPU
# FLOP/s). The StVK chain kernels are unrolled ELEMENTWISE ops — the MXU
# never runs — so utilization is measured against the VPU peak: 8 sublanes
# x 128 lanes x 4 ALUs x clock (v5e 940 MHz => 3.85e12; v5p 1.75 GHz =>
# 7.17e12), HBM 819 GB/s (v5e) / 2765 (v5p) / 1228 (v4) — the public
# "How to Scale Your Model" TPU table.
_PEAKS = {
    "v5 lite": (819e9, 3.85e12), "v5litepod": (819e9, 3.85e12),
    "v5e": (819e9, 3.85e12),
    "v5p": (2765e9, 7.17e12),
    "v4": (1228e9, 4.30e12),
    "v6": (1640e9, 7.30e12),
}


def _roofline_stats(flops, nbytes, seconds):
    """Model-work rates + fractions of the device peaks. `mfu` is achieved
    useful FLOP/s over the VPU f32 peak (these kernels are VPU-bound by
    design); `hbm_frac` is modeled HBM traffic over peak bandwidth — the
    two together say which roofline the kernel sits under."""
    out = {"model_gflops": round(flops / seconds / 1e9, 1),
           "model_hbm_gbps": round(nbytes / seconds / 1e9, 1)}
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return out
    peak = next((v for k, v in _PEAKS.items() if k in kind), None)
    if peak is not None:
        out["mfu"] = round(flops / seconds / peak[1], 4)
        out["hbm_frac"] = round(nbytes / seconds / peak[0], 4)
    return out


def _make_roofline(lscene):
    """FLOP/byte model for the fused-Pallas lattice dynamic step.

    FLOPs: useful work only — active cells x the per-cell constants counted
    from the kernels' unrolled arithmetic (ops/pallas_lattice.py). Per frame
    the step runs 1 + 2k force evals (fn0, then resid + resid(x_full) per
    Newton iter), k diag evals, and one HVP per measured PCG matvec.

    Bytes: resident-field traffic at the Mosaic-padded sizes ((8, 128)
    tiles on the two minor dims) — each kernel streams its fields once
    (force 6 Vp + cell mask; hvp 9 Vp; diag 9 Vp + the 3x3 assembly's
    15 Vp) plus ~48 Vp per PCG iteration for the vector algebra
    (solve3x3 minv reads the 9-channel diag and r, writes z; the x/r/p
    axpys and three dot products stream ~10 more 3-vectors), assuming
    XLA fuses each axpy chain into one read-modify-write pass. A model,
    not a counter — treat fractions near 1.0 as 'at the roofline'.

    When the FUSED single-launch Newton iteration engages (small dense
    grids, ops.pallas_lattice.fused_newton: residual + diag + PCG +
    trial-step residual norm inside one kernel), the whole Newton step's
    HBM traffic is one launch's I/O — u/s in, dx/f out, plus the
    channel-first transpose relayouts (~35 Vp + cell mask per Newton
    step) — because r/p/dx/diag live in VMEM scratch for all iterations
    and both in-kernel force evals read resident fields; only the
    per-frame fn0 residual eval still streams separately. FLOPs are
    unchanged (the kernel does the same useful work)."""
    from fem_simulation_tpu.ops import pallas_lattice as plat

    fused = lscene.boxes is None and plat.fused_pcg_ok(lscene.shape)
    cells = int(np.asarray(lscene.cell_mask).sum())

    def pad_vol(cell_ext):
        vx, vy, vz = (e + 1 for e in cell_ext)
        return vx * (-(-vy // 8) * 8) * (-(-vz // 128) * 128)

    def pad_cvol(cell_ext):
        cx, cy, cz = cell_ext
        return cx * (-(-cy // 8) * 8) * (-(-cz // 128) * 128)

    if lscene.boxes is None:
        exts = [tuple(s - 1 for s in lscene.shape)]
    else:
        exts = [tuple(b.c1[b.perm[d]] - b.c0[b.perm[d]] for d in range(3))
                for b in lscene.boxes]
    vp = sum(pad_vol(e) for e in exts)
    cp = sum(pad_cvol(e) for e in exts)

    def roofline(frames, ks, cgs):
        n_force = frames + 2 * int(ks.sum())
        n_diag = int(ks.sum())
        n_hvp = int(cgs.sum())
        flops = cells * (n_force * plat.FORCE_FLOPS_PER_CELL
                         + n_hvp * plat.HVP_FLOPS_PER_CELL
                         + n_diag * plat.DIAG_FLOPS_PER_CELL)
        if fused:
            nbytes = 4 * (frames * (6 * vp + cp)
                          + n_diag * (35 * vp + cp))
        else:
            nbytes = 4 * (n_force * (6 * vp + cp)
                          + n_hvp * (9 * vp + cp + 48 * vp)
                          + n_diag * (24 * vp + cp))
        return flops, nbytes
    return roofline


def _make_roofline_mg(lscene, lmg):
    """FLOP/byte model for the GMG-preconditioned paths (VERDICT r4 weak #5:
    the MG configs published no mfu/hbm_frac).

    Same per-kernel constants as _make_roofline, summed over the hierarchy:
    per frame/solve it counts the fine residual evals (1 + 2k force passes),
    per-Newton diag builds on EVERY level, the once-per-frame lmax power
    iteration (6 matvecs/level, now cached across Newton steps), and per
    outer PCG iteration one fine matvec plus 2*nu Chebyshev smoothing
    matvecs per non-coarsest level. DELIBERATE UNDER-COUNT: the coarsest
    level's inner-CG work and the transfer ops are excluded (their
    iteration counts are data-dependent inside the preconditioner and the
    coarse grid is >=64x smaller) — the printed mfu is a lower bound."""
    from fem_simulation_tpu.ops import pallas_lattice as plat
    from fem_simulation_tpu.ops import boxes as boxlib

    def pad_vol(cell_ext):
        vx, vy, vz = (e + 1 for e in cell_ext)
        return vx * (-(-vy // 8) * 8) * (-(-vz // 128) * 128)

    def pad_cvol(cell_ext):
        cx, cy, cz = cell_ext
        return cx * (-(-cy // 8) * 8) * (-(-cz // 128) * 128)

    levels = []
    for li, lvl in enumerate(lmg.levels):
        cells = float(np.asarray(lvl.cell_mask).sum())
        if li == 0 and lscene.boxes is not None:
            exts = [tuple(b.c1[b.perm[d]] - b.c0[b.perm[d]]
                          for d in range(3)) for b in lscene.boxes]
        else:
            ext = tuple(int(s) for s in lvl.cell_mask.shape)
            perm, _ = boxlib.best_perm(ext)
            exts = [tuple(ext[p] for p in perm)]
        levels.append((cells, sum(pad_vol(e) for e in exts),
                       sum(pad_cvol(e) for e in exts)))

    def roofline(frames, ks, cgs):
        n_newton = int(ks.sum())
        # dynamic frames run 1 + 2k fine residual evals; a quasi-static
        # solve runs 1 + 2k per repetition the same way (fn0 + per-Newton
        # resid + newton_update's acceptance resid)
        n_force = frames + 2 * n_newton
        n_cg = int(cgs.sum())
        c0, vp0, cp0 = levels[0]
        flops = n_force * plat.FORCE_FLOPS_PER_CELL * c0
        nbytes = n_force * 4.0 * (6 * vp0 + cp0)
        for li, (c, vp, cp) in enumerate(levels):
            flops += n_newton * plat.DIAG_FLOPS_PER_CELL * c
            nbytes += n_newton * 4.0 * (24 * vp + cp)
            if lmg.chebyshev:
                # lmax power iteration: 6 matvecs/level, once per
                # frame/solve (cached across the Newton loop)
                flops += frames * 6 * plat.HVP_FLOPS_PER_CELL * c
                nbytes += frames * 6 * 4.0 * (9 * vp + cp)
        smooth_f = smooth_b = 0.0
        for li, (c, vp, cp) in enumerate(levels):
            sweeps = 2 * lmg.nu if li < len(levels) - 1 else (
                0 if lmg.coarse_cg > 0 else lmg.coarse_sweeps)
            smooth_f += sweeps * plat.HVP_FLOPS_PER_CELL * c
            # matvec stream + the solve3x3 diag read / residual-vector pass
            smooth_b += sweeps * 4.0 * (9 * vp + cp + 16 * vp)
        flops += n_cg * (plat.HVP_FLOPS_PER_CELL * c0 + smooth_f)
        nbytes += n_cg * (4.0 * (9 * vp0 + cp0 + 48 * vp0) + smooth_b)
        return flops, nbytes
    return roofline


def bench_cloth(args):
    """ms per implicit-Euler cloth frame to ||f||_inf <= tol (mass-spring,
    reference exp1/cloth_simulation: 64x64 grid, k=1000, dt=0.0033 — the
    reference runs a fixed 5-CG-iteration frame; this solves each frame to
    the benchmark tolerance via sim.cloth.step_to_tol)."""
    import jax
    import jax.numpy as jnp
    from fem_simulation_tpu.config import ClothConfig
    from fem_simulation_tpu.sim import cloth as clothmod

    # the swinging corner-pinned cloth never settles within the bench window;
    # gravity excitation is a hex-lattice knob, so this path reports the
    # plain metric name and skips the newton_mean >= 1 contract
    args.steady = True
    r = [int(s) for s in args.cloth.split(",")]
    cfg = ClothConfig(res_x=r[0], res_y=r[-1])
    # pin two corners (the exp1 cloth protocol, examples/exp1_cloth.py):
    # an unpinned cloth rigid-translates in free fall — zero spring forces,
    # a 1-iteration PCG solve every frame — and benchmarks nothing
    scene = clothmod.ClothScene(cfg, pins=[0, cfg.res_x])
    st0 = clothmod.init_state(scene)

    def make_run(n):
        @jax.jit
        def run(p, st):
            def body(st, _):
                st2, k, fn = clothmod.step_to_tol(
                    scene, p, st, tol=args.tol, max_newton=args.max_newton)
                return st2, (k, fn, jnp.int32(0))
            return jax.lax.scan(body, st, None, length=n)
        return run

    return _time_and_print(
        args, make_run, scene.params, st0,
        metric_name=f"ms_per_timestep_to_f_inf_{args.tol:g}_cloth")


def _make_pins(args, m):
    """None = default top-slab pins; 'zmin' = cantilever end-face pin list
    (vertex ids in original mesh order, as LatticeScene expects)."""
    if args.pins == "top":
        return None
    zmin = m.ijk[:, 2].min()
    return np.nonzero(m.ijk[:, 2] == zmin)[0]


def bench_quasistatic(args, m, pins=None):
    """ms per full quasi-static solve (rest -> ||f||inf<=tol).

    Unlike the dynamic step, the quasi-static Hessian has no m/dt^2 mass
    shift, so block-Jacobi PCG iteration counts grow with mesh diameter and
    the GMG V-cycle preconditioner (--solver latmg) is where multigrid beats
    single-level solvers (reference README.md:17-19, object.py:1230-1296).

    Each timed repetition solves a distinct problem (a per-repeat vertical
    perturbation of the rest state) inside one lax.scan dispatch, so XLA
    cannot share work between repeats and the tunnel dispatch is amortized.
    """
    import jax
    import jax.numpy as jnp
    from fem_simulation_tpu.sim.lattice import (LatticeScene,
                                                quasistatic_to_tol)
    from fem_simulation_tpu.sim.lattice_mg import (LatticeMG, quasistatic_fmg,
                                                   quasistatic_to_tol_mg)

    solver = args.solver
    if solver not in ("lattice", "latmg"):
        raise SystemExit("--quasistatic supports --solver lattice|latmg")
    lscene = LatticeScene(m, pins=pins, box_threshold=args.box_threshold)
    if solver == "latmg" or args.fmg:
        lmg = LatticeMG(lscene, n_levels=args.mg_levels, dt=None,
                        coarse_cg=args.mg_coarse_cg,
                        spd_smoother=not args.mg_no_spd,
                        use_pallas=False if args.no_pallas else None)

    n_rep = max(args.frames // 10, 4)
    # distinct tiny rest-state perturbations defeat cross-repeat CSE
    seeds = jnp.linspace(0.0, 1e-4, n_rep)
    # roofline for the single-shot configs (the continuation/FMG stage
    # structure has no cg accounting — see quasistatic_to_tol return_cg)
    count_cg = args.load_steps == 1 and not args.fmg

    @jax.jit
    def run(x0):
        def body(carry, s):
            x = x0 + s * lscene.vert_mask[..., None]
            cg = jnp.int32(0)
            if args.fmg:
                x, k, fn = quasistatic_fmg(
                    lscene, lmg, tol=args.tol, max_newton=100,
                    coarse_max_newton=100, load_steps=args.load_steps,
                    fine_solver=("jacobi" if solver == "lattice" else "mg"),
                    perturb=s)
            elif solver == "latmg":
                out = quasistatic_to_tol_mg(lscene, lmg, x, tol=args.tol,
                                            max_newton=100,
                                            load_steps=args.load_steps,
                                            cg_forcing=args.cg_forcing,
                                            return_cg=count_cg)
                (x, k, fn), cg = out[:3], (out[3] if count_cg else cg)
            else:
                out = quasistatic_to_tol(
                    lscene, x, tol=args.tol, max_newton=100,
                    load_steps=args.load_steps,
                    use_pallas=False if args.no_pallas else None,
                    cg_forcing=args.cg_forcing, return_cg=count_cg)
                (x, k, fn), cg = out[:3], (out[3] if count_cg else cg)
            return carry, (k, fn, cg)
        _, (ks, fns, cgs) = jax.lax.scan(body, 0.0, seeds)
        return ks, fns, cgs

    ks, fns, cgs = run(lscene.x0)
    fns = np.asarray(fns)                    # warm-up/compile + sync
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ks, fns, cgs = run(lscene.x0)
        fns = np.asarray(fns)
        dt_ = time.perf_counter() - t0
        best = dt_ if best is None else min(best, dt_)
    ks = np.asarray(ks)
    cgs = np.asarray(cgs)
    ms = best / n_rep * 1000.0
    converged = bool(fns.max() <= args.tol * 1.01)
    result = {}
    if count_cg and not args.no_pallas:
        if solver == "latmg":
            roofline = _make_roofline_mg(lscene, lmg)
        elif lscene.boxes is None:
            roofline = _make_roofline(lscene)
        else:
            roofline = None
        if roofline is not None:
            fl, by = roofline(n_rep, ks, cgs)
            result = _roofline_stats(fl, by, best)
            result["cg_total"] = int(cgs.sum())
    print(json.dumps({
        "metric": (f"ms_quasistatic_to_f_inf_{args.tol:g}_{args.solver}"
                   + ("_fmg" if args.fmg else "")),
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 3),
        "newton_iters": int(ks.max()),
        "n_verts": int(m.n_verts),
        "converged": converged,       # False: solver hit max_newton first
        "f_inf_final": float(fns.max()),
        **result,
    }))
    return 0 if converged else 1


if __name__ == "__main__":
    sys.exit(main())
