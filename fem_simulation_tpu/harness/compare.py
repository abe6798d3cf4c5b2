"""A/B benchmark harnesses mirroring the reference comparison studies.

Reference: `Object.compare` (Newton-GS vs Newton-Multigrid,
/root/reference/exp1/quasi_simulation/object.py:1514-1628),
`compare_withoutGravity` (attachment ablation, :1630-1768), and `drag`
(GS vs CG vs Newton-MG residual studies, :1770-1852). Pass/fail there was
human inspection of matplotlib plots; here each harness returns the raw series
(and can also save the same dual-panel plot via utils.viz).
"""
from __future__ import annotations

import numpy as np

from ..sim import QuasiStaticSim


def compare(scene_factory, iterations: int = 100, plot_path: str | None = None):
    """Newton vs Newton-Multigrid convergence (reference `compare`).

    scene_factory: () -> Scene (fresh state per method).
    Returns {"newton": {...}, "newton_mg": {...}} with energy/inf series.
    """
    out = {}
    for name, runner in (("newton", "newton"), ("newton_mg", "newton_multigrid")):
        sim = QuasiStaticSim(scene_factory())
        e, fn = getattr(sim, runner)(iterations)
        out[name] = {"energy": np.asarray(e), "f_inf": np.asarray(fn)}
    if plot_path:
        from ..utils.viz import plot_convergence
        plot_convergence({k: v["f_inf"] for k, v in out.items()},
                         plot_path, title="||f||_inf: Newton vs Newton-MG")
    return out


def compare_fas(scene_factory, iterations: int = 100, variants=(2, 3),
                plot_path: str | None = None):
    """FAS variant study incl. attachment handling ablation
    (reference compare_withoutGravity: v2 has no coarse pin treatment,
    v3 adds compute_fix_hessian)."""
    out = {}
    for v in variants:
        sim = QuasiStaticSim(scene_factory())
        e, fn = sim.fas(iterations, variant=v)
        out[f"fas_v{v}"] = {"energy": np.asarray(e), "f_inf": np.asarray(fn)}
    if plot_path:
        from ..utils.viz import plot_convergence
        plot_convergence({k: v["f_inf"] for k, v in out.items()},
                         plot_path, title="FAS variants ||f||_inf")
    return out


def solver_study(scene_factory, iterations: int = 50,
                 plot_path: str | None = None):
    """Full nonlinear solver comparison: Newton-CG vs Newton-MG vs FASv3
    convergence of ||f||_inf over solver iterations."""
    out = {}
    for name, call in (
        ("newton_cg", lambda s: s.newton(iterations)),
        ("newton_mg", lambda s: s.newton_multigrid(iterations)),
        ("fas_v3", lambda s: s.fas(iterations, variant=3)),
    ):
        sim = QuasiStaticSim(scene_factory())
        e, fn = call(sim)
        out[name] = {"energy": np.asarray(e), "f_inf": np.asarray(fn)}
    if plot_path:
        from ..utils.viz import plot_convergence
        plot_convergence({k: v["f_inf"] for k, v in out.items()},
                         plot_path, title="solver comparison ||f||_inf")
    return out


def drag_study(scene_factory, iterations: int = 10, drag_vertex=None,
               drag_delta=(0.15, 0.0, 0.0), settle_steps: int = 3,
               plot_path: str | None = None):
    """Reference-faithful `drag` study (object.py:1770-1852): at a dragged
    state, assemble ONE SPD-projected Hessian A and b = f(x), then record the
    LINEAR residual ||b - A dx_i||_inf per iteration for three solvers of the
    same fixed system: colored GS sweeps, CG, and V-cycles (Galerkin coarse
    operators). This is the study that exhibits multigrid's per-iteration
    superiority independent of the outer Newton loop.

    Returns {"gs": r, "cg": r, "mg": r} with r[i] = residual after i
    iterations (r[0] = ||b||_inf for every arm).
    """
    import jax
    import jax.numpy as jnp
    from ..ops import elastic, ell
    from ..solvers import smoothers, cg as cgmod
    from ..sim import quasistatic as qs

    scene = scene_factory()
    sim = QuasiStaticSim(scene)
    if settle_steps:
        sim.newton_multigrid(settle_steps)
    x = sim.x
    # dragged state: displace the vertex farthest from the pins (mirrors the
    # interactive drag that precedes the reference study)
    p0 = scene.params["levels"][0]
    if drag_vertex is None:
        pin = np.asarray(p0["pin_mask"]) > 0
        xs = np.asarray(scene.x0)
        anchor = xs[pin].mean(axis=0) if pin.any() else xs.mean(axis=0)
        drag_vertex = int(np.argmax(((xs - anchor) ** 2).sum(axis=1)))
    x = x.at[drag_vertex].add(jnp.asarray(drag_delta, x.dtype))

    mat = scene.material
    op = scene.make_op(0, scene.params)

    @jax.jit
    def build(params, x):
        # gradient: elastic + pin only (reference drag launches
        # compute_partial_elastic_energy_X + compute_partial_fixed_energy_X)
        f = elastic.force(x, p0["hexes"], p0["det"], p0["g"],
                          mat.lame_mu, mat.lame_la, x.shape[0])
        f = f + elastic.pin_force(x, p0["pin_mask"], p0["pin_pos"],
                                  mat.control_mag)
        vals = qs.assemble_fine(scene, params, x)
        vals = ell.spd_project(vals, mat.spd_eps)   # reference spd_matrix33f
        return f, vals

    b, vals = build(scene.params, x)
    values = qs.galerkin_chain(scene, scene.params, vals)
    full = vals * op.mask[..., None, None]

    def resid(dx):
        return ell.inf_norm(b - ell.spmv(full, op.nbr, op.mask, dx))

    @jax.jit
    def run_gs(b):
        def body(dx, _):
            dx = smoothers.gauss_seidel(op, vals, b, iterations=1, x0=dx)
            return dx, resid(dx)
        return jax.lax.scan(body, jnp.zeros_like(b), None,
                            length=iterations)[1]

    @jax.jit
    def run_cg(b):
        # one CG iteration per scan step, continuing the same Krylov process
        def matvec(v):
            return ell.spmv(full, op.nbr, op.mask, v)

        def body(carry, _):
            dx, r, p, rs = carry
            ap = matvec(p)
            pap = ell.vdot(p, ap)
            ok = pap >= 1e-12
            alpha = jnp.where(ok, rs / jnp.where(ok, pap, 1.0), 0.0)
            dx = dx + alpha * p
            r = r - alpha * ap
            rs_new = ell.vdot(r, r)
            p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return (dx, r, p, rs_new), resid(dx)
        carry = (jnp.zeros_like(b), b, b, ell.vdot(b, b))
        return jax.lax.scan(body, carry, None, length=iterations)[1]

    @jax.jit
    def run_mg(b):
        def body(dx, _):
            r = b - ell.spmv(full, op.nbr, op.mask, dx)
            dx = dx + qs.vcycle(scene, scene.params, values, r,
                                gs_iterations=scene.solver.gs_iterations)
            return dx, resid(dx)
        return jax.lax.scan(body, jnp.zeros_like(b), None,
                            length=iterations)[1]

    r0 = float(ell.inf_norm(b))
    out = {}
    for name, runner in (("gs", run_gs), ("cg", run_cg), ("mg", run_mg)):
        series = np.asarray(runner(b))
        out[name] = np.concatenate([[r0], series])
    if plot_path:
        from ..utils.viz import plot_convergence
        plot_convergence(out, plot_path,
                         title="linear residual: GS vs CG vs V-cycle")
    return out
