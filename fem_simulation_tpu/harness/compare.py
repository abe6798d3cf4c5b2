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


def drag_study(scene_factory, iterations: int = 50,
               plot_path: str | None = None):
    """Per-iteration residual study: GS-only vs CG-only vs Newton-MG
    (reference `drag`, object.py:1770-1852)."""
    out = {}
    # newton with CG (reference Newton), newton_mg, fas as the three arms
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
