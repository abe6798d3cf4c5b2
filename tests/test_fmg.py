"""Full-multigrid (nested iteration) quasi-static solves — sim/lattice_mg.py
quasistatic_fmg. Beyond the reference (its NewtonMultigrid always starts
fine Newton from the current state, /root/reference/exp1/quasi_simulation/
object.py:1230-1296); tests pin the two properties that make FMG worth
shipping: it converges to the same equilibrium as plain Newton-MG, and on
deep-bend problems the prolonged coarse equilibrium replaces most of the
fine-level Newton work.
"""
import os

import numpy as np
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.sim.lattice import LatticeScene
from fem_simulation_tpu.sim.lattice_mg import (LatticeMG, quasistatic_fmg,
                                               quasistatic_to_tol_mg)

KITTEN = "/root/reference/assets/objs/kitten.obj"


def test_fmg_matches_plain_mg_on_beam():
    m = meshlib.beam(6, 6, 16, dx=0.05)
    sc = LatticeScene(m)
    mg = LatticeMG(sc, n_levels=3, dt=None, coarse_cg=8, use_pallas=False)
    x_ref, k_ref, fn_ref = quasistatic_to_tol_mg(sc, mg, sc.x0, tol=1e-4)
    x, k, fn, ks = quasistatic_fmg(sc, mg, tol=1e-4, return_stats=True)
    assert float(fn) <= 1e-4
    assert float(fn_ref) <= 1e-4
    # same equilibrium (displacements are O(0.1) here)
    assert float(np.abs(np.asarray(x - x_ref)).max()) < 1e-3
    # the prolonged guess must not make the fine level WORSE than from-rest
    assert int(ks[-1]) <= int(k_ref)


def test_fmg_deep_bend_cantilever():
    """4x4x32 cantilever sagging under gravity: from rest, single-level
    Newton with adaptive continuation needs 24 fine iterations (measured);
    the FMG guess (auto continuation at the 64x-cheaper coarsest level
    only) cuts the fine corrector to ~10. The V-cycle is the wrong fine
    corrector here (stalls at the 100 budget — see the fine_solver
    docstring), so this also pins the fine_solver='jacobi' path."""
    m = meshlib.beam(4, 4, 32, dx=0.05)
    pins = np.nonzero(m.ijk[:, 2] == m.ijk[:, 2].min())[0]
    sc = LatticeScene(m, pins=pins)
    mg = LatticeMG(sc, n_levels=3, dt=None, coarse_cg=16, use_pallas=False)
    x, k, fn, ks = quasistatic_fmg(sc, mg, tol=1e-4, max_newton=100,
                                   coarse_max_newton=100, load_steps="auto",
                                   fine_solver="jacobi", return_stats=True)
    assert float(fn) <= 1e-4
    # deep bend reached (tip sags > 1.4 world units; beam length ~1.6)
    assert float(np.asarray(x)[..., 1].min()) < -1.3
    # fine-level Newton count: measured 10, vs 24 from rest (margin for
    # toolchain drift, still far below the from-rest count)
    assert int(ks[-1]) <= 14


@pytest.mark.skipif(not os.path.exists(KITTEN),
                    reason="reference assets not available")
def test_fmg_kitten_irregular_mask():
    """FMG on the irregular voxelized kitten: the coarse gravity load must
    be the RESTRICTED fine mass — re-lumping from the binary coarse mask
    inflates jagged-boundary mass and made the guess worse than rest
    (measured: 50 fine Newton vs 6 from rest; with restricted mass: 5)."""
    m = meshlib.load_hex_mesh(KITTEN, 0.06, normalize=True)
    sc = LatticeScene(m)
    mg = LatticeMG(sc, n_levels=2, dt=None, coarse_cg=8, use_pallas=False)
    x, k, fn, ks = quasistatic_fmg(sc, mg, tol=1e-4, return_stats=True)
    assert float(fn) <= 1e-4
    assert int(ks[-1]) <= 6   # measured 5; plain MG from rest needs 6
