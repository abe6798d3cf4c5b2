import numpy as np
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene, QuasiStaticSim
from fem_simulation_tpu.sim import quasistatic as qs
from fem_simulation_tpu.utils import debug


@pytest.fixture(scope="module")
def scene():
    return Scene(meshlib.beam(3, 3, 6, dx=0.1), solver=SolverConfig(n_levels=2))


def test_hessian_symmetry_invariant(scene):
    x = scene.x0 + 0.01
    vals = qs.assemble_fine(scene, scene.params, x)
    worst = debug.check_symmetry(scene.level(0), vals)
    assert worst < 1e-4


def test_spd_after_projection(scene):
    from fem_simulation_tpu.ops import ell
    x = scene.x0 * 0.7  # compressed: indefinite Hessian expected
    vals = qs.assemble_fine(scene, scene.params, x, include_pins=False)
    before = debug.check_spd(vals)
    assert before < 0  # compression produces negative eigenvalues
    proj = ell.spd_project(vals, 1e-3)
    after = debug.check_spd(proj)
    assert after > -1e-4


def test_energy_monotone_newton_mg(scene):
    sim = QuasiStaticSim(scene)
    e, fn = sim.newton_multigrid(20)
    assert debug.check_energy_decrease(np.asarray(e)[2:], rtol=1e-2)


def test_galerkin_invariant(scene):
    from fem_simulation_tpu.ops import transfer
    x = scene.x0 + 0.005
    v0 = qs.assemble_fine(scene, scene.params, x)
    t = scene.params["transfers"][0]
    lvl1 = scene.level(1)
    vc = transfer.galerkin(v0, t["g_src"], t["g_dst"], t["g_w"],
                           lvl1.n_verts, lvl1.K)
    debug.check_galerkin(scene, scene.params, v0, vc)
