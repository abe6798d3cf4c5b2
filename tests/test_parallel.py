import numpy as np
import pytest

import jax

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig
from fem_simulation_tpu.sim import Scene
from fem_simulation_tpu.parallel import make_device_mesh, make_batched_step


def test_device_mesh_shapes():
    m = make_device_mesh(8)
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("dp", "sp")
    m1 = make_device_mesh(1)
    assert m1.devices.shape == (1, 1)


def test_batched_sharded_step_matches_single():
    """The dp x sp sharded step produces the same physics as single-device."""
    mesh = make_device_mesh(8)
    m = meshlib.beam(2, 2, 4, dx=0.1)
    scene = Scene(m, solver=SolverConfig(n_levels=2), pad_to=8)
    step_fn, params, state0 = make_batched_step(scene, mesh, batch=2)
    out = step_fn(params, state0)
    jax.block_until_ready(out)
    x = np.asarray(out.x)
    assert np.isfinite(x).all()
    # both batch entries start identical -> identical results
    np.testing.assert_allclose(x[0], x[1], atol=1e-6)

    # compare against the plain single-device step
    from fem_simulation_tpu.sim import dynamic
    st = dynamic.init_state(scene)
    ref = dynamic.step(scene, scene.params, st)
    np.testing.assert_allclose(x[0], np.asarray(ref.x), rtol=1e-4, atol=1e-5)


def test_graft_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out.x)).all()
    ge.dryrun_multichip(8)
