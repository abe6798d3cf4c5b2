import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.sim.lattice import LatticeScene
from fem_simulation_tpu.ops import stencil
from fem_simulation_tpu.parallel.lattice_halo import LatticeSlabs, make_dist_force


def test_distributed_lattice_force_matches_single():
    m = meshlib.beam(4, 4, 33, dx=0.1)   # long in z for clean slabs
    scene = LatticeScene(m)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    slabs = LatticeSlabs(scene, 8)

    rng = np.random.default_rng(0)
    x = scene.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)
    ) * scene.vert_mask[..., None]

    ref = stencil.elastic_force_lattice(x - scene.x0, scene.cell_mask,
                                        scene.g_tab,
                                        scene.det, 250.0, 0.0)

    force = make_dist_force(slabs, mesh, mu=250.0, la=0.0)
    xb = slabs.scatter(x)
    fb = jax.jit(force)(xb)
    got = slabs.gather(fb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_slab_scatter_gather_roundtrip():
    m = meshlib.beam(3, 3, 17, dx=0.1)
    scene = LatticeScene(m)
    slabs = LatticeSlabs(scene, 4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=scene.x0.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(slabs.gather(slabs.scatter(x))),
                               np.asarray(x))


def test_distributed_lattice_hvp_matches_single():
    from fem_simulation_tpu.parallel.lattice_halo import make_dist_hvp
    m = meshlib.beam(4, 4, 33, dx=0.1)
    scene = LatticeScene(m)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    slabs = LatticeSlabs(scene, 8)
    rng = np.random.default_rng(2)
    x = scene.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)
    ) * scene.vert_mask[..., None]
    p = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def force(xx):
        return stencil.elastic_force_lattice(xx - scene.x0, scene.cell_mask,
                                             scene.g_tab,
                                             scene.det, 250.0, 0.0)

    _, jvp = jax.linearize(force, x)
    ref = -jvp(p)
    hvp = make_dist_hvp(slabs, mesh, mu=250.0, la=0.0)
    got = slabs.gather(jax.jit(hvp)(slabs.scatter(x), slabs.scatter(p)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_distributed_step_matches_single():
    from fem_simulation_tpu.parallel.lattice_halo import make_dist_step
    from fem_simulation_tpu.sim import lattice as latmod
    m = meshlib.beam(4, 4, 33, dx=0.1)
    scene = LatticeScene(m)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    slabs = LatticeSlabs(scene, 8)
    step, blockify = make_dist_step(slabs, mesh, tol=1e-4)

    xb = blockify(scene.x0)
    vb = jnp.zeros_like(xb)
    xb, vb, k, fn = jax.jit(step)(xb, vb)
    assert float(fn) <= 1e-4

    st = scene.init_state()
    st1, k1, f1 = jax.jit(lambda s: latmod.step_to_tol(scene, s, tol=1e-4))(st)
    got = slabs.gather(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(st1.x), atol=1e-3)


def test_distributed_diag_matches_single():
    from fem_simulation_tpu.parallel.lattice_halo import make_dist_diag
    m = meshlib.beam(4, 4, 33, dx=0.1)
    scene = LatticeScene(m)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    slabs = LatticeSlabs(scene, 8)
    rng = np.random.default_rng(5)
    x = scene.x0 + 0.02 * jnp.asarray(
        rng.normal(size=scene.x0.shape).astype(np.float32)
    ) * scene.vert_mask[..., None]
    ref = stencil.elastic_hessian_diag_lattice(
        x - scene.x0, scene.cell_mask, scene.g_tab, scene.det, 250.0, 0.0)
    diag = make_dist_diag(slabs, mesh, mu=250.0, la=0.0)
    got = slabs.gather(jax.jit(diag)(slabs.scatter(x)))
    # f32 accumulation order differs between the global and per-slab sums
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=5e-4)
