"""Box-cover low-fill lattice path (ops/boxes.py + LatticeScene routing).

The cover must partition the real cells, cut the padded compute volume on
realistically-sized sparse shapes, and reproduce the dense-grid elastic ops
exactly (the decomposition is a partition sum + an exact axis relabeling —
see the ops/boxes.py module docstring for the invariance argument).

Parity tests use a small shell with ``box_threshold`` raised to force the
cover on (cheap on one CPU); cover QUALITY is asserted on a demo-scale mask
directly, because 128-lane padding legitimately dominates tiny bboxes and
auto-engagement is deliberately cost-driven."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.ops import boxes as boxlib
from fem_simulation_tpu.sim.lattice import LatticeScene


@pytest.fixture(scope="module")
def shell_scene():
    # 20^3 hollow box, 2-cell walls; threshold forced so the cover engages
    # at this (test-sized) bbox
    return LatticeScene(meshlib.shell(20, 20, 20, thickness=2, dx=0.05),
                        box_threshold=2.0, box_quantum=(1, 1, 8))


def test_cover_partitions_cells(shell_scene):
    sc = shell_scene
    assert sc.boxes is not None and len(sc.boxes) > 1
    cm = np.asarray(sc.cell_mask) > 0
    counted = np.zeros_like(cm, dtype=np.int32)
    for b in sc.boxes:
        counted[b.c0[0]:b.c1[0], b.c0[1]:b.c1[1], b.c0[2]:b.c1[2]] += 1
    # every real cell in exactly one box; boxes never overlap in cells
    assert (counted[cm] == 1).all()
    assert counted.max() <= 1


def test_cover_cuts_padded_volume_at_demo_scale():
    """At reference-demo bbox scale (64^3) a 2-cell shell's cover must cut
    the padded volume well below the auto-engage threshold."""
    ii, jj, kk = np.meshgrid(*[np.arange(64)] * 3, indexing="ij")
    t = 2
    interior = ((ii >= t) & (ii < 64 - t) & (jj >= t) & (jj < 64 - t)
                & (kk >= t) & (kk < 64 - t))
    cm = (~interior).astype(np.float32)
    boxes, cover_cost = boxlib.build_box_cover(cm)
    full_cost = boxlib._perm_cost((65, 65, 65))
    assert cover_cost < 0.5 * full_cost
    assert len(boxes) <= 24


def test_beam_keeps_single_grid():
    sc = LatticeScene(meshlib.beam(4, 4, 12, dx=0.05))
    assert sc.boxes is None            # flagship dense path untouched
    assert sc.box_cost_ratio >= 0.99


def test_box_ops_match_dense(shell_scene):
    sc = shell_scene
    dense = LatticeScene(sc.mesh, use_boxes=False)
    assert dense.boxes is None
    rng = np.random.default_rng(0)
    x = sc.x0 + 0.01 * jnp.asarray(
        rng.normal(size=sc.x0.shape).astype(np.float32))
    p = jnp.asarray(rng.normal(size=sc.x0.shape).astype(np.float32))

    f_box = jax.jit(lambda xx: sc.elastic_force(xx, False))(x)
    f_dense = jax.jit(lambda xx: dense.elastic_force(xx, False))(x)
    np.testing.assert_allclose(np.asarray(f_box), np.asarray(f_dense),
                               atol=1e-4)

    e_box = jax.jit(lambda xx: sc.elastic_energy(xx, False))(x)
    e_dense = jax.jit(lambda xx: dense.elastic_energy(xx, False))(x)
    np.testing.assert_allclose(float(e_box), float(e_dense), rtol=1e-5)

    d_box = jax.jit(lambda xx: sc.elastic_diag(xx, False))(x)
    d_dense = jax.jit(lambda xx: dense.elastic_diag(xx, False))(x)
    np.testing.assert_allclose(np.asarray(d_box), np.asarray(d_dense),
                               atol=1e-3)

    h_box = jax.jit(lambda xx, pp: sc.elastic_hvp_fn(xx, False)(pp))(x, p)
    h_dense = jax.jit(lambda xx, pp: dense.elastic_hvp_fn(xx, False)(pp))(x, p)
    np.testing.assert_allclose(np.asarray(h_box), np.asarray(h_dense),
                               atol=1e-3)


def test_box_pallas_interpret_matches_dense():
    """Interpret-mode Pallas kernels inside boxes (per-box axis permutation
    included) == dense XLA stencil. Small shell so interpret stays cheap;
    thickness 1 forces thin plates whose lane axis must be re-chosen."""
    sc = LatticeScene(meshlib.shell(18, 6, 12, thickness=1, dx=0.05),
                      box_threshold=2.0, box_quantum=(1, 1, 8))
    assert sc.boxes is not None
    # at least one box must engage Pallas (lane >= 16) and at least one
    # must fall back to the stencil, so both arms of the per-box gate run
    lanes = [b.c1[b.perm[2]] - b.c0[b.perm[2]] + 1 for b in sc.boxes]
    assert max(lanes) >= 16
    assert min(lanes) < 16
    dense = LatticeScene(sc.mesh, use_boxes=False)
    x = sc.x0 * 1.01
    f_box = jax.jit(lambda xx: sc.elastic_force(xx, True))(x)
    f_dense = jax.jit(lambda xx: dense.elastic_force(xx, False))(x)
    np.testing.assert_allclose(np.asarray(f_box), np.asarray(f_dense),
                               atol=1e-4)


def test_shell_dynamic_step_matches_dense(shell_scene):
    from fem_simulation_tpu.sim import lattice as latmod
    sc = shell_scene
    dense = LatticeScene(sc.mesh, use_boxes=False)
    kw = dict(tol=1e-4, max_newton=10, use_pallas=False)
    st1, k1, f1 = jax.jit(lambda s: latmod.step_to_tol(sc, s, **kw))(
        sc.init_state())
    st2, k2, f2 = jax.jit(lambda s: latmod.step_to_tol(dense, s, **kw))(
        dense.init_state())
    assert float(f1) <= 1e-4
    assert int(k1) == int(k2)
    np.testing.assert_allclose(np.asarray(st1.x), np.asarray(st2.x),
                               atol=1e-5)


def test_multi_component_cover():
    """Two separated blobs: the cover must split into per-component boxes
    (multi-box), not one bbox spanning the gap."""
    blob = np.stack(np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    cells = np.concatenate([blob, blob + np.array([0, 0, 40])])
    m = meshlib.hex_mesh_from_cells(cells, 0.05,
                                    np.zeros(3, dtype=np.float64))
    boxes, cost = boxlib.build_box_cover(
        LatticeScene(m, use_boxes=False).cell_mask, quantum=(1, 1, 1))
    assert len(boxes) >= 2
    # no box spans the empty gap
    for b in boxes:
        assert b.c1[2] <= 3 or b.c0[2] >= 40


def test_global_permutation_single_box():
    """A solid grid whose natural orientation wastes tile padding engages
    the degenerate one-box cover with the cost-optimal axis permutation
    (the voxelized-kitten case: short z pads to 128 lanes) and reproduces
    the dense ops exactly."""
    # solid 12x4x4 beam with x (the long axis) NOT on lanes; quantum (1,4,8)
    # makes the padding asymmetry visible at test size
    m = meshlib.beam(12, 4, 4, dx=0.05)
    sc = LatticeScene(m, box_quantum=(1, 4, 8))
    dense = LatticeScene(m, use_boxes=False)
    assert sc.boxes is not None and len(sc.boxes) == 1
    b = sc.boxes[0]
    assert b.c0 == (0, 0, 0) and b.c1 == (12, 4, 4)
    assert b.perm[2] == 0                     # long axis moved to lanes
    assert sc.box_cost_ratio < 0.95
    rng = np.random.default_rng(1)
    x = sc.x0 + 0.01 * jnp.asarray(
        rng.normal(size=sc.x0.shape).astype(np.float32))
    p = jnp.asarray(rng.normal(size=sc.x0.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(sc.elastic_force(x, False)),
                               np.asarray(dense.elastic_force(x, False)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc.elastic_diag(x, False)),
                               np.asarray(dense.elastic_diag(x, False)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc.elastic_hvp_fn(x, False)(p)),
                               np.asarray(dense.elastic_hvp_fn(x, False)(p)),
                               atol=1e-3)
    np.testing.assert_allclose(float(sc.elastic_energy(x, False)),
                               float(dense.elastic_energy(x, False)),
                               rtol=1e-5)


def test_global_permutation_not_engaged_when_natural_is_best():
    # long axis already on lanes: no permutation, dense path untouched
    sc = LatticeScene(meshlib.beam(4, 4, 12, dx=0.05), box_quantum=(1, 4, 8))
    assert sc.boxes is None
