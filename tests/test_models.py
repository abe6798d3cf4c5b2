import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fem_simulation_tpu import mesh as meshlib
from fem_simulation_tpu.config import SolverConfig, TrainInterpConfig, TrainSolverConfig
from fem_simulation_tpu.sim import Scene


@pytest.fixture(scope="module")
def scene():
    m = meshlib.beam(3, 3, 6, dx=0.1)
    return Scene(m, solver=SolverConfig(n_levels=2))


# ---------------------------------------------------------------- exp2

def test_interp_tables_roundtrip(scene):
    """Rebuilding P/R tables from classic triplet weights reproduces them."""
    from fem_simulation_tpu.models.train_interp import tables_from_weights
    t = scene.params["transfers"][0]
    nf = scene.level(0).n_verts
    nc = scene.level(1).n_verts
    p_w, r_w = tables_from_weights(t, t["t_w"], nf, nc, t["r_idx"].shape[1])
    np.testing.assert_allclose(np.asarray(p_w), np.asarray(t["p_w"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_w), np.asarray(t["r_w"]), atol=1e-6)


@pytest.mark.parametrize("mode", ["P", "p_hat"])
def test_interp_training_reduces_loss(scene, mode):
    from fem_simulation_tpu.models.train_interp import InterpTrainer
    cfg = TrainInterpConfig(mode=mode, lr=1e-3, iterations=8,
                            row_norm_weight=0.1)
    tr = InterpTrainer(scene, cfg)
    hist = tr.train(8, seed=0)
    assert np.isfinite(hist).all()
    # weights stay in [0, 1] (clamped SGD)
    w = np.asarray(tr.w)
    assert w.min() >= 0.0 and w.max() <= 1.0
    # they moved
    assert np.abs(w - np.asarray(scene.params["transfers"][0]["t_w"])).max() > 0


def test_interp_save_load_compare(scene, tmp_path):
    from fem_simulation_tpu.models.train_interp import InterpTrainer
    tr = InterpTrainer(scene, TrainInterpConfig(iterations=3))
    tr.train(3)
    p = tmp_path / "w.npz"
    tr.save(str(p))
    tr2 = InterpTrainer(scene).load(str(p))
    np.testing.assert_allclose(np.asarray(tr2.w), np.asarray(tr.w))
    out = tr2.compare(iterations=3)
    assert set(out) == {"classic", "trained"}
    assert np.isfinite(out["classic"]).all()
    assert np.isfinite(out["trained"]).all()


@pytest.mark.parametrize("mode", ["P", "p_hat"])
def test_interp_trained_beats_classic(scene, mode):
    """The reference's exp2 result (README.md:25): the trained interpolation
    converges faster than the classic trilinear one. Deterministic short
    training run (seed 0), then compare() — the reference's own bare-cycle
    protocol (object.py:1290-1366) — must show a strictly lower final
    residual for the trained transfer. Calibrated after 200 l2-loss SGD
    steps on this beam: bare classic diverges (2.4e7 by cycle 5), trained
    p_hat stays contractive (3.9e-2), trained P diverges slower (2.6e5);
    with smooth=True all converge and trained still wins (6.4e-3 / 1.6e-3
    vs classic 8.0e-3)."""
    from fem_simulation_tpu.models.train_interp import InterpTrainer
    cfg = TrainInterpConfig(mode=mode, lr=2e-3, iterations=200,
                            row_norm_weight=0.1, loss="l2")
    tr = InterpTrainer(scene, cfg)
    hist = tr.train(200, seed=0)
    assert np.isfinite(hist).all() and hist[-1] < hist[0]
    out = tr.compare(iterations=5)
    assert out["trained"][-1] < out["classic"][-1]


def test_interp_unrolled_training_contractive():
    """unroll>1 trains the ITERATED cycle map (beyond the reference, whose
    tape sees one cycle): on an 8x8x24 beam the classic bare cycle diverges
    (inf-norm 22.5 by iteration 8) and single-cycle-trained weights only
    slow the divergence, while 150 Adam steps at unroll=4 keep all 8
    iterations under 0.2 (calibrated 0.16)."""
    from fem_simulation_tpu.models.train_interp import InterpTrainer
    m = meshlib.beam(8, 8, 24, dx=0.1)
    sc = Scene(m, solver=SolverConfig(n_levels=2))
    tr = InterpTrainer(sc, TrainInterpConfig(mode="p_hat", lr=1e-3,
                                             loss="l2", optimizer="adam",
                                             unroll=4))
    tr.train(150, seed=0)
    out = tr.compare(iterations=8)
    assert out["classic"][-1] > 10.0          # bare classic cycle diverges
    assert np.max(out["trained"]) < 1.0       # trained cycle is contractive
    assert out["trained"][-1] < out["classic"][-1]


# ---------------------------------------------------------------- exp3

def test_graphconv_matches_manual():
    from fem_simulation_tpu.models.gnn import GraphConv
    ei = jnp.asarray(np.array([[0, 1, 2], [1, 2, 0]]))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
    model = GraphConv(5, aggr="add")
    p = model.init(jax.random.PRNGKey(0), x, ei)
    y = model.apply(p, x, ei)
    W1 = p["params"]["Dense_0"]["kernel"]
    b1 = p["params"]["Dense_0"]["bias"]
    W2 = p["params"]["Dense_1"]["kernel"]
    agg = np.zeros((3, 4), np.float32)
    src, dst = np.asarray(ei)
    for s, d in zip(src, dst):
        agg[d] += np.asarray(x)[s]
    ref = np.asarray(x) @ np.asarray(W1) + np.asarray(b1) + agg @ np.asarray(W2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_mdn3_shapes(scene):
    from fem_simulation_tpu.models.gnn import MDN3, edge_index_from_topology
    lvl = scene.level(0)
    ei = edge_index_from_topology(lvl.nbr, lvl.nbr_mask)
    model = MDN3(feat_dim=4, hidden=16)
    x = jnp.zeros((lvl.n_verts, 6))
    p = model.init(jax.random.PRNGKey(0), x, ei)
    y = model.apply(p, x, ei)
    assert y.shape == (lvl.n_verts, 3)


def test_rollout_and_training(scene):
    from fem_simulation_tpu.models.train_solver import (
        SolverNetTrainer, generate_rollout)
    cfg = TrainSolverConfig(frames=4, n_iters=2, train_times=30,
                            hidden_channels=16, feat_dim=2)
    xt, xs, res = generate_rollout(scene, cfg, seed=0)
    assert xt.shape == (4, scene.level(0).n_verts, 3)
    assert np.isfinite(np.asarray(res)).all()

    tr = SolverNetTrainer(scene, cfg)
    losses = tr.train(iterations=30, seed=0)
    assert np.isfinite(losses).all()
    # training reduces MSE substantially
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_learned_step_runs(scene):
    from fem_simulation_tpu.models.train_solver import SolverNetTrainer
    from fem_simulation_tpu.sim import dynamic
    cfg = TrainSolverConfig(frames=3, n_iters=1, hidden_channels=16, feat_dim=2)
    tr = SolverNetTrainer(scene, cfg)
    tr.train(iterations=10)
    st = dynamic.init_state(scene)
    st2 = tr.learned_step(st)
    assert np.isfinite(np.asarray(st2.x)).all()
    r = tr.evaluate_residual(st.x)
    assert np.isfinite(r)


def test_energy_gcn_training(scene):
    from fem_simulation_tpu.models.train_solver import train_energy_gcn
    net, losses = train_energy_gcn(scene, iterations=20, lr=1e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


def test_multilevel_trainer(scene):
    from fem_simulation_tpu.models.train_solver import SolverNetTrainer
    cfg = TrainSolverConfig(frames=3, n_iters=1, hidden_channels=8, feat_dim=2)
    tr = SolverNetTrainer(scene, cfg, multilevel=True)
    assert tr.multilevel
    losses = tr.train(iterations=10)
    assert np.isfinite(losses).all()
    from fem_simulation_tpu.sim import dynamic
    st = tr.learned_step(dynamic.init_state(scene))
    assert np.isfinite(np.asarray(st.x)).all()
