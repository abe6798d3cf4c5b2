"""Checkpoint / resume and metrics logging.

The reference persists only model artifacts via torch.save
(exp3/simulation/object.py:1638; exp2 .../object.py:1198-1200). Here we add a
real checkpoint story (SURVEY.md section 5): full simulation state (positions,
velocities, drag constraints) and learned parameters, as npz (with optional
orbax for pytree checkpoints), plus a structured metrics logger replacing the
reference's print + matplotlib-list pattern (object.py:857-864, 1139-1147).
"""
from __future__ import annotations

import csv
import json
import time

import numpy as np


# ---------------------------------------------------------------------------
# Checkpoints
# ---------------------------------------------------------------------------

def save_state(path: str, state, extra: dict | None = None):
    """Save a NamedTuple/dict pytree of arrays to .npz."""
    flat = {}
    if hasattr(state, "_asdict"):
        items = state._asdict().items()
    elif isinstance(state, dict):
        items = state.items()
    else:
        raise TypeError(type(state))
    for k, v in items:
        flat[k] = np.asarray(v)
    for k, v in (extra or {}).items():
        flat[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_state(path: str, state_cls=None):
    """Load arrays saved by save_state; returns (dict_or_namedtuple, extra)."""
    import jax.numpy as jnp
    data = np.load(path, allow_pickle=True)
    fields = {k: jnp.asarray(v) for k, v in data.items()
              if not k.startswith("extra_")}
    extra = {k[len("extra_"):]: data[k] for k in data.files
             if k.startswith("extra_")}
    if state_cls is not None:
        return state_cls(**fields), extra
    return fields, extra


def save_pytree(path: str, tree):
    """Pickle-free pytree save: leaf arrays as npz in flatten order.

    Pair with load_pytree(path, like=<tree of the same structure>); the
    structure itself is not serialized (jax treedefs have no stable wire
    format without pickle), only a human-readable record in `path.tree`."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path, *[np.asarray(l) for l in leaves])
    base = path[:-len(".npz")] if path.endswith(".npz") else path
    with open(base + ".tree", "w") as fh:
        fh.write(str(treedef))


def load_pytree(path: str, like):
    """Load arrays saved by save_pytree into the structure of `like`.

    `like` supplies the treedef (e.g. a freshly initialized params pytree);
    leaves are matched by flatten order and shape-checked. When the `.tree`
    sidecar save_pytree wrote exists, its structure string must match
    `like`'s — flatten order + shapes alone cannot tell two same-shaped
    fields apart (e.g. two (N, 3) arrays assigned to swapped keys)."""
    import os
    import jax
    import jax.numpy as jnp
    base = path[:-len(".npz")] if path.endswith(".npz") else path
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    sidecar = base + ".tree"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            saved = fh.read()
        if saved != str(treedef):
            raise ValueError(
                f"{path}: saved tree structure does not match `like`:\n"
                f"  saved:    {saved}\n  expected: {treedef}")
    if len(leaves) != len(like_leaves):
        raise ValueError(f"{path}: {len(leaves)} saved leaves, structure "
                         f"expects {len(like_leaves)}")
    for i, (l, ref) in enumerate(zip(leaves, like_leaves)):
        if hasattr(ref, "shape") and tuple(l.shape) != tuple(ref.shape):
            raise ValueError(f"{path}: leaf {i} shape {l.shape} != "
                             f"expected {ref.shape}")
    return jax.tree_util.tree_unflatten(treedef,
                                        [jnp.asarray(l) for l in leaves])


def checkpoint_sim(path: str, sim):
    """Checkpoint a DynamicSim / QuasiStaticSim for resume."""
    if hasattr(sim, "state"):           # DynamicSim
        save_state(path, sim.state)
    else:                               # QuasiStaticSim
        np.savez(path, x=np.asarray(sim.x))


def resume_sim(path: str, sim):
    import jax.numpy as jnp
    data = np.load(path)
    if hasattr(sim, "state"):
        from ..sim.dynamic import DynState
        sim.state = DynState(**{k: jnp.asarray(data[k]) for k in data.files})
    else:
        sim.x = jnp.asarray(data["x"])
    return sim


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

class MetricsLogger:
    """Structured per-step metrics: in-memory series + optional CSV/JSONL."""

    def __init__(self, csv_path: str | None = None,
                 jsonl_path: str | None = None):
        self.series: dict[str, list] = {}
        self._csv_path = csv_path
        self._jsonl_path = jsonl_path
        self._csv_writer = None
        self._csv_file = None

    def log(self, step: int, **metrics):
        row = {"step": step, "time": time.time(), **{
            k: float(v) for k, v in metrics.items()}}
        for k, v in row.items():
            self.series.setdefault(k, []).append(v)
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        if self._csv_path:
            new = self._csv_writer is None
            if new:
                self._csv_file = open(self._csv_path, "w", newline="")
                self._csv_writer = csv.DictWriter(self._csv_file,
                                                  fieldnames=list(row))
                self._csv_writer.writeheader()
            self._csv_writer.writerow(row)
            self._csv_file.flush()

    def get(self, key: str) -> np.ndarray:
        return np.asarray(self.series.get(key, []))

    def close(self):
        if self._csv_file:
            self._csv_file.close()
            self._csv_file = None
            self._csv_writer = None
