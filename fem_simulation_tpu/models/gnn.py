"""exp3 neural models: GraphConv encoder + per-axis MLP decoders (flax.linen).

TPU-native redesign of /root/reference/exp3/simulation/model.py (torch +
torch_geometric). GraphConv here reproduces torch_geometric's GraphConv
(aggr='add'): x_i' = W1 x_i + W2 sum_{j in N(i)} x_j — implemented as a
gather + segment-sum message pass, which is exactly the TPU-friendly form.

Models:
  Encoder     — 2x GraphConv + Linear  (model.py:8-25)
  Decoder     — D-layer ELU MLP        (model.py:28-44)
  MDN3        — encoder + 3 per-axis decoders (model.py:46-59)
  MultiLevel3 — per-level encoders; coarse features prolongated through the
                scalar interpolation matrix, concatenated, shared decoders
                (model.py:62-82; the torch CSR sparse-mm prolongation at :74
                becomes ops.transfer.prolong).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class GraphConv(nn.Module):
    """x_i' = W1 x_i + W2 agg_{j->i} x_j  (+ bias), PyG GraphConv semantics.

    aggr='mean' by default: hex-lattice vertices have ~26 neighbors, so sum
    aggregation (PyG's default, used by the reference) amplifies activations
    ~26x per layer and stacks to ~700x at init — mean keeps activations O(1).
    """
    features: int
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x, edge_index):
        # edge_index: (2, E) with messages flowing src -> dst
        src, dst = edge_index[0], edge_index[1]
        agg = jnp.zeros_like(x).at[dst].add(x[src])
        if self.aggr == "mean":
            deg = jnp.zeros((x.shape[0],), x.dtype).at[dst].add(1.0)
            agg = agg / jnp.maximum(deg, 1.0)[:, None]
        return (nn.Dense(self.features, use_bias=True)(x)
                + nn.Dense(self.features, use_bias=False)(agg))


class Encoder(nn.Module):
    hidden: int
    n_outputs: int   # per-axis feature count; output dim = 3 * n_outputs

    @nn.compact
    def __call__(self, x, edge_index):
        x = nn.relu(GraphConv(self.hidden)(x, edge_index))
        x = nn.relu(GraphConv(self.hidden)(x, edge_index))
        return nn.Dense(self.n_outputs * 3)(x)


class Decoder(nn.Module):
    depth: int = 1
    width: int = 64
    out: int = 1

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            x = nn.elu(nn.Dense(self.width)(x))
        return nn.Dense(self.out)(x)


class MDN3(nn.Module):
    """Encoder to (N, 3, feat); three per-axis decoders to (N, 3)."""
    feat_dim: int = 4
    hidden: int = 64

    @nn.compact
    def __call__(self, x, edge_index):
        h = Encoder(self.hidden, self.feat_dim)(x, edge_index)
        h = h.reshape(x.shape[0], 3, self.feat_dim)
        outs = [Decoder()(h[:, i, :]) for i in range(3)]
        return jnp.concatenate(outs, axis=-1)


class MultiLevel3(nn.Module):
    """Per-level encoders; coarse features prolongated to the fine grid and
    concatenated along the feature axis; shared per-axis decoders.

    `prolongs` is a static list of callables (one per coarse level) mapping
    that level's (N_l, F) features to fine (N_0, F) features — typically a
    chain of ops.transfer.prolong hops.
    """
    n_levels: int
    feat_dim: int = 4
    hidden: int = 64

    @nn.compact
    def __call__(self, xs: Sequence, edge_indices: Sequence, prolongs):
        feats = []
        for li in range(self.n_levels):
            h = Encoder(self.hidden, self.feat_dim)(xs[li], edge_indices[li])
            if li > 0:
                h = prolongs[li - 1](h)
            feats.append(h.reshape(xs[0].shape[0], 3, self.feat_dim))
        h = jnp.concatenate(feats, axis=2)          # (N, 3, feat*levels)
        outs = [Decoder()(h[:, i, :]) for i in range(3)]
        return jnp.concatenate(outs, axis=-1)


def edge_index_from_topology(nbr, nbr_mask) -> jnp.ndarray:
    """Directed (2, E) edge list (both directions, no self-loops) from the
    block-ELL neighbor table (replaces the reference's 28-pairs-per-hex
    enumeration, exp3/quasi_simulation/object.py:77-93)."""
    import numpy as np
    nbr = np.asarray(nbr)
    mask = np.asarray(nbr_mask) > 0
    n = nbr.shape[0]
    rows = np.repeat(np.arange(n), nbr.shape[1]).reshape(n, -1)
    sel = mask & (nbr != rows)
    src = nbr[sel].astype(np.int32)
    dst = rows[sel].astype(np.int32)
    return jnp.asarray(np.stack([src, dst]))
