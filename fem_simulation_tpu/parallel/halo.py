"""Domain-decomposed SpMV/CG with explicit halo exchange (shard_map + ppermute).

The reference is single-GPU with no communication backend (SURVEY.md section
2.3); this module is the designed TPU scaling story: vertices are partitioned
into contiguous lattice slabs along the longest axis, one slab per device on
the 'sp' mesh axis. Each device owns its slab plus a one-layer halo of
neighbor vertices; a matvec is

    halo exchange (2x ppermute over ICI)  ->  local block-ELL SpMV

and CG dot products are `psum` reductions — exactly the collective layout
SURVEY.md section 5 prescribes (halo ppermute + psum, no host round-trips).

This is the explicit-collective alternative to parallel/dist.py's GSPMD
sharding-constraint approach: here the communication schedule is spelled out,
so per-step traffic is exactly two boundary layers per device.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@dataclasses.dataclass
class SlabPartition:
    """Host-built partition tables (all (D, ...) arrays, device-major)."""
    n_dev: int
    n_own: int                 # padded owned count per device
    n_halo: int                # padded halo count per device (left+right)
    own_global: np.ndarray     # (D, n_own) global vertex id (pad: repeat last)
    own_mask: np.ndarray       # (D, n_own) 1.0 for real owned rows
    local_nbr: np.ndarray      # (D, n_own, K) local ids into [own ++ halo]
    local_mask: np.ndarray     # (D, n_own, K)
    send_left: np.ndarray      # (D, n_send) local own-ids this device sends left
    send_right: np.ndarray     # (D, n_send)
    recv_left_at: np.ndarray   # (D, n_send) halo slots receiving from the right
    recv_right_at: np.ndarray  # (D, n_send) halo slots receiving from the left
    n_send: int


def partition_slabs(lvl, n_dev: int) -> SlabPartition:
    """Slab partition along the longest lattice axis of a LevelTopology."""
    ijk = lvl.ijk
    axis = int(np.argmax(ijk.max(0) - ijk.min(0)))
    coord = ijk[:, axis]
    # equal-count slabs by sorted coordinate
    order = np.argsort(coord, kind="stable")
    slabs = np.array_split(order, n_dev)
    owner = np.empty(lvl.n_verts, dtype=np.int64)
    for d, s in enumerate(slabs):
        owner[s] = d

    nbr, mask = lvl.nbr.astype(np.int64), lvl.nbr_mask
    K = lvl.K
    own_lists = [np.sort(s) for s in slabs]
    n_own = max(len(s) for s in own_lists)

    halo_lists, send_L, send_R = [], [], []
    for d in range(n_dev):
        own = own_lists[d]
        cols = nbr[own][mask[own]]
        ext = np.unique(cols[owner[cols] != d])
        halo_lists.append(ext)
        # what d must SEND: vertices of d needed by d-1 / d+1
        send_L.append(None)
        send_R.append(None)
    for d in range(n_dev):
        left = d - 1
        right = d + 1
        need_from_d = lambda e: halo_lists[e][owner[halo_lists[e]] == d] if 0 <= e < n_dev else np.array([], np.int64)
        send_L[d] = need_from_d(left)    # left neighbor's halo owned by d
        send_R[d] = need_from_d(right)

    n_halo = max((len(h) for h in halo_lists), default=1) or 1
    n_send = max([len(s) for s in send_L + send_R] + [1])

    own_global = np.zeros((n_dev, n_own), np.int32)
    own_mask = np.zeros((n_dev, n_own), np.float32)
    local_nbr = np.zeros((n_dev, n_own, K), np.int32)
    local_mask = np.zeros((n_dev, n_own, K), np.float32)
    send_left = np.zeros((n_dev, n_send), np.int32)
    send_right = np.zeros((n_dev, n_send), np.int32)
    recv_left_at = np.zeros((n_dev, n_send), np.int32)
    recv_right_at = np.zeros((n_dev, n_send), np.int32)

    for d in range(n_dev):
        own = own_lists[d]
        halo = halo_lists[d]
        k_own = len(own)
        own_global[d, :k_own] = own
        if k_own < n_own:
            own_global[d, k_own:] = own[-1] if k_own else 0
        own_mask[d, :k_own] = 1.0
        # global -> local map: own -> [0, k_own), halo -> [n_own, n_own+|halo|)
        g2l = {int(g): i for i, g in enumerate(own)}
        for i, g in enumerate(halo):
            g2l[int(g)] = n_own + i
        ln = np.zeros((n_own, K), np.int32)
        lm = np.zeros((n_own, K), np.float32)
        for i, g in enumerate(own):
            for k in range(K):
                if mask[g, k]:
                    ln[i, k] = g2l[int(nbr[g, k])]
                    lm[i, k] = 1.0
                else:
                    ln[i, k] = i
        local_nbr[d] = ln
        local_mask[d] = lm
        # send lists in LOCAL own coordinates
        sl = np.array([g2l[int(g)] for g in send_L[d]], np.int32)
        sr = np.array([g2l[int(g)] for g in send_R[d]], np.int32)
        send_left[d, :len(sl)] = sl
        send_right[d, :len(sr)] = sr
        # where received buffers land: d's halo slots for verts owned by d-1
        # (arriving from the LEFT) and by d+1 (arriving from the RIGHT)
        from_left = [n_own + i for i, g in enumerate(halo) if owner[g] == d - 1]
        from_right = [n_own + i for i, g in enumerate(halo) if owner[g] == d + 1]
        recv_left_at[d, :len(from_left)] = np.asarray(from_left, np.int32)
        recv_right_at[d, :len(from_right)] = np.asarray(from_right, np.int32)
        # sanity: slab partitions only couple to adjacent slabs
        assert len(from_left) + len(from_right) == len(halo), \
            "partition has non-adjacent coupling; use more vertices per slab"
        assert len(from_left) == len(send_R[d - 1]) if d > 0 else not from_left
    return SlabPartition(
        n_dev=n_dev, n_own=n_own, n_halo=n_halo,
        own_global=own_global, own_mask=own_mask,
        local_nbr=local_nbr, local_mask=local_mask,
        send_left=send_left, send_right=send_right,
        recv_left_at=recv_left_at, recv_right_at=recv_right_at,
        n_send=n_send)


def make_dist_matvec(part: SlabPartition, mesh: Mesh, axis: str = "sp"):
    """Returns (matvec, scatter, gather) operating on (D, n_own, 3) shards.

    matvec(values_local (D, n_own, K, 3, 3), x_own (D, n_own, 3)) with the
    halo exchange inside shard_map.
    """
    n_own, n_halo, n_send = part.n_own, part.n_halo, part.n_send
    K = part.local_nbr.shape[2]
    D = part.n_dev

    pj = lambda a: jnp.asarray(a)
    tables = dict(
        local_nbr=pj(part.local_nbr), local_mask=pj(part.local_mask),
        send_left=pj(part.send_left), send_right=pj(part.send_right),
        recv_left_at=pj(part.recv_left_at), recv_right_at=pj(part.recv_right_at),
        own_mask=pj(part.own_mask),
    )

    def _local(vals, x_own, t_nbr, t_mask, s_l, s_r, r_l, r_r, o_m):
        # shard_map body: shards keep a leading local device dim of size 1.
        xo = x_own[0]                  # (n_own, 3)
        buf_r = xo[s_r[0]]             # data for my RIGHT neighbor, (n_send, 3)
        buf_l = xo[s_l[0]]             # data for my LEFT neighbor
        perm_r = [(i, i + 1) for i in range(D - 1)]
        perm_l = [(i + 1, i) for i in range(D - 1)]
        got_from_left = jax.lax.ppermute(buf_r, axis, perm_r)
        got_from_right = jax.lax.ppermute(buf_l, axis, perm_l)
        xl = jnp.zeros((n_own + n_halo + n_send, 3), x_own.dtype)
        xl = xl.at[:n_own].set(xo)
        # land the halos; padded recv slots (0) are redirected to a scratch
        # tail slot that no stencil references
        xl = xl.at[jnp.where(r_l[0] > 0, r_l[0], n_own + n_halo)].set(got_from_left)
        xl = xl.at[jnp.where(r_r[0] > 0, r_r[0], n_own + n_halo)].set(got_from_right)
        vm = vals[0] * t_mask[0][..., None, None]
        xg = xl[t_nbr[0]]
        y = jnp.einsum("nkji,nki->nj", vm, xg,
                       precision=jax.lax.Precision.HIGHEST)
        return (y * o_m[0][:, None])[None]

    spec_v = P(axis, None, None, None, None)
    spec_x = P(axis, None, None)
    spec_t3 = P(axis, None, None)
    spec_t2 = P(axis, None)

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(spec_v, spec_x, spec_t3, spec_t3, spec_t2, spec_t2,
                  spec_t2, spec_t2, spec_t2),
        out_specs=spec_x,
    )

    def matvec(values_local, x_own):
        return fn(values_local, x_own, tables["local_nbr"],
                  tables["local_mask"], tables["send_left"],
                  tables["send_right"], tables["recv_left_at"],
                  tables["recv_right_at"], tables["own_mask"])

    def scatter(x_global):
        """(N, 3) -> (D, n_own, 3) owned shards."""
        return x_global[part.own_global]

    def gather(x_shards):
        """(D, n_own, 3) -> (N, 3)."""
        n = int(part.own_mask.sum())
        out = jnp.zeros((n, 3), x_shards.dtype)
        idx = jnp.asarray(part.own_global.reshape(-1))
        m = jnp.asarray(part.own_mask.reshape(-1))
        flat = x_shards.reshape(-1, 3)
        return out.at[idx].add(flat * m[:, None]) / jnp.maximum(
            jnp.zeros((n,)).at[idx].add(m), 1.0)[:, None]

    return matvec, scatter, gather


def dist_cg(matvec, b_shards, mesh: Mesh, axis: str = "sp",
            iterations: int = 50, tol: float = 1e-5):
    """CG over distributed shards; dot products psum'ed inside shard_map is
    unnecessary — b_shards are fully addressable here, so plain jnp sums
    (which XLA turns into the right collectives under jit) suffice.

    tol is RELATIVE: stop when ||r|| <= tol * ||b|| (matching every other CG
    in the repo, solvers/cg.py)."""
    x = jnp.zeros_like(b_shards)
    r = b_shards
    p = r
    rs = jnp.sum(r * r)
    stop = (tol * tol) * rs

    def cond(c):
        x, r, p, rs, k = c
        return (k < iterations) & (rs > stop) & jnp.isfinite(rs)

    def body(c):
        x, r, p, rs, k = c
        ap = matvec_p(p)
        alpha = rs / jnp.sum(p * ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, k + 1)

    matvec_p = matvec
    x, r, p, rs, k = jax.lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    return x
