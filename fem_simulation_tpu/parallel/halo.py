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
    halo_global: np.ndarray = None  # (D, n_halo) global vertex id, -1 = pad


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
    halo_global = np.full((n_dev, n_halo), -1, np.int64)
    for d in range(n_dev):
        halo_global[d, :len(halo_lists[d])] = halo_lists[d]
    return SlabPartition(
        n_dev=n_dev, n_own=n_own, n_halo=n_halo,
        own_global=own_global, own_mask=own_mask,
        local_nbr=local_nbr, local_mask=local_mask,
        send_left=send_left, send_right=send_right,
        recv_left_at=recv_left_at, recv_right_at=recv_right_at,
        n_send=n_send, halo_global=halo_global)


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


# ---------------------------------------------------------------------------
# Full distributed Newton on the unstructured block-ELL path
# ---------------------------------------------------------------------------

def partition_elements(lvl, part: SlabPartition):
    """Overlap-element tables for per-device FEM assembly.

    Each device gets every hex touching >= 1 of its owned vertices, with
    corner ids rewritten to LOCAL row coordinates [own ++ halo ++ scratch].
    Boundary hexes are duplicated on both neighboring devices — recompute
    instead of a second post-scatter fold exchange: because every hex that
    contributes to an owned row is local (a hex corner is always within the
    owned row's one-ring), force / Hessian-diagonal / HVP values on owned
    rows are COMPLETE with only the x/p halo refresh, no result collective.

    Returns (hex_local (D,Hl,8) int32, hex_mask (D,Hl) f32,
    hex_global (D,Hl) int64); padded hexes point at the scratch row.
    """
    assert part.halo_global is not None, "need partition_slabs' halo tables"
    D, n_own = part.n_dev, part.n_own
    hexes = np.asarray(lvl.hexes, np.int64)
    owner = np.full(lvl.n_verts, -1, np.int64)
    for d in range(D):
        real = part.own_mask[d] > 0
        owner[part.own_global[d][real]] = d

    hex_dev = [np.nonzero((owner[hexes] == d).any(axis=1))[0]
               for d in range(D)]
    n_loc = max(len(h) for h in hex_dev)
    scratch = n_own + part.n_halo
    hex_local = np.full((D, n_loc, 8), scratch, np.int32)
    hex_mask = np.zeros((D, n_loc), np.float32)
    hex_global = np.zeros((D, n_loc), np.int64)
    for d in range(D):
        g2l = {int(g): i for i, g in enumerate(part.own_global[d])
               if part.own_mask[d, i] > 0}
        for i, g in enumerate(part.halo_global[d]):
            if g >= 0:
                g2l[int(g)] = n_own + i
        hs = hex_dev[d]
        hex_global[d, :len(hs)] = hs
        hex_mask[d, :len(hs)] = 1.0
        for j, h in enumerate(hs):
            hex_local[d, j] = [g2l[int(v)] for v in hexes[h]]
    return hex_local, hex_mask, hex_global


def slab_scatter(part: SlabPartition, x_global):
    """(N, ...) -> (D, n_own, ...) owned shards (pad rows repeat data; they
    are masked out of every product by own_mask)."""
    return jnp.asarray(np.asarray(x_global)[part.own_global])


def slab_gather(part: SlabPartition, x_shards, n_verts: int):
    """(D, n_own, ...) -> (N, ...) from owned rows."""
    flat = np.asarray(x_shards).reshape(part.n_dev * part.n_own, -1)
    idx = part.own_global.reshape(-1)
    m = part.own_mask.reshape(-1) > 0
    out = np.zeros((n_verts, flat.shape[1]), flat.dtype)
    out[idx[m]] = flat[m]
    return out.reshape((n_verts,) + np.asarray(x_shards).shape[2:])


def make_dist_newton_step(scene, part: SlabPartition, mesh: Mesh,
                          axis: str = "sp", dt: float = 0.033,
                          damping: float = 0.9995, tol: float = 1e-4,
                          max_newton: int = 20, cg_iterations: int = 60,
                          cg_tol: float = 1e-2):
    """FULL distributed implicit-Euler Newton step on the unstructured
    block-ELL path (the general-mesh twin of lattice_halo.make_dist_step).

    step(x_shards, v_shards) -> (x', v', newton_iters (D,), f_inf (D,)):
    predictor + inexact Newton with block-Jacobi PCG, the whole solve inside
    ONE shard_map — halo refresh is 2 ppermutes per force/HVP evaluation,
    dot products are `psum` and the residual norm a `pmax` (replacing the
    reference's atomic-reduction kernels, cublas.py:39-54). Matrix-free:
    the matvec is jax.linearize of the local element force (re-linearized
    once per Newton iteration), the preconditioner the exact local
    elastic + control/mass 3x3 block diagonal — identical quality to the
    single-chip path (sim/dynamic.py step_to_tol matrix_free=True).
    """
    from ..ops import elastic, ell

    lvl = scene.hier.levels[0]
    p0 = scene.params["levels"][0]
    mat = scene.material
    inv_dt = 1.0 / dt
    D, n_own = part.n_dev, part.n_own
    R = n_own + part.n_halo + 1              # + scratch row

    hex_local, hex_mask, hex_global = partition_elements(lvl, part)
    det_all = np.asarray(p0["det"])
    g_all = np.asarray(p0["g"])

    t = dict(
        hexes=jnp.asarray(hex_local),
        det=jnp.asarray(det_all[hex_global] * hex_mask[..., None]),
        g=jnp.asarray(g_all[hex_global]),
        mass=slab_scatter(part, p0["mass"]) * jnp.asarray(part.own_mask),
        pin=slab_scatter(part, p0["pin_mask"]) * jnp.asarray(part.own_mask),
        pin_pos=slab_scatter(part, p0["pin_pos"]),
        own_mask=jnp.asarray(part.own_mask),
        send_left=jnp.asarray(part.send_left),
        send_right=jnp.asarray(part.send_right),
        recv_left_at=jnp.asarray(part.recv_left_at),
        recv_right_at=jnp.asarray(part.recv_right_at),
    )
    perm_r = [(i, i + 1) for i in range(D - 1)]
    perm_l = [(i + 1, i) for i in range(D - 1)]
    eye = jnp.eye(3, dtype=jnp.float32)
    from ..solvers import cg as cgmod

    def _step_local(xb, vb, tt):
        tt = {k: v[0] for k, v in tt.items()}
        xo, vo = xb[0], vb[0]
        o_m = tt["own_mask"][:, None]
        ctrl = (mat.control_mag * tt["pin"]
                + tt["mass"] * inv_dt * inv_dt
                + (1.0 - tt["own_mask"]))

        def refresh(y):
            """(n_own, 3) owned -> (R, 3) local rows with halos landed."""
            buf_r = y[tt["send_right"]]
            buf_l = y[tt["send_left"]]
            got_l = jax.lax.ppermute(buf_r, axis, perm_r)
            got_r = jax.lax.ppermute(buf_l, axis, perm_l)
            yl = jnp.zeros((R, 3), y.dtype).at[:n_own].set(y)
            rl, rr = tt["recv_left_at"], tt["recv_right_at"]
            yl = yl.at[jnp.where(rl > 0, rl, R - 1)].set(got_l)
            yl = yl.at[jnp.where(rr > 0, rr, R - 1)].set(got_r)
            return yl

        def el_force(yl):
            return elastic.force(yl, tt["hexes"], tt["det"], tt["g"],
                                 mat.lame_mu, mat.lame_la, R)[:n_own]

        def resid(y, y_tilde):
            f = el_force(refresh(y))
            f = f.at[:, 1].add(tt["mass"] * mat.gravity)
            f = f + mat.control_mag * tt["pin"][:, None] * (tt["pin_pos"] - y)
            f = f - (tt["mass"] * inv_dt * inv_dt)[:, None] * (y - y_tilde)
            return f * o_m

        def inf_norm(f):
            return jax.lax.pmax(jnp.max(jnp.abs(f)), axis)

        def dot(a, b):
            return jax.lax.psum(jnp.sum(a * b), axis)

        # predictor
        x_old = xo
        vo = vo * damping
        xo = xo + vo * dt
        x_tilde = xo

        def body(c):
            xx, k, _, fmin = c
            f = resid(xx, x_tilde)
            xl = refresh(xx)
            _, jvp = jax.linearize(el_force, xl)

            def matvec(p):
                hp = -jvp(refresh(p))
                return (hp + ctrl[:, None] * p) * o_m

            dblocks = (elastic.hessian_diag(
                xl, tt["hexes"], tt["det"], tt["g"],
                mat.lame_mu, mat.lame_la, R)[:n_own]
                + ctrl[:, None, None] * eye)
            minv = lambda r: ell.solve3x3(dblocks, r) * o_m

            z = minv(f)
            rz = dot(f, z)
            rr0 = dot(f, f)

            def cg_cond(cc):
                xs, r, p, z, rz, i = cc
                rr = dot(r, r)
                return ((i <= cg_iterations) & (rr > cg_tol * rr0)
                        & jnp.isfinite(rr))

            def cg_body(cc):
                xs, r, p, z, rz, i = cc
                ap = matvec(p)
                alpha = rz / jnp.maximum(dot(p, ap), 1e-30)
                xs = xs + alpha * p
                r = r - alpha * ap
                z = minv(r)
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (xs, r, p, z, rz_new, i + 1)

            dx = jax.lax.while_loop(
                cg_cond, cg_body,
                (jnp.zeros_like(f), f, z, z, rz, jnp.int32(1)))[0]
            xx = xx + dx * o_m
            fn = inf_norm(resid(xx, x_tilde))
            return (xx, k + 1, fn, jnp.minimum(fmin, fn))

        fn0 = inf_norm(resid(xo, x_tilde))
        xo, k, fn, fmin = jax.lax.while_loop(
            cgmod.newton_cond(tol, max_newton), body,
            (xo, jnp.int32(0), fn0, fn0))
        vo = (xo - x_old) * inv_dt
        return (xo[None], vo[None], k[None],
                cgmod.newton_exit_norm(fn, fmin)[None])

    spec_x = P(axis, None, None)
    spec_t = {k: P(axis, *(None,) * (np.asarray(v).ndim - 1))
              for k, v in t.items()}
    fn = shard_map(_step_local, mesh=mesh,
                   in_specs=(spec_x, spec_x, spec_t),
                   out_specs=(spec_x, spec_x, P(axis), P(axis)))

    def step(x_shards, v_shards):
        return fn(x_shards, v_shards, t)

    return step
