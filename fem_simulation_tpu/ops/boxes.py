"""Box-cover decomposition of sparse voxel masks (the low-fill fast path).

The structured-lattice kernels (ops/stencil.py, ops/pallas_lattice.py)
compute over the dense bounding lattice, so their cost scales with bbox
volume, not cell count. Shapes that fill only a few percent of their bbox
(shells, thin plates, multi-part scenes) used to fall off a performance
cliff onto the unstructured block-ELL path, two orders of magnitude slower
per vertex (VERDICT r2 missing #4; the reference's BSR path is
fill-independent, /root/reference/exp1/quasi_simulation/sparse.py).

This module removes the cliff while keeping every hot op a dense stencil
kernel: cover the REAL cells with a small set of tight axis-aligned boxes
(greedy cost-driven bisection on the host at Scene build — static sparsity,
like every other index table in this framework), then evaluate each elastic
op box-by-box:

* boxes PARTITION the real cells, so per-vertex outputs (force, HVP, Hessian
  diagonal) are partial sums that ``.at[...].add`` together at shared box
  faces — the same partition-sum fold the x-chunking inside
  ops/pallas_lattice.py and the z-slab halo in parallel/lattice_halo.py use;
* each box is axis-PERMUTED before hitting the kernel so its longest extent
  lands on the TPU lane dimension (z is padded to 128 lanes, y to 8
  sublanes — a 50x50x2 plate would otherwise pad 64x in z). Grid-axis
  relabeling is exact for cubic cells: WORLD (channel) axes are relabeled
  together with the grid axes, so the kernel sees the similarity transform
  F -> P^T F P (an orthogonal change of frame), E -> P^T E P, and the StVK
  invariants tr(E), ||E||^2 are exactly preserved; output force/HVP
  channels are relabeled back (diagonal blocks on both tensor indices).
  The world axes MUST co-rotate: the kernels build F = I + sum u_i g_i^T
  from displacements (ops/stencil.py precision note), and a grid-only
  relabeling would turn the analytic identity into F = I + (Du)P which is
  NOT a transform of F (the old position-form kernels saw F -> F P and
  could leave channels alone).

Everything is resolved at trace time: static python loop over boxes, static
slices, static transposes. No gathers, no dynamic shapes.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class Box(NamedTuple):
    c0: tuple          # cell start (inclusive), 3 ints
    c1: tuple          # cell end (exclusive), 3 ints
    perm: tuple        # grid-axis permutation applied before the kernel


def _round_up(n, m):
    return -(-int(n) // m) * m


# TPU tiling: 8 sublanes x 128 lanes for f32 — the quantum the Pallas
# kernels actually allocate in. Tests pass a finer quantum to exercise the
# box machinery on small shapes where the 128-lane floor would otherwise
# (correctly) veto every split.
TILE = (1, 8, 128)


def _perm_cost(vext, quantum=TILE):
    """Padded f32 volume of a vertex grid under the tile quantum."""
    return (_round_up(vext[0], quantum[0])
            * _round_up(vext[1], quantum[1])
            * _round_up(vext[2], quantum[2]))


def best_perm(cell_ext, quantum=TILE):
    """Axis order minimizing the padded vertex volume of a box.

    Cost ties break toward the longest extent on lanes, then on sublanes
    (identity-first in itertools order can otherwise park the long axis on
    sublanes at equal padded volume — lanes are where the VPU vectorizes)."""
    vext = tuple(int(e) + 1 for e in cell_ext)
    best, best_key = (0, 1, 2), None
    for p in itertools.permutations((0, 1, 2)):
        c = _perm_cost((vext[p[0]], vext[p[1]], vext[p[2]]), quantum)
        key = (c, -vext[p[2]], -vext[p[1]])
        if best_key is None or key < best_key:
            best, best_key = p, key
    return best, best_key[0]


def _tight(cm, c0, c1):
    """Crop [c0, c1) to the bbox of its real cells; None if empty."""
    sub = cm[c0[0]:c1[0], c0[1]:c1[1], c0[2]:c1[2]]
    if not sub.any():
        return None
    lo, hi = [], []
    for d in range(3):
        axes = tuple(a for a in range(3) if a != d)
        line = sub.any(axis=axes)
        nz = np.nonzero(line)[0]
        lo.append(c0[d] + int(nz[0]))
        hi.append(c0[d] + int(nz[-1]) + 1)
    return tuple(lo), tuple(hi)


def _best_cut(cm, c0, c1, min_jump: float = 0.1):
    """(axis, position) of the sharpest fill-profile step inside [c0, c1),
    or None when every profile is flat (diffuse sparsity — no structural
    boundary to cut at). Empty planes (profile 0) are steps too, so
    disconnected components separate first."""
    sub = cm[c0[0]:c1[0], c0[1]:c1[1], c0[2]:c1[2]]
    best = None
    for d in range(3):
        if c1[d] - c0[d] < 2:
            continue
        axes = tuple(a for a in range(3) if a != d)
        prof = sub.mean(axis=axes)
        jumps = np.abs(np.diff(prof))
        i = int(np.argmax(jumps))
        if jumps[i] >= min_jump and (best is None or jumps[i] > best[0]):
            best = (float(jumps[i]), d, c0[d] + i + 1)
    if best is None:
        return None
    return best[1], best[2]


def build_box_cover(cell_mask, max_boxes: int = 24, min_fill: float = 0.75,
                    min_cells: int = 64, quantum=TILE):
    """Structural cover of the real cells by tight boxes.

    Cost-greedy splitting is myopic here — every single cut of a hollow
    shell is cost-neutral until BOTH opposing walls are separated — so
    cuts are chosen structurally instead: repeatedly take the worst-fill
    box and cut it at the sharpest step of its per-plane fill profiles
    (wall/void boundaries of shells, plates and multi-part scenes show up
    exactly there; cropping the children then drops the carved void).
    Boxes at ``min_fill``, below ``min_cells``, or with flat profiles
    (diffuse sparsity) stop splitting. Returns (boxes,
    total_padded_volume) under the tile ``quantum``; the CALLER decides
    whether the cover beats the single dense grid (LatticeScene engages it
    only below its cost threshold). Boxes partition the real cells:
    children of a cut are disjoint cell ranges and cropping never adds
    cells."""
    cm = np.asarray(cell_mask) > 0
    first = _tight(cm, (0, 0, 0), cm.shape)
    if first is None:
        return [], 0

    def cost(b):
        ext = tuple(b[1][d] - b[0][d] for d in range(3))
        return best_perm(ext, quantum)[1]

    def fill(b):
        c0, c1 = b
        sub = cm[c0[0]:c1[0], c0[1]:c1[1], c0[2]:c1[2]]
        return sub.mean()

    done, todo = [], [first]
    while todo and len(done) + len(todo) < max_boxes:
        todo.sort(key=fill)
        b = todo.pop(0)
        c0, c1 = b
        vol = int(np.prod([c1[d] - c0[d] for d in range(3)]))
        cut = None
        if fill(b) < min_fill and vol > min_cells:
            cut = _best_cut(cm, c0, c1)
        if cut is None:
            done.append(b)
            continue
        d, pos = cut
        a = _tight(cm, c0, tuple(pos if e == d else c1[e] for e in range(3)))
        bb = _tight(cm, tuple(pos if e == d else c0[e] for e in range(3)), c1)
        todo.extend(x for x in (a, bb) if x is not None)
    done.extend(todo)

    out = []
    for (c0, c1) in done:
        perm, _ = best_perm(tuple(c1[d] - c0[d] for d in range(3)), quantum)
        out.append(Box(c0=c0, c1=c1, perm=perm))
    return out, sum(cost((b.c0, b.c1)) for b in out)


def _inv(perm):
    inv = [0, 0, 0]
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)


def box_vertex_op(kernel, boxes, cell_mask, *vfields, out_trailing=(3,)):
    """Evaluate a per-grid vertex-output elastic op box-by-box.

    kernel(cm_sub, *vfield_subs) -> vertex-grid output with
    ``out_trailing`` channel dims; all arguments/outputs in lattice layout
    (X, Y, Z, ...). vfields are (X, Y, Z, C) vertex fields. Returns the
    full-grid partition sum (exact: each real cell is computed in exactly
    one box; shared box-face vertices accumulate)."""
    shape_v = vfields[0].shape[:3]
    out = jnp.zeros(shape_v + tuple(out_trailing), vfields[0].dtype)
    nt = len(out_trailing)
    for b in boxes:
        cs = tuple(slice(b.c0[d], b.c1[d]) for d in range(3))
        vs = tuple(slice(b.c0[d], b.c1[d] + 1) for d in range(3))
        tr = b.perm + (3,)
        inv = _inv(b.perm)
        cm_sub = jnp.transpose(cell_mask[cs], b.perm)
        # world axes co-rotate with the grid axes (see module docstring)
        subs = [jnp.transpose(f[vs], tr)[..., list(b.perm)] for f in vfields]
        o = kernel(cm_sub, *subs)
        for i, t in enumerate(out_trailing):
            if t == 3:      # relabel world tensor indices back
                o = jnp.take(o, jnp.asarray(inv), axis=3 + i)
        o = jnp.transpose(o, inv + tuple(3 + i for i in range(nt)))
        out = out.at[vs].add(o)
    return out


def box_scalar_op(kernel, boxes, cell_mask, *vfields):
    """Same as box_vertex_op for scalar-output ops (energy): sums boxes.
    The energy is invariant under the orthogonal frame relabeling, so the
    output needs no back-transform."""
    total = jnp.asarray(0.0, vfields[0].dtype)
    for b in boxes:
        cs = tuple(slice(b.c0[d], b.c1[d]) for d in range(3))
        vs = tuple(slice(b.c0[d], b.c1[d] + 1) for d in range(3))
        tr = b.perm + (3,)
        cm_sub = jnp.transpose(cell_mask[cs], b.perm)
        subs = [jnp.transpose(f[vs], tr)[..., list(b.perm)] for f in vfields]
        total = total + kernel(cm_sub, *subs)
    return total
