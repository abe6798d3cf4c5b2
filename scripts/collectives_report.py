"""Collective counts/bytes from compiled HLO for the distributed paths.

VERDICT r3 next #5: the multi-chip story was correctness-checked but had no
scaling evidence. This script compiles the distributed programs on an
N-virtual-device CPU mesh, walks the post-SPMD-partitioning HLO, and counts
the communication instructions (all-reduce / all-gather / collective-permute
/ reduce-scatter / all-to-all) with their per-execution payload bytes — the
ICI traffic model of each path. Instructions inside while-loop bodies
execute once per loop iteration; counts here are static HLO instructions,
with the loop-resident ones flagged (their payload recurs every Newton/CG
iteration).

Run twice (e.g. --devices 4 and 8) to see how the traffic scales with the
mesh; writes/updates a markdown table in COLLECTIVES.md.

Usage: python scripts/collectives_report.py --devices 8 [--out COLLECTIVES.md]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1}

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|"
                       r"pred)\[([0-9,]*)\]")


def _shape_bytes(tok: str) -> int:
    """Total payload bytes of an HLO result shape token (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(tok):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def count_collectives(hlo_text: str):
    """{kind: (count, total_bytes, loop_count)} over one HLO module dump.
    loop_count = instructions inside while-loop body/condition computations
    (they execute once per loop iteration, not once per call)."""
    out = {}
    in_loop_computation = False
    for line in hlo_text.splitlines():
        s = line.strip()
        # computation headers: while bodies are named %while_body... / region
        # names vary by version; detect via the canonical suffixes jax emits
        if s.startswith(("%", "ENTRY")) and s.endswith("{"):
            name = s.split(" ")[0].lstrip("%")
            in_loop_computation = any(
                t in name for t in ("while", "body", "cond", "region"))
        for kind in COLLECTIVES:
            # match the op use, not e.g. metadata: "= <shape> all-reduce("
            m = re.search(r"= ([^=]*?) " + kind + r"(?:-start)?\(", s)
            if m:
                cnt, byt, lcnt = out.get(kind, (0, 0, 0))
                out[kind] = (cnt + 1, byt + _shape_bytes(m.group(1)),
                             lcnt + (1 if in_loop_computation else 0))
                break
    return out


def hlo_of(jitted, *args):
    return jitted.lower(*args).compile().as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="markdown file to append the table to")
    ap.add_argument("--beam", default="4,4,33")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(args.devices, 2))
    import jax.numpy as jnp
    import numpy as np

    from fem_simulation_tpu import mesh as meshlib
    from fem_simulation_tpu.sim.lattice import LatticeScene
    from fem_simulation_tpu.sim.lattice_mg import quasistatic_to_tol_mg
    from fem_simulation_tpu.parallel.lattice_halo import (LatticeSlabs,
                                                          make_dist_step)
    from fem_simulation_tpu.parallel.lattice_mg_dist import (
        DistLatticeMG, make_dist_mg_step)

    D = args.devices
    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.1)
    scene = LatticeScene(m)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:D]), ("sp",))

    rows = []

    def report(name, text, note=""):
        stats = count_collectives(text)
        total_b = sum(v[1] for v in stats.values())
        print(f"\n== {name} (D={D}) — {total_b / 1e3:.1f} kB static total")
        for kind, (cnt, byt, lcnt) in sorted(stats.items()):
            print(f"  {kind:20s} n={cnt:3d} (in-loop {lcnt:3d}) "
                  f"bytes={byt:,}")
            rows.append((name, D, kind, cnt, lcnt, byt))
        if not stats:
            print("  (no collectives)")
            rows.append((name, D, "-", 0, 0, 0))
        if note:
            print(f"  note: {note}")

    # 1. z-slab halo dynamic step (explicit ppermute + local Pallas/XLA)
    slabs = LatticeSlabs(scene, D)
    step, blockify = make_dist_step(slabs, mesh, tol=1e-4)
    xb = blockify(scene.x0)
    vb = jnp.zeros_like(xb)
    report("halo dynamic step", hlo_of(jax.jit(step), xb, vb),
           "ppermutes are the 4-plane/matvec 1-ring minimum; "
           "all-reduces are the CG dot products")

    # 2. GSPMD distributed GMG quasi-static solve
    mg = DistLatticeMG(scene, mesh, n_levels=2, dt=None)
    solve = jax.jit(lambda xx: quasistatic_to_tol_mg(scene, mg, xx,
                                                     tol=1e-4, max_newton=50))
    report("GSPMD GMG quasistatic", hlo_of(solve, scene.x0),
           "partitioner-inserted halos on sharded levels; coarse level "
           "replicated (agglomeration)")

    # 3. GSPMD distributed GMG dynamic step
    stepf, place = make_dist_mg_step(scene, mesh, n_levels=2)
    st0 = place(scene.init_state())
    report("GSPMD GMG dynamic step", hlo_of(stepf, st0))

    if args.out:
        hdr_needed = not os.path.exists(args.out)
        with open(args.out, "a") as f:
            if hdr_needed:
                f.write("# Collective traffic of the distributed paths\n\n"
                        "Static HLO collective instructions per compiled "
                        "program (CPU mesh, SPMD-partitioned; `in-loop` ops "
                        "execute once per Newton/CG iteration). Generated "
                        "by `scripts/collectives_report.py`.\n\n"
                        "| program | devices | collective | count | in-loop "
                        "| payload bytes |\n|---|---|---|---|---|---|\n")
            for r in rows:
                f.write("| {} | {} | {} | {} | {} | {:,} |\n".format(*r))


if __name__ == "__main__":
    main()
