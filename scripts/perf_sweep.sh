#!/bin/bash
# Reproduce the README benchmark tables on the real TPU (single chip).
#
# Each bench.py invocation is one config; results print as one JSON line
# per run (see bench.py --help for the knobs). Compiles persist in
# /tmp/jax_cache, so a run killed mid-compile resumes on the next attempt —
# fresh OBJ-shaped programs take ~15+ min each through the remote-compile
# tunnel, which is why the OBJ dynamic rows use --amortized (one program)
# and the per-run timeout is generous.
#
# Usage: bash scripts/perf_sweep.sh [out.log]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/perf_sweep.log}"
ASSETS=/root/reference/assets/objs
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 2400 python bench.py "$@" 2>&1 | grep -v "WARNING\|experimental" | tee -a "$OUT"
}

# dynamic headline + scaling (slope timing: steady-state device throughput)
run
run --beam 16,16,64
run --beam 16,16,256
run --beam 16,16,512 --max-newton 40
# quasi-static: the multigrid-vs-single-level regime
run --quasistatic --solver lattice --beam 16,16,64 --frames 120
run --quasistatic --solver latmg --beam 16,16,256 --mg-levels 2 --mg-coarse-cg 8 --frames 120
run --beam 16,16,512 --quasistatic --solver latmg --mg-levels 2 --mg-coarse-cg 8 --frames 120
run --beam 16,16,512 --quasistatic --solver lattice --frames 120
# deep-bend cantilever: FMG start + adaptive continuation at the coarsest
run --beam 16,16,144 --pins zmin --quasistatic --load-steps auto --frames 40
run --beam 16,16,144 --pins zmin --quasistatic --load-steps auto --frames 40 \
    --fmg --mg-levels 3 --mg-coarse-cg 16
# scale rows (279k / 1.1M verts, single chip)
run --beam 32,32,256 --max-newton 40
run --beam 32,32,256 --quasistatic --solver latmg --mg-levels 4 --mg-coarse-cg 16 --frames 40
run --beam 32,32,1024 --max-newton 40 --frames 60
# reference assets (voxelized OBJs; the lattice auto-permutes the grid so
# the longest axis lands on the 128-lane dim — see ops/boxes.py)
if [ -d "$ASSETS" ]; then
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --frames 120
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --quasistatic --solver latmg --mg-levels 2 --mg-coarse-cg 8 --frames 120
  # tuned kitten MG: Eisenstat-Walker inner forcing + stronger coarse CG +
  # multi-box cover riding the V-cycle's fine matvecs (r4)
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --quasistatic --solver latmg --mg-levels 2 --mg-coarse-cg 32 --cg-forcing ew --frames 120
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --quasistatic --solver latmg --mg-levels 2 --mg-coarse-cg 32 --cg-forcing ew --box-threshold 0.6 --frames 120
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --quasistatic --solver lattice --frames 120
  run --mesh "$ASSETS/kitten.obj" --dx 0.02 --box-threshold 0.6 --amortized --frames 120
  run --mesh "$ASSETS/horse.obj" --dx 0.02 --amortized --frames 120
  run --mesh "$ASSETS/rocker.obj" --dx 0.02 --amortized --frames 120
fi
# mass-spring cloth (reference exp1/cloth_simulation 64x64 grid)
run --cloth 64
echo SWEEPDONE | tee -a "$OUT"
