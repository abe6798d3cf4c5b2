"""Batched multi-scene throughput: the dp (data-parallel) axis in action.

Physics of independent scenes never communicates, so a batch of B scenes
vmapped into one program fills the chip far better than one small scene —
the production-serving shape (many episodes / many objects at once). On a
multi-chip mesh the same code shards B over 'dp' (parallel/dist.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", default="8,8,24")
    ap.add_argument("--dx", type=float, default=0.05)
    ap.add_argument("--frames", type=int, default=50)
    args = ap.parse_args()

    from fem_simulation_tpu import mesh as meshlib
    from fem_simulation_tpu.config import SolverConfig
    from fem_simulation_tpu.sim import Scene, dynamic

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=args.dx)
    scene = Scene(m, solver=SolverConfig(n_levels=2))
    st = dynamic.init_state(scene)
    B = args.batch
    batched = dynamic.DynState(
        x=jnp.broadcast_to(st.x, (B,) + st.x.shape),
        v=jnp.zeros((B,) + st.v.shape, st.v.dtype),
        drag_mask=jnp.zeros((B,) + st.drag_mask.shape, st.drag_mask.dtype),
        drag_pos=jnp.broadcast_to(st.drag_pos, (B,) + st.drag_pos.shape))

    def one(p, s):
        s2, k, fn = dynamic.step_to_tol(scene, p, s, tol=1e-4,
                                        matrix_free=True)
        return s2, fn

    vstep = jax.vmap(one, in_axes=(None, 0))

    def make_run(n):
        @jax.jit
        def run(p, s):
            def body(s, _):
                s2, fn = vstep(p, s)
                return s2, fn
            return jax.lax.scan(body, s, None, length=n)
        return run

    n_small = max(args.frames // 5, 2)
    rs, rb = make_run(n_small), make_run(args.frames)

    def timed(run):
        out = run(scene.params, batched)
        _ = np.asarray(out[1])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            st2, fns = run(scene.params, batched)
            fns = np.asarray(fns)
            best = min(best, time.perf_counter() - t0)
        return best, fns

    t_small, _ = timed(rs)
    t_big, fns = timed(rb)
    assert fns.max() <= 1.01e-4
    ms = (t_big - t_small) / (args.frames - n_small) * 1000.0
    print(f"batch={B}: {ms:.2f} ms per batched frame "
          f"-> {ms / B:.3f} ms per scene-step "
          f"({B * 1000.0 / ms:.0f} scene-steps/sec)")


if __name__ == "__main__":
    main()
