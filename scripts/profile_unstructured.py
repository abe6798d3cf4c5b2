"""Profile the unstructured (general-mesh) path primitives on the real TPU.

VERDICT r3 missing #4: the unstructured block-Jacobi PCG step is 156 ms at
19k verts vs 0.245 ms on the lattice (~600x). Before prototyping a faster
SpMV (one-hot MXU gathers / per-color batching / sorted-segment scatter),
measure which primitive actually burns the time: the force's hex gather +
scatter-add, the linearized HVP, the Hessian diag, or the assembled
block-ELL SpMV's (N, 27) vertex gather.

Usage: python scripts/profile_unstructured.py [--beam 16,16,64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", default="16,16,64")
    args = ap.parse_args()

    from fem_simulation_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from fem_simulation_tpu import mesh as meshlib
    from fem_simulation_tpu.config import SolverConfig
    from fem_simulation_tpu.sim import Scene, dynamic
    from fem_simulation_tpu.sim import quasistatic as qs
    from fem_simulation_tpu.ops import elastic, ell

    shape = tuple(int(s) for s in args.beam.split(","))
    m = meshlib.beam(*shape, dx=0.05)
    scene = Scene(m, solver=SolverConfig(n_levels=1))
    p0 = scene.params["levels"][0]
    mat = scene.material
    N = m.n_verts
    print(f"verts={N} hexes={m.n_hexes}")

    x = scene.x0
    K = 50

    def chain(fn, v0):
        """Scan fn K times with a data dependency so XLA can't elide it."""
        @jax.jit
        def run(v):
            def body(c, _):
                o = fn(c)
                return o / jnp.maximum(jnp.sqrt(jnp.sum(o * o)), 1e-30), None
            out, _ = jax.lax.scan(body, v, None, length=K)
            return out
        return run

    # 1. force (hex gather + per-hex chain + scatter-add)
    force = lambda xx: elastic.force(xx, p0["hexes"], p0["det"], p0["g"],
                                     mat.lame_mu, mat.lame_la, N)
    t = timeit(chain(force, x), x)
    print(f"force eval:            {t / K * 1e3:.3f} ms")

    # 2. HVP via jax.linearize (the matfree CG matvec)
    @jax.jit
    def run_hvp(xx, v):
        _, jvp = jax.linearize(force, xx)

        def body(c, _):
            o = jvp(c)
            return o / jnp.maximum(jnp.sqrt(jnp.sum(o * o)), 1e-30), None
        out, _ = jax.lax.scan(body, v, None, length=K)
        return out

    v0 = jnp.ones_like(x)
    t = timeit(run_hvp, x, v0)
    print(f"HVP (linearized):      {t / K * 1e3:.3f} ms")

    # 3. hessian diag
    hd = lambda xx: elastic.hessian_diag(xx, p0["hexes"], p0["det"], p0["g"],
                                         mat.lame_mu, mat.lame_la, N)

    @jax.jit
    def run_hd(xx):
        def body(c, _):
            d = hd(xx + c)
            return c + 1e-30 * jnp.sum(d), None
        out, _ = jax.lax.scan(body, jnp.zeros_like(xx), None, length=10)
        return out
    t = timeit(run_hd, x)
    print(f"hessian_diag:          {t / 10 * 1e3:.3f} ms")

    # 4. assembly (values tensor) — one-off per Newton on the cg path
    @jax.jit
    def run_asm(xx):
        def body(c, _):
            vals = qs.assemble_elastic(scene, scene.params, 0, xx + c)
            return c + 1e-30 * jnp.sum(vals), None
        out, _ = jax.lax.scan(body, jnp.zeros_like(xx), None, length=10)
        return out
    t = timeit(run_asm, x)
    print(f"assemble_elastic:      {t / 10 * 1e3:.3f} ms")

    # 5. assembled block-ELL SpMV ((N, 27) vertex gather + einsum)
    vals = jax.jit(lambda xx: qs.assemble_elastic(scene, scene.params, 0,
                                                  xx))(x)
    op = scene.make_op(0, scene.params)
    full = vals * op.mask[..., None, None]
    spmv = lambda v: ell.spmv(full, op.nbr, op.mask, v)
    t = timeit(chain(spmv, v0), v0)
    print(f"ELL SpMV:              {t / K * 1e3:.3f} ms")

    # 6. the gather alone (x[nbr] * mask)
    gather = lambda v: jnp.sum(v[op.nbr] * op.mask[..., None], axis=1)
    t = timeit(chain(gather, v0), v0)
    print(f"  gather part alone:   {t / K * 1e3:.3f} ms")

    # 7. scatter-add alone (the force's .at[].add)
    contrib = jnp.ones((m.n_hexes, 8, 3), jnp.float32)

    def scat(v):
        out = jnp.zeros((N, 3), v.dtype)
        return out.at[p0["hexes"].reshape(-1)].add(
            (contrib * v[p0["hexes"]]).reshape(-1, 3))
    t = timeit(chain(scat, v0), v0)
    print(f"  gather+scatter-add:  {t / K * 1e3:.3f} ms")

    # 7b. scatter-free force (vertex_contrib_map gather)
    cidx, cmask = elastic.vertex_contrib_map(np.asarray(p0["hexes"]), N)
    cidx, cmask = jnp.asarray(cidx), jnp.asarray(cmask)
    force_g = lambda xx: elastic.force_gather(
        xx, p0["hexes"], p0["det"], p0["g"], mat.lame_mu, mat.lame_la,
        cidx, cmask, N)
    t = timeit(chain(force_g, x), x)
    print(f"force (gather asm):    {t / K * 1e3:.3f} ms")

    # 7c. closed-form HVP + gather assembly (no jax.linearize, no scatter)
    @jax.jit
    def run_hvp_g(xx, v):
        def body(c, _):
            o = elastic.hvp_gather(xx, c, p0["hexes"], p0["det"], p0["g"],
                                   mat.lame_mu, mat.lame_la, cidx, cmask, N)
            return o / jnp.maximum(jnp.sqrt(jnp.sum(o * o)), 1e-30), None
        out, _ = jax.lax.scan(body, v, None, length=K)
        return out
    t = timeit(run_hvp_g, x, v0)
    print(f"HVP (closed+gather):   {t / K * 1e3:.3f} ms")

    # 8. one full matfree dynamic step (the 156 ms row)
    st0 = dynamic.init_state(scene)

    @jax.jit
    def step(p, s):
        return dynamic.step_to_tol(scene, p, s, tol=1e-4, max_newton=20,
                                   use_multigrid=False, matrix_free=True)
    t = timeit(step, scene.params, st0)
    print(f"matfree step_to_tol:   {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
