"""Profiling / tracing helpers (SURVEY.md section 5: the reference has none).

Wraps jax.profiler traces and provides honest wall timers for the axon TPU
tunnel, where jax.block_until_ready returns without waiting — a host readback
is the only reliable sync (see .claude/skills/verify/SKILL.md gotchas).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


def enable_compile_cache(cache_dir: str = "/tmp/jax_cache",
                         min_compile_secs: float = 1.0):
    """Persistent XLA compile cache: repeat runs of the same program skip
    the slow TPU compile (first compile of a big while_loop program takes
    minutes through the axon tunnel). Safe no-op where unsupported —
    single source for every driver (bench.py, scripts/, examples/)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass


def force_sync(tree):
    """Synchronize by reading one element of every leaf back to the host."""
    import jax
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf).ravel()[:1]


@contextlib.contextmanager
def wall_timer(label: str = "", sink: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.setdefault(label, []).append(dt)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context; open with xprof/tensorboard."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call with forced host sync (tunnel-safe)."""
    for _ in range(warmup):
        force_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
