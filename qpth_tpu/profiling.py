"""Profiling utilities.

The reference's only observability is two wall-clock harnesses
(prof-linear.py:96-123, prof-gurobi.py:106-118). Here:

* :func:`trace` — context manager around ``jax.profiler.trace``; writes an
  XPlane/Perfetto trace viewable in TensorBoard or ui.perfetto.dev.
* :func:`solve_timings` — coarse wall-clock split of one solve
  (prefactor+prepare vs IPM loop) using chained timing that is robust to
  runtimes which memoize repeated dispatches (see benchmarks/microbench.py).

SolveStats (returned by every solve) carries the jit-friendly counters:
iterations, per-lane best residuals, convergence mask.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qpth_tpu_trace"):
    """Profile a block: ``with qpth_tpu.profiling.trace(): solve(...)``.
    View with TensorBoard's profile plugin or perfetto."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def solve_timings(solve_fn, *args, trials: int = 3):
    """Wall-time a jitted solve callable with compile excluded: returns
    (compile_s, best_run_s). ``solve_fn`` must be jit-compatible."""
    f = jax.jit(solve_fn)
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    runs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        runs.append(time.perf_counter() - t0)
    return compile_s, min(runs)
