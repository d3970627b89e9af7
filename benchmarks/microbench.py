#!/usr/bin/env python3
"""Microbenchmarks of the solver's hot ops on the current backend.

The axon TPU tunnel does not synchronize on ``block_until_ready`` and has
pathological single-element readback, so every timing here chains ``iters``
dependent applications of the op inside ONE jitted program and syncs by
reading back a small full array. Reported time = (chained - baseline)/iters.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def sync(x):
    np.asarray(x)


_overhead = [0.0]


def bench_chain(name, f, x0, iters=20, reps=3, is_baseline=False):
    """Time `iters` dependent applications of f inside one jit.

    The result is reduced to a tiny array INSIDE the jit (readback through
    the tunnel is ~30 MB/s, and slicing outside jit compiles a new program),
    and the measured baseline (noop chain) overhead is subtracted.
    """

    @jax.jit
    def loop(x):
        def body(i, x):
            return f(x)
        out = lax.fori_loop(0, iters, body, x)
        return out.reshape(-1)[:128].sum(keepdims=True)

    sync(loop(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(loop(x0))
        ts.append(time.perf_counter() - t0)
    total = min(ts)
    if is_baseline:
        _overhead[0] = total
        per = total / iters
    else:
        per = max(total - _overhead[0], 0.0) / iters
    print(f"{name:44s} {per*1e3:9.3f} ms/iter   (total {total*1e3:.1f} ms)")
    return per


def main(B=4096, n=100):
    print(f"backend={jax.default_backend()}  B={B} n={n}")
    key = jax.random.PRNGKey(0)
    L0 = jax.random.uniform(key, (B, n, n), jnp.float32)
    A = jnp.matmul(L0, jnp.swapaxes(L0, -1, -2),
                   precision=HIGHEST) + 10 * jnp.eye(n)
    A = jax.block_until_ready(A)

    # Baseline: trivial op to measure chain overhead.
    bench_chain("noop (x*1.000001)", lambda x: x * 1.000001, A, is_baseline=True)

    bench_chain("cholesky", lambda x: jnp.linalg.cholesky(
        x + 10 * jnp.eye(n)), A)

    L = jax.jit(jnp.linalg.cholesky)(A)
    L = jax.block_until_ready(L)

    def trsm_vec(x):
        v = x[..., 0]
        y = lax.linalg.triangular_solve(L, v[..., None], left_side=True,
                                        lower=True)
        return x + y * 1e-9

    bench_chain("trsm vec rhs (B,n,1)", trsm_vec, A)

    def trsm_mat(x):
        y = lax.linalg.triangular_solve(L, x, left_side=True, lower=True)
        return y + 1e-6

    bench_chain("trsm mat rhs (B,n,n)", trsm_mat, A)

    def matvec(x):
        v = x[..., 0]
        y = jnp.matmul(A, v[..., None], precision=HIGHEST)[..., 0]
        return x + y[..., None] * 1e-9

    bench_chain("batched matvec", matvec, A)

    def matmat(x):
        return jnp.matmul(A, x, precision=HIGHEST) * 1e-3

    bench_chain("batched matmul (B,n,n)@(B,n,n)", matmat, A)

    def elementwise(x):
        return x * 1.000001 + 1e-9

    bench_chain("elementwise FMA pass", elementwise, A)

    bw = B * n * n * 4 * 3
    print(f"(one (B,n,n) f32 array = {B*n*n*4/1e6:.0f} MB; "
          f"r+w pass at 800GB/s ≈ {B*n*n*4*2/800e9*1e3:.2f} ms)")


if __name__ == "__main__":
    import sys

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(B, n)
