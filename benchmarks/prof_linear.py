#!/usr/bin/env python3
"""Port of the reference's prof-linear harness
(/root/reference/prof-linear.py): time QP layer forward/backward vs a plain
dense (Linear) layer forward/backward at nBatch=128, nz = nineq in
{10, 50, 100, 500}, neq=0.

Prints the same style of Markdown table. Timing uses dependent-chain
repetitions inside one jit with a tiny readback (see benchmarks/microbench.py
for why: the axon TPU tunnel neither syncs on block_until_ready nor reads
back large arrays quickly).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import qpth_tpu

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def sync(x):
    np.asarray(x)


def chain_time(f, x0, iters, reps=3):
    @jax.jit
    def loop(x):
        out = lax.fori_loop(0, iters, lambda i, c: f(c), x0)
        return out.reshape(-1)[:8].sum(keepdims=True)

    sync(loop(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(loop(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def prof_instance(nz, n_batch, dtype=jnp.float32, iters=5):
    npr = np.random.RandomState(0)
    L = npr.rand(n_batch, nz, nz)
    Q = np.matmul(L, L.transpose(0, 2, 1)) + 1e-3 * np.eye(nz)
    G = npr.randn(n_batch, nz, nz)
    z0 = npr.randn(n_batch, nz)
    s0 = npr.rand(n_batch, nz)
    p = npr.randn(n_batch, nz)
    h = np.einsum("bmn,bn->bm", G, z0) + s0
    Qj, pj, Gj, hj = [jnp.asarray(v, dtype) for v in (Q, p, G, h)]
    W = jnp.asarray(npr.randn(nz, nz) / np.sqrt(nz), dtype)
    x_in = pj

    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)

    lin_f = chain_time(lambda x: jnp.tanh(x @ W), x_in, iters * 4)
    lin_b = chain_time(
        lambda x: jax.grad(lambda xx: jnp.sum(jnp.tanh(xx @ W) ** 2))(x),
        x_in, iters * 4)

    qp_f = chain_time(
        lambda x: qpth_tpu.solve_qp(Qj, x, Gj, hj, config=cfg) * 1e-3 + x_in,
        x_in, iters)
    qp_b = chain_time(
        lambda x: jax.grad(lambda xx: jnp.sum(
            qpth_tpu.solve_qp(Qj, xx, Gj, hj, config=cfg) ** 2))(x) * 1e-3
        + x_in,
        x_in, iters)
    return lin_f, lin_b, qp_f, qp_b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[10, 50, 100, 500])
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    print("| nz | nBatch | Linear fwd | Linear bwd | QP fwd | QP bwd |")
    print("|----|--------|-----------|-----------|--------|--------|")
    for nz in args.sizes:
        lf, lb, qf, qb = prof_instance(nz, args.batch)
        print(f"| {nz:4d} | {args.batch:5d} | {lf*1e3:9.3f} ms "
              f"| {lb*1e3:9.3f} ms | {qf*1e3:8.2f} ms | {qb*1e3:8.2f} ms |",
              flush=True)


if __name__ == "__main__":
    main()
