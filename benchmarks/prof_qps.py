#!/usr/bin/env python3
"""Port of the reference's prof-gurobi harness
(/root/reference/prof-gurobi.py): batched PDIPM wall time at nz=100,
nineq=100, neq=0 over a sweep of batch sizes, plus solution agreement
against the float64 CPU oracle (the reference quotes 1e-4..1e-5 agreement
vs Gurobi, prof-gurobi.py:120-122).
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


def make(n_batch, nz, nineq, seed=0):
    npr = np.random.RandomState(seed)
    L = npr.rand(n_batch, nz, nz)
    Q = np.matmul(L, L.transpose(0, 2, 1)) + 1e-3 * np.eye(nz)
    G = npr.randn(n_batch, nineq, nz)
    z0 = npr.randn(n_batch, nz)
    s0 = npr.rand(n_batch, nineq)
    p = npr.randn(n_batch, nz)
    h = np.einsum("bmn,bn->bm", G, z0) + s0
    return Q, p, G, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=100)
    ap.add_argument("--nineq", type=int, default=100)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 64, 128, 1024, 4096])
    ap.add_argument("--check-accuracy", action="store_true")
    args = ap.parse_args()

    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)
    print("| nz | nBatch | solve time | QPs/sec |")
    print("|----|--------|-----------|---------|")
    for B in args.batches:
        Q, p, G, h = make(B, args.nz, args.nineq)
        arr = [jnp.asarray(v, jnp.float32) for v in (Q, p, G, h)]

        @jax.jit
        def run(Q, p, G, h):
            return qpth_tpu.solve_qp_full(Q, p, G, h, config=cfg).z

        sync(run(*arr))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(*arr))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"| {args.nz:4d} | {B:6d} | {dt*1e3:9.2f} ms "
              f"| {B/dt:9.1f} |", flush=True)

        if args.check_accuracy and B <= 128:
            from qpth_tpu.solvers.oracle import solve_qp_batch_np

            z = np.asarray(run(*arr))
            x_ref, _, _, _ = solve_qp_batch_np(Q, p, G, h)
            diff = np.linalg.norm(z - x_ref, axis=1).mean()
            print(f"|      |        | mean ||z - oracle||: {diff:.2e} | |",
                  flush=True)


if __name__ == "__main__":
    main()
