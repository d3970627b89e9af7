#!/usr/bin/env python3
"""Banded (block-tridiagonal) structured tier vs the dense path at the
large-problem shapes the reference's harness stresses
(/root/reference/prof-linear.py:41-44 goes to nz=500).

Workload: MPC-chain-shaped QPs — SPD block-tridiagonal Q (nb stages of
size bs), diagonal G (box-style constraints), optional dense equality
coupling. The dense arm densifies Q/G and runs the production dense path
(hybrid blocked factorization at these sizes); the banded arm runs the
block-Thomas structured solver on the same problems.

Timing: chained dependent solves inside one jit (the axon tunnel
memoizes repeat dispatches and block_until_ready does not sync;
np.asarray readback does), reported as (t_N - t_1)/(N-1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("QPTH_TPU_JAX_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

import qpth_tpu

REPS = int(os.environ.get("BENCH_REPS", 3))
TRIALS = int(os.environ.get("BENCH_TRIALS", 3))


def make_chain(rng, B, nb, bs, neq=0, coupling=0.35):
    n = nb * bs
    Ld = np.tril(rng.randn(B, nb, bs, bs) * 0.4) + np.eye(bs) * 1.8
    Le = coupling * rng.randn(B, nb - 1, bs, bs)
    Qd = np.einsum("bnij,bnkj->bnik", Ld, Ld)
    Qd[:, 1:] += np.einsum("bnij,bnkj->bnik", Le, Le)
    Qe = np.einsum("bnij,bnkj->bnik", Le, Ld[:, :-1])
    g = np.where(np.abs(rng.randn(B, n)) < 0.3, 0.7, rng.randn(B, n))
    z0 = rng.randn(B, n)
    h = g * z0 + rng.rand(B, n) + 0.2
    p = rng.randn(B, n)
    if neq:
        A = rng.randn(neq, n) / np.sqrt(n)
        b = z0 @ A.T
    else:
        A = b = None
    return Qd, Qe, p, g, h, A, b


def densify(Qd, Qe, g):
    B, nb, bs, _ = Qd.shape
    n = nb * bs
    Q = np.zeros((B, n, n), np.float32)
    for i in range(nb):
        Q[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs] = Qd[:, i]
    for i in range(nb - 1):
        blk = Qe[:, i]
        Q[:, (i + 1) * bs:(i + 2) * bs, i * bs:(i + 1) * bs] = blk
        Q[:, i * bs:(i + 1) * bs, (i + 1) * bs:(i + 2) * bs] = \
            np.swapaxes(blk, -1, -2)
    G = np.zeros((B, n, n), np.float32)
    idx = np.arange(n)
    G[:, idx, idx] = g
    return Q, G


def chained_time(solve, p0, ops):
    """(t_REPS - t_1)/(REPS-1) with p perturbed by the previous solution.

    ``ops``: every large operand, passed as explicit jit ARGUMENTS — a
    closure over a (B, n, n) array embeds it as literal HLO constants and
    blows the axon remote-compile request limit (HTTP 413)."""
    def chain(reps):
        @jax.jit
        def run(p, *ops):
            def body(i, carry):
                pp, acc = carry
                z, r = solve(pp, *ops)
                return pp + 1e-6 * z, acc + r
            _, acc = lax.fori_loop(0, reps, body,
                                   (p, jnp.zeros((), jnp.float32)))
            return acc[None]
        return run

    run1, runN = chain(1), chain(REPS)
    np.asarray(run1(p0, *ops))
    np.asarray(runN(p0, *ops))
    t1s, tNs = [], []
    for _ in range(TRIALS):
        t0 = time.perf_counter(); np.asarray(run1(p0, *ops))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(runN(p0, *ops))
        tNs.append(time.perf_counter() - t0)
    per = (min(tNs) - min(t1s)) / (REPS - 1)
    return per


def main():
    rng = np.random.RandomState(0)
    f32 = lambda v: None if v is None else jnp.asarray(v, jnp.float32)
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False, verbose=-1)

    cases = [(1024, 16, 16, 0), (512, 16, 32, 0)]
    if os.environ.get("BANDED_EQ", "0") == "1":
        cases.append((512, 16, 32, 32))  # equality-coupled variant
    rows = []
    for (B, nb, bs, neq) in cases:
        n = nb * bs
        Qd, Qe, p, g, h, A, b = make_chain(rng, B, nb, bs, neq)
        Qdj, Qej, gj, hj, Aj, bj = map(f32, (Qd, Qe, g, h, A, b))
        p0 = f32(p)

        def solve_banded(pp, Qdj, Qej, gj, hj, Aj, bj):
            sol = qpth_tpu.solve_qp_banded_full(Qdj, Qej, pp, gj, hj,
                                                Aj, bj, config=cfg)
            return sol.z, sol.stats.best_resids.max()

        band_ops = (Qdj, Qej, gj, hj, Aj, bj)
        tb = chained_time(solve_banded, p0, band_ops)
        sb = jax.jit(solve_banded)(p0, *band_ops)
        rb = float(np.asarray(sb[1]))
        zb = np.asarray(sb[0])
        print(f"  banded n={n} B={B} neq={neq}: {tb*1e3:.1f} ms "
              f"({B/tb:.0f} qps, resid {rb:.2e})", flush=True)

        Qf, Gf = densify(Qd, Qe, g)
        Qj, Gj = jnp.asarray(Qf), jnp.asarray(Gf)

        def solve_dense(pp, Qj, Gj, hj, Aj, bj):
            sol = qpth_tpu.solve_qp_full(Qj, pp, Gj, hj, Aj, bj,
                                         config=cfg)
            return sol.z, sol.stats.best_resids.max()

        dense_ops = (Qj, Gj, hj, Aj, bj)
        td = chained_time(solve_dense, p0, dense_ops)
        sd = jax.jit(solve_dense)(p0, *dense_ops)
        rd = float(np.asarray(sd[1]))
        dz = float(np.abs(zb - np.asarray(sd[0])).max())

        rows.append((n, bs, B, neq, tb * 1e3, B / tb, rb,
                     td * 1e3, B / td, rd, td / tb, dz))
        print(f"n={n} bs={bs} B={B} neq={neq}: banded {tb*1e3:.1f} ms "
              f"({B/tb:.0f} qps, resid {rb:.2e})  dense {td*1e3:.1f} ms "
              f"({B/td:.0f} qps, resid {rd:.2e})  speedup {td/tb:.2f}x  "
              f"|dz| {dz:.2e}", flush=True)

    print("\n| n | bs | B | neq | banded ms | banded qps | dense ms | "
          "dense qps | speedup | max resid (b/d) |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for (n, bs, B, neq, tbms, qb, rb, tdms, qd, rd, sp, dz) in rows:
        print(f"| {n} | {bs} | {B} | {neq} | {tbms:.1f} | {qb:.0f} | "
              f"{tdms:.1f} | {qd:.0f} | {sp:.2f}x | {rb:.1e} / {rd:.1e} |")


if __name__ == "__main__":
    main()
