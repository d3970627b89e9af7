#!/usr/bin/env python3
"""General fixed-pattern sparse tier vs the dense path.

Workload: a banded-bandwidth-w SPD Q whose variable order has been
scrambled by a random permutation (so the natural order shows no band —
RCM must recover it), with 2-entry inequality rows (pairwise difference
constraints, also scrambled). This is the arbitrary-fixed-pattern
contract of the reference's sparse tier
(/root/reference/qpth/solvers/pdipm/spbatch.py:29-174): the dense arm
densifies and pays O(n^3) per iteration (hybrid blocked factorization at
these sizes); the general arm runs the RCM-permuted block-Thomas solver
with G^T D G pair-scattered into the band, O(nb*bs^3).

Timing: chained dependent solves inside one jit (the axon tunnel
memoizes repeat dispatches and block_until_ready does not sync;
np.asarray readback does), reported as (t_N - t_1)/(N-1). All large
operands are jit ARGUMENTS (closure constants blow the axon remote
compile limit).

    python benchmarks/prof_general.py            # n=256 B=512
    GENERAL_CASES=512:256 python benchmarks/prof_general.py
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
from qpth_tpu import SpQPFunction
from qpth_tpu.bandqp import solve_qp_banded_full

REPS = int(os.environ.get("BENCH_REPS", 3))
TRIALS = int(os.environ.get("BENCH_TRIALS", 3))


def make_scrambled(rng, B, n, w=8):
    """Scrambled banded SPD Q + 2-entry difference-constraint G rows."""
    perm0 = rng.permutation(n)
    qi = [(i, j) for i in range(n) for j in range(n) if abs(i - j) <= w]
    Qi = np.array([(perm0[i], perm0[j]) for (i, j) in qi]).T
    gi = []
    for r in range(n):
        c = rng.randint(0, n - 1)
        gi.append((r, perm0[c]))
        gi.append((r, perm0[c + 1]))
    Gi = np.array(gi).T

    Qv = np.zeros((B, Qi.shape[1]), np.float32)
    look = {}
    for k, (i, j) in enumerate(zip(*Qi)):
        if i == j:
            Qv[:, k] = 2.0 * w + 1 + rng.rand(B)
        elif (int(j), int(i)) in look:
            Qv[:, k] = Qv[:, look[(int(j), int(i))]]
        else:
            Qv[:, k] = rng.randn(B) * 0.3
            look[(int(i), int(j))] = k
    Gv = rng.randn(B, Gi.shape[1]).astype(np.float32)
    p = rng.randn(B, n).astype(np.float32)
    z0 = rng.randn(B, n)
    G = np.zeros((B, n, n), np.float32)
    np.add.at(G, (np.arange(B)[:, None], Gi[0][None, :], Gi[1][None, :]),
              Gv)
    h = (np.einsum("bmn,bn->bm", G, z0)
         + rng.rand(B, n) + 0.2).astype(np.float32)
    Q = np.zeros((B, n, n), np.float32)
    Q[:, Qi[0], Qi[1]] = Qv
    return Qi, Qv, Gi, Gv, p, h, Q, G


def chained_time(solve, p0, ops):
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
    return (min(tNs) - min(t1s)) / (REPS - 1)


def main():
    rng = np.random.RandomState(0)
    # GENERAL_REFINE: "" (off, default) | int | "auto" (the eps=1e-8
    # accuracy-dial policy) — round-5 crossover re-measure runs both
    # tiers WITH refinement in the cost (VERDICT r4 #7).
    refine = os.environ.get("GENERAL_REFINE", "")
    kw = {}
    if refine == "auto":
        kw = dict(eps=1e-8)
    elif refine:
        kw = dict(refine_steps=int(refine))
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False, verbose=-1, **kw)
    print(f"backend={jax.default_backend()} refine={refine or 'off'}",
          flush=True)

    cases = os.environ.get("GENERAL_CASES", "512:256")
    rows = []
    for case in cases.split(","):
        B, n = (int(v) for v in case.split(":"))
        Qi, Qv, Gi, Gv, p, h, Q, G = make_scrambled(rng, B, n)
        f = SpQPFunction(Qi, (n, n), Gi, (n, n),
                         np.zeros((2, 0), int), (0, n), config=cfg)
        assert f.structure == "general", f.structure
        n_, bs, nb, n_pad = f._band
        perm, invp, specg = f._gen
        print(f"n={n} B={B}: RCM bandwidth -> bs={bs} nb={nb}", flush=True)

        permj = jnp.asarray(perm)

        def solve_general(pp, Qv, Gv, hj):
            Qd, Qe = f._band_blocks(Qv)
            pq = pp[:, permj]
            if n_pad > n_:
                pq = jnp.pad(pq, ((0, 0), (0, n_pad - n_)))
            sol = solve_qp_banded_full(Qd, Qe, pq, Gv, hj, None, None,
                                       config=cfg, g_spec=specg)
            return sol.z[:, :n_], sol.stats.best_resids.max()

        gen_ops = (jnp.asarray(Qv), jnp.asarray(Gv), jnp.asarray(h))
        p0 = jnp.asarray(p)
        tg = chained_time(solve_general, p0, gen_ops)
        sg = jax.jit(solve_general)(p0, *gen_ops)
        rg = float(np.asarray(sg[1]))
        zg = np.asarray(sg[0])[:, np.asarray(invp)]
        print(f"  general n={n} B={B}: {tg*1e3:.1f} ms ({B/tg:.0f} qps, "
              f"resid {rg:.2e})", flush=True)

        def solve_dense(pp, Qj, Gj, hj):
            sol = qpth_tpu.solve_qp_full(Qj, pp, Gj, hj, None, None,
                                         config=cfg)
            return sol.z, sol.stats.best_resids.max()

        dense_ops = (jnp.asarray(Q), jnp.asarray(G), jnp.asarray(h))
        td = chained_time(solve_dense, p0, dense_ops)
        sd = jax.jit(solve_dense)(p0, *dense_ops)
        rd = float(np.asarray(sd[1]))
        dz = float(np.abs(zg - np.asarray(sd[0])).max())
        rows.append((n, bs, B, tg * 1e3, B / tg, rg,
                     td * 1e3, B / td, rd, td / tg, dz))
        print(f"n={n} bs={bs} B={B}: general {tg*1e3:.1f} ms "
              f"({B/tg:.0f} qps, resid {rg:.2e})  dense {td*1e3:.1f} ms "
              f"({B/td:.0f} qps, resid {rd:.2e})  speedup {td/tg:.2f}x  "
              f"|dz| {dz:.2e}", flush=True)

    print("\n| n | bs | B | general ms | general qps | dense ms | "
          "dense qps | speedup | resid (g/d) | |dz| |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for (n, bs, B, tgms, qg, rg, tdms, qd, rd, sp, dz) in rows:
        print(f"| {n} | {bs} | {B} | {tgms:.1f} | {qg:.0f} | {tdms:.1f} | "
              f"{qd:.0f} | {sp:.2f}x | {rg:.1e}/{rd:.1e} | {dz:.1e} |")


if __name__ == "__main__":
    main()
