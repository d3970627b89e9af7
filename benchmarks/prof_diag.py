#!/usr/bin/env python3
"""Structured (diagonal-Q/G) solver vs the dense eq-fused path on the
sudoku-shaped workload — the benchmark for VERDICT r1 next-round #1.

Workload: Q = eps*I, G = -I (the exact structure of the reference's sudoku
layer, sudoku notebook cell 10), shared dense A (neq < nz), per-example
p/b. The dense path pays an (m x m) Cholesky per iteration; the
structured path pays an (neq x neq) normal-equations factor assembled on
the MXU (and nothing at all when neq == 0).

Chained-dispatch timing (see benchmarks/microbench.py header for why
single-shot timings through the axon tunnel are invalid).

    python benchmarks/prof_diag.py [--batch 2048] [--nz 64] [--neq 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--neq", type=int, default=40)
    ap.add_argument("--eps-q", type=float, default=0.1)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

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

    B, n, neq = args.batch, args.nz, args.neq
    dt = jnp.float32
    npr = np.random.RandomState(0)
    q = np.full(n, args.eps_q, np.float32)
    g = np.full(n, -1.0, np.float32)
    h = np.zeros((B, n), np.float32)          # -x <= 0
    A = npr.randn(neq, n).astype(np.float32)
    x0 = np.abs(npr.rand(B, n)).astype(np.float32) + 0.1
    b = np.einsum("en,bn->be", A, x0).astype(np.float32)
    p = npr.randn(B, n).astype(np.float32)

    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)
    jq, jg, jh = jnp.asarray(q), jnp.asarray(g), jnp.asarray(h)
    jA, jb, jp = jnp.asarray(A), jnp.asarray(b), jnp.asarray(p)
    Qd = jnp.asarray(np.diag(q))
    Gd = jnp.asarray(np.diag(g))

    def chained_diag(reps):
        @jax.jit
        def run(p_, b_):
            def body(i, carry):
                pp, bb, _ = carry
                sol = qpth_tpu.solve_qp_diag_full(jq, pp, jg, jh, jA, bb,
                                                  config=cfg)
                return (pp + 1e-6 * sol.z, bb * (1 + 1e-12 * jnp.tanh(
                    jnp.mean(sol.z))), sol.stats.best_resids)
            return lax.fori_loop(0, reps, body,
                                 (p_, b_, jnp.zeros((B,), dt)))
        return run

    def chained_dense(reps):
        @jax.jit
        def run(p_, b_):
            def body(i, carry):
                pp, bb, _ = carry
                sol = qpth_tpu.solve_qp_full(Qd, pp, Gd, jh, jA, bb,
                                             config=cfg)
                return (pp + 1e-6 * sol.z, bb * (1 + 1e-12 * jnp.tanh(
                    jnp.mean(sol.z))), sol.stats.best_resids)
            return lax.fori_loop(0, reps, body,
                                 (p_, b_, jnp.zeros((B,), dt)))
        return run

    def measure(maker, label):
        run1, runN = maker(1), maker(args.repeats)
        _, _, res = jax.block_until_ready(run1(jp, jb))
        jax.block_until_ready(runN(jp, jb))
        t1s, tNs = [], []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(run1(jp, jb)[2])
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(runN(jp, jb)[2])
            tNs.append(time.perf_counter() - t0)
        per = (min(tNs) - min(t1s)) / (args.repeats - 1)
        qps = B / per
        print(f"{label:>10}: {per*1e3:8.2f} ms/solve  {qps:12,.0f} QPs/sec"
              f"  max resid {float(np.asarray(res).max()):.2e}")
        return qps

    # Accuracy cross-check first.
    sd = qpth_tpu.solve_qp_diag_full(jq, jp, jg, jh, jA, jb, config=cfg)
    sdd = qpth_tpu.solve_qp_full(Qd, jp, Gd, jh, jA, jb, config=cfg)
    err = float(jnp.abs(sd.z - sdd.z).max())
    print(f"workload: B={B} nz={n} neq={neq} (Q=eps*I, G=-I, shared A)")
    print(f"|z_diag - z_dense|_inf = {err:.2e}")

    q_dense = measure(chained_dense, "dense")
    q_diag = measure(chained_diag, "diag")
    print(f"structured speedup: {q_diag / q_dense:.2f}x")


if __name__ == "__main__":
    main()
