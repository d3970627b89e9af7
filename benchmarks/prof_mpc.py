#!/usr/bin/env python3
"""MPC-style receding-horizon benchmark: warm starts vs cold starts.

The reference is stateless (no warm-start API); BASELINE's MPC config is
the motivating workload for qpth_tpu's warm-start extension (SURVEY §5.4).
A batch of box-constrained tracking QPs is re-solved T times with slowly
drifting p (the receding horizon); each warm solve starts from the
previous solution's (z, s, lam, nu).

    python benchmarks/prof_mpc.py [--batch 1024] [--nz 50] [--steps 10]
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
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--nz", type=int, default=50)
    ap.add_argument("--nineq", type=int, default=50)
    ap.add_argument("--neq", type=int, default=0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--drift", type=float, default=0.02)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import qpth_tpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    B, n, m = args.batch, args.nz, args.nineq
    npr = np.random.RandomState(0)
    L = npr.rand(B, n, n).astype(np.float32)
    Q = L @ L.transpose(0, 2, 1) + 0.1 * np.eye(n, dtype=np.float32)
    G = npr.randn(B, m, n).astype(np.float32)
    z0 = npr.randn(B, n).astype(np.float32)
    s0 = npr.rand(B, m).astype(np.float32)
    h = np.einsum("bmn,bn->bm", G, z0) + s0
    if args.neq:
        A = npr.randn(B, args.neq, n).astype(np.float32)
        beq = np.einsum("bmn,bn->bm", A, z0).astype(np.float32)
    else:
        A = beq = None
    p = npr.randn(B, n).astype(np.float32)
    drift = args.drift * npr.randn(args.steps, B, n).astype(np.float32)

    # improve_margin makes plateau detection effective at float32 so
    # warm starts actually terminate early (see SolverConfig docs).
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False, improve_margin=1e-3)
    jQ, jG, jh = jnp.asarray(Q), jnp.asarray(G), jnp.asarray(h)
    jA = jnp.asarray(A) if A is not None else None
    jb = jnp.asarray(beq) if beq is not None else None

    @jax.jit
    def solve_cold(p_):
        return qpth_tpu.solve_qp_full(jQ, p_, jG, jh, jA, jb, config=cfg)

    @jax.jit
    def solve_warm(p_, init):
        return qpth_tpu.solve_qp_full(jQ, p_, jG, jh, jA, jb, config=cfg,
                                      init=init)

    # Q/G/A are fixed across the horizon: pre-factor ONCE and reuse the
    # cached factors every step (prefactor_qp — the factorization-as-
    # cached-artifact contract, reference qp.py:93, as a user API).
    factors = qpth_tpu.prefactor_qp(jQ, jG, jA, config=cfg)

    @jax.jit
    def solve_cached(p_, init, factors):
        return qpth_tpu.solve_qp_full(jQ, p_, jG, jh, jA, jb, config=cfg,
                                      init=init, factors=factors)

    def horizon(mode: str):
        p_ = jnp.asarray(p)
        sol = solve_cold(p_)
        jax.block_until_ready(sol.z)
        iters, t0 = [], time.perf_counter()
        for t in range(args.steps):
            p_ = p_ + jnp.asarray(drift[t])
            if mode == "cached":
                sol = solve_cached(p_, (sol.z, sol.s, sol.lam, sol.nu),
                                   factors)
            elif mode == "warm":
                sol = solve_warm(p_, (sol.z, sol.s, sol.lam, sol.nu))
            else:
                sol = solve_cold(p_)
            iters.append(int(sol.stats.iterations))
        jax.block_until_ready(sol.z)
        wall = time.perf_counter() - t0
        resid = float(np.asarray(sol.stats.best_resids).max())
        return iters, wall, resid

    for mode in ("cold", "warm", "cached"):  # compile all paths
        horizon(mode)
    it_c, t_c, r_c = horizon("cold")
    it_w, t_w, r_w = horizon("warm")
    it_f, t_f, r_f = horizon("cached")
    print(f"cold          : iters/step {np.mean(it_c):5.1f}  wall "
          f"{t_c:6.2f}s  max resid {r_c:.2e}")
    print(f"warm          : iters/step {np.mean(it_w):5.1f}  wall "
          f"{t_w:6.2f}s  max resid {r_w:.2e}")
    print(f"warm+prefactor: iters/step {np.mean(it_f):5.1f}  wall "
          f"{t_f:6.2f}s  max resid {r_f:.2e}")
    print(f"warm-start speedup: {t_c / t_w:.2f}x "
          f"({np.mean(it_c) / max(np.mean(it_w), 1e-9):.2f}x fewer iters)")
    print(f"warm+prefactor speedup vs cold: {t_c / t_f:.2f}x")


if __name__ == "__main__":
    main()
