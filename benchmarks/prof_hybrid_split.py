#!/usr/bin/env python3
"""Fixed-vs-per-iteration split of the hybrid-regime solve.

Times, at the config-4 corner (nz=512, neq=64, B=512 by default):
  * pre_factor_kkt alone (the one-time Schur products),
  * the full solve at max_iter = LO and max_iter = HI,
so per-iteration cost = (t_HI - t_LO) / (HI - LO) and fixed cost =
t_LO - LO * per_iter. Locates whether the next hybrid-regime win is in
the prefactor or the iteration.

    python benchmarks/prof_hybrid_split.py [nz] [neq] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import qpth_tpu
from qpth_tpu.ops import kkt as kkt_ops

LO, HI = 4, 20


def make(n, neq, B, seed=0):
    npr = np.random.RandomState(seed)
    L = npr.rand(B, n, n).astype(np.float32)
    Q = (L @ L.transpose(0, 2, 1) + n * 0.05 * np.eye(n)).astype(np.float32)
    G = npr.randn(B, n, n).astype(np.float32) / np.sqrt(n)
    z0 = npr.randn(n).astype(np.float32)
    h = np.einsum("bmn,n->bm", G, z0) + npr.rand(B, n).astype(np.float32)
    p = npr.randn(B, n).astype(np.float32)
    if neq:
        A = npr.randn(B, neq, n).astype(np.float32) / np.sqrt(n)
        beq = np.einsum("ben,n->be", A, z0).astype(np.float32)
    else:
        A = beq = None
    return [jnp.asarray(v) if v is not None else None
            for v in (Q, p, G, h, A, beq)]


def timeit(fn, p_vars, trials=3):
    np.asarray(fn(p_vars[-1]))  # compile
    ts = []
    for t in range(trials):
        t0 = time.perf_counter()
        np.asarray(fn(p_vars[t]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(n=512, neq=64, B=512):
    print(f"backend={jax.default_backend()}  nz={n} neq={neq} B={B}",
          flush=True)
    Q, p, G, h, A, beq = make(n, neq, B)
    npr = np.random.RandomState(1)
    p_vars = [jnp.asarray(np.asarray(p) + 1e-4
                          * npr.randn(B, n).astype(np.float32))
              for _ in range(4)]

    modes = kkt_ops.resolve_prefactor_modes(qpth_tpu.SolverConfig(), None)

    @jax.jit
    def prefactor(Q_, G_, A_, p_):
        f = kkt_ops.pre_factor_kkt(Q_ + 1e-12 * p_[:, :1, None], G_, A_,
                                   **modes)
        # Off-TPU the resolved mode is substitution (invQ_GT is None);
        # probe whichever representation actually exists.
        probe = f.invQ_GT if modes["inverse"] else f.L_Q
        return f.R[:, 0, 0].sum() + probe[:, 0, 0].sum()

    t_pre = timeit(lambda pv: prefactor(Q, G, A, pv), p_vars)
    print(f"pre_factor_kkt: {t_pre*1e3:9.1f} ms", flush=True)

    iters = {}
    for it in (LO, HI):
        # Pin the iteration count: disable the improvement-window and eps
        # exits so the solve runs exactly max_iter iterations (the per-lane
        # plateau exit would otherwise bias per_it low / fixed high at HI).
        cfg = qpth_tpu.SolverConfig(check_Q_spd=False, max_iter=it,
                                    not_improved_lim=10**6, eps=0.0)

        @jax.jit
        def run(Q_, G_, h_, A_, b_, p_):
            sol = qpth_tpu.solve_qp_full(Q_, p_, G_, h_, A_, b_, config=cfg)
            return sol.stats.best_resids, sol.stats.iterations

        t = timeit(lambda pv: run(Q, G, h, A, beq, pv)[0], p_vars)
        iters[it] = int(run(Q, G, h, A, beq, p_vars[0])[1])
        print(f"solve max_iter={it:2d}: {t*1e3:9.1f} ms "
              f"(ran {iters[it]} iters)", flush=True)
        if it == LO:
            t_lo = t
        else:
            t_hi = t
    per_it = (t_hi - t_lo) / (iters[HI] - iters[LO])
    fixed = t_lo - iters[LO] * per_it
    print(f"per-iteration {per_it*1e3:.2f} ms; fixed {fixed*1e3:.1f} ms "
          f"(prefactor {t_pre*1e3:.1f} ms of that)", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
