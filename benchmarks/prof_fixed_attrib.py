#!/usr/bin/env python3
"""Attribute the headline fixed cost: time the chained solve under config
variants (equilibration on/off, ruiz_iters, stats fold) to locate where
the round-4 fixed-cost growth (12.0 -> 17.5 ms) lives.

    python benchmarks/prof_fixed_attrib.py [nz] [nineq] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import qpth_tpu

REPEATS = 6
TRIALS = 3


def make(n, m, B):
    @jax.jit
    def gen(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        L = jax.random.uniform(k1, (B, n, n), jnp.float32)
        Q = (L @ jnp.swapaxes(L, -1, -2)
             + 1e-3 * jnp.eye(n, dtype=jnp.float32))
        G = jax.random.normal(k2, (B, m, n), jnp.float32)
        z0 = jax.random.normal(k3, (B, n), jnp.float32)
        s0 = jax.random.uniform(k4, (B, m), jnp.float32)
        p = jax.random.normal(k5, (B, n), jnp.float32)
        h = jnp.einsum("bmn,bn->bm", G, z0) + s0
        return Q, p, G, h

    return gen


def chained(cfg, reps, B):
    @jax.jit
    def run(Q, p, G, h):
        def body(i, carry):
            QQ, pp, _ = carry
            sol = qpth_tpu.solve_qp_full(QQ, pp, G, h, config=cfg)
            scale = 1.0 + 1e-12 * jnp.tanh(jnp.mean(sol.z))
            return QQ * scale, pp + 1e-6 * sol.z, sol.stats.best_resids
        return lax.fori_loop(0, reps, body,
                             (Q, p, jnp.zeros((B,), jnp.float32)))
    return run


def _key():
    """Time-salted key: the tunnel memoizes identical dispatches across
    processes, so fixed seeds repeat-run for free."""
    return jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)


def _force(out):
    """Through the tunnel block_until_ready does not block on the remote
    computation — fetching a (small) result does."""
    return np.asarray(out[2])


def timeit(run1, runN, gen):
    _force(run1(*gen(_key())))
    _force(runN(*gen(_key())))
    t1s, tNs = [], []
    for _ in range(TRIALS):
        args = gen(_key())
        np.asarray(sum(jnp.sum(a[..., :1]) for a in args))  # materialize
        t0 = time.perf_counter()
        _force(run1(*args))
        t1s.append(time.perf_counter() - t0)
        args = gen(_key())
        np.asarray(sum(jnp.sum(a[..., :1]) for a in args))
        t0 = time.perf_counter()
        _force(runN(*args))
        tNs.append(time.perf_counter() - t0)
    return (min(tNs) - min(t1s)) / (REPEATS - 1)


def main(n=100, m=100, B=4096):
    print(f"backend={jax.default_backend()}  nz={n} nineq={m} B={B}",
          flush=True)
    gen = make(n, m, B)

    variants = [
        ("equilibrate=False", dict(equilibrate=False)),
        ("auto (probe+light)", dict()),
        ("forced True (full ruiz)", dict(equilibrate=True)),
    ]
    for name, kw in variants:
        cfg = qpth_tpu.SolverConfig(check_Q_spd=False, **kw)
        t = timeit(chained(cfg, 1, B), chained(cfg, REPEATS, B), gen)
        print(f"  {name:24s} {t*1e3:8.2f} ms/solve  "
              f"({B/t:,.0f} QPs/s)", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
