#!/usr/bin/env python3
"""Throughput cost of the accuracy dial (VERDICT r4 #3): headline
workload QPs/sec at refine_steps in {0, 3, 6, 12} and at the shipped
auto policy (eps=1e-8 -> budget 12 with 2x-contraction early exit).
Accuracy at these settings is measured by benchmarks/parity.py.

    python benchmarks/prof_refine_cost.py
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
            sc = 1.0 + 1e-12 * jnp.tanh(jnp.mean(sol.z))
            return QQ * sc, pp + 1e-6 * sol.z, sol.stats.best_resids
        return lax.fori_loop(0, reps, body,
                             (Q, p, jnp.zeros((B,), jnp.float32)))
    return run


def _key():
    return jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)


def _force(out):
    return np.asarray(out[2])


def main(n=100, m=100, B=4096):
    print(f"backend={jax.default_backend()}  nz={n} nineq={m} B={B}",
          flush=True)
    gen = make(n, m, B)
    variants = [("refine_steps=0 (default)", dict()),
                ("refine_steps=3", dict(refine_steps=3)),
                ("refine_steps=6", dict(refine_steps=6)),
                ("refine_steps=12", dict(refine_steps=12)),
                ("auto via eps=1e-8", dict(eps=1e-8))]
    for name, kw in variants:
        cfg = qpth_tpu.SolverConfig(check_Q_spd=False, verbose=-1, **kw)
        r1, rN = chained(cfg, 1, B), chained(cfg, REPEATS, B)
        _force(r1(*gen(_key())))
        _force(rN(*gen(_key())))
        t1s, tNs = [], []
        for _ in range(TRIALS):
            a = gen(_key())
            np.asarray(sum(jnp.sum(x[..., :1]) for x in a))
            t0 = time.perf_counter()
            _force(r1(*a))
            t1s.append(time.perf_counter() - t0)
            a = gen(_key())
            np.asarray(sum(jnp.sum(x[..., :1]) for x in a))
            t0 = time.perf_counter()
            _force(rN(*a))
            tNs.append(time.perf_counter() - t0)
        t = (min(tNs) - min(t1s)) / (REPEATS - 1)
        print(f"  {name:24s} {t*1e3:8.2f} ms/solve  ({B/t:9,.0f} QPs/s)",
              flush=True)


if __name__ == "__main__":
    main()
