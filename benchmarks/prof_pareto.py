#!/usr/bin/env python3
"""Round-5 composed-defaults Pareto sweep (VERDICT r4 #2): re-validate
resid_every under the CURRENT default stack (probe-gated equilibration +
per-lane margin + coeff_x) on the harsh headline workload, with
throughput AND true-residual accuracy side by side, plus equilibrate
on/off arms at the chosen default.

    python benchmarks/prof_pareto.py [nz] [nineq] [B]
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
    return jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)


def _force(out):
    return np.asarray(out[2])


def run_variant(name, cfg, gen, B):
    r1, rN = chained(cfg, 1, B), chained(cfg, REPEATS, B)
    resids = _force(r1(*gen(_key())))       # warm + accuracy sample
    _force(rN(*gen(_key())))
    t1s, tNs = [], []
    for _ in range(TRIALS):
        args = gen(_key())
        np.asarray(sum(jnp.sum(a[..., :1]) for a in args))
        t0 = time.perf_counter()
        _force(r1(*args))
        t1s.append(time.perf_counter() - t0)
        args = gen(_key())
        np.asarray(sum(jnp.sum(a[..., :1]) for a in args))
        t0 = time.perf_counter()
        _force(rN(*args))
        tNs.append(time.perf_counter() - t0)
    t = (min(tNs) - min(t1s)) / (REPEATS - 1)
    print(f"  {name:28s} {t*1e3:8.2f} ms/solve  ({B/t:9,.0f} QPs/s)  "
          f"max resid {resids.max():.3g}  median {np.median(resids):.3g}",
          flush=True)


def main(n=100, m=100, B=4096):
    print(f"backend={jax.default_backend()}  nz={n} nineq={m} B={B}",
          flush=True)
    gen = make(n, m, B)
    for k in (1, 4, 7, 10, 14, 0):
        cfg = qpth_tpu.SolverConfig(check_Q_spd=False, resid_every=k)
        run_variant(f"resid_every={k}", cfg, gen, B)
    run_variant("k=7 equilibrate=False",
                qpth_tpu.SolverConfig(check_Q_spd=False, resid_every=7,
                                      equilibrate=False), gen, B)
    run_variant("k=7 coeff_x=False",
                qpth_tpu.SolverConfig(check_Q_spd=False, resid_every=7,
                                      coeff_x=False), gen, B)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
