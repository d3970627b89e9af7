#!/usr/bin/env python3
"""Round-5 roofline (VERDICT r4 #5): bytes-moved model vs measured time
for the SHIPPED fused path at the headline shape, and the hybrid tier at
nz=512 — both under the CURRENT default config — plus an MFU figure for
the prefactor GEMMs.

Method: chained fixed-iteration solves at two max_iter values split the
per-solve time into fixed + per-iteration parts (same harness math as
prof_fixed_attrib); the bytes model is written next to each measured
number. v5e peaks used: 819 GB/s HBM, ~49 TF/s f32 (MXU passes at
HIGHEST = full-f32 accumulation).

    python benchmarks/roofline_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import dataclasses

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
HBM_GBPS = 819.0
F32_TFLOPS = 49.0


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


def per_solve(cfg, gen, B):
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
    return (min(tNs) - min(t1s)) / (REPEATS - 1)


def split(n, m, B, base_cfg, iters=(10, 20)):
    """(fixed_ms, per_iter_ms) via two fixed-iteration measurements."""
    gen = make(n, m, B)
    ts = []
    for mi in iters:
        cfg = dataclasses.replace(base_cfg, max_iter=mi,
                                  not_improved_lim=10 ** 6, eps=0.0)
        ts.append(per_solve(cfg, gen, B))
    per_it = (ts[1] - ts[0]) / (iters[1] - iters[0])
    fixed = ts[0] - iters[0] * per_it
    return fixed * 1e3, per_it * 1e3


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    f32 = 4

    # ---- headline (fused lanes path): nz = m = 100, B = 4096 ----
    n = m = B = 0
    n, m, B = 100, 100, 4096
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)
    fixed, it = split(n, m, B, cfg)
    # per-iteration bytes model (fused xfree step kernel
    # ipm_step_xfree_lanes): read R (B m^2) + q_t/s/z vectors;
    # write s', z', zeta — vector I/O is ~nothing next to R.
    it_bytes = B * m * m * f32 + 6 * B * m * f32
    # checkpoint matvecs amortized over resid_every=7: one Q read + one
    # G read each (measured round-3: 0.46 ms/checkpoint).
    print(f"headline nz=m={n} B={B}: fixed {fixed:.2f} ms, "
          f"per-iter {it:.3f} ms", flush=True)
    print(f"  fused-step model {it_bytes/1e6:.0f} MB -> "
          f"{it_bytes/1e9/(it/1e3):.0f} GB/s achieved vs {HBM_GBPS:.0f} "
          f"peak ({100*it_bytes/1e9/(it/1e3)/HBM_GBPS:.0f}% — the factor"
          f"+inverse is VPU-issue-bound, not bandwidth-bound)",
          flush=True)

    # prefactor MFU: prefactor-only time = fixed-cost difference between
    # a cached-factors solve and a fresh solve is awkward under jit; use
    # the prefactor jitted alone (chained to amortize dispatch).
    gen = make(n, m, B)

    @jax.jit
    def pre(Q, G):
        def body(i, carry):
            QQ, acc = carry
            f = qpth_tpu.prefactor_qp(QQ, G, config=cfg)
            s = f.R[:, 0, 0]
            return QQ * (1.0 + 1e-12 * jnp.tanh(jnp.mean(s))), acc + s
        return lax.fori_loop(0, REPEATS, body,
                             (Q, jnp.zeros((B,), jnp.float32)))

    @jax.jit
    def pre1(Q, G):
        f = qpth_tpu.prefactor_qp(Q, G, config=cfg)
        return f.R[:, 0, 0]

    a = gen(_key())
    np.asarray(pre1(a[0], a[2]))
    np.asarray(pre(a[0], a[2])[1])
    t1s, tNs = [], []
    for _ in range(TRIALS):
        a = gen(_key())
        np.asarray(jnp.sum(a[0][..., :1]))
        t0 = time.perf_counter()
        np.asarray(pre1(a[0], a[2]))
        t1s.append(time.perf_counter() - t0)
        a = gen(_key())
        np.asarray(jnp.sum(a[0][..., :1]))
        t0 = time.perf_counter()
        np.asarray(pre(a[0], a[2])[1])
        tNs.append(time.perf_counter() - t0)
    tp = (min(tNs) - min(t1s)) / (REPEATS - 1)
    # FLOPs: lanes factor+triangular-inverse ~ B (n^3/6 + n^3/2) MULs x2,
    # gram n^3, invQ_GT 2 n^2 m, GiGT 2 n m^2  (HIGHEST = true f32).
    fl = B * (2 * (n ** 3 / 6 + n ** 3 / 2) + 2 * n ** 3
              + 2 * n * n * m + 2 * n * m * m)
    print(f"  prefactor {tp*1e3:.2f} ms = {fl/1e9:.1f} GFLOP -> "
          f"{fl/1e12/tp:.1f} TF/s ({100*fl/1e12/tp/F32_TFLOPS:.0f}% of "
          f"f32 peak; GEMM chain is HBM/layout-bound at m=100)",
          flush=True)

    # ---- hybrid tier: nz = m = 512, B = 512 ----
    n = m = 512
    B = 512
    fixed, it = split(n, m, B, cfg)
    # hybrid per-iteration bytes: factor reads/writes the blocked T
    # (B m^2) + panels ~ (B m^2 / 2) + two blocked substitution solves
    # re-reading the factor (2 x B m^2 / 2... measured round-3: the
    # substitution chain is the bandwidth floor).
    it_bytes = 3 * B * m * m * f32
    print(f"hybrid nz=m={n} B={B}: fixed {fixed:.2f} ms, per-iter "
          f"{it:.3f} ms", flush=True)
    print(f"  per-iter model ~{it_bytes/1e6:.0f} MB -> "
          f"{it_bytes/1e9/(it/1e3):.0f} GB/s achieved vs {HBM_GBPS:.0f} "
          f"peak ({100*it_bytes/1e9/(it/1e3)/HBM_GBPS:.0f}%)", flush=True)
    trail_fl = B * (2 / 3) * m ** 3  # factor GEMM bulk
    print(f"  factor GEMM bulk {trail_fl/1e9:.1f} GFLOP/iter -> "
          f"{trail_fl/1e12/(it/1e3):.2f} TF/s "
          f"({100*trail_fl/1e12/(it/1e3)/F32_TFLOPS:.1f}% f32 peak)",
          flush=True)


if __name__ == "__main__":
    main()
