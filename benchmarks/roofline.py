#!/usr/bin/env python3
"""Roofline report for the solver's hot Pallas kernels.

For each kernel: achieved wall time (chained dependent calls inside one
jit — see microbench.py for why), the HBM bytes it must move, its FLOP
count, and the achieved fraction of the bandwidth roofline. The BASELINE
north-star asks for "KKT solve GFLOP/s vs roofline"; for these batched
small factorizations the binding roof is HBM bandwidth, not the MXU.

    python benchmarks/roofline.py [B] [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

# v5e per-chip peaks (public): HBM ~819 GB/s, f32 via MXU ~49 TFLOP/s.
HBM_GBPS = float(os.environ.get("ROOFLINE_HBM_GBPS", 819))


def chained_time(op, args, reps=17, trials=3):
    def chain(k):
        @jax.jit
        def f(*a):
            def body(i, v):
                return op(*a[:-1], v)
            out = lax.fori_loop(0, k, body, a[-1])
            return out.reshape(-1)[:8].sum(keepdims=True)
        return f

    f1, fN = chain(1), chain(reps)
    np.asarray(f1(*args)), np.asarray(fN(*args))
    t1s, tNs = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(f1(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fN(*args))
        tNs.append(time.perf_counter() - t0)
    return max((min(tNs) - min(t1s)) / (reps - 1), 1e-9)


def report(name, secs, gbytes, gflop):
    if secs < 2e-5:  # below the tunnel measurement floor — don't report
        print(f"{name:38s}  <0.020 ms  (below measurement noise floor)")
        return
    bw = gbytes / secs
    fl = gflop / secs
    frac = bw / HBM_GBPS
    print(f"{name:38s} {secs*1e3:8.3f} ms  {bw:7.0f} GB/s "
          f"({100*frac:5.1f}% of HBM roof)  {fl:8.1f} GFLOP/s")


def main(B=4096, n=100):
    from qpth_tpu.ops.pallas import (factor_inv_lanes,
                                     factor_inv_solve_lanes,
                                     inv_solve_lanes, pad_spd_lanes)
    from qpth_tpu.ops.pallas.lanes import pad_up

    print(f"backend={jax.default_backend()}  B={B} n={n}  "
          f"HBM roof {HBM_GBPS:.0f} GB/s")
    n_p = pad_up(n)
    key = jax.random.PRNGKey(0)
    L0 = jax.random.uniform(key, (B, n, n), jnp.float32)
    R = jnp.matmul(L0, jnp.swapaxes(L0, -1, -2)) + n * jnp.eye(n)
    R_t = jax.block_until_ready(
        jax.jit(lambda r: pad_spd_lanes(jnp.transpose(r, (1, 2, 0))))(R))
    d0 = jax.block_until_ready(
        jax.random.uniform(key, (n, B), jnp.float32) + 0.5)
    v0 = jax.block_until_ready(jax.random.normal(key, (n, B), jnp.float32))

    mat_bytes = B * n_p * n_p * 4
    chol_flop = B * n ** 3 / 3 * 1e-9
    inv_flop = 2 * chol_flop
    solve_flop = B * 4 * n * n * 1e-9

    # factor+inverse: reads R, writes G
    t = chained_time(
        lambda R_t, v: factor_inv_lanes(
            R_t, d0 + 1e-12 * v * v)[0, :n, :] * 1e-20 + v,
        (R_t, v0))
    report("factor_inv_lanes (chol+trinv)", t, 2 * mat_bytes / 1e9,
           chol_flop + inv_flop)

    t = chained_time(
        lambda R_t, v: factor_inv_solve_lanes(
            R_t, d0 + 1e-12 * v * v, v)[1] * 1e-3 + v,
        (R_t, v0))
    report("factor_inv_solve (fused)", t, 2 * mat_bytes / 1e9,
           chol_flop + inv_flop + solve_flop)

    G = jax.block_until_ready(
        jax.jit(lambda R_t: factor_inv_lanes(R_t, d0))(R_t))
    t = chained_time(lambda G, v: inv_solve_lanes(G, v) * 0.5 + v * 1e-6,
                     (G, v0))
    report("inv_solve_lanes (reads G)", t, mat_bytes / 1e9, solve_flop)

    # XLA batched matvec for reference (pure bandwidth)
    Rb = jax.block_until_ready(R)
    vb = jax.block_until_ready(jax.random.normal(key, (B, n), jnp.float32))
    t = chained_time(
        lambda Rb, v: jnp.matmul(Rb, v[..., None])[..., 0] * 1e-3,
        (Rb, vb))
    report("XLA batched matvec (B,n,n)@(B,n)", t, B * n * n * 4 / 1e9,
           B * 2 * n * n * 1e-9)

    # Fused whole-IPM-step kernel: factor + inverse + R z + both solves +
    # step logic; reads R and Q^-1 G^T once (G never leaves VMEM).
    from qpth_tpu.ops.pallas.lanes import ipm_step_lanes

    iGT = jax.block_until_ready(
        jax.jit(lambda r: pad_spd_lanes(jnp.transpose(r, (1, 2, 0))))(
            jnp.matmul(R, R) * (0.01 / n)))
    s0v = jax.block_until_ready(
        jax.random.uniform(key, (n, B), jnp.float32) + 0.5)
    t = chained_time(
        lambda R_t, v: ipm_step_lanes(
            R_t, iGT, v, s0v + 1e-9 * v**2, s0v, v * 0.1, v * 0.0)[0],
        (R_t, v0))
    step_flop = (chol_flop + inv_flop + 3 * solve_flop
                 + 2 * B * 2 * n * n * 1e-9)
    report("ipm_step_lanes (whole IPM iteration)", t, 2 * mat_bytes / 1e9,
           step_flop)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(B, n)
