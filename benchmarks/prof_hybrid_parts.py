#!/usr/bin/env python3
"""Component-level timing of the hybrid blocked factorization at the
config-4 corner (m=512, B=512) — where does the ~14 ms/iteration go?

Per-iteration hybrid work = 4x (lanes diag-block factor_inv + panel GEMM
+ trailing GEMM) + 2x blocked-substitution solves. The FLOP/bandwidth
floor is ~3-4 ms/iter; round 3 measured ~14. This script times each
component with the honest chained recipe (fresh dependency chain inside
one jit, np.asarray sync, baseline-subtracted) to locate the slack.

All big operands are jit ARGUMENTS (axon HTTP 413 closure gotcha).

    python benchmarks/prof_hybrid_parts.py [B] [m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

HIGHEST = lax.Precision.HIGHEST


def sync(x):
    np.asarray(x)


_overhead = [0.0]


def bench(name, make_loop, args, iters, reps=3, is_baseline=False):
    """make_loop(iters) -> jitted fn(*args) returning a tiny array."""
    loop = make_loop(iters)
    t0 = time.perf_counter()
    sync(loop(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(loop(*args))
        ts.append(time.perf_counter() - t0)
    total = min(ts)
    if is_baseline:
        _overhead[0] = total
        per = total / iters
    else:
        per = max(total - _overhead[0], 0.0) / iters
    print(f"{name:52s} {per*1e3:9.3f} ms/iter   "
          f"(total {total*1e3:.1f} ms, compile {compile_s:.0f}s)",
          flush=True)
    return per


def main(B=512, m=512):
    from qpth_tpu.ops.hybrid import (_spd_factor_inv_block, factor_hybrid,
                                     factor_solve_hybrid, solve_hybrid)

    print(f"backend={jax.default_backend()}  B={B} m={m}", flush=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk(key):
        k1, k2, k3 = jax.random.split(key, 3)
        L0 = jax.random.uniform(k1, (B, m, m), jnp.float32)
        R = jnp.matmul(L0, jnp.swapaxes(L0, -1, -2),
                       precision=HIGHEST) + m * jnp.eye(m, dtype=jnp.float32)
        d = jax.random.uniform(k2, (B, m), jnp.float32) + 0.5
        v = jax.random.normal(k3, (B, m), jnp.float32)
        return R, d, v

    R, d, v = [jax.block_until_ready(x) for x in mk(key)]
    D0 = jax.block_until_ready(
        jax.jit(lambda R: R[:, :128, :128] * 1.0)(R))

    # ---- baseline ----
    def mk_noop(iters):
        @jax.jit
        def loop(R, d, v):
            def body(i, x):
                return x * 1.000001
            out = lax.fori_loop(0, iters, body, v)
            return out.reshape(-1)[:8].sum(keepdims=True)
        return loop

    bench("noop chain baseline", mk_noop, (R, d, v), 16, is_baseline=True)

    # ---- full blocked factor (with folded diagonal shift) ----
    def mk_factor(dinv_on):
        def mk_loop(iters):
            @jax.jit
            def loop(R, d, v):
                def body(i, carry):
                    Rx, s = carry
                    fac = factor_hybrid(Rx, dinv=(1.0 / d if dinv_on else None))
                    t = fac.Gs[0][:, 0, 0].sum() + fac.Ps[0][:, 0, 0].sum()
                    return (Rx + t * 1e-30, s + t)
                _, s = lax.fori_loop(0, iters, body, (R, jnp.zeros(())))
                return s.reshape(1)
            return loop
        return mk_loop

    bench("factor_hybrid (dinv folded)", mk_factor(True), (R, d, v), 8)
    bench("factor_hybrid (no shift)", mk_factor(False), (R, d, v), 8)

    # ---- fused factor + first solve ----
    def mk_facsolve(iters):
        @jax.jit
        def loop(R, d, v):
            def body(i, carry):
                vx, s = carry
                fac, x = factor_solve_hybrid(R, vx, dinv=1.0 / d)
                return (vx + x * 1e-20, s + x[0, 0])
            _, s = lax.fori_loop(0, iters, body, (v, jnp.zeros(())))
            return s.reshape(1)
        return loop

    bench("factor_solve_hybrid (fused)", mk_facsolve, (R, d, v), 8)

    # ---- solve only (factor passed in as jit args) ----
    fac0 = jax.jit(lambda R, d: factor_hybrid(R, dinv=1.0 / d))(R, d)
    fac0 = jax.block_until_ready(fac0)
    Gs, Ps = fac0.Gs, fac0.Ps

    def mk_solve(iters):
        from qpth_tpu.ops.hybrid import HybridFactor

        @jax.jit
        def loop(Gs, Ps, v):
            fac = HybridFactor(list(Gs), list(Ps) + [None], m, 128)

            def body(i, vv):
                return vv + solve_hybrid(fac, vv) * 1e-20
            out = lax.fori_loop(0, iters, body, v)
            return out.reshape(-1)[:8].sum(keepdims=True)
        return loop

    bench("solve_hybrid (one solve)", mk_solve,
          (tuple(Gs), tuple(p for p in Ps if p is not None), v), 16)

    # ---- diag-block factor_inv: lanes kernel vs XLA, incl. transposes ----
    def mk_block(use_lanes):
        def mk_loop(iters):
            @jax.jit
            def loop(D0, d, v):
                def body(i, carry):
                    Dx, s = carry
                    G = _spd_factor_inv_block(Dx, interpret=not use_lanes)
                    t = G[:, 0, 0].sum()
                    return (Dx + t * 1e-30, s + t)
                _, s = lax.fori_loop(0, iters, body, (D0, jnp.zeros(())))
                return s.reshape(1)
            return loop
        return mk_loop

    bench("diag block factor_inv x1 (lanes+transposes)",
          mk_block(True), (D0, d, v), 16)
    bench("diag block factor_inv x1 (XLA chol+trisolve)",
          mk_block(False), (D0, d, v), 16)

    # ---- the layout transposes alone ----
    def mk_transpose(iters):
        @jax.jit
        def loop(D0, d, v):
            def body(i, Dx):
                Dt = jnp.transpose(Dx, (1, 2, 0))
                return jnp.transpose(Dt * 1.000001, (2, 0, 1))
            out = lax.fori_loop(0, iters, body, D0)
            return out.reshape(-1)[:8].sum(keepdims=True)
        return loop

    bench("transpose pair (B,128,128)<->(128,128,B)",
          mk_transpose, (D0, d, v), 16)

    # ---- diagonal shift styles on a (B,128,128) block ----
    idx = jnp.arange(128)

    def mk_shift(style):
        def mk_loop(iters):
            @jax.jit
            def loop(D0, d, v):
                dd = d[:, :128]

                def body(i, Dx):
                    if style == "scatter":
                        return Dx.at[:, idx, idx].add(dd) * 1.000001
                    eye = jnp.eye(128, dtype=Dx.dtype)
                    return (Dx + dd[:, :, None] * eye) * 1.000001
                out = lax.fori_loop(0, iters, body, D0)
                return out.reshape(-1)[:8].sum(keepdims=True)
            return loop
        return mk_loop

    bench("diag shift via .at[].add (scatter)", mk_shift("scatter"),
          (D0, d, v), 16)
    bench("diag shift via broadcast eye", mk_shift("eye"), (D0, d, v), 16)

    # ---- GEMM bulk of block 0 (panel + trailing) ----
    G0 = jax.block_until_ready(jax.jit(
        lambda D: _spd_factor_inv_block(D, False))(D0))

    def mk_gemm(iters):
        @jax.jit
        def loop(R, G0, v):
            def body(i, carry):
                Rx, s = carry
                P = jnp.matmul(Rx[:, 128:, :128], jnp.swapaxes(G0, -1, -2),
                               precision=HIGHEST)
                S = Rx[:, 128:, 128:] - jnp.einsum(
                    "bik,bjk->bij", P, P, precision=HIGHEST)
                t = S[:, 0, 0].sum()
                return (Rx + t * 1e-30, s + t)
            _, s = lax.fori_loop(0, iters, body, (R, jnp.zeros(())))
            return s.reshape(1)
        return loop

    t = bench("block0 panel+trailing GEMMs (384-wide)", mk_gemm,
              (R, G0, v), 8)
    fl = B * (384 * 128 * 128 * 2 + 384 * 384 * 128 * 2)
    print(f"  -> block0 GEMM flops {fl/1e9:.1f} G -> "
          f"{fl/max(t,1e-9)/1e12:.1f} TFLOP/s achieved", flush=True)

    per_iter_floor = (B * m * m * 4 * 2 * 1.44 / 819e9
                      + 2 * B * m * m * 4 * 1.3 / 819e9)
    print(f"(rough per-iteration HBM floor at this shape ≈ "
          f"{per_iter_floor*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(B, m)
