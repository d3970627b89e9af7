#!/usr/bin/env python3
"""Large-problem benchmark: the XLA fallback regime beyond the lanes
kernels' VMEM wall (m > ~136), up to the BASELINE config-4 envelope
(nz up to 512, batch up to 8192, neq > 0).

Reports ms/solve, QPs/sec, and a roofline estimate for the per-iteration
factor+solve work: the dense IPM's per-iteration FLOPs are dominated by
the (m x m) Cholesky (m^3/3 MAC) + two triangular solve pairs
(~2 m^2 MAC each) + the Schur/backsub GEMV chain; we compare the achieved
FLOP rate against the chip's f32 peak and the HBM stream time of the
working set to show which roof binds.

Memory note: at nz = 512 each (B, nz, nz) operand is 1 MB/lane; the
inverse-mode working set is ~5 such operands, so batch is capped by HBM
(16 GB on v5e) well below 8192 — the sweep uses the largest batch that
fits, and the (8192, 512) BASELINE corner is reported as the sharded
multi-chip extrapolation it requires.

    python benchmarks/prof_large.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

#: v5e single-chip roofs (bf16 MXU halves for f32; HBM ~819 GB/s).
F32_TFLOPS = 98.0 / 2
HBM_GBPS = 819.0


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--backend", default="auto",
                    help="auto (hybrid above the VMEM wall) | xla")
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

    # (nz=nineq, neq, batch): the config-4 ladder that fits one chip's HBM.
    cases = [(200, 0, 2048), (200, 32, 2048), (256, 32, 2048),
             (500, 0, 512), (512, 64, 512), (512, 64, 1024)]
    if args.quick:
        cases = [(200, 0, 1024), (512, 64, 512)]

    cfg = qpth_tpu.SolverConfig(
        check_Q_spd=False,
        use_pallas=("auto" if args.backend == "auto" else args.backend),
        solve_method=("inverse" if args.backend == "xla" else "auto"))
    dt = jnp.float32

    print(f"{'nz':>5} {'neq':>4} {'B':>6} {'iters':>5} {'ms/solve':>9} "
          f"{'QPs/s':>10} {'TFLOP/s':>8} {'%f32peak':>8} {'resid':>9}")
    for n, neq, B in cases:
        npr = np.random.RandomState(0)
        L = npr.rand(B, n, n).astype(np.float32)
        Q = (L @ L.transpose(0, 2, 1) + n * 0.05 * np.eye(n)).astype(
            np.float32)
        G = npr.randn(B, n, n).astype(np.float32) / np.sqrt(n)
        z0 = npr.randn(n).astype(np.float32)
        h = (np.einsum("bmn,n->bm", G, z0)
             + npr.rand(B, n).astype(np.float32))
        p = npr.randn(B, n).astype(np.float32)
        if neq:
            A = npr.randn(B, neq, n).astype(np.float32) / np.sqrt(n)
            beq = np.einsum("ben,n->be", A, z0).astype(np.float32)
        else:
            A = beq = None

        ja = [jnp.asarray(v) if v is not None else None
              for v in (Q, p, G, h, A, beq)]

        # Direct timing with cycled inputs. At these sizes one solve is
        # 100+ ms, far above the ~30 ms tunnel dispatch latency, so
        # chained-dispatch amortization is unnecessary. Every operand is
        # an explicit jit ARGUMENT: closed-over (B, n, n) arrays would be
        # embedded in the program as hundreds of MB of literal constants,
        # blowing past the axon remote-compile request limit (HTTP 413)
        # and slowing compilation enormously. The tunnel memoizes
        # repeated identical dispatches, so distinct pre-staged p
        # variants are cycled; each call is synced by a host readback.
        @jax.jit
        def run_args(Q_, G_, h_, A_, b_, p_):
            sol = qpth_tpu.solve_qp_full(Q_, p_, G_, h_, A_, b_,
                                         config=cfg)
            return sol.stats.best_resids, sol.stats.iterations

        def run(p_):
            return run_args(ja[0], ja[2], ja[3], ja[4], ja[5], p_)

        # Distinct inputs for every single dispatch (the tunnel memoizes
        # identical executable+input pairs across trials too).
        p_vars = [[jnp.asarray(p + 1e-4
                               * npr.randn(B, n).astype(np.float32))
                   for _ in range(args.repeats)]
                  for _ in range(args.trials + 1)]
        res0, it0 = run(p_vars[-1][0])
        resid = float(np.asarray(res0).max())
        iters = int(np.asarray(it0))
        ts = []
        for t in range(args.trials):
            t0 = time.perf_counter()
            for pv in p_vars[t]:
                np.asarray(run(pv)[0])
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.repeats

        # FLOP model (per solve): one-time prefactor (Q^-1 via cholesky +
        # triangular inverse ~ n^3 MAC + Q^-1 G^T n^2 m + G(Q^-1 G^T)
        # n m^2) + iters * (factor m^3/3 + ~6 m^2-level matvecs).
        m = n
        pre = n**3 + n * n * m + n * m * m
        if neq:
            pre += 2 * n * n * neq + 2 * neq * neq * n
        per_it = m**3 / 3 + 8 * m * m
        flops = 2.0 * B * (pre + iters * per_it)
        tf = flops / per / 1e12
        print(f"{n:>5} {neq:>4} {B:>6} {iters:>5} {per*1e3:>9.1f} "
              f"{B/per:>10,.0f} {tf:>8.2f} {100*tf/F32_TFLOPS:>7.1f}% "
              f"{resid:>9.2e}")


if __name__ == "__main__":
    main()
