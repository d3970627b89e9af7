#!/usr/bin/env python3
"""Weak-scaling benchmark: fixed per-device QP batch, growing device count.

The BASELINE target is >=90% weak-scaling efficiency across hosts. The IPM
is embarrassingly parallel over the batch except for two scalar
all-reduces per iteration (improvement flag + max residual — the sharded
analogs of reference batch.py:127,140), so efficiency should stay near 1.

Without a pod this runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``); on real hardware it uses
every visible chip. Usage:

    python benchmarks/weak_scaling.py [--per-device 64] [--nz 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    # The container may pin a default jax platform in sitecustomize;
    # honor JAX_PLATFORMS explicitly (must happen before first backend use).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=64)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--nineq", type=int, default=40)
    ap.add_argument("--max-devices", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) == 1 and jax.default_backend() != "tpu":
        print("note: single device — rerun with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "JAX_PLATFORMS=cpu for a virtual mesh")
    if jax.default_backend() == "cpu" and len(jax.devices()) > 1:
        print("note: virtual CPU devices share physical cores — efficiency "
              "numbers here validate the sharded path's correctness and "
              "collective overhead only; real weak-scaling requires chips")
    import jax.numpy as jnp
    import numpy as np

    import qpth_tpu
    from qpth_tpu.parallel import batch_mesh, solve_qp_sharded

    devices = jax.devices()[:args.max_devices]
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False, max_iter=15)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base = None
    print(f"{'devices':>8} {'batch':>7} {'time_ms':>9} {'eff':>6}")
    for nd in sizes:
        B = args.per_device * nd
        npr = np.random.RandomState(0)
        L = npr.rand(B, args.nz, args.nz).astype(np.float32)
        Q = L @ L.transpose(0, 2, 1) + 0.1 * np.eye(args.nz,
                                                    dtype=np.float32)
        G = npr.randn(B, args.nineq, args.nz).astype(np.float32)
        z0 = npr.randn(B, args.nz).astype(np.float32)
        s0 = npr.rand(B, args.nineq).astype(np.float32)
        h = np.einsum("bmn,bn->bm", G, z0) + s0
        p = npr.randn(B, args.nz).astype(np.float32)
        mesh = batch_mesh(devices[:nd])

        fn = jax.jit(lambda Q, p, G, h: solve_qp_sharded(
            Q, p, G, h, mesh=mesh, config=cfg))
        ja = [jnp.asarray(v) for v in (Q, p, G, h)]
        np.asarray(fn(*ja))  # compile+warm
        ts = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(fn(*ja))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if base is None:
            base = t
        eff = base / t
        print(f"{nd:>8} {B:>7} {t*1e3:>9.1f} {eff:>6.2f}")


if __name__ == "__main__":
    main()
