#!/usr/bin/env python3
"""Tensor-parallel prefactor accounting at the nz >= 1024 regime it
targets (round-2 verdict weak #5).

Wall-clock on the virtual CPU mesh is meaningless (core contention), but
the *compiled* sharded program is real: XLA's memory analysis reports
per-device bytes for the TP lowering, and the cost analysis reports
FLOPs — with the model axis these must drop by ~n_model for the big
(nz, nz) products. This script prints both, with and without the model
axis, from the actual GSPMD-partitioned executables.

Second question (also weak #5): the TP prefactor disables the lanes
Pallas SPD-inverse (GSPMD cannot partition a pallas_call); what does
that cost? Run single-chip (no mesh) prefactor with and without the
Pallas kernels — on a real TPU run that measures the exact penalty TP
pays at prefactor time.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ON_TPU = os.environ.get("TP_ACCT_TPU", "0") == "1"
if not ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import time

import jax

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

import qpth_tpu
from qpth_tpu.ops import kkt as kkt_ops


def mesh_accounting(nz=1024, m=1024, B=2):
    """Per-device memory + FLOPs of the compiled prefactor, 1-D batch
    mesh vs 2-D (batch, model) mesh."""
    devs = np.array(jax.devices())
    rng = np.random.RandomState(0)
    L = rng.rand(B, nz, nz).astype(np.float32)
    Q = np.matmul(L, L.transpose(0, 2, 1)) + 1e-3 * np.eye(nz,
                                                           dtype=np.float32)
    G = rng.randn(B, m, nz).astype(np.float32)
    Qj, Gj = jnp.asarray(Q), jnp.asarray(G)

    from qpth_tpu.parallel.intra import prefactor_qp_tp
    print(f"prefactor accounting at nz={nz}, m={m}, B={B} "
          f"({len(devs)} devices)\n")

    # B < n_devices is the regime the model axis exists for: a 1-D
    # batch mesh can use at most B devices, so the big (nz, nz) blocks
    # sit whole in each device's HBM; sharding nz over the model axis
    # splits them.
    rows = []
    for name, shape, axes in (("1-D batch mesh", (2, 1, 4), 1),
                              ("2-D batch x model (2x4)", (2, 4, 1), 2)):
        mesh = Mesh(devs.reshape(shape[:2]) if shape[2] == 1
                    else devs[:shape[0]*shape[1]].reshape(shape[:2]),
                    ("batch", "model"))

        def build(Q, G):
            return prefactor_qp_tp(Q, G, None, mesh=mesh)

        # prefactor_qp_tp jits internally; lower a wrapper for analysis.
        from jax.sharding import NamedSharding

        def raw(Qb, Gb):
            q_s = NamedSharding(mesh, P("batch", "model", None))
            g_s = NamedSharding(mesh, P("batch", None, "model"))
            Qb = jax.lax.with_sharding_constraint(Qb, q_s)
            Gb = jax.lax.with_sharding_constraint(Gb, g_s)
            modes = dict(kkt_ops.resolve_prefactor_modes(
                qpth_tpu.SolverConfig(), Qb.dtype),
                use_pallas_kernels=False, inverse=True)
            return kkt_ops.pre_factor_kkt(Qb, Gb, None, **modes)

        with mesh:
            lowered = jax.jit(raw).lower(Qj, Gj)
            compiled = lowered.compile()
        ma = compiled.memory_analysis()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = (ca or {}).get("flops", float("nan"))
        temp = getattr(ma, "temp_size_in_bytes", None)
        out_b = getattr(ma, "output_size_in_bytes", None)
        arg_b = getattr(ma, "argument_size_in_bytes", None)
        rows.append((name, arg_b, out_b, temp, flops))
        print(f"{name:26s} per-device: args {arg_b/2**20:8.1f} MiB  "
              f"outputs {out_b/2**20:8.1f} MiB  temps {temp/2**20:8.1f} "
              f"MiB  flops {flops/1e9:10.2f} G", flush=True)
    return rows


def pallas_inverse_penalty(nz=512, B=1024, trials=3):
    """Single-chip prefactor wall time with vs without the Pallas SPD
    inverse — the penalty the TP path pays for disabling it."""
    rng = np.random.RandomState(0)
    L = rng.rand(B, nz, nz).astype(np.float32)
    Q = np.matmul(L, L.transpose(0, 2, 1)) + 1e-3 * np.eye(
        nz, dtype=np.float32)
    G = rng.randn(B, nz, nz).astype(np.float32)
    Qj, Gj = jnp.asarray(Q), jnp.asarray(G)

    print(f"\nPallas-SPD-inverse penalty, single chip, nz={nz}, B={B}:")
    print("  (at nz beyond the lanes VMEM wall ~136 both arms take the "
        "same XLA path — the TP penalty is structurally zero there)")
    for use_pallas in (True, False):
        # Reduce the result INSIDE jit: reading back a (B, nz, nz) array
        # through the axon tunnel (~30 MB/s) would dominate the timing.
        f = jax.jit(lambda Q, G: kkt_ops.pre_factor_kkt(
            Q, G, None, inverse=True,
            use_pallas_kernels=use_pallas).R.ravel()[:128].sum())
        np.asarray(f(Qj, Gj))   # compile+sync (block_until_ready no-ops)
        ts = []
        for i in range(trials):
            Qi = Qj * (1.0 + 1e-6 * (i + 1))  # distinct inputs: the
            t0 = time.perf_counter()          # tunnel memoizes repeats
            np.asarray(f(Qi, Gj))
            ts.append(time.perf_counter() - t0)
        print(f"  use_pallas_kernels={use_pallas}: {min(ts)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    if ON_TPU:
        pallas_inverse_penalty(nz=int(os.environ.get("TP_NZ", 512)),
                               B=int(os.environ.get("TP_B", 1024)))
    else:
        mesh_accounting()
