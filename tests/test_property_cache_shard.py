"""Randomized consistency sweep: fresh vs cached-prefactor solves,
warm-start fixed points, cached-factor gradients, and sharded-vs-single
device agreement — the invariants the receding-horizon (MPC) and
multi-chip paths depend on (round-5 fuzzer, seeded)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig
from qpth_tpu.parallel import batch_mesh, solve_qp_sharded


def _run_sweep(seed, n_cases):
    rng = np.random.RandomState(seed)
    for case in range(n_cases):
        B = int(rng.choice([8, 16]))
        n = int(rng.choice([4, 9, 16]))
        m = int(rng.choice([3, 8, 14]))
        neq = min(int(rng.choice([0, 2])), n - 1)
        dt = rng.choice([np.float32, np.float64])
        shared = bool(rng.rand() < 0.5)

        def mk(sh, *dims):
            return rng.randn(*((() if sh else (B,)) + dims))

        L = mk(shared, n, n)
        Q = (np.swapaxes(L, -1, -2) @ L if shared
             else L @ np.swapaxes(L, -1, -2)) \
            + (0.3 + rng.rand()) * np.eye(n)
        G = mk(shared, m, n)
        z0 = rng.randn(n)
        h = G @ z0 + rng.rand(*(() if shared else (B,)), m) + 0.05
        p = rng.randn(B, n)
        A = rng.randn(neq, n) if neq else None
        b = A @ z0 if neq else None
        kw = {}
        if rng.rand() < 0.3:
            kw["equilibrate"] = bool(rng.rand() < 0.5)
        cfg = SolverConfig(check_Q_spd=False, verbose=-1, **kw)
        desc = (f"case {case}: B={B} n={n} m={m} neq={neq} "
                f"dt={np.dtype(dt).name} shared={shared} kw={kw}")

        args = [None if v is None else jnp.asarray(v, dt)
                for v in (Q, p, G, h, A, b)]
        sol = qpth_tpu.solve_qp_full(*args, config=cfg)
        fac = qpth_tpu.prefactor_qp(args[0], args[2], args[4], config=cfg)
        sol_c = qpth_tpu.solve_qp_full(*args, config=cfg, factors=fac)
        d1 = np.abs(np.asarray(sol.z) - np.asarray(sol_c.z)).max()
        assert d1 < (1e-5 if dt == np.float32 else 1e-10), (desc, d1)
        sol_w = qpth_tpu.solve_qp_full(
            *args, config=cfg, factors=fac,
            init=(sol.z, sol.s, sol.lam, sol.nu))
        zs = max(1.0, np.abs(np.asarray(sol.z)).max())
        d2 = np.abs(np.asarray(sol_w.z) - np.asarray(sol.z)).max() / zs
        assert d2 < 2e-3, (desc, d2)
        gf = jax.grad(lambda pp: (qpth_tpu.solve_qp(
            args[0], pp, *args[2:], config=cfg) ** 2).sum())(args[1])
        gc = jax.grad(lambda pp: (qpth_tpu.solve_qp(
            args[0], pp, *args[2:], config=cfg,
            factors=fac) ** 2).sum())(args[1])
        gs = max(1.0, np.abs(np.asarray(gf)).max())
        d3 = np.abs(np.asarray(gf) - np.asarray(gc)).max() / gs
        assert d3 < (1e-4 if dt == np.float32 else 1e-9), (desc, d3)
        mesh = batch_mesh()
        z_sh = solve_qp_sharded(*args, mesh=mesh, config=cfg)
        d4 = np.abs(np.asarray(z_sh) - np.asarray(sol.z)).max()
        assert d4 < (1e-5 if dt == np.float32 else 1e-10), (desc, d4)


@pytest.mark.slow
def test_cache_warm_shard_property_sweep():
    _run_sweep(0, 6)
