"""Randomized property sweep over the dense path's configuration space
(the round-5 fuzzer, seeded): random shapes (including n=1/m=1 and
shared/batched mixes), dtypes, scale factors, and config axes
(equilibration, resid_every, Gondzio, refinement, the eps dial, FULL/IR
solvers, pallas off, mean-mode grads) — every draw must produce finite
solutions/stats, match the f64 oracle on its converged lanes, and
propagate finite gradients. Two production bugs were found by exactly
this sweep (the refined-forward backward dtype crash and the
reference's own mu-stall, tests/test_refine.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig
from qpth_tpu.config import KKTSolver
from qpth_tpu.solvers.oracle import solve_qp_batch_np


def _run_sweep(seed, n_cases):
    rng = np.random.RandomState(seed)
    for case in range(n_cases):
        B = int(rng.choice([1, 2, 3, 8]))
        n = int(rng.choice([1, 2, 3, 5, 9, 16, 33]))
        m = int(rng.choice([1, 2, 4, 7, 12, 20]))
        neq = min(int(rng.choice([0, 1, 2, 3])), max(n - 1, 0))
        dt = rng.choice([np.float32, np.float64])
        shared_Q = bool(rng.rand() < 0.4)
        shared_G = bool(rng.rand() < 0.3)
        scale = 10.0 ** rng.uniform(-2, 2)
        kw = {}
        r = rng.rand()
        if r < 0.2:
            kw["equilibrate"] = False
        elif r < 0.3:
            kw["equilibrate"] = True
        if rng.rand() < 0.2:
            kw["resid_every"] = int(rng.choice([0, 1, 3, 5]))
        if rng.rand() < 0.15:
            kw["n_correctors"] = 1
        if rng.rand() < 0.15:
            kw["refine_steps"] = int(rng.choice([1, 3]))
        if rng.rand() < 0.1:
            kw["eps"] = 1e-8
        if rng.rand() < 0.15:
            kw["kkt_solver"] = rng.choice([KKTSolver.FULL, KKTSolver.IR])
        if rng.rand() < 0.2:
            kw["use_pallas"] = False
        if rng.rand() < 0.1:
            kw["broadcast_grad_reduction"] = "mean"

        def mk(shared, *dims):
            return rng.randn(*((() if shared else (B,)) + dims))

        L = mk(shared_Q, n, n)
        Q = (np.swapaxes(L, -1, -2) @ L if shared_Q
             else L @ np.swapaxes(L, -1, -2))
        Q = scale * (Q + (0.1 + rng.rand()) * np.eye(n))
        G = mk(shared_G, m, n)
        z0 = rng.randn(n)
        s0 = rng.rand(*(() if shared_G else (B,)), m) + 0.05
        h = G @ z0 + s0
        p = rng.randn(B, n)
        if neq:
            A = rng.randn(neq, n)
            b = A @ z0
        else:
            A = b = None
        desc = (f"case {case}: B={B} n={n} m={m} neq={neq} "
                f"dt={np.dtype(dt).name} sQ={shared_Q} sG={shared_G} "
                f"scale={scale:.2g} kw={kw}")

        args = [None if v is None else jnp.asarray(v, dt)
                for v in (Q, p, G, h, A, b)]
        cfg = SolverConfig(check_Q_spd=False, verbose=-1, **kw)
        sol = qpth_tpu.solve_qp_full(*args, config=cfg)
        z = np.asarray(sol.z, np.float64)
        if sol.lo is not None:
            z = z + np.asarray(sol.lo.z, np.float64)
        assert np.isfinite(z).all(), desc
        assert np.isfinite(np.asarray(sol.stats.best_resids)).all(), desc

        f64 = lambda v: np.asarray(v, np.float64)
        xo, _, _, _ = solve_qp_batch_np(
            f64(Q), f64(p), f64(G), f64(h),
            None if A is None else f64(A),
            None if b is None else f64(b))
        ok = np.isfinite(xo).all(axis=-1)
        # Degenerate draws can stall ANY Mehrotra loop (reference
        # included — see test_auto_refine_fixes_reference_mu_stall);
        # require oracle agreement only on lanes the solver itself
        # reports as accurate.
        good = ok & (np.asarray(sol.stats.best_resids, np.float64) < 1e-4)
        if good.any():
            zs = max(1.0, np.abs(xo[good]).max())
            err = np.abs(z[good] - xo[good]).max() / zs
            tol = 5e-3 if dt == np.float32 else 1e-5
            assert err < tol, f"{desc}: solution err {err:.3g}"

        g = jax.grad(lambda pp: (qpth_tpu.solve_qp(
            args[0], pp, args[2], args[3], args[4], args[5],
            config=cfg) ** 2).sum())(args[1])
        assert np.isfinite(np.asarray(g)).all(), desc


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_dense_path_property_sweep(seed):
    _run_sweep(seed, 16)


def test_dense_path_property_smoke():
    """Fast-tier slice of the sweep."""
    _run_sweep(7, 5)
