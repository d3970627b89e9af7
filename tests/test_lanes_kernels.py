"""Batch-in-lanes Pallas kernels (interpret mode): factorization,
triangular inverse, fused solves, shared-R broadcast, padding edges, and
the backend wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu.ops import kkt as kkt_ops
from qpth_tpu.ops.pallas.lanes import (cho_solve_lanes, factor_inv_lanes,
                                       factor_inv_solve_lanes,
                                       factor_inv_solve_rz_lanes,
                                       factor_kkt_lanes, inv_solve_lanes,
                                       pad_spd_lanes)

from conftest import make_feasible_qp


def _problem(rng, B, n, shared=False):
    bR = 1 if shared else B
    L0 = rng.rand(bR, n, n).astype(np.float32)
    R = L0 @ L0.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
    dinv = (rng.rand(B, n) + 0.5).astype(np.float32)
    v = rng.randn(B, n).astype(np.float32)
    T = R + np.stack([np.diag(x) for x in dinv])
    R_t = pad_spd_lanes(jnp.asarray(R.transpose(1, 2, 0)))
    return R, dinv, v, T, R_t


@pytest.mark.parametrize("B,n", [(8, 8), (4, 7), (8, 13)])
def test_factor_and_solve_lanes(rng, B, n):
    R, dinv, v, T, R_t = _problem(rng, B, n)
    Lt = factor_kkt_lanes(R_t, jnp.asarray(dinv.T), interpret=True)
    Lr = np.linalg.cholesky(T)
    got = np.asarray(Lt).transpose(2, 0, 1)[:, :n, :n]
    for b_ in range(B):
        npt.assert_allclose(np.triu(got[b_]), Lr[b_].T, atol=2e-5)
    x = np.asarray(cho_solve_lanes(Lt, jnp.asarray(v.T), interpret=True)).T
    xr = np.stack([np.linalg.solve(T[b_], v[b_]) for b_ in range(B)])
    npt.assert_allclose(x, xr, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("shared", [False, True])
@pytest.mark.parametrize("B,n", [(8, 10), (4, 9)])
def test_factor_inv_lanes(rng, B, n, shared):
    R, dinv, v, T, R_t = _problem(rng, B, n, shared=shared)
    G = factor_inv_lanes(R_t, jnp.asarray(dinv.T), interpret=True)
    got = np.asarray(G).transpose(2, 0, 1)[:, :n, :n]
    Lr = np.linalg.cholesky(T)
    for b_ in range(B):
        npt.assert_allclose(got[b_], np.linalg.inv(Lr[b_]), atol=2e-5)
    x = np.asarray(inv_solve_lanes(G, jnp.asarray(v.T), interpret=True)).T
    xr = np.stack([np.linalg.solve(T[b_], v[b_]) for b_ in range(B)])
    npt.assert_allclose(x, xr, atol=2e-4, rtol=1e-3)


def test_factor_inv_solve_fused_and_rz(rng):
    B, n = 8, 11
    R, dinv, v, T, R_t = _problem(rng, B, n)
    z = rng.randn(B, n).astype(np.float32)

    G1, x1 = factor_inv_solve_lanes(R_t, jnp.asarray(dinv.T),
                                    jnp.asarray(v.T), interpret=True)
    xr = np.stack([np.linalg.solve(T[b_], v[b_]) for b_ in range(B)])
    npt.assert_allclose(np.asarray(x1).T, xr, atol=2e-4, rtol=1e-3)

    G2, x2 = factor_inv_solve_rz_lanes(
        R_t, jnp.asarray(dinv.T), jnp.asarray(v.T), jnp.asarray(z.T),
        interpret=True)
    rhs = v - np.einsum("bij,bj->bi", R, z)
    xr2 = np.stack([np.linalg.solve(T[b_], rhs[b_]) for b_ in range(B)])
    npt.assert_allclose(np.asarray(x2).T, xr2, atol=2e-3, rtol=1e-3)
    npt.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-6)


def test_lanes_backend_wrappers(rng):
    """factor/solve2/factor_solve/factor_solve_rz through the backend
    (layout transposes + batch padding) against the XLA backend."""
    B, m = 12, 9
    L0 = rng.rand(B, m, m).astype(np.float32)
    R = L0 @ L0.transpose(0, 2, 1) + m * np.eye(m, dtype=np.float32)
    d = (rng.rand(B, m) + 0.5).astype(np.float32)
    v = rng.randn(B, m).astype(np.float32)
    z = rng.randn(B, m).astype(np.float32)

    lanes = kkt_ops.pallas_lanes_backend(interpret=True)
    xla = kkt_ops.xla_backend()
    factors = kkt_ops.KKTFactors(L_Q=None, R=jnp.asarray(R), L_S11=None,
                                 S21=None, W=None)
    fl = lanes.prepare(factors)
    fx = xla.prepare(factors)

    Gf = lanes.factor(fl.R, jnp.asarray(d))
    Lf = xla.factor(fx.R, jnp.asarray(d))
    x_l = lanes.solve2(Gf, jnp.asarray(v))
    x_x = xla.solve2(Lf, jnp.asarray(v))
    npt.assert_allclose(np.asarray(x_l), np.asarray(x_x), atol=2e-4,
                        rtol=1e-3)

    _, y_l = lanes.factor_solve(fl.R, jnp.asarray(d), jnp.asarray(v))
    npt.assert_allclose(np.asarray(y_l), np.asarray(x_x), atol=2e-4,
                        rtol=1e-3)

    _, r_l = lanes.factor_solve_rz(fl.R, jnp.asarray(d), jnp.asarray(v),
                                   jnp.asarray(z))
    _, r_x = xla.factor_solve_rz(fx.R, jnp.asarray(d), jnp.asarray(v),
                                 jnp.asarray(z))
    npt.assert_allclose(np.asarray(r_l), np.asarray(r_x), atol=2e-3,
                        rtol=1e-3)


def test_improve_margin_terminates_earlier(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=10, nineq=8, neq=0,
                                        nbatch=16)
    args = [jnp.asarray(v, jnp.float32) for v in (Q, p, G, h)]
    strict = qpth_tpu.solve_qp_full(
        *args, config=qpth_tpu.SolverConfig(improve_margin=0.0))
    margin = qpth_tpu.solve_qp_full(
        *args, config=qpth_tpu.SolverConfig(improve_margin=1e-2))
    assert int(margin.stats.iterations) <= int(strict.stats.iterations)
    # solutions still agree to solver accuracy
    npt.assert_allclose(np.asarray(margin.z), np.asarray(strict.z),
                        atol=1e-3, rtol=1e-3)
