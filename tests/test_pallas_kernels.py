"""Pallas kernel correctness (interpret mode on CPU) and end-to-end
equivalence of the Pallas solver path with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
import qpth_tpu.ops.linalg as LA
from qpth_tpu.ops.pallas.cholesky import (cho_solve_vec_t_pallas,
                                          cholesky_t_pallas,
                                          factor_kkt_t_pallas)

from conftest import make_feasible_qp


def _spd(rng, B, n, dtype=np.float32):
    L0 = rng.rand(B, n, n).astype(dtype)
    return L0 @ L0.transpose(0, 2, 1) + 5 * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("B,n", [(16, 16), (8, 24), (4, 7), (2, 1)])
def test_cholesky_t(rng, B, n):
    A = jnp.asarray(_spd(rng, B, n))
    Lt = cholesky_t_pallas(A)
    Lr = jnp.linalg.cholesky(A)
    npt.assert_allclose(np.asarray(jnp.swapaxes(Lt, -1, -2)),
                        np.asarray(Lr), atol=5e-5)


@pytest.mark.parametrize("shared", [False, True])
def test_factor_kkt_t(rng, shared):
    B, n = 6, 12
    A = jnp.asarray(_spd(rng, 1 if shared else B, n))
    d = jnp.asarray(rng.rand(B, n).astype(np.float32) + 0.5)
    Lt = factor_kkt_t_pallas(A, d)
    Lr = jnp.linalg.cholesky(LA.add_diag(A, 1.0 / d))
    npt.assert_allclose(np.asarray(jnp.swapaxes(Lt, -1, -2)),
                        np.asarray(Lr), atol=5e-5)


@pytest.mark.parametrize("shared", [False, True])
def test_cho_solve_vec_t(rng, shared):
    B, n = 6, 16
    A = jnp.asarray(_spd(rng, 1 if shared else B, n))
    L = jnp.linalg.cholesky(A)
    v = jnp.asarray(rng.randn(B, n).astype(np.float32))
    x = cho_solve_vec_t_pallas(jnp.swapaxes(L, -1, -2), v)
    xr = LA.cho_solve_vec(L, v)
    npt.assert_allclose(np.asarray(x), np.asarray(xr), atol=5e-5, rtol=1e-3)


def test_non_spd_lane_yields_nan(rng):
    B, n = 4, 8
    A = _spd(rng, B, n)
    A[2] = -np.eye(n, dtype=np.float32)
    Lt = cholesky_t_pallas(jnp.asarray(A))
    bad = np.isnan(np.asarray(Lt)).any(axis=(1, 2))
    assert bad[2] and not bad[0] and not bad[1] and not bad[3]


@pytest.mark.parametrize(
    "neq", [pytest.param(0, marks=pytest.mark.slow),
            pytest.param(2, marks=pytest.mark.slow)])
def test_pallas_solver_path_matches_xla(rng, neq):
    """End-to-end: use_pallas=True (interpret) == use_pallas=False, forward
    and gradients. float32, small shapes (interpret mode is slow)."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=4, neq=neq,
                                        nbatch=4)
    args = [jnp.asarray(v, jnp.float32) if v is not None else None
            for v in (Q, p, G, h, A, b)]
    cfg_x = qpth_tpu.SolverConfig(use_pallas=False)
    cfg_p = qpth_tpu.SolverConfig(use_pallas=True)

    z_x = qpth_tpu.solve_qp(*args, config=cfg_x)
    z_p = qpth_tpu.solve_qp(*args, config=cfg_p)
    npt.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                        atol=1e-4, rtol=1e-3)

    def loss(cfg, p_):
        return jnp.sum(qpth_tpu.solve_qp(args[0], p_, args[2], args[3],
                                         args[4], args[5], config=cfg) ** 2)

    g_x = jax.grad(lambda p_: loss(cfg_x, p_))(args[1])
    g_p = jax.grad(lambda p_: loss(cfg_p, p_))(args[1])
    npt.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                        atol=1e-3, rtol=1e-2)


def test_inverse_solve_method_xla(rng):
    """solve_method='inverse' on the XLA path matches substitution."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=5, neq=2, nbatch=4)
    args = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]
    z_s = qpth_tpu.solve_qp(*args, config=qpth_tpu.SolverConfig(
        use_pallas=False, solve_method="subst"))
    z_i = qpth_tpu.solve_qp(*args, config=qpth_tpu.SolverConfig(
        use_pallas=False, solve_method="inverse"))
    npt.assert_allclose(np.asarray(z_i), np.asarray(z_s), atol=1e-9)


def test_trinv_kernel(rng):
    from qpth_tpu.ops.pallas.cholesky import trinv_pallas

    B, n = 4, 20
    L0 = rng.rand(B, n, n).astype(np.float32)
    A = L0 @ L0.transpose(0, 2, 1) + 5 * np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(A)
    invL = trinv_pallas(jnp.asarray(L.transpose(0, 2, 1)))
    npt.assert_allclose(np.asarray(invL), np.linalg.inv(L), atol=1e-5)
