"""Gradient correctness vs finite differences — tier 1, the core guarantee
(reference test.py:99-187): analytic implicit-KKT gradients for each of the
six parameters are compared against central differences of a scalar loss
``0.5 * ||z(theta) - z_true||^2`` where the FD probe re-solves with the
*independent CPU oracle* as the forward — cross-solver consistency exactly as
the reference does (CVXPY FD probe vs PDIPM analytic grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu.solvers.oracle import solve_qp_np

from conftest import fd_grad, make_feasible_qp

# Reference tolerances, test.py:35-36.
ATOL, RTOL = 1e-2, 1e-4


def _setup(rng, nz=10, nineq=3, neq=2, **scales):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=nz, nineq=nineq, neq=neq,
                                        **scales)
    z_true = rng.randn(nz)
    return Q, p, G, h, A, b, z_true


def _analytic_grads(Q, p, G, h, A, b, z_true):
    args = [jnp.asarray(v) for v in (Q, p, G, h) +
            ((A, b) if A is not None else ())]

    def loss(*theta):
        z = qpth_tpu.solve_qp(*theta)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


def _fd_loss(Q, p, G, h, A, b, z_true):
    def f(theta_dict):
        _, z, _, _, _ = solve_qp_np(
            theta_dict.get("Q", Q), theta_dict.get("p", p),
            theta_dict.get("G", G), theta_dict.get("h", h),
            theta_dict.get("A", A), theta_dict.get("b", b))
        return 0.5 * np.sum((z - z_true) ** 2)
    return f


@pytest.mark.parametrize("param,idx,neq,scales", [
    ("p", 1, 2, dict(q_scale=100.0, g_scale=100.0, a_scale=100.0)),
    ("Q", 0, 2, {}),
    ("G", 2, 0, {}),
    ("h", 3, 0, dict(q_scale=1.0, g_scale=1.0)),
    ("A", 4, 3, dict(q_scale=100.0, g_scale=100.0, a_scale=100.0)),
    ("b", 5, 3, dict(q_scale=100.0, g_scale=100.0, a_scale=100.0)),
])
def test_dl_dparam(rng, param, idx, neq, scales):
    nineq = 1 if param in ("A", "b") else 3
    Q, p, G, h, A, b, z_true = _setup(rng, nineq=nineq, neq=neq, **scales)
    grads = _analytic_grads(Q, p, G, h, A, b, z_true)
    analytic = np.asarray(grads[idx])

    base = {"Q": Q, "p": p, "G": G, "h": h, "A": A, "b": b}
    loss = _fd_loss(Q, p, G, h, A, b, z_true)
    if param == "Q":
        # The analytic dQ is the gradient on the symmetric manifold
        # (0.5*(dx z^T + z dx^T), qp.py:173); probe accordingly. (The
        # reference has no FD test for Q at all.)
        fd = fd_grad(lambda v: loss({param: 0.5 * (v + v.T)}), base[param])
    else:
        fd = fd_grad(lambda v: loss({param: v}), base[param])
    npt.assert_allclose(fd, analytic, rtol=RTOL, atol=ATOL)


def test_dl_dQ_symmetrized(rng):
    """dQ is returned symmetrized, 0.5*(dx z^T + z dx^T) (qp.py:173)."""
    Q, p, G, h, A, b, z_true = _setup(rng)
    dQ = np.asarray(_analytic_grads(Q, p, G, h, A, b, z_true)[0])
    npt.assert_allclose(dQ, dQ.T, atol=1e-12)


@pytest.mark.slow
def test_batched_grads_match_per_instance(rng):
    """Batched backward == stacked per-instance backwards (pure batch
    parallelism — no cross-talk between lanes).

    Uses a generous iteration budget: the not-improved termination window is
    *global* across the batch (faithful to batch.py:127), so with the default
    window a lane can get more iterations inside a batch than solo — verified
    to be bit-identical behavior to the reference on such a problem.
    """
    B, nz, m, neq = 3, 8, 4, 2
    cfg = qpth_tpu.SolverConfig(max_iter=40, not_improved_lim=10)
    Q, _, G, h, A, b = make_feasible_qp(rng, nz=nz, nineq=m, neq=neq)
    P = rng.randn(B, nz)
    z_true = rng.randn(B, nz)

    def loss_batched(p_all):
        z = qpth_tpu.solve_qp(jnp.asarray(Q), p_all, jnp.asarray(G),
                              jnp.asarray(h), jnp.asarray(A), jnp.asarray(b),
                              config=cfg)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    g_batched = np.asarray(jax.grad(loss_batched)(jnp.asarray(P)))

    for i in range(B):
        def loss_i(p_i):
            z = qpth_tpu.solve_qp(jnp.asarray(Q), p_i[None],
                                  jnp.asarray(G), jnp.asarray(h),
                                  jnp.asarray(A), jnp.asarray(b), config=cfg)
            return 0.5 * jnp.sum((z[0] - z_true[i]) ** 2)
        g_i = np.asarray(jax.grad(loss_i)(jnp.asarray(P[i])))
        npt.assert_allclose(g_batched[i], g_i, rtol=1e-6, atol=1e-8)


def test_broadcast_reduction_sum_vs_mean(rng):
    """Unbatched params: 'sum' is the correct vjp; 'mean' reproduces the
    reference's .mean(0) behavior (qp.py:159-177) = sum / B."""
    B = 4
    Q, _, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2)
    P = rng.randn(B, 6)

    def loss(cfg):
        def f(hv):
            z = qpth_tpu.solve_qp(jnp.asarray(Q), jnp.asarray(P),
                                  jnp.asarray(G), hv,
                                  jnp.asarray(A), jnp.asarray(b),
                                  config=cfg)
            return jnp.sum(z ** 2)
        return jax.grad(f)(jnp.asarray(h))

    g_sum = np.asarray(loss(qpth_tpu.SolverConfig()))
    g_mean = np.asarray(loss(qpth_tpu.SolverConfig(
        broadcast_grad_reduction="mean")))
    npt.assert_allclose(g_sum / B, g_mean, rtol=1e-10)

    # FD check of the sum semantics against the oracle.
    def np_loss(hv):
        tot = 0.0
        for i in range(B):
            _, z, _, _, _ = solve_qp_np(Q, P[i], G, hv, A, b)
            tot += np.sum(z ** 2)
        return tot

    fd = fd_grad(np_loss, h)
    npt.assert_allclose(fd, g_sum, rtol=RTOL, atol=ATOL)


def test_check_grads_vjp(rng):
    """jax.test_util-style probe: custom vjp vs numerical differentiation of
    our own forward (an addition over the reference's strategy)."""
    from jax.test_util import check_grads

    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2)
    argsf = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]

    def f(p_, h_):
        return qpth_tpu.solve_qp(argsf[0], p_, argsf[2], h_, argsf[4],
                                 argsf[5]).sum()

    check_grads(f, (argsf[1], argsf[3]), order=1, modes=("rev",),
                atol=1e-3, rtol=1e-3)
