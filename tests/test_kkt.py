"""KKT solver cross-consistency — tier 2 of the reference's test strategy
(test.py:190-247): the full saddle solve, the pre-factored Schur path, and
the iterative-refinement path must agree on random batched KKT systems with
mixed batched/unbatched parameters."""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from qpth_tpu.ops import kkt as kkt_ops
from qpth_tpu.utils import bdiag

ATOL, RTOL = 1e-8, 1e-8


def get_kkt_problem(rng, nbatch=2, nx=5, nineq=4, neq=3):
    """Mirrors the reference fixture (test.py:190-219): unbatched Q/p/A/b,
    batched G/h — exercising minimal-batch broadcasting."""
    L = rng.randn(nx, nx)
    Q = jnp.asarray(L @ L.T + 1e-8 * np.eye(nx))[None]        # (1, nx, nx)
    G = jnp.asarray(rng.randn(nbatch, nineq, nx))             # (B, ...)
    A = jnp.asarray(rng.randn(neq, nx))[None] if neq else None

    d = jnp.asarray(rng.rand(nbatch, nineq))
    rx = jnp.asarray(rng.rand(nbatch, nx))
    rs = jnp.asarray(rng.rand(nbatch, nineq))
    rz = jnp.asarray(rng.rand(nbatch, nineq))
    ry = jnp.asarray(rng.rand(nbatch, neq)) if neq else None
    return Q, G, A, d, rx, rs, rz, ry


@pytest.mark.parametrize("neq", [3, 0])
def test_full_vs_partial(rng, neq):
    Q, G, A, d, rx, rs, rz, ry = get_kkt_problem(rng, neq=neq)

    dx, ds, dz, dy = kkt_ops.factor_solve_kkt(Q, bdiag(d), G, A,
                                              rx, rs, rz, ry)

    factors = kkt_ops.pre_factor_kkt(Q, G, A)
    L_T = kkt_ops.factor_kkt(factors, d)
    dx2, ds2, dz2, dy2 = kkt_ops.solve_kkt(factors, L_T, d, G, A,
                                           rx, rs, rz, ry)

    npt.assert_allclose(dx, dx2, rtol=RTOL, atol=ATOL)
    npt.assert_allclose(ds, ds2, rtol=RTOL, atol=ATOL)
    npt.assert_allclose(dz, dz2, rtol=RTOL, atol=ATOL)
    if neq:
        npt.assert_allclose(dy, dy2, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("neq", [3, 0])
def test_ir_vs_full(rng, neq):
    """IR path agrees at its regularization-limited accuracy
    (reference tolerance: ATOL=1e-2/RTOL=1e-4, test.py:35-36)."""
    Q, G, A, d, rx, rs, rz, ry = get_kkt_problem(rng, neq=neq)

    dx, ds, dz, dy = kkt_ops.factor_solve_kkt(Q, bdiag(d), G, A,
                                              rx, rs, rz, ry)
    dx2, ds2, dz2, dy2 = kkt_ops.solve_kkt_ir(Q, bdiag(d), G, A,
                                              rx, rs, rz, ry, niter=1)

    npt.assert_allclose(dx, dx2, rtol=1e-4, atol=1e-2)
    npt.assert_allclose(ds, ds2, rtol=1e-4, atol=1e-2)
    npt.assert_allclose(dz, dz2, rtol=1e-4, atol=1e-2)
    if neq:
        npt.assert_allclose(dy, dy2, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("neq", [3, 0])
def test_solve_kkt_satisfies_newton_system(rng, neq):
    """Property test the reference lacks: the partial-path solution satisfies
    the raw (unreduced) Newton KKT equations."""
    Q, G, A, d, rx, rs, rz, ry = get_kkt_problem(rng, neq=neq)
    factors = kkt_ops.pre_factor_kkt(Q, G, A)
    L_T = kkt_ops.factor_kkt(factors, d)
    dx, ds, dz, dy = kkt_ops.solve_kkt(factors, L_T, d, G, A, rx, rs, rz, ry)

    GT = jnp.swapaxes(G, -1, -2)
    res1 = (jnp.matmul(Q, dx[..., None])[..., 0]
            + jnp.matmul(GT, dz[..., None])[..., 0] + rx)
    if neq:
        AT = jnp.swapaxes(A, -1, -2)
        res1 = res1 + jnp.matmul(AT, dy[..., None])[..., 0]
        res4 = jnp.matmul(A, dx[..., None])[..., 0] + ry
        npt.assert_allclose(np.asarray(res4), 0, atol=1e-8)
    res2 = d * ds + dz + rs
    res3 = jnp.matmul(G, dx[..., None])[..., 0] + ds + rz
    npt.assert_allclose(np.asarray(res1), 0, atol=1e-8)
    npt.assert_allclose(np.asarray(res2), 0, atol=1e-8)
    npt.assert_allclose(np.asarray(res3), 0, atol=1e-8)


def test_shared_factor_fast_path_matches_batched(rng):
    """Factoring a shared problem once (batch dim 1) must equal factoring
    materialized copies (what the reference always does, util.py:44-50)."""
    Q, G, A, d, rx, rs, rz, ry = get_kkt_problem(rng, nbatch=3)
    B = 3
    Qe = jnp.broadcast_to(Q, (B,) + Q.shape[1:])
    Ae = jnp.broadcast_to(A, (B,) + A.shape[1:])

    f1 = kkt_ops.pre_factor_kkt(Q, G, A)
    f2 = kkt_ops.pre_factor_kkt(Qe, G, Ae)
    out1 = kkt_ops.solve_kkt(f1, kkt_ops.factor_kkt(f1, d), d, G, A,
                             rx, rs, rz, ry)
    out2 = kkt_ops.solve_kkt(f2, kkt_ops.factor_kkt(f2, d), d, G, Ae,
                             rx, rs, rz, ry)
    for a, b in zip(out1, out2):
        npt.assert_allclose(np.asarray(a), np.asarray(b),
                            rtol=1e-10, atol=1e-10)
