"""API-layer semantics: batching/broadcast inference, the empty-constraint
convention, the QPFunction factory, and jit/vmap composition."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu import QPFunction, SolverConfig

from conftest import make_feasible_qp


def test_batch_inference_from_any_param(rng):
    """extract_nBatch semantics (util.py:53-59): the batch size may come
    from any single batched parameter."""
    B = 5
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2)
    pB = rng.randn(B, 6)
    z = qpth_tpu.solve_qp(jnp.asarray(Q), jnp.asarray(pB), jnp.asarray(G),
                          jnp.asarray(h), jnp.asarray(A), jnp.asarray(b))
    assert z.shape == (B, 6)

    hB = np.broadcast_to(h, (B, 3)).copy()
    z2 = qpth_tpu.solve_qp(jnp.asarray(Q), jnp.asarray(p), jnp.asarray(G),
                           jnp.asarray(hB), jnp.asarray(A), jnp.asarray(b))
    assert z2.shape == (B, 6)
    npt.assert_allclose(np.asarray(z2[0]), np.asarray(z2[1]), atol=1e-12)


def test_empty_constraint_conventions(rng):
    """None and zero-sized arrays both mean 'no equality constraints'
    (reference: e = torch.Tensor(), qp.py:58-61)."""
    Q, p, G, h, _, _ = make_feasible_qp(rng, nz=6, nineq=4, neq=0)
    args = [jnp.asarray(v) for v in (Q, p, G, h)]
    z_none = qpth_tpu.solve_qp(*args, None, None)
    e = jnp.zeros((0,))
    z_empty = qpth_tpu.solve_qp(*args, e, e)
    npt.assert_allclose(np.asarray(z_none), np.asarray(z_empty))


def test_qpfunction_factory_matches_solve_qp(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2, nbatch=2)
    args = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]
    f = QPFunction(verbose=-1)
    npt.assert_allclose(np.asarray(f(*args)),
                        np.asarray(qpth_tpu.solve_qp(*args)))


@pytest.mark.slow
def test_qpfunction_kwargs_forwarding(rng):
    from qpth_tpu import KKTSolver

    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2)
    f = QPFunction(maxIter=30, kkt_solver=KKTSolver.IR)
    z = f(*[jnp.asarray(v) for v in (Q, p, G, h, A, b)])
    assert np.isfinite(np.asarray(z)).all()


def test_solve_qp_eq_closed_form(rng):
    """Equality-only QPs (rejected by the reference, qp.py:89) solve in
    closed form, differentiably."""
    nz, neq, B = 8, 3, 4
    L = rng.randn(nz, nz)
    Q = L @ L.T + 1e-3 * np.eye(nz)
    A = rng.randn(neq, nz)
    p = rng.randn(B, nz)
    b = rng.randn(B, neq)
    x = qpth_tpu.solve_qp_eq(jnp.asarray(Q), jnp.asarray(p),
                             jnp.asarray(A), jnp.asarray(b))
    # KKT: Ax = b and Qx + p in range(A^T).
    npt.assert_allclose(np.einsum("en,bn->be", A, np.asarray(x)), b,
                        atol=1e-9)
    r = np.asarray(x) @ Q.T + p
    # Project the stationarity residual out of range(A^T): must vanish.
    P = np.eye(nz) - A.T @ np.linalg.solve(A @ A.T, A)
    npt.assert_allclose(r @ P.T, 0, atol=1e-8)

    # Differentiable through plain autodiff; unconstrained case too.
    g = jax.grad(lambda p_: jnp.sum(qpth_tpu.solve_qp_eq(
        jnp.asarray(Q), p_, jnp.asarray(A), jnp.asarray(b)) ** 2))(
            jnp.asarray(p))
    assert np.isfinite(np.asarray(g)).all()
    x0 = qpth_tpu.solve_qp_eq(jnp.asarray(Q), jnp.asarray(p))
    npt.assert_allclose(np.asarray(x0), -np.linalg.solve(Q, p.T).T,
                        atol=1e-9)


def test_check_Q_spd_raises_eagerly(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=3, neq=2)
    Q_bad = np.asarray(Q).copy()
    Q_bad[0, 0] = -100.0
    with pytest.raises(RuntimeError, match="SPD"):
        qpth_tpu.solve_qp(jnp.asarray(Q_bad), jnp.asarray(p), jnp.asarray(G),
                          jnp.asarray(h), jnp.asarray(A), jnp.asarray(b))


def test_grad_through_parameter_construction(rng):
    """Gradients flow through upstream parameter construction (the OptNet
    pattern: Q = LL^T + eps I, h = G z0 + s0 — cls notebook cell 3)."""
    nz, m = 4, 8
    L0 = jnp.asarray(np.tril(rng.rand(nz, nz) + 0.5))
    G = jnp.asarray(rng.randn(m, nz))
    z0 = jnp.asarray(rng.randn(nz) * 0.1)
    s0 = jnp.asarray(rng.rand(m) + 0.5)
    p = jnp.asarray(rng.randn(3, nz))

    def loss(L, z0, s0):
        Q = L @ L.T + 1e-4 * jnp.eye(nz)
        h = G @ z0 + s0
        z = qpth_tpu.solve_qp(Q, p, G, h)
        return jnp.sum(z ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(L0, z0, s0)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).max() > 0


@pytest.mark.slow
def test_vmap_composition(rng):
    """vmap over an extra leading axis composes with the batched solver."""
    K, B, nz, m = 2, 3, 5, 4
    Qs, ps, Gs, hs = [], [], [], []
    for _ in range(K):
        Q, p, G, h, _, _ = make_feasible_qp(rng, nz=nz, nineq=m, neq=0,
                                            nbatch=B)
        Qs.append(Q), ps.append(p), Gs.append(G), hs.append(h)
    Qk = jnp.asarray(np.broadcast_to(np.stack(Qs)[:, None], (K, B, nz, nz)))
    pk, Gk, hk = map(lambda x: jnp.asarray(np.stack(x)), (ps, Gs, hs))

    z_vmap = jax.vmap(lambda Q, p, G, h: qpth_tpu.solve_qp(Q, p, G, h))(
        Qk, pk, Gk, hk)
    for k in range(K):
        z_k = qpth_tpu.solve_qp(Qk[k], pk[k], Gk[k], hk[k])
        npt.assert_allclose(np.asarray(z_vmap[k]), np.asarray(z_k),
                            atol=1e-9)


def test_dtype_preserved(rng):
    Q, p, G, h, _, _ = make_feasible_qp(rng, nz=4, nineq=3, neq=0)
    for dt in (jnp.float32, jnp.float64):
        z = qpth_tpu.solve_qp(*[jnp.asarray(v, dt) for v in (Q, p, G, h)])
        assert z.dtype == dt


def test_nineq0_dispatches_to_eq_solver(rng):
    """QPFunction()(Q, p, empty, empty, A, b) returns the KKT solution
    where the reference raises (qp.py:89) — weak #4 of round 2."""
    nz, neq, B = 8, 3, 4
    L = rng.randn(nz, nz)
    Q = jnp.asarray(L @ L.T + 1e-3 * np.eye(nz))
    A = jnp.asarray(rng.randn(neq, nz))
    p = jnp.asarray(rng.randn(B, nz))
    b = jnp.asarray(rng.randn(B, neq))
    e = jnp.zeros((0,))

    want = qpth_tpu.solve_qp_eq(Q, p, A, b)
    for G_, h_ in ((e, e), (None, None), (jnp.zeros((0, nz)), e)):
        z = qpth_tpu.solve_qp(Q, p, G_, h_, A, b)
        npt.assert_allclose(np.asarray(z), np.asarray(want), rtol=1e-6)
    z_f = QPFunction()(Q, p, e, e, A, b)
    npt.assert_allclose(np.asarray(z_f), np.asarray(want), rtol=1e-6)

    # Gradients flow through the closed-form path (batched + shared p).
    g = jax.grad(lambda p_: jnp.sum(
        qpth_tpu.solve_qp(Q, p_, e, e, A, b) ** 2))(p)
    assert np.isfinite(np.asarray(g)).all() and np.abs(g).max() > 0

    # Full-solution variant: zero-width lam/s, duals satisfy stationarity.
    sol = qpth_tpu.solve_qp_full(Q, p, e, e, A, b)
    assert sol.lam.shape == (B, 0) and sol.s.shape == (B, 0)
    npt.assert_allclose(np.asarray(sol.z), np.asarray(want), rtol=1e-6)
    rx = (np.asarray(sol.z) @ np.asarray(Q).T + np.asarray(p)
          + np.asarray(sol.nu) @ np.asarray(A))
    npt.assert_allclose(rx, 0, atol=1e-5)
    assert bool(sol.stats.converged.all())

    # Unconstrained (no G, no A): plain -Q^-1 p through the same entry.
    z_un = qpth_tpu.solve_qp(Q, p, None, None)
    npt.assert_allclose(np.asarray(z_un),
                        -np.linalg.solve(np.asarray(Q), np.asarray(p).T).T,
                        rtol=1e-5)
