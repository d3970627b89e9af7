"""Structure-exploiting diagonal-Q/G solver vs the dense path.

The structured path (core/diag.py + diagqp.py) is the TPU-native analog of
the reference's sparse-KKT solver (spbatch.py + torch.spbqrfactsolve); its
contract is exact agreement with the dense Cholesky-Schur path on
qualifying problems — solutions, duals, and all gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu import SpQPFunction
from qpth_tpu.utils import bdiag

from conftest import make_feasible_qp


def _diag_qp(rng, n=8, neq=0, nbatch=4, g_sign=-1.0, shared=False):
    """Random feasible diagonal-structure QP: Q = diag(q), G = diag(g)."""
    q = 0.5 + rng.rand(nbatch, n)
    g = g_sign * (0.5 + rng.rand(nbatch, n))
    x0 = rng.randn(n)
    if shared:
        q, g = q[0], g[0]
    s0 = rng.rand(nbatch, n)
    h = g * x0 + s0
    p = rng.randn(nbatch, n)
    if neq > 0:
        A = rng.randn(*(((neq, n)) if shared else (nbatch, neq, n)))
        b = A @ x0 if shared else np.einsum("ben,n->be", A, x0)
    else:
        A = b = None
    return q, p, g, h, A, b


@pytest.mark.parametrize("neq", [0, 3])
@pytest.mark.parametrize("shared", [False, True])
def test_diag_matches_dense(rng, neq, shared):
    q, p, g, h, A, b = _diag_qp(rng, n=8, neq=neq, nbatch=4, shared=shared)
    args = [jnp.asarray(v) if v is not None else None
            for v in (q, p, g, h, A, b)]
    sol_d = qpth_tpu.solve_qp_diag_full(*args)

    Qd = bdiag(jnp.asarray(q))
    Gd = bdiag(jnp.asarray(g))
    sol_ref = qpth_tpu.solve_qp_full(Qd, args[1], Gd, args[3], args[4],
                                     args[5])
    npt.assert_allclose(np.asarray(sol_d.z), np.asarray(sol_ref.z),
                        atol=1e-8)
    npt.assert_allclose(np.asarray(sol_d.lam), np.asarray(sol_ref.lam),
                        atol=1e-7)
    if neq > 0:
        npt.assert_allclose(np.asarray(sol_d.nu), np.asarray(sol_ref.nu),
                            atol=1e-7)


def test_diag_sudoku_shape(rng):
    """The sudoku layer's exact structure: Q = eps*I, G = -I, learned A
    (reference sudoku notebook cell 10) — the workload the structured path
    exists for."""
    n, neq, B = 16, 10, 4
    q = np.full(n, 0.1)
    g = np.full(n, -1.0)
    h = np.zeros(n)              # -x <= 0, i.e. x >= 0
    A = rng.randn(neq, n)
    x0 = np.abs(rng.rand(B, n)) + 0.1
    b = np.einsum("en,bn->be", A, x0)
    p = rng.randn(B, n)
    args = [jnp.asarray(v) for v in (q, p, g, h, A, b)]
    sol = qpth_tpu.solve_qp_diag_full(*args)

    Qd = np.diag(q)
    Gd = np.diag(g)
    z_ref = qpth_tpu.solve_qp(jnp.asarray(Qd), args[1], jnp.asarray(Gd),
                              jnp.asarray(np.broadcast_to(h, (B, n))),
                              args[4], args[5])
    npt.assert_allclose(np.asarray(sol.z), np.asarray(z_ref), atol=1e-7)
    assert (np.asarray(sol.z) > -1e-8).all()   # respects x >= 0


@pytest.mark.parametrize("neq", [0, 3])
def test_diag_grads_match_dense(rng, neq):
    """All six gradients of the structured path == the dense path's
    (diagonal entries for dq/dg)."""
    q, p, g, h, A, b = _diag_qp(rng, n=6, neq=neq, nbatch=2)
    args = [jnp.asarray(v) if v is not None else None
            for v in (q, p, g, h, A, b)]
    z_true = rng.randn(2, 6)

    def loss_diag(q_, p_, g_, h_, A_, b_):
        z = qpth_tpu.solve_qp_diag(q_, p_, g_, h_, A_, b_)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    def loss_dense(q_, p_, g_, h_, A_, b_):
        z = qpth_tpu.solve_qp(bdiag(q_), p_, bdiag(g_), h_, A_, b_)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    argnums = tuple(range(6 if neq else 4))
    gs = jax.grad(loss_diag, argnums=argnums)(*args)
    gd = jax.grad(loss_dense, argnums=argnums)(*args)
    for i, (a, e) in enumerate(zip(gs, gd)):
        npt.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-7,
                            err_msg=f"grad argnum {i}")


def test_spqpfunction_diag_dispatch(rng):
    """SpQPFunction auto-detects square diagonal patterns and routes to the
    structured solver; result identical to forcing the dense tier."""
    n, neq, B = 6, 2, 3
    Qi = np.stack([np.arange(n), np.arange(n)])
    Qv = 0.5 + rng.rand(B, n)
    Gi = np.stack([np.arange(n), np.arange(n)])
    Gv = -(0.5 + rng.rand(B, n))
    x0 = rng.randn(n)
    h = Gv * x0 + rng.rand(B, n)
    Ai = np.stack([np.repeat(np.arange(neq), n),
                   np.tile(np.arange(n), neq)])
    Av = rng.randn(B, neq * n)
    A_dense = Av.reshape(B, neq, n)
    b = np.einsum("ben,n->be", A_dense, x0)
    p = rng.randn(B, n)

    f_auto = SpQPFunction(Qi, (n, n), Gi, (n, n), Ai, (neq, n))
    assert f_auto.structure == "diag"
    f_dense = SpQPFunction(Qi, (n, n), Gi, (n, n), Ai, (neq, n),
                           structure="dense")
    args = list(map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    z_auto = f_auto(*args)
    z_dense = f_dense(*args)
    npt.assert_allclose(np.asarray(z_auto), np.asarray(z_dense), atol=1e-8)

    # Gradients agree between the two tiers as well.
    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    ga = jax.grad(loss(f_auto), argnums=(0, 2, 4))(*args)
    gd = jax.grad(loss(f_dense), argnums=(0, 2, 4))(*args)
    for a, e in zip(ga, gd):
        npt.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-7)


def test_diag_grads_vs_finite_differences(rng):
    """Tier-1 guarantee for the structured path: analytic implicit-KKT
    gradients vs central differences of an oracle-forward loss (the same
    cross-solver probe the dense path gets in test_grads.py)."""
    from conftest import fd_grad
    from qpth_tpu.solvers.oracle import solve_qp_np

    n, neq = 6, 2
    q, p, g, h, A, b = _diag_qp(rng, n=n, neq=neq, nbatch=1)
    q1, p1, g1, h1, b1 = (v[0] for v in (q, p, g, h, b))
    A1 = A[0]
    z_true = rng.randn(n)

    def loss_params(qv, gv, hv):
        z = qpth_tpu.solve_qp_diag(
            jnp.asarray(qv), jnp.asarray(p1)[None], jnp.asarray(gv),
            jnp.asarray(hv), jnp.asarray(A1), jnp.asarray(b1)[None])
        return 0.5 * jnp.sum((z[0] - z_true) ** 2)

    gq, gg, gh = jax.grad(loss_params, argnums=(0, 1, 2))(q1, g1, h1)

    def fd_loss(name):
        def f(v):
            theta = dict(q=q1, g=g1, h=h1)
            theta[name] = v
            _, z, _, _, _ = solve_qp_np(
                np.diag(theta["q"]), p1, np.diag(theta["g"]), theta["h"],
                A1, b1)
            return 0.5 * np.sum((z - z_true) ** 2)
        return f

    npt.assert_allclose(np.asarray(gq), fd_grad(fd_loss("q"), q1),
                        atol=1e-2, rtol=1e-4)
    npt.assert_allclose(np.asarray(gg), fd_grad(fd_loss("g"), g1),
                        atol=1e-2, rtol=1e-4)
    npt.assert_allclose(np.asarray(gh), fd_grad(fd_loss("h"), h1),
                        atol=1e-2, rtol=1e-4)


def test_diag_float32(rng):
    q, p, g, h, A, b = _diag_qp(rng, n=10, neq=4, nbatch=8)
    args64 = [jnp.asarray(v) for v in (q, p, g, h, A, b)]
    args32 = [jnp.asarray(v, jnp.float32) for v in (q, p, g, h, A, b)]
    z64 = qpth_tpu.solve_qp_diag(*args64)
    z32 = qpth_tpu.solve_qp_diag(*args32)
    assert z32.dtype == jnp.float32
    npt.assert_allclose(np.asarray(z32), np.asarray(z64), atol=5e-3,
                        rtol=1e-2)


@pytest.mark.parametrize("n_correctors", [0, 2])
def test_diag_fused_step_matches_composed(rng, n_correctors):
    """The fused structured-step kernel (ops/pallas/diagstep.py, run in
    interpret mode on CPU) produces the same trajectory as the composed
    path."""
    n, neq, B = 12, 5, 8
    q, p, g, h, A, b = _diag_qp(rng, n=n, neq=neq, nbatch=B, shared=True)
    args = [jnp.asarray(v, jnp.float32) for v in (q, p, g, h, A, b)]
    cfg = qpth_tpu.SolverConfig(use_pallas=True, check_Q_spd=False,
                                max_iter=6, n_correctors=n_correctors,
                                fused_diag_step=True)
    sol_f = qpth_tpu.solve_qp_diag_full(*args, config=cfg)

    import qpth_tpu.ops.pallas.diagstep as ds
    import qpth_tpu.core.diag as diag_core

    # Force the composed path by disabling the fused support check.
    orig = ds.diag_step_supported
    try:
        ds.diag_step_supported = lambda *a, **k: False
        sol_c = qpth_tpu.solve_qp_diag_full(*args, config=cfg)
    finally:
        ds.diag_step_supported = orig

    npt.assert_allclose(np.asarray(sol_f.z), np.asarray(sol_c.z),
                        atol=2e-4, rtol=1e-3)
    npt.assert_allclose(np.asarray(sol_f.lam), np.asarray(sol_c.lam),
                        atol=2e-4, rtol=1e-3)
    npt.assert_allclose(np.asarray(sol_f.nu), np.asarray(sol_c.nu),
                        atol=2e-3, rtol=1e-2)
    assert int(sol_f.stats.iterations) == int(sol_c.stats.iterations)


@pytest.mark.parametrize("n,neq,B", [(1, 0, 1), (2, 1, 3), (9, 8, 2),
                                     (16, 7, 5)])
def test_diag_odd_shapes(rng, n, neq, B):
    """Edge shapes (tiny n, nearly-square A, batch 1) solve and satisfy
    the KKT conditions."""
    q, p, g, h, A, b = _diag_qp(rng, n=n, neq=neq, nbatch=B)
    args = [jnp.asarray(v) if v is not None else None
            for v in (q, p, g, h, A, b)]
    sol = qpth_tpu.solve_qp_diag_full(*args)
    z, lam, s, nu = map(np.asarray, (sol.z, sol.lam, sol.s, sol.nu))
    stat = q * z + p + g * lam
    if neq:
        stat = stat + np.einsum("ben,be->bn", A, nu)
        npt.assert_allclose(np.einsum("ben,bn->be", A, z) - b, 0,
                            atol=1e-6)
    npt.assert_allclose(stat, 0, atol=1e-6)
    npt.assert_allclose(g * z + s - h, 0, atol=1e-6)
    assert (s > -1e-9).all() and (lam > -1e-9).all()


def test_diag_warm_start(rng):
    q, p, g, h, A, b = _diag_qp(rng, n=8, neq=2, nbatch=4)
    args = [jnp.asarray(v) for v in (q, p, g, h, A, b)]
    cold = qpth_tpu.solve_qp_diag_full(*args)
    init = (cold.z, cold.s, cold.lam, cold.nu)
    p2 = args[1] + 0.01
    warm = qpth_tpu.solve_qp_diag_full(args[0], p2, *args[2:], init=init)
    cold2 = qpth_tpu.solve_qp_diag_full(args[0], p2, *args[2:])
    npt.assert_allclose(np.asarray(warm.z), np.asarray(cold2.z), atol=1e-6)
    assert int(warm.stats.iterations) <= int(cold2.stats.iterations)
