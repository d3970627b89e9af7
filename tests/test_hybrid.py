"""Hybrid blocked Cholesky (large-m path beyond the lanes VMEM wall):
factor/solve correctness vs XLA, and the full solver at m > 136."""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu.ops.hybrid import factor_hybrid, solve_hybrid
from qpth_tpu.ops.linalg import cho_solve, cho_solve_vec, cholesky

from conftest import make_feasible_qp


@pytest.mark.parametrize("m", [150, 257, 300])
def test_hybrid_factor_solve_matches_xla(rng, m):
    B = 3
    X = rng.randn(B, m, m)
    T = jnp.asarray(X @ X.transpose(0, 2, 1) + m * np.eye(m))
    v = jnp.asarray(rng.randn(B, m))
    fac = factor_hybrid(T, interpret=True)
    x = solve_hybrid(fac, v)
    x_ref = cho_solve_vec(cholesky(T), v)
    npt.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-9,
                        atol=1e-9)


def test_hybrid_blocksize_edge(rng):
    """m an exact multiple of the block size (no remainder block)."""
    B, m = 2, 256
    X = rng.randn(B, m, m)
    T = jnp.asarray(X @ X.transpose(0, 2, 1) + m * np.eye(m))
    v = jnp.asarray(rng.randn(B, m))
    x = solve_hybrid(factor_hybrid(T, interpret=True), v)
    x_ref = cho_solve_vec(cholesky(T), v)
    npt.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-9,
                        atol=1e-9)


@pytest.mark.slow
def test_solver_on_hybrid_backend_matches_xla(rng):
    """Full IPM at m > 136 on the hybrid backend == the XLA path with the
    same (inverse-mode) prefactor representation. The comparison must
    hold the prefactor fixed: explicit Q^-1 at float32 is the documented
    accuracy/speed trade shared by ALL fast backends (PERF.md), so
    comparing hybrid+inverse against xla+substitution would conflate the
    two choices."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=60, nineq=150, neq=0,
                                        nbatch=2)
    # Temper the random-gram conditioning (cond(LL^T) ~ 1e8 at nz=60 is
    # an f64-only regime; config-4 problems are diagonally regularized).
    Q = Q + 0.1 * 60 * np.eye(60)
    args32 = [jnp.asarray(v, jnp.float32) for v in (Q, p, G, h)]
    z_h = qpth_tpu.solve_qp(
        *args32, config=qpth_tpu.SolverConfig(use_pallas="hybrid",
                                              check_Q_spd=False))
    z_x = qpth_tpu.solve_qp(
        *args32, config=qpth_tpu.SolverConfig(use_pallas="xla",
                                              solve_method="inverse",
                                              check_Q_spd=False))
    npt.assert_allclose(np.asarray(z_h), np.asarray(z_x), atol=5e-4,
                        rtol=1e-3)

    # And against the f64 oracle at f32-appropriate tolerance.
    from qpth_tpu.solvers.oracle import solve_qp_batch_np

    x_ref, _, _, _ = solve_qp_batch_np(Q, p, G, h, None, None)
    npt.assert_allclose(np.asarray(z_h), x_ref, atol=5e-3, rtol=1e-2)


@pytest.mark.parametrize("m", [150, 256, 413])
def test_spd_inv_hybrid_matches_xla(rng, m):
    """Blocked explicit SPD inverse (the large-m prefactor path) ==
    cho_solve against the identity."""
    from qpth_tpu.ops.hybrid import spd_inv_hybrid

    B = 2
    X = rng.randn(B, m, m)
    M = jnp.asarray(X @ X.transpose(0, 2, 1) + m * np.eye(m))
    inv_h = spd_inv_hybrid(M, interpret=True)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=M.dtype), (B, m, m))
    inv_ref = cho_solve(cholesky(M), eye)
    npt.assert_allclose(np.asarray(inv_h), np.asarray(inv_ref),
                        rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("m,k", [(150, 70), (256, 256), (300, 13)])
def test_solve_hybrid_mat_matches_xla(rng, m, k):
    """Multi-RHS blocked substitution (the factored-Q prefactor route) ==
    cho_solve with matrix RHS."""
    from qpth_tpu.ops.hybrid import solve_hybrid_mat

    B = 2
    X = rng.randn(B, m, m)
    T = jnp.asarray(X @ X.transpose(0, 2, 1) + m * np.eye(m))
    V = jnp.asarray(rng.randn(B, m, k))
    Xs = solve_hybrid_mat(factor_hybrid(T, interpret=True), V)
    X_ref = cho_solve(cholesky(T), V)
    npt.assert_allclose(np.asarray(Xs), np.asarray(X_ref), rtol=1e-9,
                        atol=1e-9)


def test_facq_prefactor_matches_explicit_inverse(rng):
    """The factored-Q KKTFactors representation (facQ + substitution-built
    cached products, the TPU hybrid-regime route in pre_factor_kkt/_q_rep)
    produces the same R / invQ_GT / invQ_AT / apply_invQ results as the
    explicit-inverse representation."""
    from qpth_tpu.ops import kkt as kkt_ops
    from qpth_tpu.ops.hybrid import factor_hybrid, solve_hybrid_mat
    from qpth_tpu.ops.linalg import bmm

    nz, m, neq, B = 170, 160, 12, 3
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=nz, nineq=m, neq=neq,
                                        nbatch=B)
    Q = jnp.asarray(np.broadcast_to(Q + 0.1 * nz * np.eye(nz),
                                    (B, nz, nz)))
    G, A = jnp.asarray(G), jnp.asarray(A)

    ref = kkt_ops.pre_factor_kkt(Q, G, A, inverse=True,
                                 use_pallas_kernels=False)
    assert ref.invQ is not None and ref.facQ is None

    # Build the facQ representation the way pre_factor_kkt's TPU branch
    # does (interpret mode stands in for the hardware kernels).
    facQ = factor_hybrid(Q, interpret=True)
    GT = jnp.swapaxes(G, -1, -2)
    AT = jnp.swapaxes(A, -1, -2)
    invQ_GT = solve_hybrid_mat(facQ, GT)
    invQ_AT = solve_hybrid_mat(facQ, AT)
    npt.assert_allclose(np.asarray(invQ_GT), np.asarray(ref.invQ_GT),
                        rtol=1e-8, atol=1e-8)
    npt.assert_allclose(np.asarray(invQ_AT), np.asarray(ref.invQ_AT),
                        rtol=1e-8, atol=1e-8)
    GiGT = bmm(G, invQ_GT)
    npt.assert_allclose(np.asarray(GiGT), np.asarray(ref.GiGT),
                        rtol=1e-8, atol=1e-8)

    # apply_invQ dispatch on a facQ-carrying factors pytree.
    fac_rep = ref._replace(invQ=None, facQ=facQ)
    v = jnp.asarray(rng.randn(B, nz))
    npt.assert_allclose(np.asarray(kkt_ops.apply_invQ(fac_rep, v)),
                        np.asarray(kkt_ops.apply_invQ(ref, v)),
                        rtol=1e-8, atol=1e-8)
