"""Algorithmically-independent third-party cross-check of the oracle AND
the solver: scipy.optimize (an active-set/trust-region family, nothing
like a Mehrotra IPM), mirroring the role CVXPY/ECOS plays for the
reference (/root/reference/qpth/solvers/cvxpy.py:5-31, test.py:99-187).

Our in-repo oracle (solvers/oracle.py) is itself an IPM — a correlated
bug in both the solver and the oracle would be invisible to the rest of
the suite; an independent method breaks that correlation. Skips cleanly
when scipy is absent (the reference gates its sparse tests on hardware
the same way, test.py:250-251).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig
from qpth_tpu.solvers.oracle import solve_qp_np

from conftest import make_feasible_qp

scipy_opt = pytest.importorskip("scipy.optimize")


def scipy_solve(Q, p, G, h, A=None, b=None):
    """Solve the QP with scipy trust-constr from a feasible-ish start."""
    n = len(p)
    cons = [scipy_opt.LinearConstraint(G, -np.inf, h)]
    if A is not None:
        cons.append(scipy_opt.LinearConstraint(A, b, b))
    x0 = np.zeros(n)
    res = scipy_opt.minimize(
        lambda x: 0.5 * x @ Q @ x + p @ x,
        x0, jac=lambda x: Q @ x + p, hess=lambda x: Q,
        method="trust-constr", constraints=cons,
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 2000})
    return res.x


@pytest.mark.parametrize("neq", [0, 2])
def test_three_way_agreement(rng, neq):
    """solver (f64) == in-repo oracle == scipy, pairwise to ~1e-6."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=5, neq=neq)
    B = 3
    ps = rng.randn(B, 8)

    z_solver = np.asarray(qpth_tpu.solve_qp(
        jnp.asarray(Q), jnp.asarray(ps), jnp.asarray(G), jnp.asarray(h),
        jnp.asarray(A) if A is not None else None,
        jnp.asarray(b) if b is not None else None,
        config=SolverConfig(verbose=-1)))
    for i in range(B):
        z_oracle = solve_qp_np(Q, ps[i], G, h, A, b)[1]
        z_scipy = scipy_solve(Q, ps[i], G, h, A, b)
        # 1e-5: scipy trust-constr's own convergence level on
        # equality-constrained instances (solver vs oracle agree to
        # ~1e-10; the third-party arm is the loose one).
        np.testing.assert_allclose(z_solver[i], z_scipy,
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(z_oracle, z_scipy,
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(z_solver[i], z_oracle,
                                   atol=1e-8, rtol=1e-8)


@pytest.mark.slow
def test_refined_f32_beats_scipy_tolerance(rng):
    """The dw-refined f32 solve agrees with scipy at scipy's own
    convergence level — the accuracy story holds against a third party,
    not just our own f64 oracle."""
    import jax

    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=5, neq=0)
    r32 = lambda v: None if v is None else np.float64(np.float32(v))
    Q, p, G, h = map(r32, (Q, p, G, h))
    with jax.enable_x64(False):
        sol = qpth_tpu.solve_qp_full(
            jnp.asarray(Q, jnp.float32), jnp.asarray(p[None], jnp.float32),
            jnp.asarray(G, jnp.float32), jnp.asarray(h, jnp.float32),
            config=SolverConfig(verbose=-1, refine_steps=5))
    z = np.asarray(sol.z, np.float64)[0] + np.asarray(sol.lo.z,
                                                      np.float64)[0]
    z_scipy = scipy_solve(Q, p, G, h)
    np.testing.assert_allclose(z, z_scipy, atol=5e-7, rtol=1e-6)
