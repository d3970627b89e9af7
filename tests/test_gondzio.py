"""Gondzio multiple centrality correctors: same solutions, never more
iterations, composes with both KKT paths and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu

from conftest import make_feasible_qp


@pytest.mark.parametrize("neq", [0, 2])
@pytest.mark.parametrize("method", ["subst", "inverse"])
def test_gondzio_same_solution(rng, neq, method):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=10, nineq=8, neq=neq,
                                        nbatch=8)
    args = [jnp.asarray(v) for v in (Q, p, G, h) if v is not None]
    if neq:
        args += [jnp.asarray(A), jnp.asarray(b)]
    base = qpth_tpu.solve_qp_full(*args, config=qpth_tpu.SolverConfig(
        solve_method=method))
    gz = qpth_tpu.solve_qp_full(*args, config=qpth_tpu.SolverConfig(
        solve_method=method, n_correctors=2))
    npt.assert_allclose(np.asarray(gz.z), np.asarray(base.z),
                        atol=1e-6, rtol=1e-6)
    assert float(np.asarray(gz.stats.best_resids).max()) <= \
        float(np.asarray(base.stats.best_resids).max()) * 1.5 + 1e-9


def test_gondzio_grads_match(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=0, nbatch=4)
    args = [jnp.asarray(v) for v in (Q, p, G, h)]

    def loss(cfg, p_):
        return jnp.sum(qpth_tpu.solve_qp(args[0], p_, args[2], args[3],
                                         config=cfg) ** 2)

    g0 = jax.grad(lambda p_: loss(qpth_tpu.SolverConfig(), p_))(args[1])
    g2 = jax.grad(lambda p_: loss(
        qpth_tpu.SolverConfig(n_correctors=2), p_))(args[1])
    npt.assert_allclose(np.asarray(g2), np.asarray(g0), atol=1e-6,
                        rtol=1e-5)
