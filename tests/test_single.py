"""Single-instance solver (core/single.py): correctness vs the oracle and
the batched solver, plus vmap composition — the reference's single.py is
dead code (test.py never imports it); here it is a live, tested variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qpth_tpu
from qpth_tpu.core.single import solve_single
from qpth_tpu.solvers.oracle import solve_qp_np


def _problem(seed, nz=8, nineq=10, neq=0, nbatch=None):
    npr = np.random.RandomState(seed)
    shape = (nbatch,) if nbatch else ()
    L = npr.rand(*shape, nz, nz)
    Q = L @ np.swapaxes(L, -1, -2) + 0.1 * np.eye(nz)
    G = npr.randn(*shape, nineq, nz)
    z0 = npr.randn(*shape, nz)
    s0 = npr.rand(*shape, nineq)
    h = np.einsum("...mn,...n->...m", G, z0) + s0
    p = npr.randn(*shape, nz)
    if neq:
        A = npr.randn(*shape, neq, nz)
        b = np.einsum("...mn,...n->...m", A, z0)
    else:
        A = b = None
    return Q, p, G, h, A, b


@pytest.mark.parametrize("neq", [0, 3])
def test_single_vs_oracle(neq):
    Q, p, G, h, A, b = _problem(0, neq=neq)
    args = [jnp.asarray(v) for v in (Q, p, G, h)]
    if neq:
        args += [jnp.asarray(A), jnp.asarray(b)]
    sol = solve_single(*args)
    x_ref = solve_qp_np(Q, p, G, h, A, b)[1]
    np.testing.assert_allclose(np.asarray(sol.z), x_ref,
                               rtol=1e-6, atol=1e-7)
    assert float(sol.resid) < 1e-8


def test_single_vmap_matches_batched():
    B = 4
    Q, p, G, h, A, b = _problem(1, neq=2, nbatch=B)
    args = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]
    vs = jax.vmap(lambda *a: solve_single(*a).z)(*args)
    zb = qpth_tpu.solve_qp(*args)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(zb),
                               rtol=1e-5, atol=1e-6)
