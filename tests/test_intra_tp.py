"""Intra-QP tensor parallelism: TP-sharded prefactor on a
("batch", "model") mesh matches the single-axis result and solves
identically (SURVEY §2.5 stretch row / VERDICT r1 next-round #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import Mesh

import qpth_tpu
from qpth_tpu.parallel import prefactor_qp_tp

from conftest import make_feasible_qp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _mesh2d():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("batch", "model"))


@pytest.mark.parametrize("neq", [0, 4])
def test_tp_prefactor_matches_plain(rng, neq):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=32, nineq=16, neq=neq,
                                        nbatch=8)
    args = [jnp.asarray(v) if v is not None else None
            for v in (Q, p, G, h, A, b)]
    f_tp = prefactor_qp_tp(args[0], args[2], args[4], mesh=_mesh2d())
    f_plain = qpth_tpu.prefactor_qp(args[0], args[2], args[4])
    for name, a, e in zip(f_tp._fields, f_tp, f_plain):
        if e is None:
            assert a is None, name
            continue
        npt.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-9,
                            err_msg=name)


def test_tp_factors_solve_and_differentiate(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=24, nineq=12, neq=4,
                                        nbatch=8)
    args = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]
    f_tp = prefactor_qp_tp(args[0], args[2], args[4], mesh=_mesh2d())
    sol_tp = qpth_tpu.solve_qp_full(*args, factors=f_tp)
    sol = qpth_tpu.solve_qp_full(*args)
    npt.assert_allclose(np.asarray(sol_tp.z), np.asarray(sol.z), atol=1e-9)

    g_tp = jax.grad(lambda p_: jnp.sum(qpth_tpu.solve_qp(
        args[0], p_, *args[2:], factors=f_tp) ** 2))(args[1])
    g = jax.grad(lambda p_: jnp.sum(qpth_tpu.solve_qp(
        args[0], p_, *args[2:]) ** 2))(args[1])
    npt.assert_allclose(np.asarray(g_tp), np.asarray(g), atol=1e-8)
