"""Fused whole-IPM-step kernel (ipm_step_lanes) vs the composed path:
identical trajectories, with and without Gondzio correctors."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu.core import pdipm
from qpth_tpu.ops import kkt as kkt_ops

from conftest import make_feasible_qp


@pytest.mark.parametrize("neq", [0, 3])
@pytest.mark.parametrize("shared", [False, True])
@pytest.mark.parametrize(
    "n_correctors",
    [0, pytest.param(2, marks=pytest.mark.slow)])
def test_fused_step_matches_composed(rng, n_correctors, shared, neq,
                                     monkeypatch):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=9, nineq=7, neq=neq,
                                        nbatch=8)
    if shared:   # OptNet-layer pattern: shared Q/G/h, batched p
        G, h = G[0], h[0]  # (Q from the fixture is already unbatched)
        if neq:
            A, b = A[0], b[0]
    args = [jnp.asarray(v, jnp.float32) for v in (Q, p, G, h)]
    if neq:
        args += [jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)]
    cfg = qpth_tpu.SolverConfig(use_pallas=True, max_iter=6,
                                n_correctors=n_correctors)

    sol_f = qpth_tpu.solve_qp_full(*args, config=cfg)

    # Disable the fused path (force composed) by making the support check
    # return False.
    from qpth_tpu.ops.pallas import lanes

    monkeypatch.setattr(lanes, "ipm_step_supported",
                        lambda *a, **k: False)
    sol_c = qpth_tpu.solve_qp_full(*args, config=cfg)

    npt.assert_allclose(np.asarray(sol_f.z), np.asarray(sol_c.z),
                        atol=2e-4, rtol=1e-3)
    npt.assert_allclose(np.asarray(sol_f.lam), np.asarray(sol_c.lam),
                        atol=2e-4, rtol=1e-3)
    npt.assert_allclose(np.asarray(sol_f.s), np.asarray(sol_c.s),
                        atol=2e-4, rtol=1e-3)
    npt.assert_allclose(np.asarray(sol_f.nu), np.asarray(sol_c.nu),
                        atol=2e-3, rtol=1e-2)
    assert int(sol_f.stats.iterations) == int(sol_c.stats.iterations)
