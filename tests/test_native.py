"""Native C++ oracle: builds, matches the numpy oracle, handles batching."""

import numpy as np
import numpy.testing as npt
import pytest

from qpth_tpu import native
from qpth_tpu.solvers.oracle import solve_qp_batch_np

from conftest import make_feasible_qp

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("neq", [0, 3])
def test_native_matches_numpy(rng, neq):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=10, nineq=6, neq=neq,
                                        nbatch=4)
    out_n = native.solve_qp_batch_native(Q, p, G, h, A, b)
    out_p = solve_qp_batch_np(Q, p, G, h, A, b)
    for got, want in zip(out_n, out_p):
        npt.assert_allclose(got, np.asarray(want), atol=1e-9)


def _poison_lane(G, h, lane):
    """Make one lane's constraints contradictory: x0 <= -1 and -x0 <= -1."""
    G = np.array(G, copy=True)
    h = np.array(h, copy=True)
    G[lane, 0, :] = 0.0
    G[lane, 1, :] = 0.0
    G[lane, 0, 0] = 1.0
    G[lane, 1, 0] = -1.0
    h[lane, 0] = -1.0
    h[lane, 1] = -1.0
    return G, h


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_per_lane_failure_isolation(rng, impl):
    """One infeasible lane in a batch of 8: the other 7 still get correct
    solutions and the bad lane is flagged (VERDICT r1 next-round #5)."""
    B, lane = 8, 3
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=6, nineq=4, neq=0, nbatch=B)
    Gp, hp = _poison_lane(G, h, lane)
    solve = (native.solve_qp_batch_native if impl == "native"
             else solve_qp_batch_np)
    x, nu, lam, s, status = solve(Q, p, Gp, hp, None, None,
                                  return_status=True)
    assert status[lane] != 0
    good = [i for i in range(B) if i != lane]
    assert all(status[i] == 0 for i in good)
    # Healthy lanes match a solve of the unpoisoned batch.
    x_ref, _, _, _ = solve_qp_batch_np(Q, p, G, h, None, None)
    npt.assert_allclose(x[good], x_ref[good], atol=1e-8)
    assert np.isfinite(x[good]).all()


def test_native_shared_matrices(rng):
    """Batch-1 (shared) matrix params with full-batch vectors."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=5, neq=2)
    B = 3
    P = rng.randn(B, 8)
    x, nu, lam, s = native.solve_qp_batch_native(Q, P, G, h, A,
                                                 np.broadcast_to(b, (B, 2)))
    xp, nup, lamp, sp = solve_qp_batch_np(Q, P, G, h, A,
                                          np.broadcast_to(b, (B, 2)))
    npt.assert_allclose(x, xp, atol=1e-9)
    npt.assert_allclose(lam, lamp, atol=1e-9)
