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
