"""Tracked-residual mode (SolverConfig.resid_every): the per-iteration
residual matvecs (batch.py:94-107) are replaced by the exact identity
r_new = (1 - alpha) r between checkpoints. These tests pin:

* the identity itself — at float64 the tracked norms agree with the
  recomputed ones to roundoff, so the returned solution matches the
  recompute-every-iteration run;
* honesty of the reported stats — best_resids are exactly-scored even in
  pure tracked mode (resid_every=0);
* the fused (interpret-mode Pallas) path returning the applied alpha.
"""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig

from conftest import make_feasible_qp


def _cfg(**kw):
    base = dict(check_Q_spd=False, solve_method="inverse",
                use_pallas=False, verbose=-1)
    base.update(kw)
    return SolverConfig(**base)


@pytest.mark.parametrize("neq", [0, 3])
@pytest.mark.parametrize("resid_every", [0, 4])
def test_tracked_matches_exact_f64(rng, neq, resid_every):
    """Same trajectory, same solution: the step direction never depends on
    the residual score, so with the improvement window disabled the
    tracked and exact runs are identical apart from iterate selection."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=neq,
                                        nbatch=5)
    args = [None if v is None else jnp.asarray(v, jnp.float64)
            for v in (Q, p, G, h, A, b)]
    kw = dict(not_improved_lim=1000, improve_margin=0.0)
    sol_exact = qpth_tpu.solve_qp_full(*args, config=_cfg(resid_every=1,
                                                          **kw))
    sol_track = qpth_tpu.solve_qp_full(*args, config=_cfg(
        resid_every=resid_every, **kw))
    npt.assert_allclose(np.asarray(sol_track.z), np.asarray(sol_exact.z),
                        atol=1e-9)
    # best_resids are exact in both modes (tracked mode rescores), so they
    # agree to f64 roundoff noise on this well-conditioned fixture.
    npt.assert_allclose(np.asarray(sol_track.stats.best_resids),
                        np.asarray(sol_exact.stats.best_resids),
                        rtol=1e-5, atol=1e-9)


def test_tracked_stats_are_exactly_scored(rng):
    """stats.best_resids must equal the true KKT residual score of the
    returned point — never the (optimistic) tracked product."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=2,
                                        nbatch=4)
    args = [jnp.asarray(v, jnp.float64) for v in (Q, p, G, h, A, b)]
    sol = qpth_tpu.solve_qp_full(*args, config=_cfg(resid_every=0))
    Qn, pn, Gn, hn, An, bn = [np.asarray(v) for v in args]
    x, s, z, y = [np.asarray(v) for v in (sol.z, sol.s, sol.lam, sol.nu)]
    m = Gn.shape[-2]
    rx = (x @ Qn.T + pn + np.einsum("bmn,bm->bn", Gn, z)
          + np.einsum("ben,be->bn", An, y))
    rz = np.einsum("bmn,bn->bm", Gn, x) + s - hn
    ry = np.einsum("ben,bn->be", An, x) - bn
    mu = np.abs((s * z).sum(-1)) / m
    score = (np.linalg.norm(ry, axis=-1) + np.linalg.norm(rz, axis=-1)
             + np.linalg.norm(rx, axis=-1) + m * mu)
    npt.assert_allclose(np.asarray(sol.stats.best_resids), score,
                        rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize(
    "neq", [0, pytest.param(3, marks=pytest.mark.slow)])
def test_tracked_fused_interpret(rng, neq):
    """The fused Pallas step's alpha output feeds the tracking; f32
    interpret mode, tracked vs exact solutions agree to f32 tolerance."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=neq,
                                        nbatch=4)
    args = [None if v is None else jnp.asarray(v, jnp.float32)
            for v in (Q, p, G, h, A, b)]
    cfg = dict(check_Q_spd=False, use_pallas=True, verbose=-1)
    z_exact = qpth_tpu.solve_qp_full(
        *args, config=SolverConfig(resid_every=1, **cfg)).z
    sol = qpth_tpu.solve_qp_full(
        *args, config=SolverConfig(resid_every=4, **cfg))
    npt.assert_allclose(np.asarray(sol.z), np.asarray(z_exact),
                        rtol=1e-3, atol=1e-4)
    assert np.isfinite(np.asarray(sol.stats.best_resids)).all()
