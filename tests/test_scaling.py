"""Ruiz equilibration (scaling.py): solution/gradient invariance and the
float32 conditioning win.

The reference has no equilibration (it runs float64 end-to-end,
/root/reference/qpth/solvers/pdipm/batch.py); these tests pin that the
TPU build's scaling layer is exactly transparent: same solutions, same
gradients, better f32 conditioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpth_tpu import scaling as sc
from qpth_tpu.config import SolverConfig
from qpth_tpu.qp import prefactor_qp, solve_qp, solve_qp_full

from conftest import make_feasible_qp


def badly_scaled_qp(rng, nz=12, nineq=6, neq=3, nbatch=4, spread=3.0):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=nz, nineq=nineq, neq=neq,
                                        nbatch=nbatch)
    s = 10.0 ** rng.uniform(-spread, spread, size=nz)
    Q = Q * s[:, None] * s[None, :]
    G = G * s[None, None, :]
    p = p * s[None, :]
    if A is not None:
        A = A * s[None, None, :]
    return Q, p, G, h, A, b


def test_pow2_scalings_and_unit_norms(rng):
    Q, p, G, h, A, b = badly_scaled_qp(rng)
    Qb = jnp.asarray(Q)[None]
    Gb, Ab = jnp.asarray(G), jnp.asarray(A)
    s, Qs, Gs, As = sc.ruiz_equilibrate(Qb, Gb, Ab)
    # every scaling is a power of two
    for v in (s.E, s.RG, s.RA, s.c):
        m, e = np.frexp(np.asarray(v, np.float64))
        assert np.all(np.abs(m) == 0.5)
    # scaled KKT row/col infinity norms within a factor ~4 of 1
    cn = np.maximum(np.abs(np.asarray(Qs)).max(axis=-2).max(0),
                    np.abs(np.asarray(Gs)).max(axis=-2).max(0))
    cn = np.maximum(cn, np.abs(np.asarray(As)).max(axis=-2).max(0))
    assert cn.max() / cn.min() < 16
    # reconstruction: Qs = c E Q E exactly (pow2 scalings are exact)
    E = np.asarray(s.E, np.float64)[0]
    c = np.asarray(s.c, np.float64)[0]
    want = c * E[:, None] * E[None, :] * np.asarray(Qb, np.float64)[0]
    np.testing.assert_array_equal(np.asarray(Qs, np.float64)[0], want)


def test_solution_invariance_f64(rng):
    args = [jnp.asarray(x) for x in badly_scaled_qp(rng)]
    z0 = solve_qp(*args, config=SolverConfig(equilibrate=False))
    z1 = solve_qp(*args, config=SolverConfig(equilibrate=True))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=1e-7, atol=1e-8)
    # full primal-dual point maps back consistently
    s0 = solve_qp_full(*args, config=SolverConfig(equilibrate=False))
    s1 = solve_qp_full(*args, config=SolverConfig(equilibrate=True))
    for a, c in ((s0.lam, s1.lam), (s0.nu, s1.nu), (s0.s, s1.s)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("wrt", ["p", "G", "h", "A", "b", "Q"])
def test_gradient_invariance_f64(rng, wrt):
    args = [jnp.asarray(x) for x in badly_scaled_qp(rng, nbatch=2)]
    names = ["Q", "p", "G", "h", "A", "b"]
    i = names.index(wrt)

    def make_loss(cfg):
        def f(v):
            a = list(args)
            a[i] = v
            return (solve_qp(*a, config=cfg) ** 2).sum()
        return jax.grad(f)

    g0 = make_loss(SolverConfig(equilibrate=False))(args[i])
    g1 = make_loss(SolverConfig(equilibrate=True))(args[i])
    scale = np.abs(np.asarray(g0)).max()
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() < 1e-9 * scale


def test_f32_accuracy_improves(rng):
    """Two regimes. Moderate scaling (10^±3): both arms reach the f32
    plateau; equilibration must not materially hurt (strict ordering
    there is rounding luck — measured across seeds it is a coin flip
    within ~2x either way). Harsh scaling (10^±6): the unequilibrated f32
    chain loses 3+ digits while the equilibrated one stays at the plateau
    — equilibration must win by an order of magnitude."""
    def errs(spread, seed):
        r = np.random.RandomState(seed)
        Q, p, G, h, A, b = badly_scaled_qp(r, nbatch=8, spread=spread)
        args64 = [jnp.asarray(x) for x in (Q, p, G, h, A, b)]
        zref = np.asarray(solve_qp(*args64, config=SolverConfig()))
        args32 = [jnp.asarray(x, jnp.float32) for x in (Q, p, G, h, A, b)]
        zs = np.abs(zref).max()
        e_plain = np.abs(np.asarray(solve_qp(
            *args32, config=SolverConfig(equilibrate=False))) - zref).max()
        e_eq = np.abs(np.asarray(solve_qp(
            *args32, config=SolverConfig(equilibrate=True))) - zref).max()
        return e_plain / zs, e_eq / zs

    e_plain, e_eq = errs(3.0, 7)
    assert e_eq < 4.0 * e_plain  # no material harm at the plateau
    for seed in (7, 8, 9):
        e_plain, e_eq = errs(6.0, seed)
        assert e_eq < 0.1 * e_plain, (seed, e_plain, e_eq)


def test_batch_collapse_keeps_shared_matrices_shared(rng):
    # Q shared, G batched: scalings must collapse to batch 1 so the scaled
    # Q stays (1, nz, nz) — the OptNet shared-problem fast path.
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=4, neq=0,
                                        nbatch=3)
    Qb = jnp.asarray(Q)[None]
    Gb = jnp.asarray(G)
    s, Qs, Gs, _ = sc.ruiz_equilibrate(Qb, Gb, None)
    assert Qs.shape[0] == 1
    assert Gs.shape[0] == 3
    assert s.E.shape[0] == 1


def test_prefactor_carries_scaling(rng):
    Q, p, G, h, A, b = badly_scaled_qp(rng, nbatch=2)
    args32 = [jnp.asarray(x, jnp.float32) for x in (Q, p, G, h, A, b)]
    cfg = SolverConfig(equilibrate=True)
    f = prefactor_qp(args32[0], args32[2], args32[4], config=cfg)
    assert f.scaling is not None
    z_cached = solve_qp(*args32, config=cfg, factors=f)
    z_fresh = solve_qp(*args32, config=cfg)
    np.testing.assert_allclose(np.asarray(z_cached), np.asarray(z_fresh),
                               rtol=1e-5, atol=1e-6)


def test_warm_start_scaled(rng):
    Q, p, G, h, A, b = badly_scaled_qp(rng, nbatch=2)
    args32 = [jnp.asarray(x, jnp.float32) for x in (Q, p, G, h, A, b)]
    cfg = SolverConfig(equilibrate=True)
    s0 = solve_qp_full(*args32, config=cfg)
    s1 = solve_qp_full(*args32, config=cfg,
                       init=(s0.z, s0.s, s0.lam, s0.nu))
    # warm-started from the solution, the re-solve stays at the solution
    assert np.abs(np.asarray(s1.z) - np.asarray(s0.z)).max() < 1e-3


def test_probe_light_vs_full_branch(rng):
    """equilibrate='auto' (the probe): well-scaled data keeps the factors
    in ORIGINAL coordinates (identity factors.scaling) with the Ruiz
    scalings riding in sem_scaling; badly-scaled data takes the full
    scale-the-inputs branch (factor coords == semantic coords)."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=12, nineq=6, neq=3,
                                        nbatch=4)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    cfg = SolverConfig(equilibrate="auto")

    fac = prefactor_qp(f32(Q), f32(G), f32(A), config=cfg)
    assert fac.scaling is not None and fac.sem_scaling is not None
    # light branch: iterate coordinates are identity...
    for v in (fac.scaling.E, fac.scaling.RG, fac.scaling.RA,
              fac.scaling.c):
        np.testing.assert_array_equal(np.asarray(v), 1.0)
    # ...while the semantic scalings are the real (non-trivial) Ruiz ones
    assert np.asarray(fac.sem_scaling.RG).std() >= 0.0
    assert not np.allclose(np.asarray(fac.sem_scaling.c), 1.0) or \
        not np.allclose(np.asarray(fac.sem_scaling.E), 1.0)

    s = 10.0 ** rng.uniform(-5, 5, size=12)
    Qb = Q * s[:, None] * s[None, :]
    Gb = G * s[None, None, :]
    Ab = A * s[None, None, :]
    fac_bad = prefactor_qp(f32(Qb), f32(Gb), f32(Ab), config=cfg)
    # full branch: factor coords == semantic coords (the Ruiz scalings)
    np.testing.assert_array_equal(np.asarray(fac_bad.scaling.E),
                                  np.asarray(fac_bad.sem_scaling.E))
    assert np.asarray(fac_bad.scaling.E).std() > 0.0


def test_probe_solution_quality_matches_forced(rng):
    """On well-scaled data the auto (light) branch must solve as well as
    forced full equilibration and as plain equilibrate=False (same
    problem, three coordinate conventions, one answer)."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=10, nineq=6, neq=2,
                                        nbatch=4)
    args = [jnp.asarray(v, jnp.float32) for v in (Q, p, G, h, A, b)]
    zs = {}
    for name, kw in (("auto", {}), ("forced", dict(equilibrate=True)),
                     ("off", dict(equilibrate=False))):
        sol = solve_qp_full(*args, config=SolverConfig(
            check_Q_spd=False, verbose=-1, **kw))
        zs[name] = np.asarray(sol.z)
        assert float(sol.stats.best_resids.max()) < 1e-3, name
    assert np.abs(zs["auto"] - zs["forced"]).max() < 1e-4
    assert np.abs(zs["auto"] - zs["off"]).max() < 1e-4
