"""Banded (block-tridiagonal) structured tier vs the dense path.

The banded solver must return the same solutions as the dense IPM on the
densified problem (the reference's arbitrary-pattern sparse contract,
spbatch.py:184-269, for the banded case), with exact gradients matching
the dense custom_vjp's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig
from qpth_tpu.core import banded as band_core


def make_banded_qp(rng, nb=5, bs=4, neq=0, nbatch=3, coupling=0.3):
    """Random strictly-feasible QP with SPD block-tridiagonal Q (an MPC
    chain shape) and diagonal G."""
    n = nb * bs
    # SPD block-tridiagonal Q: band Cholesky L (block bidiagonal) -> LL^T.
    Ld = rng.randn(nbatch, nb, bs, bs) * 0.5
    Ld = Ld + np.eye(bs) * (1.5 + rng.rand(nbatch, nb, 1, 1))
    Ld = np.tril(Ld)
    Le = coupling * rng.randn(nbatch, nb - 1, bs, bs)
    Qd = np.einsum("bnij,bnkj->bnik", Ld, Ld)
    Qd[:, 1:] += np.einsum("bnij,bnkj->bnik", Le, Le)
    Qe = np.einsum("bnij,bnkj->bnik", Le, Ld[:, :-1])
    g = rng.randn(nbatch, n) + np.sign(rng.randn(nbatch, n)) * 0.5
    g = np.where(np.abs(g) < 0.3, 0.5, g)  # keep G well away from 0
    z0 = rng.randn(nbatch, n)
    s0 = rng.rand(nbatch, n) + 0.2
    h = g * z0 + s0
    p = rng.randn(nbatch, n)
    if neq > 0:
        A = rng.randn(neq, n)
        b = z0 @ A.T
    else:
        A = b = None
    return Qd, Qe, p, g, h, A, b


def densify(Qd, Qe):
    B, nb, bs, _ = Qd.shape
    n = nb * bs
    Q = np.zeros((B, n, n))
    for i in range(nb):
        Q[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs] = Qd[:, i]
    for i in range(nb - 1):
        blk = Qe[:, i]
        Q[:, (i + 1) * bs:(i + 2) * bs, i * bs:(i + 1) * bs] = blk
        Q[:, i * bs:(i + 1) * bs, (i + 1) * bs:(i + 2) * bs] = \
            np.swapaxes(blk, -1, -2)
    return Q


def test_bt_factor_solve_unit(rng):
    """Block-Thomas solve == dense solve of the assembled H."""
    B, nb, bs = 3, 6, 4
    Qd, Qe, *_ = make_banded_qp(rng, nb=nb, bs=bs, nbatch=B)
    H = densify(Qd, Qe) + 3.0 * np.eye(nb * bs)
    Qd = Qd + 3.0 * np.eye(bs)
    fac = band_core.bt_factor(jnp.asarray(Qd), jnp.asarray(Qe),
                              band_core._spd_inv_stage(False))
    r = rng.randn(B, nb, bs)
    x = np.asarray(band_core.bt_solve(fac, jnp.asarray(r)))
    want = np.linalg.solve(H, r.reshape(B, -1, 1))[..., 0]
    npt.assert_allclose(x.reshape(B, -1), want, rtol=1e-8, atol=1e-9)

    # multi-RHS
    R = rng.randn(B, nb, bs, 3)
    X = np.asarray(band_core.bt_solve_multi(fac, jnp.asarray(R)))
    wantX = np.linalg.solve(H, R.reshape(B, nb * bs, 3))
    npt.assert_allclose(X.reshape(B, -1, 3), wantX, rtol=1e-8, atol=1e-9)

    # matvec
    y = np.asarray(band_core.bt_mul(jnp.asarray(Qd), jnp.asarray(Qe),
                                    jnp.asarray(r)))
    npt.assert_allclose(y.reshape(B, -1),
                        np.einsum("bij,bj->bi", H - 3.0 * np.eye(nb * bs),
                                  r.reshape(B, -1))
                        + 3.0 * r.reshape(B, -1), rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("neq", [0, 5])
def test_banded_matches_dense(rng, neq):
    Qd, Qe, p, g, h, A, b = make_banded_qp(rng, nb=5, bs=4, neq=neq)
    cfg = SolverConfig(check_Q_spd=False, verbose=-1)
    asj = lambda v: None if v is None else jnp.asarray(v)
    sol_b = qpth_tpu.solve_qp_banded_full(*map(asj, (Qd, Qe, p, g, h, A, b)),
                                          config=cfg)
    Q = densify(Qd, Qe)
    G = np.zeros((g.shape[0], g.shape[1], g.shape[1]))
    idx = np.arange(g.shape[1])
    G[:, idx, idx] = g
    sol_d = qpth_tpu.solve_qp_full(*map(asj, (Q, p, G, h, A, b)),
                                   config=cfg)
    npt.assert_allclose(np.asarray(sol_b.z), np.asarray(sol_d.z),
                        rtol=1e-6, atol=1e-7)
    npt.assert_allclose(np.asarray(sol_b.lam), np.asarray(sol_d.lam),
                        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("neq", [0, 4])
def test_banded_gradients_match_dense(rng, neq):
    Qd, Qe, p, g, h, A, b = make_banded_qp(rng, nb=4, bs=3, neq=neq,
                                           nbatch=2)
    cfg = SolverConfig(check_Q_spd=False, verbose=-1)
    asj = lambda v: None if v is None else jnp.asarray(v)

    def loss_banded(Qd, Qe, p, g, h, A, b):
        z = qpth_tpu.solve_qp_banded(Qd, Qe, p, g, h, A, b, config=cfg)
        return jnp.sum(z ** 2)

    argnums = (0, 1, 2, 3, 4) + ((5, 6) if neq else ())
    gb = jax.grad(loss_banded, argnums=argnums)(
        *map(asj, (Qd, Qe, p, g, h, A, b)))

    def loss_dense(Q, p, G, h, A, b):
        z = qpth_tpu.solve_qp(Q, p, G, h, A, b, config=cfg)
        return jnp.sum(z ** 2)

    Q = densify(Qd, Qe)
    n = g.shape[1]
    G = np.zeros((g.shape[0], n, n))
    idx = np.arange(n)
    G[:, idx, idx] = g
    argd = (0, 1, 2, 3) + ((4, 5) if neq else ())
    gd = jax.grad(loss_dense, argnums=argd)(
        *map(asj, (Q, p, G, h, A, b)))
    dQ = np.asarray(gd[0])
    B, nb, bs = Qd.shape[0], Qd.shape[1], Qd.shape[-1]

    # dQd vs diagonal blocks of dense dQ.
    for i in range(nb):
        npt.assert_allclose(np.asarray(gb[0])[:, i],
                            dQ[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs],
                            rtol=1e-4, atol=1e-6)
    # dQe vs sub + transposed-super blocks of dense dQ.
    for i in range(nb - 1):
        want = (dQ[:, (i + 1) * bs:(i + 2) * bs, i * bs:(i + 1) * bs]
                + np.swapaxes(
                    dQ[:, i * bs:(i + 1) * bs, (i + 1) * bs:(i + 2) * bs],
                    -1, -2))
        npt.assert_allclose(np.asarray(gb[1])[:, i], want,
                            rtol=1e-4, atol=1e-6)
    # dp, dh vs dense.
    npt.assert_allclose(np.asarray(gb[2]), np.asarray(gd[1]),
                        rtol=1e-4, atol=1e-6)
    npt.assert_allclose(np.asarray(gb[4]), np.asarray(gd[3]),
                        rtol=1e-4, atol=1e-6)
    # dg vs diagonal of dense dG.
    dG = np.asarray(gd[2])
    npt.assert_allclose(np.asarray(gb[3]), dG[:, idx, idx],
                        rtol=1e-4, atol=1e-6)
    if neq:
        npt.assert_allclose(np.asarray(gb[5]), np.asarray(gd[4]),
                            rtol=1e-4, atol=1e-6)
        npt.assert_allclose(np.asarray(gb[6]), np.asarray(gd[5]),
                            rtol=1e-4, atol=1e-6)


def test_banded_shared_params_and_warmstart(rng):
    """Shared (unbatched) blocks + warm start restarts cleanly."""
    Qd, Qe, p, g, h, A, b = make_banded_qp(rng, nb=4, bs=3, neq=3,
                                           nbatch=3)
    cfg = SolverConfig(check_Q_spd=False, verbose=-1)
    asj = jnp.asarray
    sol = qpth_tpu.solve_qp_banded_full(asj(Qd[0]), asj(Qe[0]), asj(p),
                                        asj(g[0]), asj(h), asj(A), asj(b),
                                        config=cfg)
    assert sol.z.shape == p.shape
    sol2 = qpth_tpu.solve_qp_banded_full(
        asj(Qd[0]), asj(Qe[0]), asj(p), asj(g[0]), asj(h), asj(A), asj(b),
        config=cfg, init=(sol.z, sol.s, sol.lam, sol.nu))
    npt.assert_allclose(np.asarray(sol2.z), np.asarray(sol.z),
                        rtol=1e-5, atol=1e-6)
    assert int(sol2.stats.iterations) <= int(sol.stats.iterations)


@pytest.mark.parametrize("neq", [0, 4])
def test_banded_separable_box_constraints(rng, neq):
    """Separable G (g_cols): true box constraints [I; -I] (m = 2n) match
    the dense path, forward and gradients."""
    Qd, Qe, p, _, _, _, _ = make_banded_qp(rng, nb=4, bs=3, neq=0,
                                           nbatch=3)
    B, n = p.shape
    u = rng.rand(B, n) + 0.5
    lo = -(rng.rand(B, n) + 0.5)
    # rows 0..n-1:  x_i <= u_i ; rows n..2n-1: -x_i <= -lo_i
    g = np.concatenate([np.ones((B, n)), -np.ones((B, n))], axis=1)
    h = np.concatenate([u, -lo], axis=1)
    if neq:
        # equalities anchored at a strictly in-box point so the QP is
        # feasible
        z0 = lo + (u - lo) * rng.rand(B, n)
        A = rng.randn(neq, n)
        b = np.einsum("en,bn->be", A, z0)
    else:
        A = b = None
    g_cols = list(range(n)) * 2
    cfg = SolverConfig(check_Q_spd=False, verbose=-1)
    asj = lambda v: None if v is None else jnp.asarray(v)

    sol_b = qpth_tpu.solve_qp_banded_full(
        *map(asj, (Qd, Qe, p, g, h, A, b)), config=cfg, g_cols=g_cols)
    Q = densify(Qd, Qe)
    eye = np.eye(n)
    G = np.broadcast_to(np.concatenate([eye, -eye], axis=0),
                        (B, 2 * n, n)).copy()
    sol_d = qpth_tpu.solve_qp_full(*map(asj, (Q, p, G, h, A, b)),
                                   config=cfg)
    npt.assert_allclose(np.asarray(sol_b.z), np.asarray(sol_d.z),
                        rtol=1e-6, atol=1e-7)
    # solution actually respects the box
    assert (np.asarray(sol_b.z) <= u + 1e-7).all()
    assert (np.asarray(sol_b.z) >= lo - 1e-7).all()

    # gradients through the separable path match the dense ones
    def loss_b(Qd, Qe, p, g, h):
        z = qpth_tpu.solve_qp_banded(Qd, Qe, p, g, h, asj(A), asj(b),
                                     config=cfg, g_cols=g_cols)
        return jnp.sum(z ** 2)

    gb = jax.grad(loss_b, argnums=(2, 3, 4))(
        *map(asj, (Qd, Qe, p, g, h)))

    def loss_d(Q, p, G, h):
        z = qpth_tpu.solve_qp(Q, p, G, h, asj(A), asj(b), config=cfg)
        return jnp.sum(z ** 2)

    gd = jax.grad(loss_d, argnums=(1, 2, 3))(*map(asj, (Q, p, G, h)))
    npt.assert_allclose(np.asarray(gb[0]), np.asarray(gd[0]),
                        rtol=1e-4, atol=1e-6)    # dp
    idx = np.arange(n)
    dG = np.asarray(gd[1])
    dg_dense = np.concatenate([dG[:, idx, idx], dG[:, n + idx, idx]],
                              axis=1)
    npt.assert_allclose(np.asarray(gb[1]), dg_dense, rtol=1e-4, atol=1e-6)
    npt.assert_allclose(np.asarray(gb[2]), np.asarray(gd[2]),
                        rtol=1e-4, atol=1e-6)    # dh


def test_banded_refine_separable(rng):
    """Post-loop Newton-IR (refine_steps) on the separable banded tier:
    f32 residual score drops well below the IPM's plateau."""
    import jax.numpy as jnp

    from qpth_tpu import SolverConfig
    from qpth_tpu.bandqp import solve_qp_banded_full

    B, nb, bs = 8, 4, 4
    n = nb * bs
    Ld = np.tril(rng.randn(B, nb, bs, bs) * 0.3) + np.eye(bs) * 1.5
    Qd = np.einsum("bnij,bnkj->bnik", Ld, Ld)
    Qe = 0.2 * rng.randn(B, nb - 1, bs, bs)
    Qd[:, 1:] += np.einsum("bnij,bnkj->bnik", Qe, Qe)
    g = np.where(np.abs(rng.randn(B, n)) < 0.3, 0.7, rng.randn(B, n))
    z0 = rng.randn(B, n)
    h = g * z0 + rng.rand(B, n) + 0.2
    p = rng.randn(B, n)
    a32 = [jnp.asarray(v, jnp.float32) for v in (Qd, Qe, p, g, h)]

    base = solve_qp_banded_full(
        *a32, config=SolverConfig(check_Q_spd=False, verbose=-1))
    ref = solve_qp_banded_full(
        *a32, config=SolverConfig(check_Q_spd=False, verbose=-1,
                                  refine_steps=3))
    rb = float(base.stats.best_resids.max())
    rr = float(ref.stats.best_resids.max())
    assert rr <= rb
    assert rr < 1e-4, (rb, rr)


def test_general_tier_refine_breaks_f32_plateau(rng):
    """The round-3 weak spot (VERDICT #2): the general (multi-entry-row)
    condensation's f32 residuals plateaued at 1e-2..1e-1. Post-loop
    Newton-IR must push the scrambled-band fixture's score below 1e-4 —
    parity with the separable tier."""
    import sys

    import jax.numpy as jnp

    from qpth_tpu import SolverConfig, SpQPFunction
    from qpth_tpu.bandqp import solve_qp_banded_full

    B, n, w = 16, 128, 8
    perm0 = rng.permutation(n)
    qi = [(i, j) for i in range(n) for j in range(n) if abs(i - j) <= w]
    Qi = np.array([(perm0[i], perm0[j]) for (i, j) in qi]).T
    gi = []
    for r in range(n):
        c = rng.randint(0, n - 1)
        gi.append((r, perm0[c]))
        gi.append((r, perm0[c + 1]))
    Gi = np.array(gi).T
    Qv = np.zeros((B, Qi.shape[1]), np.float32)
    look = {}
    for k, (i, j) in enumerate(zip(*Qi)):
        if i == j:
            Qv[:, k] = 2.0 * w + 1 + rng.rand(B)
        elif (int(j), int(i)) in look:
            Qv[:, k] = Qv[:, look[(int(j), int(i))]]
        else:
            Qv[:, k] = rng.randn(B) * 0.3
            look[(int(i), int(j))] = k
    Gv = rng.randn(B, Gi.shape[1]).astype(np.float32)
    p = rng.randn(B, n).astype(np.float32)
    G = np.zeros((B, n, n), np.float32)
    np.add.at(G, (np.arange(B)[:, None], Gi[0][None, :], Gi[1][None, :]),
              Gv)
    z0 = rng.randn(B, n)
    h = (np.einsum("bmn,bn->bm", G, z0) + rng.rand(B, n)
         + 0.2).astype(np.float32)

    scores = {}
    for steps in (0, 3):
        cfg = SolverConfig(check_Q_spd=False, verbose=-1,
                           refine_steps=steps)
        f = SpQPFunction(Qi, (n, n), Gi, (n, n), np.zeros((2, 0), int),
                         (0, n), config=cfg, structure="general")
        n_, bs, nb, n_pad = f._band
        perm, invp, specg = f._gen
        Qd, Qe = f._band_blocks(jnp.asarray(Qv))
        pq = jnp.asarray(p)[:, jnp.asarray(perm)]
        if n_pad > n_:
            pq = jnp.pad(pq, ((0, 0), (0, n_pad - n_)))
        sol = solve_qp_banded_full(Qd, Qe, pq, jnp.asarray(Gv),
                                   jnp.asarray(h), None, None,
                                   config=cfg, g_spec=specg)
        scores[steps] = float(sol.stats.best_resids.max())
    assert scores[3] < 1e-4, scores
    assert scores[3] < scores[0] / 10, scores
