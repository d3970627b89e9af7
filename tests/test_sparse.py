"""Sparse fixed-pattern path (SpQPFunction analog) vs the dense solver —
mirrors the reference's sparse tests (test.py:250-368) without the
CUDA/custom-op gating: the TPU path is available everywhere."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu import SpQPFunction


def _diag_problem(rng, nbatch=2, nx=5, nineq=4, neq=3):
    """The reference's sparse fixture (test.py:255-281): diagonal patterns."""
    Qi = np.stack([np.arange(nx), np.arange(nx)])
    Qv = np.ones((nbatch, nx))
    Qsz = (nx, nx)

    Gi = np.stack([np.arange(nineq), np.arange(nineq)])
    Gv = rng.randn(nbatch, nineq)
    Gsz = (nineq, nx)
    h = rng.randn(nbatch, nineq) + 3.0

    Ai = np.stack([np.arange(neq), np.arange(neq)])
    Av = Gv[:, :neq].copy()
    Asz = (neq, nx)
    b = h[:, :neq].copy() * 0.1
    p = rng.randn(nbatch, nx)
    return (Qi, Qv, Qsz), (Gi, Gv, Gsz, h), (Ai, Av, Asz, b), p


def _densify_np(idx, vals, shape):
    B = vals.shape[0]
    out = np.zeros((B,) + shape)
    for bi in range(B):
        np.add.at(out[bi], (idx[0], idx[1]), vals[bi])
    return out


def test_sparse_forward_matches_dense(rng):
    (Qi, Qv, Qsz), (Gi, Gv, Gsz, h), (Ai, Av, Asz, b), p = _diag_problem(rng)

    f = SpQPFunction(Qi, Qsz, Gi, Gsz, Ai, Asz)
    z_sp = f(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))

    Qd = _densify_np(Qi, Qv, Qsz)
    Gd = _densify_np(Gi, Gv, Gsz)
    Ad = _densify_np(Ai, Av, Asz)
    z_dense = qpth_tpu.solve_qp(*map(jnp.asarray, (Qd, p, Gd, h, Ad, b)))
    npt.assert_allclose(np.asarray(z_sp), np.asarray(z_dense), atol=1e-9)


def test_sparse_backward_matches_dense(rng):
    """Sparse-value gradients == dense gradients gathered at the pattern.
    The reference only verifies dQv (its dG/dA sparse grads are documented
    broken, test.py:366-367); here all six match."""
    (Qi, Qv, Qsz), (Gi, Gv, Gsz, h), (Ai, Av, Asz, b), p = _diag_problem(
        rng, nbatch=1)
    f = SpQPFunction(Qi, Qsz, Gi, Gsz, Ai, Asz)
    z_true = rng.randn(1, Qsz[0])

    def loss_sp(Qv_, p_, Gv_, h_, Av_, b_):
        z = f(Qv_, p_, Gv_, h_, Av_, b_)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    gs = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4, 5))(
        *map(jnp.asarray, (Qv, p, Gv, h, Av, b)))

    Qd, Gd, Ad = (_densify_np(Qi, Qv, Qsz), _densify_np(Gi, Gv, Gsz),
                  _densify_np(Ai, Av, Asz))

    def loss_dense(Q_, p_, G_, h_, A_, b_):
        z = qpth_tpu.solve_qp(Q_, p_, G_, h_, A_, b_)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4, 5))(
        *map(jnp.asarray, (Qd, p, Gd, h, Ad, b)))

    npt.assert_allclose(np.asarray(gs[0]),
                        np.asarray(gd[0])[:, Qi[0], Qi[1]], atol=1e-8)
    npt.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]), atol=1e-8)
    npt.assert_allclose(np.asarray(gs[2]),
                        np.asarray(gd[2])[:, Gi[0], Gi[1]], atol=1e-8)
    npt.assert_allclose(np.asarray(gs[3]), np.asarray(gd[3]), atol=1e-8)
    npt.assert_allclose(np.asarray(gs[4]),
                        np.asarray(gd[4])[:, Ai[0], Ai[1]], atol=1e-8)
    npt.assert_allclose(np.asarray(gs[5]), np.asarray(gd[5]), atol=1e-8)


def test_offdiagonal_pattern(rng):
    """Off-diagonal + duplicate-free general pattern (beyond the reference's
    diagonal-only fixture)."""
    nx, nineq, B = 4, 3, 2
    Qi = np.array([[0, 1, 2, 3, 0, 1], [0, 1, 2, 3, 1, 0]])
    Qv = np.concatenate([np.ones((B, 4)) * 2.0, 0.3 * np.ones((B, 2))],
                        axis=1)
    Gi = np.array([[0, 1, 2, 0], [0, 1, 2, 3]])
    Gv = rng.randn(B, 4)
    h = np.abs(rng.randn(B, nineq)) + 1.0
    p = rng.randn(B, nx)

    f = SpQPFunction(Qi, (nx, nx), Gi, (nineq, nx),
                     np.zeros((2, 0), dtype=int), (0, nx))
    z = f(*map(jnp.asarray, (Qv, p, Gv, h)),
          jnp.zeros((B, 0)), jnp.zeros((B, 0)))
    Qd = _densify_np(Qi, Qv, (nx, nx))
    Gd = _densify_np(Gi, Gv, (nineq, nx))
    z_ref = qpth_tpu.solve_qp(jnp.asarray(Qd), jnp.asarray(p),
                              jnp.asarray(Gd), jnp.asarray(h))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-9)


def _banded_problem(rng, n=22, w=3, B=2, neq=2, sym=True):
    """Tridiagonal-band pattern (bandwidth w) Q, diagonal G — the MPC-chain
    shape the banded tier targets. n=22 with bs=8 exercises padding."""
    rows, cols, vals = [], [], []
    diag_boost = np.zeros(n)
    for i in range(n):
        for j in range(max(0, i - w), min(n, i + w + 1)):
            if i == j:
                continue
            rows.append(i), cols.append(j)
    off = 0.3 * rng.randn(B, len(rows))
    if sym:
        # symmetric values: value(i,j) == value(j,i)
        pair = {}
        for k, (i, j) in enumerate(zip(rows, cols)):
            key = (min(i, j), max(i, j))
            if key in pair:
                off[:, k] = off[:, pair[key]]
            else:
                pair[key] = k
    # diagonally-dominant SPD
    Qi = np.array([rows + list(range(n)), cols + list(range(n))])
    dvals = np.abs(off).sum(axis=1).max() + 2.0 + rng.rand(B, n)
    Qv = np.concatenate([off, dvals], axis=1)
    Gi = np.stack([np.arange(n), np.arange(n)])
    Gv = rng.randn(B, n)
    Gv = np.where(np.abs(Gv) < 0.3, 0.7, Gv)
    z0 = rng.randn(B, n)
    h = Gv * z0 + rng.rand(B, n) + 0.2
    p = rng.randn(B, n)
    if neq:
        Ai_r, Ai_c = np.nonzero(np.ones((neq, n)))
        Ai = np.stack([Ai_r, Ai_c])
        Av = rng.randn(B, neq * n) * 0.5
        b = np.einsum("bk,bk->b...", np.ones((B, 0)), np.ones((B, 0))) \
            if False else None
        A = Av.reshape(B, neq, n)
        b = np.einsum("ben,bn->be", A, z0)
    else:
        Ai = np.zeros((2, 0), dtype=int)
        Av = np.zeros((B, 0))
        b = np.zeros((B, 0))
    return Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n)


def test_banded_pattern_auto_dispatch(rng):
    """Banded Q + diagonal G auto-dispatches to the block-Thomas tier and
    matches the densified dense path (forward + gradients), including the
    n % bs != 0 padding path."""
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n) = _banded_problem(rng)
    f = SpQPFunction(Qi, (n, n), Gi, (n, n), Ai, (neq, n))
    assert f.structure == "banded"

    args = [jnp.asarray(v) for v in (Qv, p, Gv, h, Av, b)]
    z = f(*args)
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (n, n))
    A = _densify_np(Ai, Av, (neq, n)) if neq else None
    z_ref = qpth_tpu.solve_qp(
        jnp.asarray(Qd), jnp.asarray(p), jnp.asarray(Gd), jnp.asarray(h),
        None if A is None else jnp.asarray(A),
        None if A is None else jnp.asarray(b))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-6)

    # Gradients to the pattern values match the dense path's gathered.
    def loss_sp(Qv, p, Gv, h, Av, b):
        return jnp.sum(f(Qv, p, Gv, h, Av, b) ** 2)

    gs = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4, 5))(*args)

    def loss_d(Q, p, G, h, A, b):
        return jnp.sum(qpth_tpu.solve_qp(Q, p, G, h, A, b) ** 2)

    gd = jax.grad(loss_d, argnums=(0, 1, 2, 3, 4, 5))(
        *[jnp.asarray(v) for v in (Qd, p, Gd, h, A, b)])
    npt.assert_allclose(np.asarray(gs[0]),
                        np.asarray(gd[0])[:, Qi[0], Qi[1]],
                        rtol=1e-4, atol=1e-7)
    npt.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                        rtol=1e-4, atol=1e-7)
    npt.assert_allclose(np.asarray(gs[2]),
                        np.asarray(gd[2])[:, Gi[0], Gi[1]],
                        rtol=1e-4, atol=1e-7)
    npt.assert_allclose(np.asarray(gs[3]), np.asarray(gd[3]),
                        rtol=1e-4, atol=1e-7)
    npt.assert_allclose(np.asarray(gs[4]),
                        np.asarray(gd[4])[:, Ai[0], Ai[1]],
                        rtol=1e-4, atol=1e-7)
    npt.assert_allclose(np.asarray(gs[5]), np.asarray(gd[5]),
                        rtol=1e-4, atol=1e-7)


def test_banded_detection_boundaries(rng):
    """Dense-bandwidth patterns stay on the dense tier; banded Q with a
    non-separable (but still narrow) G lands on the general tier;
    structure='banded' can be forced where legal."""
    n = 24
    # full-bandwidth pattern -> dense (RCM cannot compress it either)
    Qi_dense = np.stack(np.nonzero(np.ones((n, n))))
    Gi = np.stack([np.arange(n), np.arange(n)])
    f = SpQPFunction(Qi_dense, (n, n), Gi, (n, n),
                     np.zeros((2, 0), int), (0, n))
    assert f.structure == "dense"
    # banded Q but non-separable G: the general tier (pattern of
    # Q ∪ G^T G still narrow-banded) takes it now instead of densifying
    Qi, _, _, _, _, _, Ai, _, _, _ = _banded_problem(rng, n=n, neq=0)
    Gi_nd = np.array([[0, 0], [0, 1]])
    f2 = SpQPFunction(Qi, (n, n), Gi_nd, (n, n),
                      np.zeros((2, 0), int), (0, n))
    assert f2.structure == "general"


def test_box_pattern_dispatches_banded(rng):
    """Diagonal-Q + box-G ([I; -I]) patterns — non-square G — dispatch to
    the banded tier (the diag tier needs square diagonal G) and match the
    densified dense path."""
    n, B = 20, 2
    Qi = np.stack([np.arange(n), np.arange(n)])
    Qv = np.ones((B, n)) * (1.0 + rng.rand(B, n))
    rows = np.arange(2 * n)
    cols = np.concatenate([np.arange(n), np.arange(n)])
    Gi = np.stack([rows, cols])
    Gv = np.concatenate([np.ones((B, n)), -np.ones((B, n))], axis=1)
    u = rng.rand(B, n) + 0.5
    lo = -(rng.rand(B, n) + 0.5)
    h = np.concatenate([u, -lo], axis=1)
    p = rng.randn(B, n)

    f = SpQPFunction(Qi, (n, n), Gi, (2 * n, n),
                     np.zeros((2, 0), int), (0, n))
    assert f.structure == "banded"
    z = f(*map(jnp.asarray, (Qv, p, Gv, h)),
          jnp.zeros((B, 0)), jnp.zeros((B, 0)))
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (2 * n, n))
    z_ref = qpth_tpu.solve_qp(jnp.asarray(Qd), jnp.asarray(p),
                              jnp.asarray(Gd), jnp.asarray(h))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-6)
    assert (np.asarray(z) <= u + 1e-7).all()
    assert (np.asarray(z) >= lo - 1e-7).all()


def _general_problem(rng, n=30, m=24, neq=4, B=3, w=3):
    """Scrambled banded Q (RCM must recover the order) + multi-column G
    rows + dense A — the arbitrary-fixed-pattern workload of the
    reference's sparse tier (spbatch.py:29-174)."""
    perm0 = rng.permutation(n)
    qi = [(i, j) for i in range(n) for j in range(n) if abs(i - j) <= w]
    Qi = np.array([(perm0[i], perm0[j]) for (i, j) in qi]).T
    gi = []
    for r in range(m):
        base = rng.randint(0, n - 3)
        for c in range(base, base + rng.randint(2, 4)):
            gi.append((r, perm0[c]))
    Gi = np.array(gi).T
    Ai = np.stack(np.nonzero(np.ones((neq, n)))) if neq else \
        np.zeros((2, 0), int)

    Qv = np.zeros((B, Qi.shape[1]))
    look = {}
    for k, (i, j) in enumerate(zip(*Qi)):
        if i == j:
            Qv[:, k] = 2.0 * w + 1 + rng.rand(B)
        elif (int(j), int(i)) in look:
            Qv[:, k] = Qv[:, look[(int(j), int(i))]]
        else:
            Qv[:, k] = rng.randn(B) * 0.3
            look[(int(i), int(j))] = k
    Gv = rng.randn(B, Gi.shape[1])
    Av = rng.randn(B, Ai.shape[1])
    p = rng.randn(B, n)
    z0 = rng.randn(B, n)
    s0 = rng.rand(B, m) + 0.1
    G = _densify_np(Gi, Gv, (m, n))
    A = _densify_np(Ai, Av, (neq, n)) if neq else None
    h = np.einsum("bmn,bn->bm", G, z0) + s0
    b = np.einsum("ben,bn->be", A, z0) if neq else np.zeros((B, 0))
    return Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m)


def test_general_pattern_auto_dispatch(rng):
    """A scrambled banded pattern with non-separable G auto-dispatches to
    the general tier (RCM reorder + banded solve with pair-scattered
    G^T D G) and matches the densified dense path: forward tightly, all
    six value-gradients to cross-solver accuracy (two different IPMs;
    the reference documents 1e-4-1e-5 solution agreement vs Gurobi,
    prof-gurobi.py:120-122 — implicit gradients amplify that)."""
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(rng)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (neq, n))
    assert f.structure == "general"

    args = [jnp.asarray(v) for v in (Qv, p, Gv, h, Av, b)]
    z = f(*args)
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (m, n))
    A = _densify_np(Ai, Av, (neq, n))
    z_ref = qpth_tpu.solve_qp(
        jnp.asarray(Qd), jnp.asarray(p), jnp.asarray(Gd), jnp.asarray(h),
        jnp.asarray(A), jnp.asarray(b))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)

    def loss_sp(Qv, p, Gv, h, Av, b):
        return jnp.sum(f(Qv, p, Gv, h, Av, b) ** 2)

    gs = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4, 5))(*args)

    def loss_d(Q, p, G, h, A, b):
        return jnp.sum(qpth_tpu.solve_qp(Q, p, G, h, A, b) ** 2)

    gd = jax.grad(loss_d, argnums=(0, 1, 2, 3, 4, 5))(
        *[jnp.asarray(v) for v in (Qd, p, Gd, h, A, b)])
    gathered = (gd[0][:, Qi[0], Qi[1]], gd[1], gd[2][:, Gi[0], Gi[1]],
                gd[3], gd[4][:, Ai[0], Ai[1]], gd[5])
    for got, want in zip(gs, gathered):
        # ~1e-10 measured with the Newton-solve IR in fwd and bwd; 1e-6
        # leaves margin while still catching any IR/amplification
        # regression (the un-refined path sat at ~1e-3).
        scale = max(float(np.abs(np.asarray(want)).max()), 1.0)
        npt.assert_allclose(np.asarray(got), np.asarray(want),
                            atol=1e-6 * scale)


def test_general_pattern_no_eq(rng):
    """General tier without equality constraints."""
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(
        rng, neq=0)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (0, n))
    assert f.structure == "general"
    args = [jnp.asarray(v) for v in (Qv, p, Gv, h, Av, b)]
    z = f(*args)
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (m, n))
    z_ref = qpth_tpu.solve_qp(jnp.asarray(Qd), jnp.asarray(p),
                              jnp.asarray(Gd), jnp.asarray(h))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)


def test_general_structure_forced_raises():
    """structure='general' rejects incompressible (dense-bandwidth)
    patterns — those belong on the dense tier."""
    import pytest

    n = 24
    Qi_dense = np.stack(np.nonzero(np.ones((n, n))))
    Gi = np.stack([np.arange(n), np.arange(n)])
    with pytest.raises(ValueError):
        SpQPFunction(Qi_dense, (n, n), Gi, (n, n),
                     np.zeros((2, 0), int), (0, n), structure="general")


def test_general_newton_refinement_floor(rng):
    """Regression for the general-G Newton-solve stall: primal
    condensation amplifies the H-solve error by d = z/s, and without
    per-solve iterative refinement the IPM latches at sqrt(eps)-level
    residuals (~5e-7 in f64) with NaN-frozen lanes. With the d cap +
    2 IR passes the f64 floor is ~1e-9."""
    from qpth_tpu.bandqp import solve_qp_banded_full
    from qpth_tpu.config import SolverConfig

    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(
        rng, neq=0)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (0, n),
                     config=SolverConfig(not_improved_lim=50))
    perm, invp, spec = f._gen
    _, bs, nb, n_pad = f._band
    Qd, Qe = f._band_blocks(jnp.asarray(Qv))
    pp = jnp.asarray(p)[:, perm]
    sol = solve_qp_banded_full(Qd, Qe, pp, jnp.asarray(Gv),
                               jnp.asarray(h), None, None,
                               config=f.config, g_spec=spec)
    assert float(np.asarray(sol.stats.best_resids).max()) < 1e-7


def test_empty_g_pattern_routes_to_eq_solver(rng):
    """An empty inequality pattern must bypass the IPM tiers (m = 0 has
    no barrier) and reach the dense path's closed-form equality dispatch
    — where the reference raises (qp.py:89)."""
    n, neq, B = 12, 3, 2
    Qi = np.stack([np.arange(n), np.arange(n)])
    Qv = 1.0 + rng.rand(B, n)
    Ai = np.stack(np.nonzero(np.ones((neq, n))))
    Av = rng.randn(B, Ai.shape[1])
    p = rng.randn(B, n)
    b = rng.randn(B, neq)
    f = SpQPFunction(Qi, (n, n), np.zeros((2, 0), int), (0, n),
                     Ai, (neq, n))
    assert f.structure == "dense"
    z = f(jnp.asarray(Qv), jnp.asarray(p), jnp.zeros((B, 0)),
          jnp.zeros((B, 0)), jnp.asarray(Av), jnp.asarray(b))
    Q = _densify_np(Qi, Qv, (n, n))
    A = _densify_np(Ai, Av, (neq, n))
    z_ref = qpth_tpu.solve_qp_eq(jnp.asarray(Q), jnp.asarray(p),
                                 jnp.asarray(A), jnp.asarray(b))
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-12)


@pytest.mark.slow
def test_general_pattern_property_random(rng):
    """Property sweep: random pattern families (varying bandwidth, row
    arity, padding remainder, empty G rows, duplicate entries) all agree
    with the densified dense path when the general tier engages."""
    for trial in range(5):
        n = int(rng.randint(18, 40))
        w = int(rng.randint(2, 5))
        B = 2
        perm0 = rng.permutation(n)
        qi = [(i, j) for i in range(n) for j in range(n)
              if abs(i - j) <= w and rng.rand() < 0.8 or i == j]
        # ensure symmetry of the pattern
        qset = set()
        for (i, j) in qi:
            qset.add((i, j))
            qset.add((j, i))
        Qi = np.array([(perm0[i], perm0[j]) for (i, j) in sorted(qset)]).T
        m = int(rng.randint(4, n))
        gi = []
        for r in range(m):
            if rng.rand() < 0.15:
                continue  # empty row
            base = int(rng.randint(0, n - 2))
            arity = int(rng.randint(1, 4))
            for c in range(base, min(base + arity, n)):
                gi.append((r, perm0[c]))
                if rng.rand() < 0.1:
                    gi.append((r, perm0[c]))  # duplicate entry
        Gi = np.array(gi).T

        Qv = np.zeros((B, Qi.shape[1]))
        look = {}
        for k, (i, j) in enumerate(zip(*Qi)):
            if i == j:
                Qv[:, k] = 3.0 * w + 1 + rng.rand(B)
            elif (int(j), int(i)) in look:
                Qv[:, k] = Qv[:, look[(int(j), int(i))]]
            else:
                Qv[:, k] = rng.randn(B) * 0.3
                look[(int(i), int(j))] = k
        Gv = rng.randn(B, Gi.shape[1])
        p = rng.randn(B, n)
        z0 = rng.randn(B, n)
        Gd = _densify_np(Gi, Gv, (m, n))
        h = np.einsum("bmn,bn->bm", Gd, z0) + rng.rand(B, m) + 0.1
        f = SpQPFunction(Qi, (n, n), Gi, (m, n),
                         np.zeros((2, 0), int), (0, n),
                         structure="general")
        z = f(*map(jnp.asarray, (Qv, p, Gv, h)),
              jnp.zeros((B, 0)), jnp.zeros((B, 0)))
        Qd = _densify_np(Qi, Qv, (n, n))
        z_ref = qpth_tpu.solve_qp(jnp.asarray(Qd), jnp.asarray(p),
                                  jnp.asarray(Gd), jnp.asarray(h))
        npt.assert_allclose(
            np.asarray(z), np.asarray(z_ref), atol=2e-5,
            err_msg=f"trial {trial}: n={n} w={w} m={m}")


@pytest.mark.slow
def test_general_onehot_matches_scatter(rng):
    """The TPU one-hot-GEMM lowering of the general tier's scatters is
    bit-level-equivalent to the XLA scatter path (0/1 matmul in HIGHEST
    precision accumulates the identical sums)."""
    import qpth_tpu.core.banded as bnd

    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(
        rng, neq=0, B=2)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (0, n))
    args = [jnp.asarray(v) for v in (Qv, p, Gv, h)] + \
        [jnp.zeros((2, 0))] * 2
    orig = bnd._use_onehot
    try:
        z_scatter = np.asarray(f(*args))
        jax.clear_caches()
        bnd._use_onehot = lambda a, b_: True
        z_onehot = np.asarray(f(*args))
    finally:
        bnd._use_onehot = orig
        jax.clear_caches()
    npt.assert_allclose(z_onehot, z_scatter, atol=1e-13)


@pytest.mark.slow
def test_general_f32_small_n_densifies(rng):
    """Auto-chosen general patterns at f32 and n < GENERAL_F32_MIN_N take
    the dense path (measured on-chip: the dense hybrid arm is ~2x faster
    AND ~3 orders more accurate there — PERF.md general-tier table);
    explicitly-requested structure='general' is honored regardless, and
    f64 dispatches to the general tier at any size."""
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(rng)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (neq, n))
    assert f.structure == "general" and n < f.GENERAL_F32_MIN_N

    args32 = [jnp.asarray(v, jnp.float32)
              for v in (Qv, p, Gv, h, Av, b)]
    z32 = f(*args32)
    # Bit-identical to the densified dense path == the dense route ran.
    Qd = _densify_np(Qi, Qv, (n, n)).astype(np.float32)
    Gd = _densify_np(Gi, Gv, (m, n)).astype(np.float32)
    A = _densify_np(Ai, Av, (neq, n)).astype(np.float32)
    z_dense = qpth_tpu.solve_qp(
        jnp.asarray(Qd), args32[1], jnp.asarray(Gd), args32[3],
        jnp.asarray(A), args32[5])
    npt.assert_array_equal(np.asarray(z32), np.asarray(z_dense))

    # Forcing the tier bypasses the floor: same f32 inputs, different
    # (general-tier) computation.
    ff = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (neq, n),
                      structure="general")
    zf = ff(*args32)
    assert np.abs(np.asarray(zf) - np.asarray(z_dense)).max() > 0


def _kkt_score(Qd, p, Gd, h, Ad, b, sol):
    z = np.float64(np.asarray(sol.z))
    lam = np.float64(np.asarray(sol.lam))
    sv = np.float64(np.asarray(sol.s))
    m = Gd.shape[-2]
    rx = (np.einsum("bnk,bk->bn", Qd, z) + p
          + np.einsum("bmn,bm->bn", Gd, lam))
    rz = np.einsum("bmn,bn->bm", Gd, z) + sv - h
    sc = (np.linalg.norm(rx, axis=-1) + np.linalg.norm(rz, axis=-1)
          + np.abs((sv * lam).sum(-1)))
    if Ad is not None and Ad.shape[-2] > 0:
        nu = np.float64(np.asarray(sol.nu))
        sc = sc + np.linalg.norm(
            np.einsum("ben,bn->be", Ad, z) - b, axis=-1)
        # nu enters rx above only through the dense path; re-add for
        # completeness of the stationarity check:
        rx2 = rx + np.einsum("ben,be->bn", Ad, nu)
        sc = sc - np.linalg.norm(rx, axis=-1) \
            + np.linalg.norm(rx2, axis=-1)
    return sc


def test_solve_full_diag_tier(rng):
    """VERDICT r4 #9: the structured tiers surface duals + SolveStats via
    SpQPFunction.solve_full, drop-in like the dense path — diag tier."""
    (Qi, Qv, Qsz), (Gi, Gv, Gsz, h), (Ai, Av, Asz, b), p = _diag_problem(
        rng, nx=5, nineq=5)
    f = SpQPFunction(Qi, Qsz, Gi, Gsz, Ai, Asz)
    assert f.structure == "diag"
    sol = f.solve_full(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    Qd = _densify_np(Qi, Qv, Qsz)
    Gd = _densify_np(Gi, Gv, Gsz)
    Ad = _densify_np(Ai, Av, Asz)
    sc = _kkt_score(Qd, p, Gd, h, Ad, b, sol)
    assert sc.max() < 1e-6, sc
    assert np.asarray(sol.stats.best_resids).shape == (Qv.shape[0],)
    # warm start from the solution stays at the solution
    sol2 = f.solve_full(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)),
                        init=(sol.z, sol.s, sol.lam, sol.nu))
    assert np.abs(np.asarray(sol2.z) - np.asarray(sol.z)).max() < 1e-6


def test_solve_full_banded_tier(rng):
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n) = _banded_problem(rng)
    f = SpQPFunction(Qi, (n, n), Gi, (n, n), Ai, (neq, n))
    assert f.structure == "banded"
    sol = f.solve_full(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (n, n))
    Ad = _densify_np(Ai, Av, (neq, n))
    sc = _kkt_score(Qd, p, Gd, h, Ad, b, sol)
    assert sc.max() < 1e-6, sc
    # z matches __call__ exactly (same tier, same path)
    z_call = f(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    npt.assert_allclose(np.asarray(sol.z), np.asarray(z_call), atol=1e-12)


def test_solve_full_general_tier(rng):
    Qi, Qv, Gi, Gv, h, p, Ai, Av, b, (neq, n, m) = _general_problem(rng)
    f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (neq, n),
                     structure="general")
    sol = f.solve_full(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    Qd = _densify_np(Qi, Qv, (n, n))
    Gd = _densify_np(Gi, Gv, (m, n))
    Ad = _densify_np(Ai, Av, (neq, n))
    sc = _kkt_score(Qd, p, Gd, h, Ad, b, sol)
    assert sc.max() < 1e-5, sc
    z_call = f(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
    npt.assert_allclose(np.asarray(sol.z), np.asarray(z_call), atol=1e-12)
    # warm start round-trips through the permutation/padding correctly
    sol2 = f.solve_full(*map(jnp.asarray, (Qv, p, Gv, h, Av, b)),
                        init=(sol.z, sol.s, sol.lam, sol.nu))
    assert np.abs(np.asarray(sol2.z) - np.asarray(sol.z)).max() < 1e-5
