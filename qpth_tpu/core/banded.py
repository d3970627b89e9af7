"""Structure-exploiting batched IPM for block-tridiagonal-Q / diagonal-G
QPs — the banded tier of the sparse path (MPC chains, finite-difference /
finite-horizon couplings).

The reference handles arbitrary fixed sparsity patterns by assembling one
big sparse KKT matrix and QR-factoring it per iteration
(``/root/reference/qpth/solvers/pdipm/spbatch.py:184-269``, backed by the
custom ``torch.spbqrfactsolve`` CUDA kernel).  The TPU-native answer, as
with the diagonal tier (:mod:`qpth_tpu.core.diag`), is to exploit the
structure *algebraically*: with G diagonal the per-iteration Newton system
collapses onto the primal block

    H dx + A^T dy = rt,   A dx = -ry,     H = Q + diag(g^2 d)

and when Q is block-tridiagonal (bandwidth <= bs after blocking into nb
stages of size bs) H is too, so H-solves become a **block-Thomas sweep**:
nb sequential stages of small dense (bs x bs) batched ops — Schur
complements C_i = H_i - E_{i-1} W_{i-1} E_{i-1}^T, explicit SPD inverses
W_i = C_i^{-1} (the batch-in-lanes Pallas kernel on TPU), and batched MXU
GEMMs for everything else.  Per-lane cost drops from O(n^3) dense to
O(nb * bs^3) — at nz = 512, bs = 32 that is a 256x FLOP reduction over the
dense Cholesky the densifying fallback pays.

Equality constraints are handled exactly as in the diagonal tier: the
normal-equations matrix M = A H^-1 A^T is assembled from a multi-RHS
block-Thomas solve and factored dense ((neq x neq), lanes kernel) —
appropriate while neq stays moderate (< ~136); larger neq falls back to
the dense path at dispatch time.

Loop semantics (init + shift, residual score, best-iterate tracking,
improvement-window termination, Mehrotra predictor-corrector, Gondzio
correctors, 0.999 step, per-lane NaN freeze) mirror
:mod:`qpth_tpu.core.pdipm` / the reference's batch.py:47-207 contract, so
the banded and dense paths return the same solutions to solver precision
(tested in tests/test_banded.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import QPSolution, SolverConfig, SolveStats
from ..ops.linalg import bmv, btmv
from .diag import _bvec, _factor_spd, _m_solve, _use_pallas_m
from .pdipm import (_greduce, _runtime_supports_callbacks,
                    _step_to_boundary)

_HI = lax.Precision.HIGHEST


def bt_mul(Qd, Qe, x):
    """y = Q x for block-tridiagonal Q.

    Qd: (B, nb, bs, bs) diagonal blocks; Qe: (B, nb-1, bs, bs)
    subdiagonal blocks (block (i+1, i)); x: (B, nb, bs). All stages run
    as one batched MXU GEMM each.
    """
    y = jnp.einsum("bnij,bnj->bni", Qd, x, precision=_HI)
    if Qe.shape[1]:
        lo = jnp.einsum("bnij,bnj->bni", Qe, x[:, :-1], precision=_HI)
        hi = jnp.einsum("bnji,bnj->bni", Qe, x[:, 1:], precision=_HI)
        y = y.at[:, 1:].add(lo).at[:, :-1].add(hi)
    return y


class _BTFactor(NamedTuple):
    """Block-Thomas factorization of H = blocktridiag(Hd, Qe, Qe^T).

    W: (nb, B, bs, bs) stage-wise Schur-complement inverses C_i^{-1};
    F: (nb, B, bs, bs) forward-sweep multipliers E_{i-1} W_{i-1} (zero at
    stage 0); Gt: (nb, B, bs, bs) backward-sweep multipliers W_i E_i^T
    (zero at the last stage).
    """

    W: jnp.ndarray
    F: jnp.ndarray
    Gt: jnp.ndarray


def bt_factor(Hd, Qe, spd_inv) -> _BTFactor:
    """Factor the block-tridiagonal SPD H via the Schur-complement
    (block-Thomas) recursion:

        C_0 = Hd_0,   C_i = Hd_i - E_{i-1} W_{i-1} E_{i-1}^T,
        W_i = C_i^{-1}

    ``spd_inv``: batched (B, bs, bs) SPD inverse. The stage loop is the
    only sequential part; each step is batched over all B lanes.
    """
    B, nb, bs, _ = Hd.shape
    Hd_s = jnp.swapaxes(Hd, 0, 1)                       # (nb, B, bs, bs)
    # E_prev for stage i is Qe[i-1]; zero block for stage 0.
    zeroE = jnp.zeros((1, B, bs, bs), Hd.dtype)
    E_prev = (jnp.concatenate([zeroE, jnp.swapaxes(Qe, 0, 1)], axis=0)
              if Qe.shape[1] else jnp.broadcast_to(zeroE, (nb, B, bs, bs)))

    def step(W_prev, xs):
        D_i, E_p = xs
        F_i = jnp.einsum("bij,bjk->bik", E_p, W_prev, precision=_HI)
        C = D_i - jnp.einsum("bij,bkj->bik", F_i, E_p, precision=_HI)
        W = spd_inv(C)
        return W, (W, F_i)

    W0 = jnp.zeros((B, bs, bs), Hd.dtype)               # unused at stage 0
    _, (W, F) = lax.scan(step, W0, (Hd_s, E_prev))

    if Qe.shape[1]:
        # Gt_i = W_i E_i^T with E_i = Qe[:, i] (coupling block (i+1, i)).
        Gt_head = jnp.einsum("nbij,bnkj->nbik", W[:-1], Qe, precision=_HI)
        Gt = jnp.concatenate(
            [Gt_head, jnp.zeros((1, B, bs, bs), Hd.dtype)], axis=0)
    else:
        Gt = jnp.zeros((nb, B, bs, bs), Hd.dtype)
    return _BTFactor(W=W, F=F, Gt=Gt)


def bt_solve(fac: _BTFactor, r):
    """Solve H x = r given a bt_factor. r: (B, nb, bs) -> (B, nb, bs).

    Forward sweep v_i = r_i - F_i v_{i-1}; u_i = W_i v_i (one batched
    GEMM over all stages); backward sweep x_i = u_i - Gt_i x_{i+1}.
    """
    r_s = jnp.swapaxes(r, 0, 1)                         # (nb, B, bs)

    def fwd(v_prev, xs):
        r_i, F_i = xs
        v = r_i - jnp.einsum("bij,bj->bi", F_i, v_prev, precision=_HI)
        return v, v

    v0 = jnp.zeros_like(r_s[0])
    _, v = lax.scan(fwd, v0, (r_s, fac.F))
    u = jnp.einsum("nbij,nbj->nbi", fac.W, v, precision=_HI)

    def bwd(x_next, xs):
        u_i, Gt_i = xs
        x = u_i - jnp.einsum("bij,bj->bi", Gt_i, x_next, precision=_HI)
        return x, x

    _, x_rev = lax.scan(bwd, jnp.zeros_like(u[0]), (u[::-1], fac.Gt[::-1]))
    return jnp.swapaxes(x_rev[::-1], 0, 1)


def bt_solve_multi(fac: _BTFactor, R):
    """Multi-RHS variant: R (B, nb, bs, k) -> (B, nb, bs, k)."""
    R_s = jnp.swapaxes(R, 0, 1)                         # (nb, B, bs, k)

    def fwd(v_prev, xs):
        r_i, F_i = xs
        v = r_i - jnp.einsum("bij,bjk->bik", F_i, v_prev, precision=_HI)
        return v, v

    _, v = lax.scan(fwd, jnp.zeros_like(R_s[0]), (R_s, fac.F))
    u = jnp.einsum("nbij,nbjk->nbik", fac.W, v, precision=_HI)

    def bwd(x_next, xs):
        u_i, Gt_i = xs
        x = u_i - jnp.einsum("bij,bjk->bik", Gt_i, x_next, precision=_HI)
        return x, x

    _, x_rev = lax.scan(bwd, jnp.zeros_like(u[0]), (u[::-1], fac.Gt[::-1]))
    return jnp.swapaxes(x_rev[::-1], 0, 1)


def _spd_inv_stage(use_pallas: bool):
    """Batched small SPD inverse for the stage recursion."""
    if use_pallas:
        from ..ops import kkt as kkt_ops

        return lambda C: kkt_ops._spd_inv(C, True)
    from ..ops.linalg import cho_solve, cholesky

    def inv(C):
        eye = jnp.broadcast_to(jnp.eye(C.shape[-1], dtype=C.dtype),
                               C.shape)
        return cho_solve(cholesky(C), eye)

    return inv


class GeneralG:
    """Arbitrary fixed-pattern sparse G for the general structured tier.

    Static COO pattern ``(rows, cols)`` — ``cols`` in the (possibly
    RCM-permuted) variable order the banded solver runs in — with
    per-batch values supplied at call time as the solver's ``g`` argument
    of shape (B, nnz). Construction precomputes the scatter maps that
    assemble ``G^T diag(w) G`` into the block-tridiagonal band: every
    ordered within-row entry pair (k1, k2) lands in a diagonal-block slot
    (blk, r, c) or — when the two columns sit in adjacent blocks — a
    subdiagonal-block slot. Pairs spanning more than one block fall
    outside the band and raise (the caller chooses ``bs`` from the
    bandwidth of Q ∪ G^T G, so a well-formed plan cannot hit this).

    This is the TPU-native replacement for the reference's arbitrary-
    pattern sparse KKT assembly (`cat_kkt`,
    /root/reference/qpth/solvers/pdipm/spbatch.py:184-243): the pattern
    is compiled into static scatter maps instead of runtime sparse
    tensors. Hashable on the static pattern so it can ride custom_vjp
    nondiff metadata and jit static closures.
    """

    def __init__(self, m, n, bs, nb, rows, cols):
        import numpy as np

        self.m, self.n = int(m), int(n)
        self.bs, self.nb = int(bs), int(nb)
        self.rows = np.asarray(rows, np.int32).reshape(-1)
        self.cols = np.asarray(cols, np.int32).reshape(-1)
        byrow = {}
        for k, r in enumerate(self.rows):
            byrow.setdefault(int(r), []).append(k)
        hd, qe = [], []
        for ks in byrow.values():
            for k1 in ks:
                c1 = int(self.cols[k1])
                b1 = c1 // self.bs
                for k2 in ks:
                    c2 = int(self.cols[k2])
                    b2 = c2 // self.bs
                    if b1 == b2:
                        hd.append((k1, k2, b1, c1 % self.bs, c2 % self.bs))
                    elif b1 == b2 + 1:
                        qe.append((k1, k2, b2, c1 % self.bs, c2 % self.bs))
                    elif b1 == b2 - 1:
                        pass    # implied transpose of a qe pair
                    else:
                        raise ValueError(
                            "G^T G entry pair spans non-adjacent blocks; "
                            "bs must cover the bandwidth of Q ∪ G^T G")
        self.hd = np.asarray(hd, np.int32).reshape(-1, 5).T
        self.qe = np.asarray(qe, np.int32).reshape(-1, 5).T
        #: row of each pair (for the diag-weight gather d[:, row]).
        self.hd_row = self.rows[self.hd[0]] if self.hd.size else self.hd[0]
        self.qe_row = self.rows[self.qe[0]] if self.qe.size else self.qe[0]
        self._key = (self.m, self.n, self.bs, self.nb,
                     self.rows.tobytes(), self.cols.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, GeneralG) and self._key == other._key


#: Budget (in f32 elements) for materializing a static one-hot
#: scatter-as-GEMM matrix; above it the plain XLA scatter is used.
_ONEHOT_BUDGET = 32 * 1024 * 1024


def _use_onehot(n_src, n_dst) -> bool:
    """Route static scatter-adds through a one-hot GEMM on TPU: XLA
    lowers scatter to a serialized update chain there, while a
    (B, n_src) x (n_src, n_dst) matmul with a 0/1 matrix is one MXU op
    reading a static constant. CPU keeps the scatter (faster, and the
    one-hot constant is pure overhead off-TPU)."""
    return (jax.default_backend() == "tpu"
            and n_src * n_dst <= _ONEHOT_BUDGET)


def _onehot(src_idx, n_src, dst_idx, n_dst, dtype):
    """Static (n_src, n_dst) 0/1 matrix with ones at (src, dst) pairs
    (duplicates accumulate). Built IN-GRAPH from the small index
    constants — a materialized numpy literal would be embedded in the
    HLO request verbatim (the axon remote-compile literal-size hazard);
    this scatter is loop-invariant, so XLA hoists/folds it once per
    compiled solve."""
    return jnp.zeros((n_src, n_dst), dtype).at[
        jnp.asarray(src_idx), jnp.asarray(dst_idx)].add(1.0)


def _gen_ops(gen_g: GeneralG, g, B, n, dtype):
    """(gmul, gtmul, h_assemble) for a general sparse G with values g
    (B, nnz). h_assemble(Qd, Qe, d) returns (Hd, He) = the band of
    Q + G^T diag(d) G via precomputed pair scatters (one-hot GEMMs on
    TPU, see _use_onehot)."""
    import numpy as np

    gr = jnp.asarray(gen_g.rows)
    gc = jnp.asarray(gen_g.cols)
    m = gen_g.m
    nnz = int(gen_g.rows.size)

    def gmul(v):
        """G v: (B, n) -> (B, m): gather + row scatter-add."""
        ent = g * v[:, gc]
        if _use_onehot(nnz, m):
            return jnp.matmul(ent, _onehot(np.arange(nnz), nnz,
                                           gen_g.rows, m, dtype),
                              precision=_HI)
        return jnp.zeros((B, m), dtype).at[:, gr].add(ent)

    def gtmul(w):
        """G^T w: (B, m) -> (B, n)."""
        ent = g * w[:, gr]
        if _use_onehot(nnz, n):
            return jnp.matmul(ent, _onehot(np.arange(nnz), nnz,
                                           gen_g.cols, n, dtype),
                              precision=_HI)
        return jnp.zeros((B, n), dtype).at[:, gc].add(ent)

    hk1, hk2, hb, hr, hc = [jnp.asarray(x) for x in gen_g.hd]
    hrow = jnp.asarray(gen_g.hd_row)
    n_hd = int(gen_g.hd.shape[1]) if gen_g.hd.size else 0
    bs, nb = gen_g.bs, gen_g.nb
    has_qe = bool(np.asarray(gen_g.qe).size)
    if has_qe:
        qk1, qk2, qb, qr, qc = [jnp.asarray(x) for x in gen_g.qe]
        qrow = jnp.asarray(gen_g.qe_row)
        n_qe = int(gen_g.qe.shape[1])

    def h_assemble(Qd, Qe, d):
        w_hd = g[:, hk1] * g[:, hk2] * d[:, hrow]
        hd_slots = nb * bs * bs
        if _use_onehot(n_hd, hd_slots):
            dst = (np.asarray(gen_g.hd[2]) * bs + np.asarray(gen_g.hd[3])
                   ) * bs + np.asarray(gen_g.hd[4])
            upd = jnp.matmul(w_hd, _onehot(np.arange(n_hd), n_hd,
                                           dst, hd_slots, dtype),
                             precision=_HI)
            Hd = Qd + upd.reshape(B, nb, bs, bs)
        else:
            Hd = Qd.at[:, hb, hr, hc].add(w_hd)
        if has_qe:
            w_qe = g[:, qk1] * g[:, qk2] * d[:, qrow]
            qe_slots = max(nb - 1, 1) * bs * bs
            if _use_onehot(n_qe, qe_slots):
                dstq = (np.asarray(gen_g.qe[2]) * bs
                        + np.asarray(gen_g.qe[3])) * bs \
                    + np.asarray(gen_g.qe[4])
                updq = jnp.matmul(w_qe, _onehot(np.arange(n_qe), n_qe,
                                                dstq, qe_slots, dtype),
                                  precision=_HI)
                He = Qe + updq.reshape(B, nb - 1, bs, bs)
            else:
                He = Qe.at[:, qb, qr, qc].add(w_qe)
        else:
            He = Qe
        return Hd, He

    return gmul, gtmul, h_assemble


#: Newton-system IR passes for the general-G condensed solve (see
#: solve_newton's docstring); 2 reaches the dtype floor in f64.
_GEN_IR_PASSES = 2


def _d_cap(dtype):
    """Cap for the slack weighting d = z/s in the general-G condensed
    system. Swept on a scrambled-band fixture (f64: 1e8..1e12, f32:
    1e4..1e8): too low and the capped barrier's perturbation dominates,
    too high and the H-solve error (amplified by d in the dz recovery)
    takes over even with IR. 1e10/1e7 sit at the bottom of the bathtub:
    f64 reaches ~1e-9 best residuals, f32 the same ~1e-4 plateau as the
    dense path."""
    return 1e10 if jnp.dtype(dtype).itemsize >= 8 else 1e7


class _BandState(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray
    best_x: jnp.ndarray
    best_s: jnp.ndarray
    best_z: jnp.ndarray
    best_y: jnp.ndarray
    best_resids: jnp.ndarray
    mu: jnp.ndarray
    n_not_improved: jnp.ndarray
    lane_done: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def solve_banded(Qd, Qe, p, g, h, A, b, config: SolverConfig,
                 init=None, g_cols=None, gen_g=None) -> QPSolution:
    """Batched IPM with block-tridiagonal Q and *separable* G: each
    inequality row involves exactly one variable — or, with ``gen_g``,
    an ARBITRARY fixed-pattern sparse G (see :class:`GeneralG`; ``g`` is
    then the (B?, nnz) entry values and G^T diag(d) G is assembled into
    the band by static pair scatters each iteration).

    Qd: (B?, nb, bs, bs) diagonal blocks (symmetric); Qe: (B?, nb-1, bs,
    bs) subdiagonal blocks ((i+1, i); the (i, i+1) blocks are implied
    transposes); p: (B?, n) with n = nb*bs.

    G is given row-wise: row r is ``g[r] * x[g_cols[r]] <= h[r]`` with
    ``g`` (B?, m) and ``g_cols`` a STATIC (m,) integer column map
    (default: arange(n), i.e. G = diag(g), m = n). Box constraints
    [I; -I] are g_cols = [0..n-1, 0..n-1] with g = [1...,-1...], m = 2n.
    G^T-applications become static scatter-adds and G-applications
    gathers, so the condensed system H = Q + G^T D G stays
    block-tridiagonal for ANY separable pattern.

    A: (bA, neq, n) dense or None; b: (B?, neq). Same convergence
    contract as :func:`qpth_tpu.core.pdipm.solve`.
    """
    Qd = jnp.asarray(Qd)
    Qe = jnp.asarray(Qe)
    if Qd.ndim == 3:
        Qd = Qd[None]
    if Qe.ndim == 3:
        Qe = Qe[None]
    nb, bs = Qd.shape[1], Qd.shape[-1]
    n = nb * bs
    p = jnp.atleast_2d(jnp.asarray(p))
    h_a = jnp.asarray(h)
    B = max(p.shape[0], h_a.shape[0] if h_a.ndim == 2 else 1,
            Qd.shape[0])
    dtype = p.dtype
    axis = config.axis_name

    # The stage recursion needs full-batch blocks (the scan's W carry is
    # per-lane once d enters H).
    Qd = jnp.broadcast_to(Qd, (B, nb, bs, bs))
    Qe = jnp.broadcast_to(Qe, (B, max(nb - 1, 0), bs, bs))
    q_diag_embed = jnp.zeros((B, nb, bs, bs), dtype)
    eye_idx = jnp.arange(bs)

    g = _bvec(g, B)
    p = _bvec(p, B)
    h = _bvec(h, B)
    if A is not None:
        A = jnp.asarray(A)
        if A.ndim == 2:
            A = A[None]
        neq = A.shape[-2]
        b = _bvec(b, B)
        A_blocks = jnp.broadcast_to(A, (B, neq, n)).reshape(B, neq, nb, bs)
    else:
        neq = 0
        b = None
    h_assemble = None
    if gen_g is not None:
        m = gen_g.m
        gmul, gtmul, h_assemble = _gen_ops(gen_g, g, B, n, dtype)
    elif g_cols is None:
        # Diagonal G: gather/scatter degenerate to elementwise products
        # (XLA is not guaranteed to simplify an iota-gather).
        m = g.shape[-1]
        assert m == n, "diagonal G requires g of length n"

        def gmul(v):
            return g * v

        def gtmul(w):
            return g * w
    else:
        m = g.shape[-1]
        ci = jnp.asarray(g_cols)

        def gmul(v):
            """G v for (B, n) v -> (B, m): per-row gather."""
            return g * v[:, ci]

        def gtmul(w):
            """G^T w for (B, m) w -> (B, n): static scatter-add."""
            return jnp.zeros((B, n), dtype).at[:, ci].add(g * w)

    improve_margin = config.improve_margin
    if improve_margin is None:
        improve_margin = 0.0 if jnp.dtype(dtype).itemsize >= 8 else 1e-3
    per_lane_term = improve_margin > 0.0

    import numpy as np

    from ..ops.kkt import pallas_hw_ok

    use_pallas_stage = (np.dtype(dtype) == np.float32
                        and pallas_hw_ok()
                        and config.use_pallas not in (False, "xla")
                        and (config.use_pallas != "auto"
                             or jax.default_backend() == "tpu"))
    if use_pallas_stage:
        from ..ops.pallas.lanes import lanes_supported

        use_pallas_stage = lanes_supported(bs, B)
    spd_inv = _spd_inv_stage(use_pallas_stage)
    use_pallas_M = _use_pallas_m(config, dtype, neq, B)

    def blocks(v):
        return v.reshape(B, nb, bs)

    def flat(v):
        return v.reshape(B, n)

    def factor_all(d):
        """Complete + factor H = Q + G^T diag(d) G; returns (fac, X, Mfac)
        with X = H^-1 A^T and Mfac the factored normal-equations matrix
        M = A H^-1 A^T (both None when neq == 0)."""
        if h_assemble is not None:
            Hd, He = h_assemble(Qd, Qe, d)
        else:
            shift = blocks(gtmul(g * d))
            Hd = Qd + q_diag_embed.at[..., eye_idx, eye_idx].set(shift)
            He = Qe
        fac = bt_factor(Hd, He, spd_inv)
        if neq == 0:
            return fac, None, None
        AT = jnp.transpose(A_blocks, (0, 2, 3, 1))      # (B, nb, bs, neq)
        X = bt_solve_multi(fac, AT)                     # (B, nb, bs, neq)
        M = jnp.einsum("bfnk,bnke->bfe", A_blocks, X, precision=_HI)
        Mfac = _factor_spd(M, use_pallas_M)
        return fac, X, Mfac

    def solve_newton_base(fac, X, Mfac, rx, rs, rz, ry, d):
        """Same elimination as the diagonal tier (G diagonal); the H-solve
        is the block-Thomas sweep and dx reuses X = H^-1 A^T so the dy
        back-substitution costs one GEMM, not another sweep."""
        rt = jnp.zeros((B, n), dtype)
        if rx is not None:
            rt = rt - rx
        if rs is not None:
            rt = rt + gtmul(rs)
        if rz is not None:
            rt = rt - gtmul(d * rz)
        u = flat(bt_solve(fac, blocks(rt)))             # H^-1 rt
        if neq > 0:
            rhs = bmv(A, u)
            if ry is not None:
                rhs = rhs + ry
            dy = _m_solve(Mfac, rhs)
            dx = u - flat(jnp.einsum("bnke,be->bnk", X, dy,
                                     precision=_HI))
        else:
            dy = None
            dx = u
        gdx = gmul(dx)
        ds = -gdx if rz is None else (-rz - gdx)
        dz = -d * ds if rs is None else (-rs - d * ds)
        return dx, ds, dz, dy

    if gen_g is None:
        solve_newton = solve_newton_base
    else:
        def solve_newton(fac, X, Mfac, rx, rs, rz, ry, d):
            """General-G Newton solve with iterative refinement.

            Primal condensation recovers dz = -rs - d*ds, amplifying the
            H-solve error by d — for active rows (d up to the cap) the
            raw direction's dual residual is O(cond(H)*eps*d), junk near
            convergence, and the IPM stalls at sqrt(eps)-level residuals
            (the separable path is immune: its diagonally-dominant H
            solves to ~eps). The primal and complementarity equations
            hold exactly by construction, so the error sits entirely in
            the dual equation; refinement against it with the cached
            factorization contracts the error by cond(H)*eps per pass —
            two passes reach the dtype floor. This is the role
            regularized IR plays in the reference (solve_kkt_ir,
            batch.py:244-310) and in its sparse tier (spbatch.py:259-267,
            one refinement against the regularized K̃)."""
            dx, ds, dz, dy = solve_newton_base(fac, X, Mfac,
                                               rx, rs, rz, ry, d)
            for _ in range(_GEN_IR_PASSES):
                e_dual = gtmul(dz) + flat(bt_mul(Qd, Qe, blocks(dx)))
                if rx is not None:
                    e_dual = e_dual + rx
                if neq > 0:
                    e_dual = e_dual + btmv(A, dy)
                    e_y = bmv(A, dx)
                    if ry is not None:
                        e_y = e_y + ry
                else:
                    e_y = None
                cx, cs, cz, cy = solve_newton_base(
                    fac, X, Mfac, e_dual, None, None, e_y, d)
                dx, ds, dz = dx + cx, ds + cs, dz + cz
                if neq > 0:
                    dy = dy + cy
            return dx, ds, dz, dy

    # ---- Init: d = 1, RHS (p, 0, -h, -b) (batch.py:61-67) ----
    if init is None:
        ones = jnp.ones((B, m), dtype)
        fac0, X0, Mfac0 = factor_all(ones)
        x, s, z, y = solve_newton(fac0, X0, Mfac0, p, None, -h,
                                  -b if neq > 0 else None, ones)

        def shift_pos(v):
            mn = v.min(axis=-1, keepdims=True)
            return jnp.where(mn < 0, v - mn + 1.0, v)

        s = shift_pos(s)
        z = shift_pos(z)
    else:
        x, s, z, y = init
        s = jnp.maximum(s, config.warm_start_min)
        z = jnp.maximum(z, config.warm_start_min)
    y = y if y is not None else jnp.zeros((B, 0), dtype)

    inf = jnp.asarray(jnp.inf, dtype)
    state = _BandState(
        x=x, s=s, z=z, y=y, best_x=x, best_s=s, best_z=z, best_y=y,
        best_resids=jnp.full((B,), inf, dtype),
        mu=jnp.zeros((B,), dtype),
        n_not_improved=jnp.zeros((B,) if per_lane_term else (),
                                 jnp.int32),
        lane_done=jnp.zeros((B,), bool),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
    )

    def residuals(x, s, z, y):
        rx = flat(bt_mul(Qd, Qe, blocks(x))) + p + gtmul(z)
        if neq > 0:
            rx = rx + btmv(A, y)
            ry = bmv(A, x) - b
            y_resid = jnp.linalg.norm(ry, axis=-1)
        else:
            ry = None
            y_resid = jnp.zeros((B,), dtype)
        rz = gmul(x) + s - h
        mu = jnp.abs((s * z).sum(axis=-1) / m)
        resids = (y_resid + jnp.linalg.norm(rz, axis=-1)
                  + jnp.linalg.norm(rx, axis=-1) + m * mu)
        return rx, rz, ry, mu, resids

    def cond_fn(st):
        return jnp.logical_and(~st.done, st.it < config.max_iter)

    def body_fn(st):
        x, s, z, y = st.x, st.s, st.z, st.y
        rx, rz, ry, mu, resids = residuals(x, s, z, y)

        improved_strict = resids < st.best_resids
        improved = resids < st.best_resids * (1.0 - improve_margin)
        best_resids = jnp.where(improved_strict, resids, st.best_resids)
        imp = improved_strict[:, None]
        best_x = jnp.where(imp, x, st.best_x)
        best_s = jnp.where(imp, s, st.best_s)
        best_z = jnp.where(imp, z, st.best_z)
        best_y = jnp.where(imp, y, st.best_y) if neq > 0 else st.best_y

        if per_lane_term:
            n_not = jnp.where(improved, 0, st.n_not_improved + 1)
            lane_done = st.lane_done | (n_not >= config.not_improved_lim)
            window_done = _greduce(lane_done.all(), "min", axis)
        else:
            any_improved = _greduce(improved.any(), "max", axis)
            n_not = jnp.where(any_improved, 0, st.n_not_improved + 1)
            lane_done = st.lane_done
            window_done = n_not >= config.not_improved_lim
        max_best = _greduce(best_resids.max(), "max", axis)
        min_mu = _greduce(mu.min(), "min", axis)
        done = (window_done
                | (max_best < config.eps)
                | (min_mu > config.mu_divergence))

        def do_step(args):
            x, s, z, y = args
            d = z / s
            if gen_g is not None:
                # General-G only: cap d. The separable shift H = Q +
                # diag(g^2 d) stays SPD-stable at any d, but the general
                # G^T diag(d) G cross terms cancel catastrophically in
                # the block-Thomas recursion once d >> 1/eps(dtype) —
                # lanes then NaN-freeze mid-convergence. Capping bounds
                # cond(H) at the cost of an O(1/dmax)-perturbed barrier,
                # well below the attainable residual floor either way.
                d = jnp.minimum(d, _d_cap(dtype))
            fac, X, Mfac = factor_all(d)

            # Predictor (rs := z, batch.py:98).
            dx_a, ds_a, dz_a, dy_a = solve_newton(fac, X, Mfac,
                                                  rx, z, rz, ry, d)
            alpha = jnp.minimum(
                jnp.minimum(_step_to_boundary(z, dz_a),
                            _step_to_boundary(s, ds_a)), 1.0)[:, None]
            t1 = ((s + alpha * ds_a) * (z + alpha * dz_a)).sum(axis=-1)
            t2 = (s * z).sum(axis=-1)
            sig = (t1 / t2) ** 3

            # Corrector: RHS zero except rs (batch.py:170-173).
            rs_c = ((-mu * sig)[:, None] + ds_a * dz_a) / s
            dx_c, ds_c, dz_c, dy_c = solve_newton(
                fac, X, Mfac, None, rs_c, None, None, d)
            dx, ds, dz = dx_a + dx_c, ds_a + ds_c, dz_a + dz_c
            dy = (dy_a + dy_c) if neq > 0 else None

            for _ in range(config.n_correctors):
                a_g = jnp.minimum(
                    jnp.minimum(_step_to_boundary(z, dz),
                                _step_to_boundary(s, ds)), 1.0)
                a_t = jnp.minimum(1.08 * a_g + 0.08, 1.0)[:, None]
                v = (s + a_t * ds) * (z + a_t * dz)
                mu_t = (sig * mu)[:, None]
                rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
                ddx, dds, ddz, ddy = solve_newton(
                    fac, X, Mfac, None, rs_g, None, None, d)
                dz_n, ds_n = dz + ddz, ds + dds
                a_n = jnp.minimum(
                    jnp.minimum(_step_to_boundary(z, dz_n),
                                _step_to_boundary(s, ds_n)), 1.0)
                acc = (a_n > a_g)[:, None]
                dz = jnp.where(acc, dz_n, dz)
                ds = jnp.where(acc, ds_n, ds)
                dx = jnp.where(acc, dx + ddx, dx)
                if neq > 0:
                    dy = jnp.where(acc, dy + ddy, dy)

            alpha = jnp.minimum(
                0.999 * jnp.minimum(_step_to_boundary(z, dz),
                                    _step_to_boundary(s, ds)), 1.0)
            lane_bad = (jnp.isnan(dx).any(-1) | jnp.isnan(ds).any(-1)
                        | jnp.isnan(dz).any(-1))
            if neq > 0:
                lane_bad = lane_bad | jnp.isnan(dy).any(-1)
            msk = lane_bad[:, None]
            alpha = jnp.where(msk, 0.0, alpha[:, None])
            x = x + alpha * jnp.where(msk, 0.0, dx)
            s = s + alpha * jnp.where(msk, 0.0, ds)
            z = z + alpha * jnp.where(msk, 0.0, dz)
            if neq > 0:
                y = y + alpha * jnp.where(msk, 0.0, dy)
            return x, s, z, y

        x, s, z, y = lax.cond(done, lambda a: a, do_step, (x, s, z, y))
        return _BandState(
            x=x, s=s, z=z, y=y,
            best_x=best_x, best_s=best_s, best_z=best_z, best_y=best_y,
            best_resids=best_resids, mu=mu,
            n_not_improved=n_not, lane_done=lane_done,
            it=st.it + 1, done=done,
        )

    final = lax.while_loop(cond_fn, body_fn, state)

    from ..config import resolve_refine_steps

    refine_budget, _ = resolve_refine_steps(config, dtype)
    if refine_budget > 0:
        # Post-loop linear KKT iterative refinement (same scheme as the
        # dense tier's _refine_dw, single-word residuals): full Newton
        # steps toward mu = 0 with the complementarity diagonal clamped
        # LOW — the IR fixed point is set by the residuals, not by the
        # clamped d, so the refine solves can run at a condition number
        # (~1/refine_clamp) the in-loop barrier path could never cap to
        # (the in-loop d-cap sweep bottoms at 1e7 because capping the
        # BARRIER perturbs the IPM trajectory; a post-loop IR has no
        # trajectory to perturb). This is what breaks the general tier's
        # f32 1e-2..1e-1 plateau (PERF.md round-3 table).
        rc = config.refine_clamp
        if rc is None:
            rc = 1e-10 if jnp.dtype(dtype).itemsize >= 8 else 1e-5
        rc = jnp.asarray(rc, dtype)
        bx, bs_v, bz, by = (final.best_x, final.best_s, final.best_z,
                            final.best_y)
        _, _, _, bmu, bscore = residuals(bx, bs_v, bz, by)
        x, s, z, y = bx, bs_v, bz, by
        best = (bx, bs_v, bz, by, bscore, bmu)
        for _ in range(refine_budget):
            rx, rz, ry, mu, _ = residuals(x, s, z, y)
            s_hat = jnp.maximum(s, rc)
            d_r = jnp.maximum(z, rc) / s_hat
            rs_eff = z * (s / s_hat)
            fac_r, X_r, Mfac_r = factor_all(d_r)
            dx, ds, dz, dy = solve_newton(fac_r, X_r, Mfac_r,
                                          rx, rs_eff, rz, ry, d_r)
            lane_bad = (jnp.isnan(dx).any(-1) | jnp.isnan(ds).any(-1)
                        | jnp.isnan(dz).any(-1))
            if neq > 0:
                lane_bad = lane_bad | jnp.isnan(dy).any(-1)
            msk = lane_bad[:, None]
            x = x + jnp.where(msk, 0.0, dx)
            s = s + jnp.where(msk, 0.0, ds)
            z = z + jnp.where(msk, 0.0, dz)
            if neq > 0:
                y = y + jnp.where(msk, 0.0, dy)
            _, _, _, mu_n, score_n = residuals(x, s, z, y)
            take = (score_n < best[4])[:, None]
            best = (jnp.where(take, x, best[0]),
                    jnp.where(take, s, best[1]),
                    jnp.where(take, z, best[2]),
                    jnp.where(take, y, best[3]) if neq > 0 else best[3],
                    jnp.minimum(score_n, best[4]),
                    jnp.where(take[:, 0], mu_n, best[5]))
        final = final._replace(best_x=best[0], best_s=best[1],
                               best_z=best[2], best_y=best[3],
                               best_resids=best[4], mu=best[5])

    if config.verbose >= 0 and _runtime_supports_callbacks():
        max_best = _greduce(final.best_resids.max(), "max", axis)
        lax.cond(
            max_best > 1.0,
            lambda: jax.debug.print(
                "qpth_tpu warning: returning an inaccurate solution "
                "(max residual {r:.3e} > 1); the problem may be infeasible "
                "or badly conditioned.", r=max_best),
            lambda: None,
        )

    stats = SolveStats(
        iterations=final.it,
        best_resids=final.best_resids,
        mu=final.mu,
        converged=final.best_resids < config.eps,
    )
    return QPSolution(z=final.best_x, nu=final.best_y, lam=final.best_z,
                      s=final.best_s, stats=stats)


def solve_kkt_banded(Qd, Qe, g, A, d, rx, config: SolverConfig,
                     g_cols=None, gen_g=None):
    """One Newton solve of the banded-structure KKT system at a given
    diagonal d with RHS (rx, 0, 0, 0) — the backward pass's single extra
    solve (the banded analog of qp.py:148-155). Inputs are canonically
    batched: Qd (B, nb, bs, bs), Qe (B, nb-1, bs, bs), g (B, m) with the
    separable-G column map g_cols (None = diagonal) — or, with ``gen_g``
    (:class:`GeneralG`), g the (B, nnz) general-pattern entry values —
    A (bA, neq, n) or None, d (B, m), rx (B, n). Returns
    (dx, ds, dz, dy)."""
    import numpy as np

    B, nb, bs = Qd.shape[0], Qd.shape[1], Qd.shape[-1]
    n = nb * bs
    dtype = rx.dtype
    neq = A.shape[-2] if A is not None else 0
    ci = jnp.arange(n) if g_cols is None else jnp.asarray(g_cols)

    from ..ops.kkt import pallas_hw_ok

    use_pallas_stage = (np.dtype(dtype) == np.float32
                        and pallas_hw_ok()
                        and config.use_pallas not in (False, "xla")
                        and (config.use_pallas != "auto"
                             or jax.default_backend() == "tpu"))
    if use_pallas_stage:
        from ..ops.pallas.lanes import lanes_supported

        use_pallas_stage = lanes_supported(bs, B)
    spd_inv = _spd_inv_stage(use_pallas_stage)

    if gen_g is not None:
        d = jnp.minimum(d, _d_cap(dtype))    # see do_step's cap rationale
        gmul_gen, _, h_assemble = _gen_ops(gen_g, g, B, n, dtype)
        Hd, He = h_assemble(jnp.broadcast_to(Qd, (B, nb, bs, bs)), Qe, d)
    else:
        shift = jnp.zeros((B, n), dtype).at[:, ci].add(
            g * g * d).reshape(B, nb, bs)
        eye_idx = jnp.arange(bs)
        Hd = Qd + jnp.zeros((B, nb, bs, bs), dtype).at[
            ..., eye_idx, eye_idx].set(shift)
        He = Qe
    fac = bt_factor(Hd, He, spd_inv)

    if neq > 0:
        A_blocks = jnp.broadcast_to(A, (B, neq, n)).reshape(B, neq, nb, bs)
        AT = jnp.transpose(A_blocks, (0, 2, 3, 1))
        X = bt_solve_multi(fac, AT)
        M = jnp.einsum("bfnk,bnke->bfe", A_blocks, X, precision=_HI)
        Mfac = _factor_spd(M, _use_pallas_m(config, dtype, neq, B))
    else:
        X = Mfac = None

    def base_solve(rxx, ryy):
        """Condensed solve of the KKT system with RHS (-rxx, 0, 0, -ryy)."""
        u = bt_solve(fac, (-rxx).reshape(B, nb, bs)).reshape(B, n)
        if neq > 0:
            rhs = bmv(A, u)
            if ryy is not None:
                rhs = rhs + ryy
            dyv = _m_solve(Mfac, rhs)
            dxv = u - jnp.einsum("bnke,be->bnk", X, dyv,
                                 precision=_HI).reshape(B, n)
        else:
            dyv = None
            dxv = u
        dsv = -gmul_gen(dxv) if gen_g is not None else -g * dxv[:, ci]
        dzv = -d * dsv
        return dxv, dsv, dzv, dyv

    dx, ds, dz, dy = base_solve(rx, None)
    if gen_g is not None:
        # Same Newton-system IR as the forward loop's general-G solves
        # (primal condensation amplifies the H-solve error by d; the
        # backward pass's d = clamp(lam)/clamp(s) reaches the cap too).
        gtmul_gen = _gen_ops(gen_g, g, B, n, dtype)[1]
        for _ in range(_GEN_IR_PASSES):
            e_dual = (rx + gtmul_gen(dz)
                      + bt_mul(jnp.broadcast_to(Qd, (B, nb, bs, bs)), Qe,
                               dx.reshape(B, nb, bs)).reshape(B, n))
            if neq > 0:
                e_dual = e_dual + btmv(A, dy)
                e_y = bmv(A, dx)
            else:
                e_y = None
            cx, cs, cz, cy = base_solve(e_dual, e_y)
            dx, ds, dz = dx + cx, ds + cs, dz + cz
            if neq > 0:
                dy = dy + cy
    return dx, ds, dz, dy
