"""Sparse (fixed-pattern) batched QP layer — the ``SpQPFunction`` analog.

The reference's sparse path (qp.py:186-252 + solvers/pdipm/spbatch.py) keeps
COO index sets fixed across the batch with per-batch values and solves the
assembled sparse KKT system with a custom CUDA batched sparse QR
(``torch.spbqrfactsolve``, spbatch.py:255).

TPU-native disposition (SURVEY §7 stretch; BASELINE sparse row of §2.4): TPU
has no sparse QR; dynamic sparsity defeats XLA's static-shape compilation.
Since the pattern is static per layer instance, we *compile the structure
in* — on four tiers:

1. **Diagonal patterns** (the ones OptNet layers actually use: the sudoku
   layer's ``Q = eps*I``, ``G = -I``, reference sudoku notebook cell 10):
   detected at construction and dispatched to the structure-exploiting
   diagonal solver (:mod:`qpth_tpu.core.diag`), where the per-iteration
   factorization collapses from (nineq x nineq) dense Cholesky to an
   (neq x neq) normal-equations system assembled on the MXU — the
   TPU-native answer to the reference's batched sparse QR
   (``torch.spbqrfactsolve``, spbatch.py:255).
2. **Banded patterns** (block-tridiagonal Q after static blocking, G
   *separable* — at most one variable per inequality row: diagonal G,
   box stacks [I; -I], variable bounds — the MPC-chain / finite-horizon
   workload): dispatched to the
   block-Thomas structured solver (:mod:`qpth_tpu.core.banded`), where
   per-iteration cost drops from O(n^3) dense to O(nb * bs^3) — the
   arbitrary-fixed-pattern scaling the reference gets from sparse QR,
   delivered for the banded family. Cross-block entries are symmetrized
   (half the value from each triangle lands in the shared subdiagonal
   block slot), which matches the dense path exactly for symmetric
   patterns; n is padded to a block multiple with decoupled dummy
   variables (q=1, p=0, no inequality rows) whose lanes never interact
   with the real ones.
3. **General fixed patterns** (arbitrary COO Q and G — the full contract
   of the reference's sparse tier): the bandwidth of the condensed-system
   pattern patt(Q) ∪ patt(G^T G) is minimized with a reverse-Cuthill-McKee
   reordering (computed once at construction), and the block-Thomas solver
   runs in the permuted space with G^T diag(d) G assembled into the band
   by static pair scatters (:class:`qpth_tpu.core.banded.GeneralG`).
   Sub-dense O(nb * bs^3) per-iteration cost for any pattern RCM can
   compress to moderate bandwidth — the scaling the reference gets from
   batched sparse QR, delivered without sparse triangular machinery.
4. **Incompressible patterns**: values are scattered into dense batched
   operands (a static gather/scatter XLA fuses away) and the dense
   Cholesky-Schur path runs on the MXU — on such patterns the reference's
   sparse QR fills in and pays dense cost too.

Gradients are gathered back to the pattern in all tiers, replacing the
reference's boolean-mask trick (qp.py:229-248).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import QPSolvers, SolverConfig
from .qp import solve_qp


def _densify(idx, vals, shape):
    """Scatter fixed-pattern COO values to dense: idx (2, nnz) static,
    vals (B, nnz) -> (B, *shape). Duplicate indices accumulate."""
    B = vals.shape[0]
    out = jnp.zeros((B,) + tuple(shape), vals.dtype)
    return out.at[:, idx[0], idx[1]].add(vals)


def _sparsify_grad(idx, dense_grad):
    """Gather a dense cotangent back onto the pattern: (B, m, n) -> (B, nnz).

    This is the transpose of ``_densify`` (exact vjp, including duplicate
    index accumulation) — unlike the reference's mask-and-reshape
    (qp.py:229-248) it is correct for off-diagonal and repeated entries.
    """
    return dense_grad[:, idx[0], idx[1]]


class SpQPFunction:
    """Batched QPs with shared sparsity patterns and per-batch values.

    Mirrors the reference's constructor/call contract (qp.py:186-210):
    ``SpQPFunction(Qi, Qsz, Gi, Gsz, Ai, Asz)(Qv, p, Gv, h, Av, b)`` where
    ``*i`` are (2, nnz) integer COO indices shared across the batch, ``*sz``
    are dense shapes, and ``*v`` are (B, nnz) values.
    """

    def __init__(self, Qi, Qsz, Gi, Gsz, Ai, Asz,
                 eps: float = 1e-12, verbose: int = 0,
                 notImprovedLim: int = 3, maxIter: int = 20,
                 config: Optional[SolverConfig] = None,
                 structure: str = "auto"):
        self.Qi, self.Qsz = jnp.asarray(Qi), tuple(Qsz)
        self.Gi, self.Gsz = jnp.asarray(Gi), tuple(Gsz)
        self.Ai, self.Asz = jnp.asarray(Ai), tuple(Asz)
        if config is None:
            config = SolverConfig(
                eps=eps, verbose=verbose, not_improved_lim=notImprovedLim,
                max_iter=maxIter)
        self.config = config
        self.nineq, self.nz = self.Gsz
        self.neq = self.Asz[0]
        # Static structure detection (patterns are fixed per instance, so
        # this is a construction-time numpy check, never traced): diagonal
        # Q and diagonal square G qualify for the diagonal structured
        # solver; banded Q with diagonal G for the block-Thomas tier.
        if structure not in ("auto", "diag", "banded", "general", "dense"):
            raise ValueError(structure)
        self.structure = structure
        if structure == "auto":
            qi = np.asarray(self.Qi)
            gi = np.asarray(self.Gi)
            pdipm = config.solver == QPSolvers.PDIPM_BATCHED
            g_diag = (pdipm and self.Gsz[0] == self.Gsz[1]
                      and bool((gi[0] == gi[1]).all()))
            diag_ok = g_diag and bool((qi[0] == qi[1]).all())
            if self.nineq == 0 or gi.shape[1] == 0:
                # No (or empty) inequalities: the IPM tiers need m > 0;
                # the dense path dispatches to the closed-form equality
                # solver (solve_qp_eq) for this case.
                self.structure = "dense"
            elif diag_ok:
                self.structure = "diag"
            elif (pdipm and self._plan_separable_g(gi)
                    and self._plan_banded(qi, allow_diag=True)):
                # allow_diag: a diagonal/blocked Q with non-diagonal
                # separable G (box stacks) belongs here, not the dense
                # tier — the diag tier requires square diagonal G.
                self.structure = "banded"
            elif pdipm and self._plan_general(qi, gi):
                self.structure = "general"
                self._general_auto = True
            else:
                self.structure = "dense"
        elif structure == "banded":
            if not (self._plan_separable_g(np.asarray(self.Gi))
                    and self._plan_banded(np.asarray(self.Qi),
                                          allow_diag=True)):
                raise ValueError(
                    "structure='banded' requires separable G (at most one "
                    "variable per inequality row) and a banded Q pattern "
                    "(bandwidth <= n/4, >= 3 blocks)")
        elif structure == "general":
            if not self._plan_general(np.asarray(self.Qi),
                                      np.asarray(self.Gi)):
                raise ValueError(
                    "structure='general' requires the RCM bandwidth of "
                    "patt(Q) ∪ patt(G^T G) to be moderate (<= n/3 and "
                    "<= 128, >= 3 blocks) and no dense G rows")

    def _plan_separable_g(self, gi) -> bool:
        """G is separable when every inequality row touches at most one
        variable (diagonal G, box stacks [I; -I], variable bounds...).
        Precomputes the static row -> column map."""
        m = self.Gsz[0]
        if gi.shape[1] and np.unique(gi[0]).size != gi.shape[1]:
            return False  # a row with two entries (or duplicates)
        ci = np.zeros(m, dtype=gi.dtype)
        ci[gi[0]] = gi[1]
        self._g_ci = ci
        return True

    def _q_scatter_maps(self, qi, bs, nb) -> bool:
        """Precompute the COO -> (Qd, Qe) scatter indices for a given
        blocking (upper/lower cross-block entries symmetrized at half
        weight; see module docstring). False if any entry falls outside
        the block-tridiagonal band."""
        br, bc = qi[0] // bs, qi[1] // bs
        if qi.shape[1] and np.abs(br - bc).max() > 1:
            return False
        on_diag = br == bc
        lower = br == bc + 1
        upper = br == bc - 1
        # Diagonal-block entries: direct scatter (both triangles have
        # their own slots, like the dense densify).
        self._qd_sel = np.nonzero(on_diag)[0]
        self._qd_idx = (br[on_diag], qi[0][on_diag] % bs,
                        qi[1][on_diag] % bs)
        # Cross-block entries share one Qe slot per symmetric pair: half
        # the value from each triangle (see module docstring).
        lo_sel = np.nonzero(lower)[0]
        up_sel = np.nonzero(upper)[0]
        self._qe_sel = np.concatenate([lo_sel, up_sel])
        self._qe_idx = (
            np.concatenate([bc[lower], br[upper]]),
            np.concatenate([qi[0][lower] % bs, qi[1][upper] % bs]),
            np.concatenate([qi[1][lower] % bs, qi[0][upper] % bs]),
        )
        return True

    def _plan_banded(self, qi, allow_diag: bool = False) -> bool:
        """Static banded-pattern analysis: choose a block size bs so Q is
        block-tridiagonal, precompute the COO -> (Qd, Qe) scatter indices,
        and the padding plan. Returns False when the pattern is not
        usefully banded (the general/dense tiers then apply).
        ``allow_diag``: accept a purely diagonal Q too (used when G is
        separable but not square diagonal, where the diag tier cannot
        take the problem)."""
        n = self.Qsz[0]
        if self.Qsz[0] != self.Qsz[1] or qi.shape[1] == 0:
            return False
        w = int(np.abs(qi[0] - qi[1]).max())
        if w == 0 and not allow_diag:
            return False  # diagonal — handled by the diag tier
        bs = max(w, 8 if n >= 64 else 2)
        nb = -(-n // bs)
        if nb < 3 or bs > 128 or w > n // 4:
            return False
        if not self._q_scatter_maps(qi, bs, nb):
            return False    # cannot happen with bs >= w
        self._band = (n, bs, nb, nb * bs)
        return True

    def _plan_general(self, qi, gi) -> bool:
        """General fixed-pattern tier: reduce the bandwidth of the
        condensed-system pattern K = patt(Q) ∪ patt(G^T G) with a
        reverse-Cuthill-McKee reordering, then run the block-tridiagonal
        solver in the permuted space with G^T diag(d) G assembled into
        the band by static pair scatters (core.banded.GeneralG). This is
        the arbitrary-pattern analog of the reference's sparse-KKT tier
        (cat_kkt + batched sparse QR, spbatch.py:184-269): any fixed
        pattern whose RCM bandwidth is moderate gets sub-dense
        O(nb * bs^3) per-iteration cost; patterns RCM cannot compress
        fall back to the dense tier (where a dense factor is the honest
        cost anyway — the reference's QR fills in on those too)."""
        n = self.Qsz[0]
        m = self.Gsz[0]
        if self.Qsz[0] != self.Qsz[1] or qi.shape[1] == 0:
            return False
        try:
            import scipy.sparse as sp
            from scipy.sparse.csgraph import reverse_cuthill_mckee
        except ImportError:         # pragma: no cover
            return False
        # Within-row column pairs of G (the pattern of G^T G) — with a
        # budget gate so a dense G row cannot explode the pair list.
        byrow = {}
        for r, c in zip(gi[0], gi[1]):
            byrow.setdefault(int(r), []).append(int(c))
        npairs = sum(len(cs) * len(cs) for cs in byrow.values())
        if npairs > max(128 * n, 8 * gi.shape[1]):
            return False
        pr, pc = [], []
        for cs in byrow.values():
            for c1 in cs:
                for c2 in cs:
                    pr.append(c1)
                    pc.append(c2)
        rk = np.concatenate([qi[0], qi[1], np.asarray(pr, qi.dtype)])
        ck = np.concatenate([qi[1], qi[0], np.asarray(pc, qi.dtype)])
        K = sp.csr_matrix((np.ones(rk.size), (rk, ck)), shape=(n, n))
        perm = np.asarray(reverse_cuthill_mckee(K, symmetric_mode=True),
                          np.int64)
        invp = np.empty(n, np.int64)
        invp[perm] = np.arange(n)
        coo = K.tocoo()
        w_rcm = int(np.abs(invp[coo.row] - invp[coo.col]).max())
        w_nat = int(np.abs(coo.row - coo.col).max())
        if w_nat <= w_rcm:          # RCM can worsen an already-good order
            perm = np.arange(n)
            invp = perm
            w = w_nat
        else:
            w = w_rcm
        bs = max(w, 8 if n >= 64 else 2)
        nb = -(-n // bs)
        if nb < 3 or bs > 128 or w > n // 3:
            return False
        qi_p = np.stack([invp[qi[0]], invp[qi[1]]])
        if not self._q_scatter_maps(qi_p, bs, nb):
            return False            # cannot happen with bs >= w
        from .core.banded import GeneralG

        spec = GeneralG(m, nb * bs, bs, nb, gi[0], invp[gi[1]])
        self._gen = (perm, invp, spec)
        self._band = (n, bs, nb, nb * bs)
        return True

    #: Auto-dispatch floor for the general tier below float64 — a pure
    #: SPEED crossover, RE-MEASURED round 5 on-chip WITH refinement
    #: (refine_steps=3) in both tiers' cost (PERF.md round-5 crossover
    #: table, scrambled-band fixture): dense wins 1.4x at n=256, the
    #: tiers cross almost exactly at n=512 (general 1.8x), and general
    #: wins 3.3x by n=1024 (widening with n — linear vs cubic). The
    #: refined general tier also breaks its old f32 1e-1 accuracy
    #: plateau on-chip (1.8e-5..8.6e-5 across the table), so only
    #: throughput decides the floor.
    #: Explicit ``structure="general"`` is always honored at any size.
    GENERAL_F32_MIN_N = 512

    def __call__(self, Qv, p, Gv, h, Av, b):
        """Solve; differentiable in (Qv, p, Gv, h, Av, b)."""
        if self.structure == "diag":
            return self._call_diag(Qv, p, Gv, h, Av, b)
        if self.structure == "banded":
            return self._call_banded(Qv, p, Gv, h, Av, b)
        if self.structure == "general" and not self._general_densifies(Qv):
            return self._call_general(Qv, p, Gv, h, Av, b)
        # (general + auto-chosen + f32 + small n densifies below — a
        # measured speed crossover, see GENERAL_F32_MIN_N.)
        Q = _densify(self.Qi, Qv, self.Qsz)
        G = _densify(self.Gi, Gv, self.Gsz)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        # solve_qp's custom_vjp produces dense cotangents; _densify's own
        # vjp (gather at the pattern) maps them back to the values — the
        # whole pipeline is differentiable end to end.
        return solve_qp(Q, p, G, h, A, b if self.neq > 0 else None,
                        config=self.config)

    def solve_full(self, Qv, p, Gv, h, Av, b, init=None):
        """Forward-only solve returning the FULL primal-dual solution and
        ``SolveStats`` (qpth_tpu.QPSolution), from whichever tier the
        pattern dispatched to — the structured tiers are drop-in for the
        dense path (VERDICT r4 #9: duals + stats + MPC warm starts on
        every tier). ``init``: optional warm start (x, s, z, y) in
        NATURAL coordinates (pass the previous solve_full's
        (z, s, lam, nu)); permutation/padding for the general/banded
        tiers is handled here. Not differentiable — use ``__call__`` for
        gradients.

        The reference's sparse path returns only zhats and keeps duals on
        ctx (qp.py:201-210); this surfaces them like the dense API does.
        """
        if self.structure == "diag":
            from .diagqp import solve_qp_diag_full

            B = Qv.shape[0]
            n = self.Qsz[0]
            q = jnp.zeros((B, n), Qv.dtype).at[:, self.Qi[0]].add(Qv)
            g = jnp.zeros((B, n), Gv.dtype).at[:, self.Gi[0]].add(Gv)
            A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
            return solve_qp_diag_full(q, p, g, h, A,
                                      b if self.neq > 0 else None,
                                      config=self.config, init=init)
        if self.structure == "banded" or (
                self.structure == "general"
                and not self._general_densifies(Qv)):
            from .bandqp import solve_qp_banded_full

            general = self.structure == "general"
            B = Qv.shape[0]
            n, bs, nb, n_pad = self._band
            m = self.Gsz[0]
            dt = Qv.dtype
            Qd, Qe = self._band_blocks(Qv)
            A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
            pv = jnp.broadcast_to(jnp.atleast_2d(p), (B, n))
            hv = jnp.broadcast_to(jnp.atleast_2d(h), (B, m))
            if general:
                perm, invp, spec = self._gen
                pv = pv[:, perm]
                if A is not None:
                    A = A[:, :, perm]
                gk = dict(g_spec=spec)
                gv = Gv
            else:
                gk = dict(g_cols=self._g_ci)
                gv = jnp.zeros((B, m), Gv.dtype).at[:, self.Gi[0]].add(Gv)
            if n_pad > n:
                pad = n_pad - n
                pv = jnp.pad(pv, ((0, 0), (0, pad)))
                if A is not None:
                    A = jnp.pad(A, ((0, 0), (0, 0), (0, pad)))
            if init is not None:
                x0, s0, z0, y0 = init
                x0 = x0[:, perm] if general else x0
                if n_pad > n:
                    x0 = jnp.pad(x0, ((0, 0), (0, n_pad - n)))
                init = (x0, s0, z0, y0)
            sol = solve_qp_banded_full(
                Qd, Qe, pv, gv, hv, A, b if self.neq > 0 else None,
                config=self.config, init=init, **gk)
            z = sol.z[:, invp] if general else sol.z[:, :n]
            return sol._replace(z=z)
        Q = _densify(self.Qi, Qv, self.Qsz)
        G = _densify(self.Gi, Gv, self.Gsz)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        from .qp import solve_qp_full

        return solve_qp_full(Q, p, G, h, A,
                             b if self.neq > 0 else None,
                             config=self.config, init=init)

    def _general_densifies(self, Qv) -> bool:
        """The general tier's auto-dispatch densify rule (see __call__)."""
        return (getattr(self, "_general_auto", False)
                and jnp.dtype(jnp.asarray(Qv).dtype).itemsize < 8
                and self.Qsz[0] < self.GENERAL_F32_MIN_N)

    def _call_diag(self, Qv, p, Gv, h, Av, b):
        """Structured dispatch: scatter pattern values onto the Q/G
        diagonals (duplicates accumulate, as in _densify) and run the
        diagonal-structure solver; its custom_vjp cotangents flow back
        through the scatters onto the pattern values."""
        from .diagqp import solve_qp_diag

        B = Qv.shape[0]
        n = self.Qsz[0]
        q = jnp.zeros((B, n), Qv.dtype).at[:, self.Qi[0]].add(Qv)
        g = jnp.zeros((B, n), Gv.dtype).at[:, self.Gi[0]].add(Gv)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        return solve_qp_diag(q, p, g, h, A,
                             b if self.neq > 0 else None,
                             config=self.config)

    def _band_blocks(self, Qv):
        """Scatter pattern values into block-tridiagonal (Qd, Qe) with the
        precomputed maps (padded tail gets the identity diagonal so the
        dummy variables stay decoupled)."""
        B = Qv.shape[0]
        n, bs, nb, n_pad = self._band
        dt = Qv.dtype
        Qd = jnp.zeros((B, nb, bs, bs), dt).at[
            :, self._qd_idx[0], self._qd_idx[1], self._qd_idx[2]].add(
                Qv[:, self._qd_sel])
        Qe = jnp.zeros((B, nb - 1, bs, bs), dt).at[
            :, self._qe_idx[0], self._qe_idx[1], self._qe_idx[2]].add(
                0.5 * Qv[:, self._qe_sel])
        if n_pad > n:
            tail = np.arange(n, n_pad)
            qd_pad = np.zeros((nb, bs, bs), np.float64)
            qd_pad[tail // bs, tail % bs, tail % bs] = 1.0
            Qd = Qd + jnp.asarray(qd_pad, dt)
        return Qd, Qe

    def _call_banded(self, Qv, p, Gv, h, Av, b):
        """Banded dispatch: scatter pattern values into block-tridiagonal
        (Qd, Qe) + the separable-G row coefficients, pad n to a block
        multiple with decoupled dummy variables, and run the block-Thomas
        solver; its custom_vjp cotangents flow back through the
        scatters/pads onto the pattern values."""
        from .bandqp import solve_qp_banded

        B = Qv.shape[0]
        n, bs, nb, n_pad = self._band
        m = self.Gsz[0]
        dt = Qv.dtype
        Qd, Qe = self._band_blocks(Qv)
        # Row coefficients of the separable G (one variable per row;
        # self._g_ci maps rows to columns).
        g = jnp.zeros((B, m), Gv.dtype).at[:, self.Gi[0]].add(Gv)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        p = jnp.broadcast_to(jnp.atleast_2d(p), (B, n))
        h = jnp.broadcast_to(jnp.atleast_2d(h), (B, m))
        if n_pad > n:
            # Dummy tail variables: q = 1 identity diagonal (added in
            # _band_blocks), p = 0, no inequality rows (separable G
            # decouples m from n), zero A columns — decoupled from the
            # real lanes.
            pad = n_pad - n
            p = jnp.pad(p, ((0, 0), (0, pad)))
            if A is not None:
                A = jnp.pad(A, ((0, 0), (0, 0), (0, pad)))
        z = solve_qp_banded(Qd, Qe, p, g, h, A,
                            b if self.neq > 0 else None,
                            config=self.config, g_cols=self._g_ci)
        return z[:, :n]

    def _call_general(self, Qv, p, Gv, h, Av, b):
        """General-pattern dispatch: run the block-tridiagonal solver in
        the RCM-permuted variable order with G^T D G assembled into the
        band from the COO values by static pair scatters (the
        arbitrary-fixed-pattern analog of the reference's sparse tier,
        spbatch.py:29-174); gather the solution back to the natural
        order. Fully differentiable — cotangents flow back through the
        scatters, pads, and permutation gathers onto the values."""
        from .bandqp import solve_qp_banded

        perm, invp, spec = self._gen
        B = Qv.shape[0]
        n, bs, nb, n_pad = self._band
        m = self.Gsz[0]
        Qd, Qe = self._band_blocks(Qv)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        p = jnp.broadcast_to(jnp.atleast_2d(p), (B, n))[:, perm]
        h = jnp.broadcast_to(jnp.atleast_2d(h), (B, m))
        if A is not None:
            A = A[:, :, perm]
        if n_pad > n:
            p = jnp.pad(p, ((0, 0), (0, n_pad - n)))
            if A is not None:
                A = jnp.pad(A, ((0, 0), (0, 0), (0, n_pad - n)))
        z = solve_qp_banded(Qd, Qe, p, Gv, h, A,
                            b if self.neq > 0 else None,
                            config=self.config, g_spec=spec)
        return z[:, invp]
