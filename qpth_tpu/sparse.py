"""Sparse (fixed-pattern) batched QP layer — the ``SpQPFunction`` analog.

The reference's sparse path (qp.py:186-252 + solvers/pdipm/spbatch.py) keeps
COO index sets fixed across the batch with per-batch values and solves the
assembled sparse KKT system with a custom CUDA batched sparse QR
(``torch.spbqrfactsolve``, spbatch.py:255).

TPU-native disposition (SURVEY §7 stretch; BASELINE sparse row of §2.4): TPU
has no sparse QR; dynamic sparsity defeats XLA's static-shape compilation.
Since the pattern is static per layer instance, we *compile the structure
in* — on two tiers:

1. **Diagonal patterns** (the ones OptNet layers actually use: the sudoku
   layer's ``Q = eps*I``, ``G = -I``, reference sudoku notebook cell 10):
   detected at construction and dispatched to the structure-exploiting
   diagonal solver (:mod:`qpth_tpu.core.diag`), where the per-iteration
   factorization collapses from (nineq x nineq) dense Cholesky to an
   (neq x neq) normal-equations system assembled on the MXU — the
   TPU-native answer to the reference's batched sparse QR
   (``torch.spbqrfactsolve``, spbatch.py:255).
2. **General patterns**: values are scattered into dense batched operands
   (a static gather/scatter XLA fuses away) and the dense Cholesky-Schur
   path runs on the MXU — for moderate sizes faster on TPU than any
   sparse triangular machinery.

Gradients are gathered back to the pattern in both tiers, replacing the
reference's boolean-mask trick (qp.py:229-248).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import QPSolvers, SolverConfig
from .qp import DEFAULT_CONFIG, solve_qp


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
        # Q and diagonal square G qualify for the structured solver.
        if structure not in ("auto", "diag", "dense"):
            raise ValueError(structure)
        self.structure = structure
        if structure == "auto":
            qi = np.asarray(self.Qi)
            gi = np.asarray(self.Gi)
            diag_ok = (bool((qi[0] == qi[1]).all())
                       and self.Gsz[0] == self.Gsz[1]
                       and bool((gi[0] == gi[1]).all())
                       and config.solver == QPSolvers.PDIPM_BATCHED)
            self.structure = "diag" if diag_ok else "dense"

    def __call__(self, Qv, p, Gv, h, Av, b):
        """Solve; differentiable in (Qv, p, Gv, h, Av, b)."""
        if self.structure == "diag":
            return self._call_diag(Qv, p, Gv, h, Av, b)
        Q = _densify(self.Qi, Qv, self.Qsz)
        G = _densify(self.Gi, Gv, self.Gsz)
        A = _densify(self.Ai, Av, self.Asz) if self.neq > 0 else None
        # solve_qp's custom_vjp produces dense cotangents; _densify's own
        # vjp (gather at the pattern) maps them back to the values — the
        # whole pipeline is differentiable end to end.
        return solve_qp(Q, p, G, h, A, b if self.neq > 0 else None,
                        config=self.config)

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
