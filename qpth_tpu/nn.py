"""Flax (linen) OptNet layers — the model-zoo layer of the framework.

Faithful TPU-native counterparts of the reference's example models
(``/root/reference/example-cls-layer.ipynb`` cell 3 and
``example-sudoku.ipynb`` cell 10): ``nn.Module``s embedding the
differentiable QP layer so the solver drops into Flax training loops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as linen
import jax
import jax.numpy as jnp

from .config import SolverConfig
from .diagqp import solve_qp_diag
from .qp import solve_qp


class OptNetClassifier(linen.Module):
    """FC-ReLU-FC-ReLU-QP-log_softmax classifier (cls notebook cell 3).

    Learns ``L, G, z0, s0``; builds ``Q = (M*L)(M*L)^T + eps*I`` (M a
    lower-triangular mask) and ``h = G z0 + s0`` so the QP is SPD and
    strictly feasible by construction. No equality constraints.
    """

    n_features: int
    n_hidden: int
    n_cls: int
    n_ineq: int = 200
    eps: float = 1e-4
    qp_config: SolverConfig = SolverConfig(verbose=-1)

    @linen.compact
    def __call__(self, x):
        B = x.shape[0]
        x = x.reshape(B, -1)
        x = jax.nn.relu(linen.Dense(self.n_hidden)(x))
        x = jax.nn.relu(linen.Dense(self.n_cls)(x))

        L = self.param(
            "L", lambda k: jnp.tril(
                jax.random.uniform(k, (self.n_cls, self.n_cls))))
        G = self.param(
            "G", lambda k: jax.random.uniform(
                k, (self.n_ineq, self.n_cls), minval=-1.0, maxval=1.0))
        z0 = self.param("z0", lambda k: jnp.zeros(self.n_cls))
        s0 = self.param("s0", lambda k: jnp.ones(self.n_ineq))

        M = jnp.tril(jnp.ones((self.n_cls, self.n_cls)))
        Lm = (M * L).astype(x.dtype)
        Q = Lm @ Lm.T + self.eps * jnp.eye(self.n_cls, dtype=x.dtype)
        h = G @ z0 + s0

        # Q, G, h shared across the batch: factored once (batch dim 1),
        # per-example p = features.
        z = solve_qp(Q, x, G.astype(x.dtype), h.astype(x.dtype),
                     config=self.qp_config)
        return jax.nn.log_softmax(z, axis=-1)


class OptNetSudoku(linen.Module):
    """Sudoku layer (sudoku notebook cell 10): fixed ``Q = eps*I``,
    ``G = -I``, ``h = 0``; *learns the equality-constraint structure* ``A``
    through the implicit KKT gradients dA/db — this exercises the neq > 0
    Schur path end to end.

    ``Q``/``G`` are diagonal, so by default the layer runs on the
    structure-exploiting diagonal solver (per-iteration work: one
    (n_eq x n_eq) normal-equations factor instead of an (nx x nx) dense
    Cholesky — see qpth_tpu/core/diag.py). Set ``structure="dense"`` to
    force the dense Schur path (used by the equivalence tests).
    """

    n: int = 2
    q_penalty: float = 0.1
    n_eq: int = 40
    structure: str = "diag"
    qp_config: SolverConfig = SolverConfig(verbose=-1)

    @linen.compact
    def __call__(self, puzzles):
        B = puzzles.shape[0]
        nx = (self.n ** 2) ** 3
        p = -puzzles.reshape(B, -1)
        dt = p.dtype

        A = self.param(
            "A", lambda k: jax.random.uniform(k, (self.n_eq, nx)))
        b = jnp.ones(self.n_eq, dtype=dt)

        if self.structure == "diag":
            q = jnp.full((nx,), self.q_penalty, dtype=dt)
            g = jnp.full((nx,), -1.0, dtype=dt)
            h = jnp.zeros(nx, dtype=dt)
            z = solve_qp_diag(q, p, g, h, A.astype(dt), b,
                              config=self.qp_config)
        else:
            Q = self.q_penalty * jnp.eye(nx, dtype=dt)
            G = -jnp.eye(nx, dtype=dt)
            h = jnp.zeros(nx, dtype=dt)
            z = solve_qp(Q, p, G, h, A.astype(dt), b,
                         config=self.qp_config)
        return z.reshape(puzzles.shape)
