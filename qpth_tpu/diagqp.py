"""Differentiable diagonal-structure QP layer: ``solve_qp_diag``.

Public entry point of the structure-exploiting path (see
:mod:`qpth_tpu.core.diag` for the algebra): batched QPs

    min_x 1/2 x^T diag(q) x + p^T x   s.t.  diag(g) x <= h,  A x = b

with exact implicit-KKT gradients to (q, p, g, h, A, b).  The gradient
formulas are the diagonal restriction of the reference's dense ones
(qp.py:157-177): dQ = 1/2(dx z^T + z dx^T) has diagonal dx*z, and
dG = dlam z^T + lam dx^T has diagonal dlam*z + lam*dx.

``SpQPFunction`` dispatches here automatically when its COO patterns are
diagonal (the sudoku layer's Q = eps*I, G = -I); it can also be used
directly for box-constrained / LASSO-style layers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import QPSolution, SolverConfig
from .core import diag as diag_core
from .qp import DEFAULT_CONFIG
from .utils import bger, normalize_constraints


def _canon_diag(q, p, g, h, A, b):
    """Canonicalize: vectors broadcast to (B, n) (differentiably, so the
    broadcast's vjp performs the unbatched-param sum reduction); A kept at
    minimal batch (1 when shared)."""
    A, b = normalize_constraints(A, b)
    arrs = [jnp.asarray(v) for v in (q, p, g, h)]
    B = max(a.shape[0] if a.ndim == 2 else 1 for a in arrs)
    if b is not None:
        b = jnp.asarray(b)
        B = max(B, b.shape[0] if b.ndim == 2 else 1)

    unb = [a.ndim == 1 for a in arrs]

    def vec(v):
        v = v[None] if v.ndim == 1 else v
        return jnp.broadcast_to(v, (B,) + v.shape[1:])

    qb, pb, gb, hb = map(vec, arrs)
    if A is not None:
        A = jnp.asarray(A)
        Ab = A[None] if A.ndim == 2 else A
        bb = vec(b)
        unb.append(b.ndim == 1)
    else:
        Ab = bb = None
        unb.append(False)
    meta = (B,) + tuple(unb)  # (B, q_unb, p_unb, g_unb, h_unb, b_unb)
    return qb, pb, gb, hb, Ab, bb, meta


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _diag_core_fn(qb, pb, gb, hb, Ab, bb, init, config: SolverConfig,
                  meta):
    return diag_core.solve_diag(qb, pb, gb, hb, Ab, bb, config,
                                init=init).z


def _diag_fwd(qb, pb, gb, hb, Ab, bb, init, config: SolverConfig, meta):
    sol = diag_core.solve_diag(qb, pb, gb, hb, Ab, bb, config, init=init)
    return sol.z, (sol.z, sol.lam, sol.s, sol.nu, qb, gb, Ab, init)


def _diag_bwd(config: SolverConfig, meta, res, dl_dz):
    """One extra structured KKT solve (the diagonal analog of
    qp.py:148-155): RHS is (dl/dz, 0, 0, 0)."""
    zhat, lam, s, nu, qb, gb, Ab, init = res
    B_global, q_unb, p_unb, g_unb, h_unb, b_unb = meta
    B, n = zhat.shape
    neq = Ab.shape[-2] if Ab is not None else 0
    dt = dl_dz.dtype

    c = config.grad_clamp
    d = jnp.maximum(lam, c) / jnp.maximum(s, c)
    H = qb + gb * gb * d
    use_pallas = diag_core._use_pallas_m(config, dt, neq, B)
    fac = (diag_core._m_factor(Ab, 1.0 / H, use_pallas)
           if neq > 0 else None)
    dx, _, dlam, dnu = diag_core.solve_kkt_diag(
        qb, gb, Ab, d, H, fac, dl_dz, None, None, None, B, n, dt)

    # Diagonal restriction of the dense gradient assembly (qp.py:157-177).
    dq = dx * zhat
    dp = dx
    dg = dlam * zhat + lam * dx
    dh = -dlam
    mean_mode = config.broadcast_grad_reduction == "mean"
    if neq > 0:
        dA = bger(dnu, zhat) + bger(nu, dx)
        db = -dnu
        if Ab.shape[0] == 1 and B > 1:
            dA = dA.sum(axis=0, keepdims=True)
            if mean_mode:
                dA = dA / B_global
    else:
        dA = db = None

    def rvec(gr, was_unb):
        # broadcast_to's vjp performs the sum for unbatched params; mean
        # mode additionally divides, like the reference's .mean(0).
        if gr is not None and mean_mode and was_unb and B_global > 1:
            return gr / B_global
        return gr

    dq, dp, dg, dh = (rvec(dq, q_unb), rvec(dp, p_unb),
                      rvec(dg, g_unb), rvec(dh, h_unb))
    db = rvec(db, b_unb)
    d_init = (None if init is None
              else jax.tree_util.tree_map(jnp.zeros_like, init))
    return (dq, dp, dg, dh, dA, db, d_init)


_diag_core_fn.defvjp(_diag_fwd, _diag_bwd)


def solve_qp_diag(q, p, g, h, A=None, b=None,
                  config: SolverConfig = DEFAULT_CONFIG, init=None):
    """Differentiable batched diagonal-structure QP solve; returns z*.

    q, g: (B, n) or (n,) diagonals of Q and G (q > 0); p, h: (B, n) or
    (n,); A: (B, neq, n), (neq, n) or None; b matching. Unbatched
    parameters receive summed cotangents (``broadcast_grad_reduction``
    as in :func:`qpth_tpu.solve_qp`).
    """
    qb, pb, gb, hb, Ab, bb, meta = _canon_diag(q, p, g, h, A, b)
    return _diag_core_fn(qb, pb, gb, hb, Ab, bb, init, config, meta)


def solve_qp_diag_full(q, p, g, h, A=None, b=None,
                       config: SolverConfig = DEFAULT_CONFIG,
                       init=None) -> QPSolution:
    """Forward-only diagonal-structure solve with full primal-dual
    solution and stats (not differentiable)."""
    qb, pb, gb, hb, Ab, bb, _ = _canon_diag(q, p, g, h, A, b)
    return diag_core.solve_diag(qb, pb, gb, hb, Ab, bb, config, init=init)
