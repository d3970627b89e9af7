"""Single-instance primal-dual interior-point QP solver.

The clean, unbatched exposition of the same Mehrotra predictor-corrector
algorithm that :mod:`qpth_tpu.core.pdipm` runs in batch — the analog of the
reference's ``qpth/solvers/pdipm/single.py`` (which documents the math in
its most readable form and proves the blocks are Cholesky-factorizable:
``single.py:107,144,159,177``; algorithm follows the Boyd convex-
optimization code-gen formulation cited at ``single.py:7``). Unlike the
reference's copy — dead code written against removed torch APIs
(``potrf/potrs/gesv``) — this one is live, tested, and composes with
``jax.vmap`` (vmapping it is a correct, if less optimized, alternative to
the batched solver).

Solves   min_z 1/2 z^T Q z + p^T z   s.t.  G z <= h,  A z = b.

KKT strategy: the unbatched analog of the partial pre-factorization
(pre_factor_kkt / factor_kkt, reference single.py:137-178): Cholesky of Q
and of S11 = A Q^-1 A^T once, Cholesky of T = R + diag(1/d) per iteration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_solve, cholesky

from ..config import SolverConfig


class SingleSolution(NamedTuple):
    z: jax.Array          #: primal solution (nz,)
    nu: jax.Array         #: equality duals (neq,) — zero-width if neq == 0
    lam: jax.Array        #: inequality duals (nineq,)
    s: jax.Array          #: slacks (nineq,)
    iterations: jax.Array  #: scalar int32
    resid: jax.Array      #: final residual score (scalar)


def _factors(Q, G, A):
    """One-time factorizations (reference single.py:137-172)."""
    L_Q = cholesky(Q, lower=True)
    invQ_GT = cho_solve((L_Q, True), G.T)            # (nz, nineq)
    R = G @ invQ_GT                                   # G Q^-1 G^T
    if A is None:
        return L_Q, R, None, None, None
    invQ_AT = cho_solve((L_Q, True), A.T)            # (nz, neq)
    S11 = A @ invQ_AT
    L_S11 = cholesky(S11, lower=True)
    S21 = G @ invQ_AT                                 # (nineq, neq)
    W = cho_solve((L_S11, True), S21.T)               # (neq, nineq)
    R = R - S21 @ W
    return L_Q, R, L_S11, S21, W


def _solve_kkt(L_Q, R, L_S11, S21, W, G, A, d, rx, rs, rz, ry):
    """Unbatched analog of the batched Schur solve (single.py:103-134)."""
    L_T = cholesky(R + jnp.diag(1.0 / d), lower=True)
    invQ_rx = cho_solve((L_Q, True), rx)
    r2 = G @ invQ_rx + rs / d - rz
    if A is None:
        dz = cho_solve((L_T, True), -r2)
        dy = None
        g1 = -rx - G.T @ dz
    else:
        r1 = A @ invQ_rx - ry
        u = cho_solve((L_S11, True), -r1)
        dz = cho_solve((L_T, True), -r2 - S21 @ u)
        dy = u - W @ dz
        g1 = -rx - G.T @ dz - A.T @ dy
    dx = cho_solve((L_Q, True), g1)
    ds = (-rs - dz) / d
    return dx, ds, dz, dy


def _step(v, dv):
    """Max alpha with v + alpha dv >= 0 (single.py get_step analog)."""
    a = jnp.where(dv < 0, -v / dv, jnp.inf)
    return a.min()


def solve_single(Q, p, G, h, A=None, b=None,
                 config: SolverConfig = SolverConfig()) -> SingleSolution:
    """Solve ONE QP (unbatched shapes). jit/vmap/grad-composable for
    moderate sizes; for production batches use qpth_tpu.solve_qp."""
    nz = p.shape[-1]
    nineq = G.shape[-2]
    neq = A.shape[-2] if A is not None else 0
    dtype = p.dtype

    L_Q, R, L_S11, S21, W = _factors(Q, G, A)

    def kkt(d, rx, rs, rz, ry):
        return _solve_kkt(L_Q, R, L_S11, S21, W, G, A, d, rx, rs, rz, ry)

    # Init: d = 1, RHS (p, 0, -h, -b); shift s, z to >= 1
    # (reference single.py:19-38).
    ones = jnp.ones((nineq,), dtype)
    x, s, z, y = kkt(ones, p, jnp.zeros((nineq,), dtype), -h,
                     -b if neq > 0 else None)
    shift = lambda v: jnp.where(v.min() < 0, v - v.min() + 1.0, v)  # noqa
    s, z = shift(s), shift(z)
    y = y if y is not None else jnp.zeros((0,), dtype)

    def residuals(x, s, z, y):
        rx = Q @ x + p + G.T @ z
        if neq > 0:
            rx = rx + A.T @ y
            ry = A @ x - b
            pri_y = jnp.linalg.norm(ry)
        else:
            ry = None
            pri_y = jnp.zeros((), dtype)
        rz = G @ x + s - h
        mu = jnp.abs(jnp.dot(s, z)) / nineq
        score = (pri_y + jnp.linalg.norm(rz) + jnp.linalg.norm(rx)
                 + nineq * mu)
        return rx, rz, ry, mu, score

    class _St(NamedTuple):
        x: jax.Array
        s: jax.Array
        z: jax.Array
        y: jax.Array
        it: jax.Array
        resid: jax.Array

    def cond(st):
        return jnp.logical_and(st.it < config.max_iter,
                               st.resid > config.eps)

    def body(st):
        x, s, z, y = st.x, st.s, st.z, st.y
        rx, rz, ry, mu, _ = residuals(x, s, z, y)
        d = z / s
        dx_a, ds_a, dz_a, dy_a = kkt(d, rx, z, rz, ry)
        alpha = jnp.minimum(jnp.minimum(_step(z, dz_a), _step(s, ds_a)), 1.0)
        t1 = jnp.dot(s + alpha * ds_a, z + alpha * dz_a)
        sig = (t1 / jnp.dot(s, z)) ** 3
        rs_c = (-mu * sig + ds_a * dz_a) / s
        dx_c, ds_c, dz_c, dy_c = kkt(d, jnp.zeros((nz,), dtype), rs_c,
                                     jnp.zeros((nineq,), dtype),
                                     jnp.zeros((neq,), dtype)
                                     if neq > 0 else None)
        dx, ds, dz = dx_a + dx_c, ds_a + ds_c, dz_a + dz_c
        alpha = jnp.minimum(
            0.999 * jnp.minimum(_step(z, dz), _step(s, ds)), 1.0)
        x = x + alpha * dx
        s = s + alpha * ds
        z = z + alpha * dz
        if neq > 0:
            y = y + alpha * (dy_a + dy_c)
        _, _, _, _, score = residuals(x, s, z, y)
        return _St(x, s, z, y, st.it + 1, score)

    *_, score0 = residuals(x, s, z, y)
    st = lax.while_loop(cond, body,
                        _St(x, s, z, y, jnp.zeros((), jnp.int32), score0))
    return SingleSolution(z=st.x, nu=st.y, lam=st.z, s=st.s,
                          iterations=st.it, resid=st.resid)
