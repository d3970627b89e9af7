"""Broadcast-aware batched dense linear algebra on top of XLA.

The reference reaches batched LU/GEMM kernels through torch
(``torch.linalg.lu_factor/lu_solve``, ``torch.bmm`` — batch.py:8-20, 349-372).
The TPU-native replacements here are built on XLA's batched Cholesky and
triangular-solve plus ``dot_general`` on the MXU, with two deliberate design
changes:

1. **Cholesky, not LU.** Every system the reference factors is SPD
   (``Q``, ``A Q^-1 A^T``, ``R + diag(1/d)`` — see single.py:144,159,177 for
   the reference's own Cholesky variant), so pivot-free factorization is
   correct by construction rather than by the ``lu_hack`` gamble
   (batch.py:8-20).

2. **Shared-factor fast paths.** When a matrix has batch dim 1 (parameter
   shared across the QP batch) the batched matvec/solve against B right-hand
   sides is reshaped into a single large GEMM / multi-RHS triangular solve so
   XLA tiles it onto the MXU instead of looping tiny ops.

All matmuls use ``precision=HIGHEST`` so float32 on TPU runs at full fp32
accuracy (multi-pass bf16), which the IPM's conditioning requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def bmm(a, b):
    """Batched matmul with leading-dim broadcasting, (bA,m,k)x(bB,k,n)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def bmv(M, v):
    """Batched matrix-vector: (bM, m, n) x (B, n) -> (max(bM,B), m).

    When M is shared (bM == 1) this lowers to a single (B,n)x(n,m) GEMM.
    """
    if M.shape[0] == 1 and v.shape[0] != 1:
        return jnp.matmul(v, M[0].T, precision=HIGHEST)
    return jnp.matmul(M, v[..., None], precision=HIGHEST)[..., 0]


def btmv(M, v):
    """Batched transposed matvec: M^T v, (bM, m, n) x (B, m) -> (B, n)."""
    if M.shape[0] == 1 and v.shape[0] != 1:
        return jnp.matmul(v, M[0], precision=HIGHEST)
    return jnp.matmul(jnp.swapaxes(M, -1, -2), v[..., None],
                      precision=HIGHEST)[..., 0]


def cholesky(a):
    """Batched lower Cholesky. Returns NaN-filled factors for non-SPD lanes
    (jnp semantics) instead of raising — callers mask on isnan."""
    return jnp.linalg.cholesky(a)


def _tri_solve(L, rhs, trans: bool):
    """lax triangular solve, lower, left side; trans selects L^T."""
    return lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True, transpose_a=trans
    )


def tri_solve(L, rhs, trans: bool = False):
    """Solve L X = rhs (or L^T X = rhs), rhs (B, n, k), L (bL, n, n).

    Shared-factor fast path: when bL == 1 and B > 1 the B right-hand sides are
    folded into the column dimension — one big multi-RHS solve instead of B
    small ones.
    """
    if L.shape[0] == 1 and rhs.shape[0] != 1:
        B, n, k = rhs.shape
        flat = jnp.transpose(rhs, (1, 0, 2)).reshape(n, B * k)
        out = _tri_solve(L[0], flat, trans)
        return jnp.transpose(out.reshape(n, B, k), (1, 0, 2))
    if L.shape[0] != 1 and rhs.shape[0] == 1:
        rhs = jnp.broadcast_to(rhs, (L.shape[0],) + rhs.shape[1:])
    return _tri_solve(L, rhs, trans)


def cho_solve(L, rhs):
    """Solve (L L^T) X = rhs for matrix rhs (B, n, k)."""
    return tri_solve(L, tri_solve(L, rhs, trans=False), trans=True)


def cho_solve_vec(L, v):
    """Solve (L L^T) x = v for vector rhs (B, n)."""
    return cho_solve(L, v[..., None])[..., 0]


def lu_solve_general(A_mat, rhs):
    """General (non-SPD) batched dense solve for the FULL/IR reference paths.

    XLA lowers this to batched partial-pivot LU (jnp.linalg.solve).
    rhs: (B, n, k) or (B, n).
    """
    vec = rhs.ndim == A_mat.ndim - 1
    if vec:
        rhs = rhs[..., None]
    if A_mat.shape[0] == 1 and rhs.shape[0] != 1:
        A_mat = jnp.broadcast_to(A_mat, (rhs.shape[0],) + A_mat.shape[1:])
    if A_mat.shape[0] != 1 and rhs.shape[0] == 1:
        rhs = jnp.broadcast_to(rhs, (A_mat.shape[0],) + rhs.shape[1:])
    out = jnp.linalg.solve(A_mat, rhs)
    return out[..., 0] if vec else out


def add_diag(M, d):
    """M + diag(d) batched: (bM, n, n) + (B, n) -> (max, n, n)."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    return M + d[..., :, None] * eye


def spd_check_eager(Q) -> None:
    """Eagerly raise if Q is not SPD, mirroring qp.py:81-85.

    Only possible on concrete (non-traced) values; silently skipped under
    tracing (the solver itself is NaN-robust and reports via stats).
    """
    if isinstance(Q, jax.core.Tracer):
        return
    L = jnp.linalg.cholesky(jnp.asarray(Q))
    if bool(jnp.isnan(L).any()):
        raise RuntimeError("Q is not SPD.")
