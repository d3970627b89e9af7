"""Pallas TPU kernels for the hot KKT factor/solve path.

The reference reaches cuBLAS batched LU through torch (``lu_hack``,
batch.py:8-20 and call sites at 292-448). The TPU-native equivalents here
are *batch-vectorized* pivot-free blocked Cholesky and triangular
substitution: a grid over batch tiles, each program holding a (BT, n, n)
tile in VMEM, with

  * a right-looking **blocked** recurrence: the bs-wide diagonal block is
    factored (and its triangular inverse formed) by an unrolled scalar
    recurrence on tiny (BT, bs, bs) shapes, then the panel solve and the
    trailing Schur update run as batched ``dot_general`` contractions on
    the MXU — so the O(n^3) work lands on the systolic array, not the VPU;
  * factors produced/consumed in **transposed layout** ``Lt = L^T`` so every
    hot slice in both the factorization and the substitutions indexes
    sublanes (cheap) rather than lanes;
  * symmetric-input exploitation: row j of the (symmetric) trailing matrix
    *is* column j, so no transposed reads are ever needed.

NaN behavior matches jnp.linalg.cholesky (non-SPD lanes yield NaNs, which
the IPM's best-iterate masking handles). CPU/interpret fallback keeps tests
runnable without a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_bt(B: int, n: int, vmem_budget=10 * 1024 * 1024, bufs=6) -> int:
    """Batch-tile size: biggest power of two whose tiles fit the budget
    (in/out pipeline double-buffers plus live in-kernel values)."""
    per_elem = max(n, 8) * max(n, 128) * 4
    bt = max(1, vmem_budget // (bufs * per_elem))
    bt = 1 << (bt.bit_length() - 1)
    while B % bt != 0 and bt > 1:
        bt //= 2
    return min(bt, B, 256)


def _mm(a, b, dn):
    # HIGHEST: full-f32 MXU passes — the IPM's conditioning cannot tolerate
    # one-pass bf16 (0.4% relative error in the Schur updates).
    return lax.dot_general(a, b, dimension_numbers=dn,
                           preferred_element_type=F32,
                           precision=lax.Precision.HIGHEST)


# batched matmul: (BT, m, k) @ (BT, k, r) -> (BT, m, r)
_DN_MM = (((2,), (1,)), ((0,), (0,)))
# batched gram: contract dim 1: (BT, k, m), (BT, k, r) -> (BT, m, r)
_DN_GRAM = (((1,), (1,)), ((0,), (0,)))


def _small_chol_inv(D, dtype):
    """Factor a (BT, b, b) SPD block; return (Ut, X) where Ut = chol(D)^T
    (rows of L^T) and X = inv(chol(D)) rows. Unrolled scalar recurrence."""
    BT, b, _ = D.shape
    lane_b = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    Ut = jnp.zeros((BT, b, b), dtype)
    X = jnp.zeros((BT, b, b), dtype)
    Dc = D
    for i in range(b):
        row = Dc[:, i, :]                         # (BT, b)
        isq = lax.rsqrt(row[:, i])                # (BT,)
        lrow = jnp.where(lane_b >= i, row * isq[:, None], 0.0)
        Dc = Dc - lrow[:, :, None] * lrow[:, None, :]
        Ut = jnp.where(sub_b == i, lrow[:, None, :], Ut)
        # inv(L_D) row i = (e_i - sum_{k<i} L[i,k] X[k,:]) / L[i,i];
        # L[i,k] = Ut[k,i] (zeros for k > i; k = i term hits X[i,:] = 0).
        coeff = Ut[:, :, i]                       # (BT, b)
        s = jnp.sum(coeff[:, :, None] * X, axis=1)
        e_i = jnp.where(lane_b == i, 1.0, 0.0)
        xrow = (e_i - s) * isq[:, None]
        X = jnp.where(sub_b == i, xrow[:, None, :], X)
    return Ut, X


def _chol_blocked_writeout(A, l_ref, bs):
    """Blocked Cholesky of symmetric (BT, n, n) A; writes Lt rows into
    l_ref. The trailing submatrix is the loop-carried value (static,
    shrinking shapes — fully unrolled over n/bs blocks)."""
    BT, n, _ = A.shape
    dtype = A.dtype
    Atr = A
    for jb in range(0, n, bs):
        b = min(bs, n - jb)
        rest = n - jb - b
        Ut, X = _small_chol_inv(Atr[:, :b, :b], dtype)
        parts = []
        if jb:
            parts.append(jnp.zeros((BT, b, jb), dtype))
        parts.append(Ut)
        if rest:
            Rpan = Atr[:, :b, b:]                 # (BT, b, rest)
            W = _mm(X, Rpan, _DN_MM)              # rows jb..jb+b of Lt tail
            Atr = Atr[:, b:, b:] - _mm(W, W, _DN_GRAM)
            parts.append(W)
        l_ref[:, jb:jb + b, :] = jnp.concatenate(parts, axis=2)


def _pick_bs(n: int) -> int:
    for bs in (16, 8):
        if n % bs == 0:
            return bs
    for bs in range(min(20, n), 0, -1):
        if n % bs == 0:
            return bs
    return min(16, n)


# ---------------------------------------------------------------------------
# Batched Cholesky (transposed output)
# ---------------------------------------------------------------------------

def _cholt_kernel(a_ref, l_ref, *, bs):
    _chol_blocked_writeout(a_ref[...], l_ref, bs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_t_pallas(A, *, interpret: bool | None = None):
    """Batched Cholesky of (B, n, n) SPD matrices, returning Lt = L^T."""
    if interpret is None:
        interpret = _default_interpret()
    B, n, _ = A.shape
    bt = _pick_bt(B, n)
    return pl.pallas_call(
        functools.partial(_cholt_kernel, bs=_pick_bs(n)),
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), A.dtype),
        interpret=interpret,
    )(A)


def cholesky_pallas(A, *, interpret: bool | None = None):
    """Standard-layout wrapper (returns L); prefer cholesky_t_pallas."""
    return jnp.swapaxes(cholesky_t_pallas(A, interpret=interpret), -1, -2)


# ---------------------------------------------------------------------------
# Fused factor_kkt: Lt = chol(R + diag(1/d))^T
# ---------------------------------------------------------------------------

def _factor_kkt_kernel(r_ref, dinv_ref, l_ref, *, bs):
    n = r_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    sub = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    T = r_ref[...] + jnp.where(lane == sub,
                               dinv_ref[...][:, :, None], 0.0)
    _chol_blocked_writeout(T, l_ref, bs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_kkt_t_pallas(R, d, *, interpret: bool | None = None):
    """Lt = chol(R + diag(1/d))^T without materializing T in HBM.

    R: (bR, n, n) with bR in {1, B}; d: (B, n) > 0. The analog of the
    reference's per-iteration factor_kkt (batch.py:435-470)."""
    if interpret is None:
        interpret = _default_interpret()
    B, n = d.shape
    bR = R.shape[0]
    dinv = 1.0 / d
    bt = _pick_bt(B, n)
    r_index = (lambda i: (0, 0, 0)) if bR == 1 else (lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_factor_kkt_kernel, bs=_pick_bs(n)),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt if bR != 1 else 1, n, n), r_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), d.dtype),
        interpret=interpret,
    )(R, dinv)


# ---------------------------------------------------------------------------
# Blocked triangular inverse (consumes Lt, emits invL in standard layout)
# ---------------------------------------------------------------------------

def _trinv_kernel(lt_ref, out_ref, *, bs):
    """invL of a lower-triangular L given Lt = L^T, blocked:

        invL[blk, :prev] = -X_blk @ (L[blk, :prev] @ invL_top)
                         = -X_blk @ (Lt[:prev, blk]^T @ invL_top)

    where X_blk = inv(L_diag_block) comes from the same scalar recurrence as
    the factorization; the cross-block work is MXU contractions (the
    transposed read folds into dot_general's dimension numbers for free).
    """
    Lt = lt_ref[...]
    BT, n, _ = Lt.shape
    dtype = Lt.dtype
    inv_top = None                                # (BT, jb, n) rows so far
    for jb in range(0, n, bs):
        b = min(bs, n - jb)
        rest = n - jb - b
        # Diagonal block of L in row layout: D[i,k] = L[jb+i, jb+k]
        # = Lt[jb+k, jb+i]; recover it by re-deriving X from D directly.
        Dt = Lt[:, jb:jb + b, jb:jb + b]          # (BT, b, b) = D^T (upper)
        # X = inv(D): forward substitution, row recurrence on tiny shapes.
        lane_b = lax.broadcasted_iota(jnp.int32, (1, b), 1)
        sub_b = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
        X = jnp.zeros((BT, b, b), dtype)
        for i in range(b):
            # L[i, k] = Dt[k, i]; row i of X = (e_i - sum_{k<i} L[i,k] X[k])
            # / L[i,i].
            coeff = Dt[:, :, i]                   # (BT, b)
            s = jnp.sum(coeff[:, :, None] * X, axis=1)
            e_i = jnp.where(lane_b == i, 1.0, 0.0)
            xrow = (e_i - s) / Dt[:, i, i][:, None]
            X = jnp.where(sub_b == i, xrow[:, None, :], X)
        parts = []
        if jb:
            S = Lt[:, :jb, jb:jb + b]             # (BT, jb, b)
            # S^T @ inv_top[:, :, :jb]: contract over jb rows.
            C = lax.dot_general(S, inv_top[:, :, :jb],
                                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=F32,
                                precision=lax.Precision.HIGHEST)
            M = -_mm(X, C, _DN_MM)                # (BT, b, jb)
            parts.append(M)
        parts.append(X)
        if rest:
            parts.append(jnp.zeros((BT, b, rest), dtype))
        rows = jnp.concatenate(parts, axis=2)     # (BT, b, n)
        out_ref[:, jb:jb + b, :] = rows
        inv_top = rows if inv_top is None else jnp.concatenate(
            [inv_top, rows], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trinv_pallas(Lt, *, interpret: bool | None = None):
    """Inverse of lower-triangular L given Lt = L^T: (B, n, n) -> invL
    (standard row layout)."""
    if interpret is None:
        interpret = _default_interpret()
    B, n, _ = Lt.shape
    bt = _pick_bt(B, n, bufs=8)                   # inv_top is an extra live tile
    return pl.pallas_call(
        functools.partial(_trinv_kernel, bs=_pick_bs(n)),
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), Lt.dtype),
        interpret=interpret,
    )(Lt)


def spd_inverse(A, *, interpret: bool | None = None):
    """A^-1 for batched SPD A via chol + blocked triangular inverse + gram
    (all MXU work): A^-1 = invL^T invL."""
    Lt = cholesky_t_pallas(A, interpret=interpret)
    invL = trinv_pallas(Lt, interpret=interpret)
    return lax.dot_general(invL, invL,
                           dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                           preferred_element_type=F32,
                           precision=lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Batched two-triangular-solve (vector RHS) on transposed factors
# ---------------------------------------------------------------------------

def _cho_solve_vec_body_t(Lt, v):
    """Solve (L L^T) x = v given Lt = L^T, on a (BT, n, n) tile.

    Forward pass is column-oriented (SAXPY) and backward row-oriented, so
    every factor access is a sublane slice Lt[:, j, :]."""
    n = Lt.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    y = v
    for j in range(n):
        ltrow = Lt[:, j, :]                       # column j of L
        yj = y[:, j] / ltrow[:, j]
        y = y - jnp.where(lane > j, ltrow * yj[:, None], 0.0)
        y = jnp.where(lane == j, yj[:, None], y)
    x = jnp.zeros_like(v)
    for i in range(n - 1, -1, -1):
        ltrow = Lt[:, i, :]                       # row i of L^T
        acc = jnp.sum(jnp.where(lane > i, ltrow * x, 0.0), axis=-1)
        xi = (y[:, i] - acc) / ltrow[:, i]
        x = jnp.where(lane == i, xi[:, None], x)
    return x


def _cho_solve_vec_kernel(l_ref, v_ref, x_ref):
    x_ref[...] = _cho_solve_vec_body_t(l_ref[...], v_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cho_solve_vec_t_pallas(Lt, v, *, interpret: bool | None = None):
    """Solve (L L^T) x = v with Lt = L^T: (bL, n, n), bL in {1, B};
    v: (B, n)."""
    if interpret is None:
        interpret = _default_interpret()
    B, n = v.shape
    bL = Lt.shape[0]
    bt = _pick_bt(B, n)
    l_index = (lambda i: (0, 0, 0)) if bL == 1 else (lambda i: (i, 0, 0))
    return pl.pallas_call(
        _cho_solve_vec_kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt if bL != 1 else 1, n, n), l_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), v.dtype),
        interpret=interpret,
    )(Lt, v)
