"""Hybrid blocked Cholesky for problems beyond the lanes kernels' VMEM
wall (m > ~136): lanes-kernel diagonal blocks + MXU trailing updates.

The per-iteration factorization of ``T = R + diag(1/d)`` has two cost
components with opposite hardware affinities:

* the *serial pivot chain* — irreducibly sequential per matrix, best
  executed in the batch-in-lanes layout where each of the m steps is a
  full-width vector op over 128 independent QPs (``ops/pallas/lanes.py``,
  measured ~31x XLA's batched Cholesky at m = 100);
* the *trailing bulk* — O(m^3) GEMM flops, best executed on the MXU.

Above the VMEM wall neither pure approach wins: the lanes kernel cannot
hold the matrix, and XLA's batched Cholesky serializes the pivot chain
per lane. This module splits the work at a 128-wide block granularity:

    for each block column j:                       (right-looking)
        G_j = inv(chol(D_j))     <- lanes factor_inv kernel (fits VMEM)
        P_j = T[i>j, j] @ G_j^T  <- batched MXU GEMM
        T[i>j, k>j] -= P_j P_j^T <- batched MXU GEMM (trailing update)

(A LEFT-looking variant — each block column updated once with all
previous panels' contributions, touching only the block lower triangle,
half the trailing GEMM flops — measured 29% faster in isolation at
m = 512, B = 512 but 5-8% SLOWER end-to-end inside the jitted solver,
reproduced across runs; XLA schedules the right-looking trailing
updates better against the surrounding iteration ops, so right-looking
stays) and stores ``(G_j diagonal-block inverses, P_j panels)``;
triangular solves become blocked substitution whose per-block step is one
(128 x 128) batched matvec — no XLA triangular_solve anywhere.

This replaces cuSOLVER-class batched large-m factorization in the
reference stack (lu_hack call sites, batch.py:8-20,435-470) for the
BASELINE config-4 regime (nz up to 512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import HIGHEST, add_diag, bmm, cholesky, tri_solve

#: Block size: matches the lanes kernels' 128-lane tile and the MXU tile.
BLOCK = 128


def _spd_factor_inv_block(D, interpret: bool):
    """G = inv(chol(D)) for a batch of (kb x kb) SPD blocks, kb <= ~136.

    Lanes kernel on TPU (batch padded to the 128-lane tile); XLA
    cholesky + triangular solve elsewhere/in interpret mode for speed.
    """
    B, kb = D.shape[0], D.shape[-1]
    from .pallas.lanes import lanes_supported

    if not interpret and B >= 8 and lanes_supported(kb, B):
        from .pallas.lanes import (factor_inv_lanes, pad_spd_lanes, pad_up)

        D_t = pad_spd_lanes(jnp.transpose(D, (1, 2, 0)))
        Bp = pad_up(B, 128)
        if Bp != B:
            D_t = jnp.pad(D_t, ((0, 0), (0, 0), (0, Bp - B)))
        zero_d = jnp.zeros((kb, Bp), D.dtype)
        G = factor_inv_lanes(D_t, zero_d, interpret=False)
        return jnp.transpose(G[:, :, :B], (2, 0, 1))[:, :kb, :kb]
    L = cholesky(D)
    eye = jnp.broadcast_to(jnp.eye(kb, dtype=D.dtype), (B, kb, kb))
    return tri_solve(L, eye)


class HybridFactor:
    """Blocked factor of a batch of SPD matrices: diagonal-block inverses
    ``Gs[j] = inv(L_jj)`` and sub-diagonal panels ``Ps[j] = L[j+1:, j]``."""

    __slots__ = ("Gs", "Ps", "m", "block")

    def __init__(self, Gs, Ps, m, block):
        self.Gs, self.Ps, self.m, self.block = Gs, Ps, m, block


jax.tree_util.register_pytree_node(
    HybridFactor,
    lambda f: ((f.Gs, f.Ps), (f.m, f.block)),
    lambda aux, ch: HybridFactor(ch[0], ch[1], *aux),
)


def _lower_block_grid(T, block):
    """Slice batched (B, m, m) T into its lower block triangle:
    ``S[i][k]`` = block (i, k) for k <= i. The strictly-upper half is
    never read by the blocked factorization (panels consume block
    column j below the diagonal; diagonal blocks are symmetric), so
    keeping only the triangle cuts ~1/3 of the trailing-update flops
    and writes at nb = 4."""
    m = T.shape[-1]
    starts = list(range(0, m, block))
    return [[T[:, i0:i0 + min(block, m - i0), k0:k0 + min(block, m - k0)]
             for k0 in starts[:bi + 1]]
            for bi, i0 in enumerate(starts)]


def _panel_update(S, G, j, nb):
    """Form block column j's sub-diagonal panel (one GEMM per block row)
    and apply the triangle-only trailing update with one GEMM per trailing
    block ROW against a prefix of the concatenated panel — same flops as
    per-block-pair updates but ~40% fewer, larger MXU dispatches at
    nb = 4 (the panel concat is needed for the stored factor anyway, so
    the prefix operands are free). Mutates S; returns the panel P."""
    GT = jnp.swapaxes(G, -1, -2)
    prows = [bmm(S[i][j], GT) for i in range(j + 1, nb)]
    P = jnp.concatenate(prows, axis=1) if len(prows) > 1 else prows[0]
    off = 0
    for i in range(j + 1, nb):
        Pi = prows[i - j - 1]
        kbi = Pi.shape[1]
        upd = jnp.einsum("bik,bjk->bij", Pi, P[:, :off + kbi],
                         precision=HIGHEST)
        c = 0
        for k in range(j + 1, i + 1):
            kbk = S[i][k].shape[-1]
            S[i][k] = S[i][k] - upd[:, :, c:c + kbk]
            c += kbk
        off += kbi
    return P


def factor_hybrid(T, interpret: bool = False,
                  block: int = BLOCK, dinv=None) -> HybridFactor:
    """Blocked Cholesky of batched SPD T (B, m, m).

    ``dinv``: optional (B, m) diagonal shift — factors T + diag(dinv)
    without materializing the shifted matrix (the IPM calls this every
    iteration with T = R fixed and dinv = 1/d varying; folding the shift
    into the per-block diagonal reads saves a full read+write pass over
    the (B, m, m) matrix per iteration).

    Right-looking with triangle-only trailing updates: only the lower
    block triangle of the trailing matrix is computed (the upper half is
    never consumed), as per-block (B, <=128, 128) GEMMs.
    """
    m = T.shape[-1]
    S = _lower_block_grid(T, block)
    nb = len(S)
    Gs, Ps = [], []
    for j in range(nb):
        D = S[j][j]
        if dinv is not None:
            j0 = j * block
            kb = D.shape[-1]
            idx = jnp.arange(kb)
            D = D.at[:, idx, idx].add(dinv[:, j0:j0 + kb])
        G = _spd_factor_inv_block(D, interpret)
        Gs.append(G)
        if j < nb - 1:
            Ps.append(_panel_update(S, G, j, nb))
        else:
            Ps.append(None)
    return HybridFactor(Gs, Ps, m, block)


def factor_solve_hybrid(T, v, interpret: bool = False,
                        block: int = BLOCK, dinv=None):
    """Fused blocked factor + first solve: the forward substitution is
    carried along the factor's block loop (each panel P_j is applied to
    the remaining RHS right after it is formed, while it is fresh),
    saving the separate forward sweep's full re-read of the panels.
    Returns (HybridFactor, x) with (T + diag(dinv)) x = v.
    """
    m = T.shape[-1]
    S = _lower_block_grid(T, block)
    nb = len(S)
    Gs, Ps, ys = [], [], []
    r = v

    def mv(M, x):
        return jnp.einsum("bij,bj->bi", M, x, precision=HIGHEST)

    def mtv(M, x):
        return jnp.einsum("bij,bi->bj", M, x, precision=HIGHEST)

    for j in range(nb):
        D = S[j][j]
        if dinv is not None:
            j0 = j * block
            kb = D.shape[-1]
            idx = jnp.arange(kb)
            D = D.at[:, idx, idx].add(dinv[:, j0:j0 + kb])
        G = _spd_factor_inv_block(D, interpret)
        Gs.append(G)
        kb = D.shape[-1]
        y = mv(G, r[:, :kb])
        ys.append(y)
        if j < nb - 1:
            P = _panel_update(S, G, j, nb)
            Ps.append(P)
            r = r[:, kb:] - mv(P, y)
        else:
            Ps.append(None)
    fac = HybridFactor(Gs, Ps, m, block)

    # Backward substitution (as in solve_hybrid, reusing the computed ys).
    nb = len(Gs)
    xs = [None] * nb
    for j in range(nb - 1, -1, -1):
        rj = ys[j]
        if fac.Ps[j] is not None:
            xt = jnp.concatenate(xs[j + 1:], axis=-1)
            rj = rj - mtv(fac.Ps[j], xt)
        xs[j] = mtv(fac.Gs[j], rj)
    return fac, jnp.concatenate(xs, axis=-1)


def solve_hybrid(fac: HybridFactor, v):
    """Solve (L L^T) x = v for batched vectors v (B, m) given the blocked
    factor. Pure batched-GEMV substitution; every step is MXU-sized."""
    m, block = fac.m, fac.block
    nb = len(fac.Gs)
    starts = [j * block for j in range(nb)]

    def mv(M, x):
        return jnp.einsum("bij,bj->bi", M, x, precision=HIGHEST)

    def mtv(M, x):
        return jnp.einsum("bij,bi->bj", M, x, precision=HIGHEST)

    # Forward, right-looking: apply each panel to the WHOLE remaining RHS
    # as one batched GEMV the moment y_k is available (nb-1 full-height
    # GEMVs instead of nb(nb-1)/2 sliced ones — same flops, fewer and
    # MXU-friendlier dispatches; mirrors factor_solve_hybrid's fused
    # sweep).
    ys = []
    r = v
    for k in range(nb):
        kb = min(block, m - starts[k])
        y = mv(fac.Gs[k], r[:, :kb])
        ys.append(y)
        r = r[:, kb:]
        if fac.Ps[k] is not None:
            r = r - mv(fac.Ps[k], y)

    # Backward: x_j = G_j^T (y_j - [P_j^T x_{k>j}]).
    xs = [None] * nb
    for j in range(nb - 1, -1, -1):
        j0 = starts[j]
        kb = min(block, m - j0)
        r = ys[j]
        if fac.Ps[j] is not None:
            xt = jnp.concatenate(xs[j + 1:], axis=-1)
            r = r - mtv(fac.Ps[j], xt)
        xs[j] = mtv(fac.Gs[j], r)
    return jnp.concatenate(xs, axis=-1)


def solve_hybrid_mat(fac: HybridFactor, V):
    """Multi-RHS solve (L L^T) X = V for batched matrices V (B, m, k):
    the blocked substitution of :func:`solve_hybrid` with every per-block
    step widened from a GEMV to a (B, <=128|k) GEMM — used to build the
    prefactor's cached Q^-1 G^T / Q^-1 A^T products directly from the
    blocked factor, without materializing Q^-1 (which costs an extra
    triangular inversion + a full m^3 gram at HIGHEST precision)."""
    m, block = fac.m, fac.block
    nb = len(fac.Gs)
    starts = [j * block for j in range(nb)]

    ys = []
    r = V
    for k in range(nb):
        kb = min(block, m - starts[k])
        y = bmm(fac.Gs[k], r[:, :kb])
        ys.append(y)
        r = r[:, kb:]
        if fac.Ps[k] is not None:
            r = r - bmm(fac.Ps[k], y)

    xs = [None] * nb
    for j in range(nb - 1, -1, -1):
        r = ys[j]
        if fac.Ps[j] is not None:
            xt = jnp.concatenate(xs[j + 1:], axis=1)
            r = r - jnp.einsum("bij,bik->bjk", fac.Ps[j], xt,
                               precision=HIGHEST)
        xs[j] = jnp.einsum("bij,bik->bjk", fac.Gs[j], r,
                           precision=HIGHEST)
    return jnp.concatenate(xs, axis=1)


def spd_inv_hybrid(M, interpret: bool = False, block: int = BLOCK):
    """Explicit batched SPD inverse via the blocked factorization.

    inv(M) = L^-T L^-1 with L^-1 built block-column by block-column from
    the factor's diagonal-block inverses and panels (a forward
    substitution with identity RHS — every step a (B, *, 128) GEMM), then
    one gram GEMM. All O(m^3) work lands on the MXU; the XLA alternative
    (``cho_solve(cholesky(M), I)``) serializes the m-step pivot chain per
    lane (measured 145 ms vs ~25 ms at m = 512, B = 512 — it was 47% of
    the whole nz=512 solve). Replaces the large-m prefactor inversions
    the reference delegates to cuSOLVER (batch.py:375-424 lu_solve
    call sites).
    """
    B, m = M.shape[0], M.shape[-1]
    fac = factor_hybrid(M, interpret=interpret, block=block)
    Gs, Ps = fac.Gs, fac.Ps
    nb = len(Gs)
    sizes = [G.shape[-1] for G in Gs]

    cols = []                      # cols[j]: (B, m - start_j, kb_j)
    for j in range(nb):
        y = Gs[j]
        blocks = [y]
        r = -bmm(Ps[j], y) if Ps[j] is not None else None
        for k in range(j + 1, nb):
            kb = sizes[k]
            yk = bmm(Gs[k], r[:, :kb])
            blocks.append(yk)
            r = r[:, kb:]
            if Ps[k] is not None:
                r = r - bmm(Ps[k], yk)
        cols.append(jnp.concatenate(blocks, axis=1) if len(blocks) > 1
                    else blocks[0])

    full_cols = []
    off = 0
    for j in range(nb):
        kb = sizes[j]
        if off:
            zero = jnp.zeros((B, off, kb), M.dtype)
            full_cols.append(jnp.concatenate([zero, cols[j]], axis=1))
        else:
            full_cols.append(cols[j])
        off += kb
    Linv = (jnp.concatenate(full_cols, axis=2) if nb > 1
            else full_cols[0])
    return jnp.einsum("bki,bkj->bij", Linv, Linv, precision=HIGHEST)


def hybrid_backend(interpret: bool = False):
    """KKTBackend using the hybrid blocked factorization — the TPU fast
    path for lanes-unsupported sizes (m beyond the VMEM wall)."""
    from . import kkt as kkt_ops

    def factor(R, d):
        # Diagonal shift folded into the blocked factor (no full-matrix
        # add_diag copy per iteration).
        return factor_hybrid(R, interpret=interpret, dinv=1.0 / d)

    def solve2(fac, v):
        return solve_hybrid(fac, v)

    def factor_solve(R, d, v):
        return factor_solve_hybrid(R, v, interpret=interpret,
                                   dinv=1.0 / d)

    def factor_solve_rz(R, d, q, z):
        # (R + D^-1) x = q - R z  with  w = x + z  becomes
        # (R + D^-1) w = q + z/d — eliminating the bmv(R, z) full-matrix
        # HBM pass (537 MB ≈ 0.65 ms/iteration at m=512, B=512; the lanes
        # backend gets the same effect by folding R z into its kernel
        # where R is already VMEM-resident).
        fac, w = factor_solve(R, d, q + z / d)
        return fac, w - z

    return kkt_ops.KKTBackend(
        prepare=lambda f: f, factor=factor, solve2=solve2,
        factor_solve=factor_solve, factor_solve_rz=factor_solve_rz)
