"""KKT linear-algebra layer: the heart of the solver.

Per IPM iteration the Newton system in (dx, ds, dz, dy) is reduced, via slack
elimination with D = diag(z/s), to a symmetrized Schur complement in the dual
variables (comment block batch.py:388-394 in the reference):

    S = [ A Q^-1 A^T     A Q^-1 G^T          ]
        [ G Q^-1 A^T     G Q^-1 G^T + D^-1   ]

The reference computes a *partial LU* of S once (pre_factor_kkt,
batch.py:375-429) and completes it each iteration by LU-factoring
``T = R + diag(1/d)`` (factor_kkt, batch.py:435-470), where

    R = G Q^-1 G^T - (G Q^-1 A^T)(A Q^-1 A^T)^-1 (A Q^-1 G^T)

TPU-native redesign: all three factored blocks (Q, A Q^-1 A^T, T) are SPD, so
this file uses pivot-free batched Cholesky + a textbook symmetric 2x2 block
solve — no pivots, no pivot surgery (batch.py:450-467), no ``lu_hack``.
Factors are first-class pytrees (``KKTFactors``) shared by forward and
backward, the JAX analog of the reference caching Q_LU/S_LU/R on ctx
(qp.py:93, 148-155).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .linalg import (
    add_diag,
    bmm,
    bmv,
    btmv,
    cho_solve,
    cho_solve_vec,
    cholesky,
    lu_solve_general,
    tri_solve,
)


class KKTFactors(NamedTuple):
    """Cached one-time factorization products (reference: Q_LU, S_LU, R on
    ctx, qp.py:93). Batch dims are minimal (1 if the parameter is shared).

    Two interchangeable representations of the Q / S11 solves:
      * substitution: Cholesky factors L_Q / L_S11 (invQ/invS11 = None);
      * inverse: explicit SPD inverses invQ / invS11 (L_* = None) — every
        per-iteration application becomes a single batched matvec on the
        MXU instead of a latency-bound substitution chain. Computed via
        blocked triangular inversion (Pallas on TPU).
    """

    #: Lower Cholesky of Q, (bQ, nz, nz); None in inverse mode.
    L_Q: Optional[jnp.ndarray]
    #: Schur complement core G Q^-1 G^T - S21 S11^-1 S12, (b, nineq, nineq).
    R: jnp.ndarray
    #: Lower Cholesky of S11 = A Q^-1 A^T, (b, neq, neq); None when neq == 0
    #: or in inverse mode.
    L_S11: Optional[jnp.ndarray]
    #: S21 = G Q^-1 A^T, (b, nineq, neq); None when neq == 0.
    S21: Optional[jnp.ndarray]
    #: W = S11^-1 S12 = S11^-1 S21^T, (b, neq, nineq); None when neq == 0.
    W: Optional[jnp.ndarray]
    #: Q^-1, (bQ, nz, nz); None in substitution mode.
    invQ: Optional[jnp.ndarray] = None
    #: S11^-1, (b, neq, neq); None when neq == 0 or substitution mode.
    invS11: Optional[jnp.ndarray] = None
    # --- Cached products for the fast per-iteration algebra (inverse
    # mode only). The IPM's RHS/backsub matvecs against Q^-1 and G can be
    # folded into these precomputed products plus vector identities
    # (e.g. rs/d = s for the predictor), cutting per-iteration HBM reads
    # by ~a third. See pdipm.solve's fast path.
    #: Q^-1 G^T, (b, nz, nineq); None unless inverse mode.
    invQ_GT: Optional[jnp.ndarray] = None
    #: Q^-1 A^T, (b, nz, neq); None unless inverse mode with neq > 0.
    invQ_AT: Optional[jnp.ndarray] = None
    #: G Q^-1 G^T (no Schur correction), (b, nineq, nineq); None unless
    #: inverse mode. Equal to R when neq == 0.
    GiGT: Optional[jnp.ndarray] = None
    #: S11 = A Q^-1 A^T, (b, neq, neq); None unless inverse mode, neq > 0.
    S11: Optional[jnp.ndarray] = None
    #: Blocked Cholesky factor of Q (ops.hybrid.HybridFactor) — the
    #: inverse-mode Q representation beyond the lanes VMEM wall, where the
    #: cached products are built by multi-RHS blocked substitution instead
    #: of materializing Q^-1 (saves the triangular inversion + the full
    #: m^3 HIGHEST-precision gram). invQ is None when this is set; vector
    #: applications go through ops.hybrid.solve_hybrid.
    facQ: Optional[object] = None
    # --- Equilibration (scaling.Scaling). ``scaling`` gives the
    # coordinates the cached products (and hence the IPM iterates) live
    # in: identity values when the probe's light branch kept the factors
    # UNSCALED, the Ruiz scalings when the full branch scaled the inputs.
    # ``sem_scaling`` carries the Ruiz scalings themselves in either case
    # — the solver uses them for the scale-sensitive VECTOR-space
    # behaviors (init shift, clamps, termination/selection scoring),
    # which is where equilibration's entire numerical effect lives for
    # pow2 scalings (the factorization chains are exactly scale-covariant
    # — see scaling.py's docstring); this is how the light branch gets
    # the full equilibration behavior with ZERO matrix scaling work.
    # Scaled matrices are never stored either way: residual scoring reads
    # the ORIGINAL matrices and maps norms by exact pow2 weights.
    scaling: Optional[object] = None
    sem_scaling: Optional[object] = None


def _spd_inv(M, use_pallas_kernels: bool):
    """Batched SPD inverse. On TPU with a real batch: lanes-layout fused
    Cholesky+triangular-inverse kernel, then the gram product on the MXU
    (batch-major, XLA). Small/shared batches: XLA Cholesky-solve against
    the identity."""
    B, n = M.shape[0], M.shape[-1]
    from .pallas.lanes import lanes_supported

    import jax

    interp = jax.default_backend() != "tpu"
    # Hardware lane-DMA alignment: only 128-multiple batches take the
    # Pallas path (others fall back to XLA — rare and cheap).
    if (use_pallas_kernels and B >= 8 and lanes_supported(n, B)
            and (interp or B % 128 == 0)):
        from .pallas import factor_inv_lanes, pad_spd_lanes

        M_t = pad_spd_lanes(jnp.transpose(M, (1, 2, 0)))
        zero_d = jnp.zeros((n, B), M.dtype)
        G = factor_inv_lanes(M_t, zero_d, interpret=interp)
        G_b = jnp.transpose(G, (2, 0, 1))[:, :n, :n]
        # precision=HIGHEST: TPU f32 matmuls otherwise run reduced-precision
        # bf16 passes, which the IPM's conditioning cannot tolerate.
        return jnp.einsum("bki,bkj->bij", G_b, G_b,
                          preferred_element_type=M.dtype,
                          precision=jax.lax.Precision.HIGHEST)
    if use_pallas_kernels and not interp and B >= 8:
        # Beyond the lanes VMEM wall: blocked hybrid inverse — the XLA
        # fallback's serialized batched Cholesky was 47% of the whole
        # nz=512 solve (145 ms vs ~25 ms at m=512, B=512).
        from .hybrid import spd_inv_hybrid

        return spd_inv_hybrid(M)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype),
                           (M.shape[0], n, n))
    return cho_solve(cholesky(M), eye)


def uses_explicit_inverse(B: int, n: int, use_pallas_kernels: bool) -> bool:
    """Static predicate: does inverse-mode prefactorization represent
    Q^-1 explicitly (lanes regime) rather than as a blocked factor
    (hybrid regime)? Single source of truth for ``_q_rep``'s branch."""
    import jax

    from .pallas.lanes import lanes_supported

    interp = jax.default_backend() != "tpu"
    return not (use_pallas_kernels and not interp and B >= 8
                and not (lanes_supported(n, B) and B % 128 == 0))


def _q_rep(Q, use_pallas_kernels: bool):
    """Inverse-mode representation of Q^-1: (invQ, facQ), exactly one set.

    Lanes regime (nz within the VMEM wall): explicit inverse — every
    per-iteration application is one batched matvec. Beyond the wall
    (the hybrid regime): the blocked Cholesky factor — the cached
    products become multi-RHS blocked substitutions (pure GEMMs), and
    the explicit inverse's extra triangular inversion + full nz^3
    HIGHEST gram are never paid."""
    B, n = Q.shape[0], Q.shape[-1]
    if not uses_explicit_inverse(B, n, use_pallas_kernels):
        from .hybrid import factor_hybrid

        return None, factor_hybrid(Q)
    return _spd_inv(Q, use_pallas_kernels), None


def apply_invQ(factors: KKTFactors, v):
    """Q^-1 v for batched vectors under either inverse-mode representation."""
    if factors.invQ is not None:
        return bmv(factors.invQ, v)
    from .hybrid import solve_hybrid

    return solve_hybrid(factors.facQ, v)


def pre_factor_kkt(Q, G, A, *, inverse: bool = False,
                   use_pallas_kernels: bool = False) -> KKTFactors:
    """One-time factorizations, the Cholesky analog of batch.py:375-429.

    Q: (bQ, nz, nz) SPD; G: (bG, nineq, nz); A: (bA, neq, nz) or None.

    ``inverse=True`` builds explicit Q^-1 / S11^-1 (see KKTFactors); the
    Schur products then use plain GEMMs instead of triangular solves.
    """
    import jax

    GT = jnp.swapaxes(G, -1, -2)
    facQ = None
    if inverse:
        invQ, facQ = _q_rep(Q, use_pallas_kernels)
        if facQ is not None:
            from .hybrid import solve_hybrid_mat

            invQ_GT = solve_hybrid_mat(facQ, GT)
        else:
            invQ_GT = bmm(invQ, GT)
        L_Q = None
    else:
        invQ = None
        L_Q = cholesky(Q)
        invQ_GT = cho_solve(L_Q, GT)                # (b, nz, nineq)
    def _bmmT(XT, Y):
        """X @ Y computed from the already-materialized transpose XT: when
        X is a fused elementwise expression (equilibration's scaled G/A),
        using X directly as a dot operand would materialize a SECOND
        full-size copy — XT is the one transpose copy either way, so
        contract against it (dots take arbitrary contracting dims)."""
        if XT.shape[0] == Y.shape[0]:
            return jnp.einsum("bnm,bnk->bmk", XT, Y,
                              precision=jax.lax.Precision.HIGHEST)
        return bmm(jnp.swapaxes(XT, -1, -2), Y)  # mixed batch: rare

    G_invQ_GT = _bmmT(GT, invQ_GT)              # (b, nineq, nineq)

    if A is None:
        return KKTFactors(L_Q=L_Q, R=G_invQ_GT, L_S11=None, S21=None,
                          W=None, invQ=invQ, facQ=facQ,
                          invQ_GT=invQ_GT if inverse else None,
                          GiGT=G_invQ_GT if inverse else None)

    AT = jnp.swapaxes(A, -1, -2)
    if inverse:
        if facQ is not None:
            from .hybrid import solve_hybrid_mat

            invQ_AT = solve_hybrid_mat(facQ, AT)
        else:
            invQ_AT = bmm(invQ, AT)
    else:
        invQ_AT = cho_solve(L_Q, AT)
    # Same GT/AT reuse as above (no second materialization of scaled G/A).
    S11 = _bmmT(AT, invQ_AT)                        # (b, neq, neq) SPD
    S21 = _bmmT(GT, invQ_AT)                        # (b, nineq, neq)
    S21T = jnp.swapaxes(S21, -1, -2)
    if inverse:
        invS11 = _spd_inv(S11, use_pallas_kernels)
        W = bmm(invS11, S21T)
        L_S11 = None
    else:
        invS11 = None
        L_S11 = cholesky(S11)
        W = cho_solve(L_S11, S21T)                  # (b, neq, nineq)
    R = G_invQ_GT - bmm(S21, W)                     # (b, nineq, nineq)
    return KKTFactors(L_Q=L_Q, R=R, L_S11=L_S11, S21=S21, W=W,
                      invQ=invQ, facQ=facQ, invS11=invS11,
                      invQ_GT=invQ_GT if inverse else None,
                      invQ_AT=invQ_AT if inverse else None,
                      GiGT=G_invQ_GT if inverse else None,
                      S11=S11 if inverse else None)


def factor_kkt(factors: KKTFactors, d):
    """Complete the per-iteration factorization: Cholesky of
    ``T = R + diag(1/d)`` (analog of batch.py:435-470). d: (B, nineq) > 0.

    Returns L_T, (max(bR, B), nineq, nineq). Non-SPD lanes yield NaN factors
    which the IPM masks via best-iterate tracking.
    """
    return cholesky(add_diag(factors.R, 1.0 / d))


class KKTBackend(NamedTuple):
    """Injectable implementation of the per-iteration factor/solve pair."""

    #: One-time layout preparation of the cached factors for this backend
    #: (e.g. transpose R to the Pallas lanes layout). Called once per solve.
    prepare: object
    #: (R_prepared, d) -> per-iteration factor object of R + diag(1/d).
    factor: object
    #: (factor, v) -> solve (R + diag(1/d)) x = v for batch-major (B, m) v.
    solve2: object
    #: (R_prepared, d, v) -> (factor, x): fused per-iteration factor plus
    #: first solve (the Pallas lanes kernel solves while the factor is
    #: still in VMEM, saving one HBM round-trip of the factor).
    factor_solve: object
    #: (R_prepared, d, q, z) -> (factor, x) solving
    #: (R + diag(1/d)) x = q - R z — the R @ z matvec folded into the
    #: factor kernel where R is already resident (one fewer HBM pass).
    factor_solve_rz: object
    #: (invQ_GT, q, ip) -> loop-invariant operands for the fused
    #: whole-step kernel (lanes layout); None when unavailable.
    prepare_fused: object = None
    #: (R_prepared, iGT_prepared, x, s, z, q_t, ip_t, n_correctors) ->
    #: (x', s', z'): one full IPM iteration fused in a single kernel
    #: (neq == 0 only). None when unavailable.
    fused_step: object = None
    #: (factors, rb, q, ip) -> (eq operand tuple, q_t, ip_t) for the
    #: eq-constrained fused step.
    prepare_fused_eq: object = None
    #: (R_prepared, eq_ops, x, s, z, y, q_t, ip_t, n_correctors) ->
    #: (x', s', z', y'). None when unavailable.
    fused_step_eq: object = None
    #: (v, fill) -> backend-layout loop-invariant vector (e.g. the lanes
    #: (m, B) transpose of a (B, m) vector). None when unavailable.
    prepare_vec: object = None
    #: (R_prepared, s, z, q_t, n_correctors) -> (zeta, s', z', alpha):
    #: the x-free fused step (coefficient-tracked x, neq == 0 only;
    #: see core/pdipm.py). None when unavailable.
    fused_step_xfree: object = None


def xla_backend() -> KKTBackend:
    def factor(R, d):
        return cholesky(add_diag(R, 1.0 / d))

    def factor_solve(R, d, v):
        L = factor(R, d)
        return L, cho_solve_vec(L, v)

    def factor_solve_rz(R, d, q, z):
        # (R + D^-1) x = q - R z  substitutes w = x + z into
        # (R + D^-1) w = q + z/d: the full-matrix R z matvec (a complete
        # HBM pass over R on top of the factor's) becomes one elementwise
        # vector op.
        fac, w = factor_solve(R, d, q + z / d)
        return fac, w - z

    return KKTBackend(
        prepare=lambda f: f, factor=factor, solve2=cho_solve_vec,
        factor_solve=factor_solve, factor_solve_rz=factor_solve_rz)


def pallas_blocked_backend(interpret: bool | None = None) -> KKTBackend:
    """Batch-major blocked kernels (transposed Lt layout). Superseded by the
    lanes backend on TPU; kept for comparison and as a fallback."""
    from .pallas import cho_solve_vec_t_pallas, factor_kkt_t_pallas

    def factor(R, d):
        return factor_kkt_t_pallas(R, d, interpret=interpret)

    def solve2(Lt, v):
        return cho_solve_vec_t_pallas(Lt, v, interpret=interpret)

    def factor_solve(R, d, v):
        Lt = factor(R, d)
        return Lt, solve2(Lt, v)

    def factor_solve_rz(R, d, q, z):
        # Same w = x + z substitution as the XLA backend: no R z matvec.
        fac, w = factor_solve(R, d, q + z / d)
        return fac, w - z

    return KKTBackend(
        prepare=transpose_factors, factor=factor, solve2=solve2,
        factor_solve=factor_solve, factor_solve_rz=factor_solve_rz)


def pallas_lanes_backend(interpret: bool | None = None) -> KKTBackend:
    """Batch-in-lanes kernels: fused Cholesky + triangular inverse per
    iteration; every solve is two issue-bound matvec sweeps. The fastest
    TPU path (see ops/pallas/lanes.py)."""
    from .pallas import (factor_inv_lanes, factor_inv_solve_lanes,
                         inv_solve_lanes, pad_spd_lanes)
    from .pallas.lanes import factor_inv_solve_rz_lanes, pad_batch_lanes

    def _padded_B(B):
        # On hardware every lane-dim DMA (even a whole-array copy) must be
        # 128-aligned; interpret mode (CPU tests) is exempt and keeps
        # small batches cheap.
        if interpret:
            return B
        from .pallas.lanes import pad_up

        return pad_up(B, 128)

    def prepare(factors: KKTFactors) -> KKTFactors:
        R_t = pad_spd_lanes(jnp.transpose(factors.R, (1, 2, 0)))
        bR = R_t.shape[-1]
        Bp = _padded_B(bR)
        if bR > 1 and Bp != bR:
            R_t = jnp.pad(R_t, ((0, 0), (0, 0), (0, Bp - bR)))
        return factors._replace(R=R_t)

    def _pad_lanes(v_t, fill):
        B = v_t.shape[-1]
        Bp = _padded_B(B)
        if Bp == B:
            return v_t
        return jnp.pad(v_t, ((0, 0), (0, Bp - B)), constant_values=fill)

    def factor(R_t, d):
        # Padded lanes get dinv = 1 (SPD identity block; never read back).
        dinv_t = _pad_lanes(jnp.swapaxes(1.0 / d, 0, 1), 1.0)
        return factor_inv_lanes(R_t, dinv_t, interpret=interpret)

    def solve2(G, v):
        B = v.shape[0]
        x_t = inv_solve_lanes(G, _pad_lanes(jnp.swapaxes(v, 0, 1), 0.0),
                              interpret=interpret)
        return jnp.swapaxes(x_t[:, :B], 0, 1)

    def factor_solve(R_t, d, v):
        B = v.shape[0]
        dinv_t = _pad_lanes(jnp.swapaxes(1.0 / d, 0, 1), 1.0)
        G, x_t = factor_inv_solve_lanes(
            R_t, dinv_t, _pad_lanes(jnp.swapaxes(v, 0, 1), 0.0),
            interpret=interpret)
        return G, jnp.swapaxes(x_t[:, :B], 0, 1)

    def factor_solve_rz(R_t, d, q, z):
        B = q.shape[0]
        dinv_t = _pad_lanes(jnp.swapaxes(1.0 / d, 0, 1), 1.0)
        G, x_t = factor_inv_solve_rz_lanes(
            R_t, dinv_t, _pad_lanes(jnp.swapaxes(q, 0, 1), 0.0),
            _pad_lanes(jnp.swapaxes(z, 0, 1), 0.0),
            interpret=interpret)
        return G, jnp.swapaxes(x_t[:, :B], 0, 1)

    def prepare_fused(invQ_GT, q, ip):
        """Loop-invariant operands for ipm_step_lanes: invQ_GT (B, nz, m)
        to lanes layout (nz_p, m_p, Bp); q (B, m) / ip (B, nz) transposed
        and lane-padded."""
        from .pallas.lanes import pad_up as _pu

        t = jnp.transpose(invQ_GT, (1, 2, 0))
        nz, m, b = t.shape
        t = jnp.pad(t, ((0, _pu(nz) - nz), (0, _pu(m) - m),
                        (0, (_padded_B(b) - b) if b > 1 else 0)))
        q_t = _pad_lanes(jnp.swapaxes(q, 0, 1), 0.0)
        ip_t = _pad_lanes(jnp.swapaxes(ip, 0, 1), 0.0)
        return t, q_t, ip_t

    def fused_step(R_t, iGT_t, x, s, z, q_t, ip_t, n_correctors):
        from .pallas.lanes import ipm_step_lanes

        B = x.shape[0]
        x_t = _pad_lanes(jnp.swapaxes(x, 0, 1), 0.0)
        s_t = _pad_lanes(jnp.swapaxes(s, 0, 1), 1.0)
        z_t = _pad_lanes(jnp.swapaxes(z, 0, 1), 1.0)
        xo, so, zo, ao = ipm_step_lanes(R_t, iGT_t, x_t, s_t, z_t, q_t,
                                        ip_t, n_correctors=n_correctors,
                                        interpret=interpret)
        return (jnp.swapaxes(xo[:, :B], 0, 1),
                jnp.swapaxes(so[:, :B], 0, 1),
                jnp.swapaxes(zo[:, :B], 0, 1),
                ao[0, :B])

    def prepare_vec(v, fill=0.0):
        return _pad_lanes(jnp.swapaxes(v, 0, 1), fill)

    def fused_step_xfree(R_t, s, z, q_t, n_correctors):
        from .pallas.lanes import ipm_step_xfree_lanes

        B = s.shape[0]
        s_t = _pad_lanes(jnp.swapaxes(s, 0, 1), 1.0)
        z_t = _pad_lanes(jnp.swapaxes(z, 0, 1), 1.0)
        zt, so, zo, ao = ipm_step_xfree_lanes(
            R_t, s_t, z_t, q_t, n_correctors=n_correctors,
            interpret=interpret)
        return (jnp.swapaxes(zt[:, :B], 0, 1),
                jnp.swapaxes(so[:, :B], 0, 1),
                jnp.swapaxes(zo[:, :B], 0, 1),
                ao[0, :B])

    def _mat_lanes(Mb, rows_pad, cols_pad):
        """(b, r, c) batch-major -> (r_p, c_p, b_p) lanes layout."""
        from .pallas.lanes import pad_up as _pu

        t = jnp.transpose(Mb, (1, 2, 0))
        r, c, b = t.shape
        return jnp.pad(t, ((0, rows_pad - r), (0, cols_pad - c),
                           (0, (_padded_B(b) - b) if b > 1 else 0)))

    def prepare_fused_eq(factors: KKTFactors, rb, q, ip):
        from .pallas.lanes import pad_up as _pu

        nz, m = factors.invQ_GT.shape[1], factors.invQ_GT.shape[2]
        neq = factors.S21.shape[-1]
        nz_p, m_p, q_p = _pu(nz), _pu(m), _pu(neq)
        eq_ops = (
            _mat_lanes(factors.invQ_GT, nz_p, m_p),
            _mat_lanes(factors.S21, m_p, q_p),
            _mat_lanes(factors.W, q_p, m_p),
            _mat_lanes(factors.invS11, q_p, q_p),
            _mat_lanes(factors.S11, q_p, q_p),
            _mat_lanes(factors.invQ_AT, nz_p, q_p),
            _pad_lanes(jnp.swapaxes(rb, 0, 1), 0.0),
        )
        q_t = _pad_lanes(jnp.swapaxes(q, 0, 1), 0.0)
        ip_t = _pad_lanes(jnp.swapaxes(ip, 0, 1), 0.0)
        return eq_ops, q_t, ip_t

    def fused_step_eq(R_t, eq_ops, x, s, z, y, q_t, ip_t, n_correctors):
        from .pallas.lanes import ipm_step_eq_lanes

        iGT_t, S21_t, W_t, iS11_t, S11_t, iAT_t, rb_t = eq_ops
        B = x.shape[0]
        x_t = _pad_lanes(jnp.swapaxes(x, 0, 1), 0.0)
        s_t = _pad_lanes(jnp.swapaxes(s, 0, 1), 1.0)
        z_t = _pad_lanes(jnp.swapaxes(z, 0, 1), 1.0)
        y_t = _pad_lanes(jnp.swapaxes(y, 0, 1), 0.0)
        xo, so, zo, yo, ao = ipm_step_eq_lanes(
            R_t, iGT_t, S21_t, W_t, iS11_t, S11_t, iAT_t,
            x_t, s_t, z_t, y_t, q_t, ip_t, rb_t,
            n_correctors=n_correctors, interpret=interpret)
        return (jnp.swapaxes(xo[:, :B], 0, 1),
                jnp.swapaxes(so[:, :B], 0, 1),
                jnp.swapaxes(zo[:, :B], 0, 1),
                jnp.swapaxes(yo[:, :B], 0, 1),
                ao[0, :B])

    return KKTBackend(prepare=prepare, factor=factor, solve2=solve2,
                      factor_solve=factor_solve,
                      factor_solve_rz=factor_solve_rz,
                      prepare_fused=prepare_fused,
                      fused_step=fused_step,
                      prepare_fused_eq=prepare_fused_eq,
                      fused_step_eq=fused_step_eq,
                      prepare_vec=prepare_vec,
                      fused_step_xfree=fused_step_xfree)


def pallas_hw_ok() -> bool:
    """Whether Pallas kernels can actually be BUILT for the current
    backend: Mosaic cannot compile TPU kernels in 64-bit tracing mode
    (measured: the remote compile helper crashes under
    ``jax_enable_x64``, even for all-f32 kernels). Interpret mode (CPU
    tests) is unaffected. When this returns False on TPU every caller
    falls back to the XLA paths — slower, but correct; this is what
    makes ``SolverConfig.refine_steps`` (which requires x64) usable
    on-chip."""
    import jax

    return not (jax.default_backend() == "tpu"
                and jax.config.jax_enable_x64)


def resolve_backend(use_pallas, dtype=None, m=None, B=None) -> KKTBackend:
    """Map SolverConfig.use_pallas ("auto" | bool | "lanes" | "blocked" |
    "xla") to a backend. The Pallas kernels are float32-only; other dtypes
    (float64 CPU test runs, bf16 experiments) fall back to XLA, as do
    problem sizes whose working set exceeds VMEM (m beyond ~136) and
    x64-mode TPU runs (see pallas_hw_ok)."""
    import jax
    import numpy as np

    if use_pallas == "hybrid_xla":
        # Pallas-free blocked hybrid (the TP path) — usable under any
        # dtype/x64 state since it contains no pallas_call.
        from .hybrid import hybrid_backend

        return hybrid_backend(interpret=True)
    if dtype is not None and np.dtype(dtype) != np.float32:
        return xla_backend()
    if not pallas_hw_ok():
        return xla_backend()
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas == "auto":
        use_pallas = "lanes" if on_tpu else False
    elif use_pallas is True:
        use_pallas = "lanes"
    if use_pallas == "lanes" and m is not None and B is not None:
        from .pallas.lanes import lanes_supported

        if not lanes_supported(m, B):
            # Beyond the VMEM wall: hybrid blocked factorization (lanes
            # diagonal blocks + MXU trailing updates) instead of the
            # plain XLA fallback.
            from .hybrid import hybrid_backend

            return hybrid_backend(interpret=not on_tpu)
    if not use_pallas or use_pallas == "xla":
        return xla_backend()
    interpret = not on_tpu
    if use_pallas == "blocked":
        return pallas_blocked_backend(interpret=interpret)
    if use_pallas == "lanes":
        return pallas_lanes_backend(interpret=interpret)
    if use_pallas == "hybrid":
        from .hybrid import hybrid_backend

        return hybrid_backend(interpret=not on_tpu)
    raise ValueError(f"use_pallas: {use_pallas!r}")


def resolve_prefactor_modes(config, dtype=None) -> dict:
    """kwargs for pre_factor_kkt from (use_pallas, solve_method, dtype)."""
    import jax
    import numpy as np

    use_pallas = config.use_pallas
    if dtype is not None and np.dtype(dtype) != np.float32:
        use_pallas = False  # Pallas kernels are float32-only
    # x64-mode TPU: Mosaic cannot build kernels (pallas_hw_ok) — keep the
    # explicit-inverse representation (the fast cached-products path works
    # fine through XLA) but build it without Pallas.
    x64_tpu_fallback = (not pallas_hw_ok() and use_pallas
                        and (dtype is None
                             or np.dtype(dtype) == np.float32))
    if not pallas_hw_ok():
        use_pallas = False
    if use_pallas == "xla":
        use_pallas = False  # explicit XLA escape hatch: no Pallas anywhere
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    method = config.solve_method
    if method == "auto":
        inverse = bool(use_pallas) or bool(x64_tpu_fallback)
    else:
        inverse = method == "inverse"
    if use_pallas in (True, "lanes") and not inverse:
        raise ValueError(
            "the lanes Pallas backend applies Q/S11 via explicit inverses; "
            "solve_method='subst' requires use_pallas in (False, 'xla', "
            "'blocked')")
    # "hybrid_xla" (the TP path): inverse-mode cached products, but the
    # prefactor itself must stay pallas-free so GSPMD can partition it.
    kernels = bool(use_pallas) and use_pallas != "hybrid_xla"
    return dict(inverse=inverse, use_pallas_kernels=kernels)


def transpose_factors(factors: KKTFactors) -> KKTFactors:
    """Convert cached factors to the transposed (Lt) layout, once per solve.
    No-op for inverse-mode factors (matvec application is layout-free)."""
    return factors._replace(
        L_Q=(jnp.swapaxes(factors.L_Q, -1, -2)
             if factors.L_Q is not None else None),
        L_S11=(jnp.swapaxes(factors.L_S11, -1, -2)
               if factors.L_S11 is not None else None),
    )


def solve_kkt(factors: KKTFactors, L_T, d, G, A, rx, rs, rz, ry,
              solve2=cho_solve_vec):
    """Solve the reduced KKT system given cached factors + per-iteration L_T.

    Semantics identical to the reference's solve_kkt (batch.py:349-372):

        S [dy; dz] = -[ A Q^-1 rx - ry ;  G Q^-1 rx + rs/d - rz ]
        dx = Q^-1 (-rx - G^T dz - A^T dy)
        ds = (-rs - dz) / d

    but the Schur solve is the symmetric block form:
        u  = S11^-1 (-r1);  dz = T^-1 (-r2 - S21 u);  dy = u - W dz.

    rx: (B, nz); rs, rz: (B, nineq); ry: (B, neq).  Any of rx/rs/rz/ry may
    be ``None``, meaning *structurally zero* — the solve then skips the
    corresponding matvecs entirely (the IPM's corrector RHS is zero in
    every block but rs, batch.py:170-173, and the backward RHS is zero in
    every block but rx, qp.py:151-155; the reference pays full-size
    zero-matvecs for these, we don't).
    Returns (dx, ds, dz, dy) with dy None when neq == 0.

    ``solve2`` is the two-triangular-solve primitive; when a transposed
    (Pallas) backend is used, ``factors``/``L_T`` must already be in Lt
    layout (see transpose_factors). Inverse-mode factors apply Q^-1 / S11^-1
    as single matvecs instead.
    """
    rhs_T, u = prepare_rhs_kkt(factors, d, G, A, rx, rs, rz, ry,
                               solve2=solve2)
    dz = solve2(L_T, rhs_T)
    return backsub_kkt(factors, dz, u, d, G, A, rx, rs, solve2=solve2)


def _acc(*terms):
    terms = [t for t in terms if t is not None]
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _q_solvers(factors: KKTFactors, solve2):
    if factors.invQ is not None or factors.facQ is not None:
        return (lambda v: apply_invQ(factors, v),
                lambda v: bmv(factors.invS11, v))
    return (lambda v: solve2(factors.L_Q, v),
            lambda v: solve2(factors.L_S11, v))


def prepare_rhs_kkt(factors: KKTFactors, d, G, A, rx, rs, rz, ry,
                    solve2=cho_solve_vec):
    """Stage 1 of solve_kkt: everything up to (but excluding) the T-solve.
    Returns (rhs_T, u) where dz = T^-1 rhs_T and u is the S11 intermediate
    (None unless neq > 0 with a nonzero (rx, ry) block). Split out so the
    per-iteration factor and the first solve can run fused in one kernel
    (backend.factor_solve)."""
    solveQ, solveS11 = _q_solvers(factors, solve2)
    invQ_rx = solveQ(rx) if rx is not None else None        # (B, nz)
    r2 = _acc(bmv(G, invQ_rx) if invQ_rx is not None else None,
              rs / d if rs is not None else None,
              -rz if rz is not None else None)               # (B, nineq)
    u = None
    rhs_T = -r2
    if A is not None:
        r1 = _acc(bmv(A, invQ_rx) if invQ_rx is not None else None,
                  -ry if ry is not None else None)           # (B, neq)
        if r1 is not None:
            u = solveS11(-r1)                                # (B, neq)
            rhs_T = -r2 - bmv(factors.S21, u)
    return rhs_T, u


def backsub_kkt(factors: KKTFactors, dz, u, d, G, A, rx, rs,
                solve2=cho_solve_vec):
    """Stage 2 of solve_kkt: back-substitute (dx, ds, dy) from dz."""
    solveQ, _ = _q_solvers(factors, solve2)
    if A is None:
        dy = None
        g1 = _acc(-rx if rx is not None else None, -btmv(G, dz))
    else:
        dy = (u if u is not None else 0.0) - bmv(factors.W, dz)
        g1 = _acc(-rx if rx is not None else None, -btmv(G, dz),
                  -btmv(A, dy))
    dx = solveQ(g1)
    ds = (-rs - dz) / d if rs is not None else -dz / d
    return dx, ds, dz, dy


def factor_solve_kkt(Q, D, G, A, rx, rs, rz, ry):
    """Reference/baseline path: build the full saddle system fresh and do a
    textbook Schur solve (analog of batch.py:313-346, KKTSolvers.LU_FULL).

    D: (B, nineq, nineq) full matrix (as in the reference's tests) — the
    diagonal case is D = bdiag(d).
    """
    return _factor_solve_saddle(Q, D, G, A, rx, rs, rz, ry, reg_eps=0.0)


def _factor_solve_saddle(Q, D, G, A, rx, rs, rz, ry, reg_eps: float):
    """Shared core of factor_solve_kkt (reg_eps=0) and the regularized path
    factor_solve_kkt_reg (batch.py:273-310, S shifted by -eps*I; callers pass
    Q_tilde/D_tilde with +eps already added to the H blocks)."""
    nineq, nz = G.shape[-2], G.shape[-1]
    neq = A.shape[-2] if A is not None else 0
    B = max(x.shape[0] for x in (Q, D, G, rx, rs, rz) if x is not None)
    dtype = Q.dtype

    # H = blockdiag(Q, D); Abar = [[G, I], [A, 0]].
    H = jnp.zeros((max(Q.shape[0], D.shape[0]), nz + nineq, nz + nineq), dtype)
    H = H.at[:, :nz, :nz].add(Q)
    H = H.at[:, nz:, nz:].add(D)

    eye_m = jnp.eye(nineq, dtype=dtype)
    bG = G.shape[0]
    if neq > 0:
        bA = max(bG, A.shape[0])
        Abar = jnp.zeros((bA, nineq + neq, nz + nineq), dtype)
        Abar = Abar.at[:, :nineq, :nz].add(G)
        Abar = Abar.at[:, :nineq, nz:].add(eye_m)
        Abar = Abar.at[:, nineq:, :nz].add(A)
        hvec = jnp.concatenate(
            [jnp.broadcast_to(rz, (B, nineq)), jnp.broadcast_to(ry, (B, neq))],
            axis=1,
        )
    else:
        Abar = jnp.zeros((bG, nineq, nz + nineq), dtype)
        Abar = Abar.at[:, :, :nz].add(G)
        Abar = Abar.at[:, :, nz:].add(eye_m)
        hvec = rz

    g = jnp.concatenate(
        [jnp.broadcast_to(rx, (B, nz)), jnp.broadcast_to(rs, (B, nineq))],
        axis=1,
    )

    AbarT = jnp.swapaxes(Abar, -1, -2)
    invH_AT = lu_solve_general(H, AbarT)            # (b, nz+m, m+p)
    invH_g = lu_solve_general(H, g)                 # (B, nz+m)
    S = bmm(Abar, invH_AT)
    if reg_eps:
        S = add_diag(S, jnp.full(S.shape[:1] + S.shape[-1:], -reg_eps,
                                 dtype=dtype))
    t = bmv(Abar, invH_g) - hvec
    w = lu_solve_general(S, -t)                     # (B, m+p) = [dz; dy]
    v = lu_solve_general(H, -g - btmv(Abar, w))

    dx, ds = v[:, :nz], v[:, nz:]
    dz = w[:, :nineq]
    dy = w[:, nineq:] if neq > 0 else None
    return dx, ds, dz, dy


def kkt_resid_reg(Q, D, G, A, eps, dx, ds, dz, dy, rx, rs, rz, ry):
    """Residual of the eps-regularized KKT system (batch.py:228-241)."""
    resx = bmv(Q, dx) + btmv(G, dz) + rx
    if dy is not None:
        resx = resx + btmv(A, dy)
    ress = bmv(D, ds) + dz + rs
    resz = bmv(G, dx) + ds - eps * dz + rz
    resy = bmv(A, dx) - eps * dy + ry if dy is not None else None
    return resx, ress, resz, resy


def solve_kkt_ir(Q, D, G, A, rx, rs, rz, ry, eps: float = 1e-7,
                 niter: int = 1):
    """Regularized saddle solve + iterative refinement (batch.py:244-270,
    KKTSolvers.IR_UNOPT; the fix referenced by qpth issue #6)."""
    nz = Q.shape[-1]
    nineq = G.shape[-2]
    Q_t = add_diag(Q, jnp.full(Q.shape[:1] + (nz,), eps, Q.dtype))
    D_t = add_diag(D, jnp.full(D.shape[:1] + (nineq,), eps, D.dtype))

    dx, ds, dz, dy = _factor_solve_saddle(Q_t, D_t, G, A, rx, rs, rz, ry,
                                          reg_eps=eps)
    for _ in range(niter):
        resx, ress, resz, resy = kkt_resid_reg(
            Q, D, G, A, eps, dx, ds, dz, dy, rx, rs, rz, ry)
        ddx, dds, ddz, ddy = _factor_solve_saddle(
            Q_t, D_t, G, A, -resx, -ress, -resz,
            -resy if resy is not None else None, reg_eps=eps)
        dx, ds, dz = dx + ddx, ds + dds, dz + ddz
        dy = dy + ddy if dy is not None else None
    return dx, ds, dz, dy


def kkt_residuals(Q, p, G, h, A, b, x, s, z, y):
    """Raw KKT residuals of a candidate primal-dual point (batch.py:94-102):

        rx = Q x + p + G^T z (+ A^T y)   (stationarity)
        rz = G x + s - h                  (primal ineq)
        ry = A x - b                      (primal eq; None when neq == 0)
        mu = |<s, z>| / nineq             (complementarity measure)
    """
    nineq = G.shape[-2]
    rx = bmv(Q, x) + p + btmv(G, z)
    if A is not None:
        rx = rx + btmv(A, y)
        ry = bmv(A, x) - b
    else:
        ry = None
    rz = bmv(G, x) + s - h
    mu = jnp.abs((s * z).sum(axis=-1) / nineq)
    return rx, rz, ry, mu
