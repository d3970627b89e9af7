"""Differentiable batched QP layer — the ``QPFunction`` analog.

Solves, for every element of a batch simultaneously,

    z* = argmin_z 1/2 z^T Q z + p^T z   s.t.  G z <= h,  A z = b

(problem statement mirrors ``/root/reference/qpth/qp.py:32-42``) and exposes
exact gradients to all six parameters via implicit differentiation of the KKT
conditions at the solution — one extra solve against the cached KKT
factorization, no unrolling (reference backward: qp.py:127-182).

TPU-native shape/batching contract (matching qp.py:48-71):
  Q: (B, nz, nz) or (nz, nz)        p: (B, nz) or (nz,)
  G: (B, nineq, nz) or (nineq, nz)  h: (B, nineq) or (nineq,)
  A: (B, neq, nz), (neq, nz), None, or a zero-sized array
  b: (B, neq), (neq,), None, or a zero-sized array

Unbatched parameters are *not* materialized at batch size (contrast
util.py:44-50): matrices keep batch dim 1 so shared problems are factored
once, and batched matvecs against shared matrices lower to MXU GEMMs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import scaling as scaling_mod
from .config import (KKTSolver, QPSolution, QPSolvers, SolverConfig,
                     SolveStats)
from .core import pdipm
from .ops import kkt as kkt_ops
from .ops.linalg import spd_check_eager
from .utils import as_batched, bger, extract_nbatch, normalize_constraints

DEFAULT_CONFIG = SolverConfig()


# ---------------------------------------------------------------------------
# Canonical batching
# ---------------------------------------------------------------------------

def _canonicalize(Q, p, G, h, A, b):
    """Bring params to canonical batched form: matrices at minimal batch
    (1 when shared), vectors broadcast to the full batch.

    All ops used here ([None] indexing, broadcast_to) are differentiable, so
    cotangents of the canonical arrays flow back to the user's original
    shapes with the correct (sum) reduction semantics.
    """
    A, b = normalize_constraints(A, b)
    B = extract_nbatch(Q, p, G, h, A, b)
    Qb, _ = as_batched(Q, 3)
    Gb, _ = as_batched(G, 3)
    Ab, _ = as_batched(A, 3) if A is not None else (None, False)

    pb, p_unb = as_batched(p, 2)
    hb, h_unb = as_batched(h, 2)
    pb = jnp.broadcast_to(pb, (B,) + pb.shape[1:])
    hb = jnp.broadcast_to(hb, (B,) + hb.shape[1:])
    if A is not None:
        bb, b_unb = as_batched(b, 2)
        bb = jnp.broadcast_to(bb, (B,) + bb.shape[1:])
    else:
        bb, b_unb = None, False
    meta = (B, p_unb, h_unb, b_unb)
    return Qb, pb, Gb, hb, Ab, bb, meta


# ---------------------------------------------------------------------------
# Forward paths
# ---------------------------------------------------------------------------

def _build_factors(Qb, Gb, Ab, config: SolverConfig) -> kkt_ops.KKTFactors:
    """One-time prefactorization, optionally Ruiz-equilibrated first
    (scaling.py). ``factors.scaling`` records the coordinates the factors
    live in and ``factors.sem_scaling`` the Ruiz scalings themselves, so
    repeated solves and the backward pass transform consistently.

    ``equilibrate="auto"`` probes the data (ruiz_scalings' ``probe``):
    well-scaled problems take the LIGHT branch — the factors (and hence
    the IPM iterates) stay in ORIGINAL coordinates, zero matrix-scaling
    work, with equilibration's entire effect delivered through
    sem_scaling's vector-space semantics in the solver (see pdipm.solve)
    — so the common case pays ~one |Q|/|G| probe read. Badly-scaled
    problems take the classic scale-the-inputs branch (over/underflow
    protection), where factor coordinates == semantic coordinates."""
    modes = kkt_ops.resolve_prefactor_modes(config, Qb.dtype)
    if scaling_mod.resolve_equilibrate(config, Qb.dtype):
        probe = config.equilibrate == "auto"
        sc, ok = scaling_mod.ruiz_scalings(
            Qb, Gb, Ab, iters=config.ruiz_iters,
            axis_name=config.axis_name, probe=probe, return_ok=True)

        def scaled_prefactor(_):
            return kkt_ops.pre_factor_kkt(
                scaling_mod.scale_Q(Qb, sc), scaling_mod.scale_G(Gb, sc),
                scaling_mod.scale_A(Ab, sc), **modes)

        if not probe:
            return scaled_prefactor(None)._replace(scaling=sc,
                                                   sem_scaling=sc)

        # Probe-positive fast path: prefactor the ORIGINAL matrices —
        # zero matrix scaling work of any kind. For pow2 scalings the
        # whole factorization chain is exactly scale-covariant, so
        # equilibration's entire numerical effect lives in the solver's
        # VECTOR-space behaviors (init shift, clamps, selection scoring);
        # those read sem_scaling, while the iterate coordinates
        # (factors.scaling) stay identity. Probe-negative data takes the
        # scale-inputs-first branch (over/underflow protection), where
        # iterate coordinates == semantic coordinates. The runtime
        # executes only the taken branch of the cond.
        def light_prefactor(_):
            return kkt_ops.pre_factor_kkt(Qb, Gb, Ab, **modes)

        import jax

        f = jax.lax.cond(ok, light_prefactor, scaled_prefactor, None)
        fac_sc = scaling_mod.select_scaling(
            ok, scaling_mod.identity_like(sc), sc)
        return f._replace(scaling=fac_sc, sem_scaling=sc)
    return kkt_ops.pre_factor_kkt(Qb, Gb, Ab, **modes)


def _forward_batched(Qb, pb, Gb, hb, Ab, bb, config: SolverConfig,
                     init=None, factors=None):
    """Forward solve on canonically-batched params.

    Returns ``(solution, factors)`` where ``factors`` is the one-time
    KKT pre-factorization actually used (None for the oracle path) — the
    caller shares it with the backward pass and/or across receding-horizon
    re-solves instead of recomputing it (the reference caches Q_LU/S_LU/R
    on ctx, qp.py:93).
    """
    if config.check_Q_spd:
        spd_check_eager(Qb)
    if Gb.shape[-2] == 0:
        raise ValueError(
            "nineq == 0 reached the IPM path; call solve_qp / solve_qp_full "
            "(which dispatch to the closed-form equality solver) or "
            "solve_qp_eq directly.")
    if config.solver == QPSolvers.PDIPM_BATCHED:
        if factors is None:
            factors = _build_factors(Qb, Gb, Ab, config)
        # pdipm.solve handles equilibration internally (factors.scaling):
        # it iterates in scaled coordinates but reads the ORIGINAL
        # matrices for residual scoring and returns the solution, duals,
        # and stats in original coordinates — scaled matrix copies never
        # materialize. The power-of-two scalings make every coordinate
        # transform exact in floating point.
        return pdipm.solve(Qb, pb, Gb, hb, Ab, bb, factors, config,
                           init=init), factors
    if config.solver == QPSolvers.CPU_ORACLE:
        return _oracle_forward(Qb, pb, Gb, hb, Ab, bb), None
    raise ValueError(config.solver)


def _oracle_forward(Qb, pb, Gb, hb, Ab, bb) -> QPSolution:
    """Per-instance float64 CPU solve through a host callback — the analog
    of the reference's CVXPY loop (qp.py:97-120). Uses the native C++
    oracle when it builds, else the numpy one."""
    from . import native
    from .solvers.oracle import solve_qp_batch_np

    B, n = pb.shape
    m = hb.shape[1]
    neq = Ab.shape[1] if Ab is not None else 0
    dt = pb.dtype
    solve = (native.solve_qp_batch_native if native.is_available()
             else solve_qp_batch_np)

    def cb(Q, p, G, h, A=None, b=None):
        x, nu, lam, s = solve(Q, p, G, h, A, b)
        return (x.astype(dt), nu.astype(dt), lam.astype(dt), s.astype(dt))

    out_shape = (
        jax.ShapeDtypeStruct((B, n), dt),
        jax.ShapeDtypeStruct((B, neq), dt),
        jax.ShapeDtypeStruct((B, m), dt),
        jax.ShapeDtypeStruct((B, m), dt),
    )
    args = (Qb, pb, Gb, hb) + ((Ab, bb) if Ab is not None else ())
    x, nu, lam, s = jax.pure_callback(cb, out_shape, *args)
    stats = SolveStats(
        iterations=jnp.zeros((), jnp.int32),
        best_resids=jnp.zeros((B,), dt),
        mu=jnp.zeros((B,), dt),
        converged=jnp.ones((B,), bool),
    )
    return QPSolution(z=x, nu=nu, lam=lam, s=s, stats=stats)


# ---------------------------------------------------------------------------
# custom_vjp: implicit differentiation of the KKT conditions
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _qp_core(Qb, pb, Gb, hb, Ab, bb, init, cached_factors,
             config: SolverConfig, meta):
    return _forward_batched(Qb, pb, Gb, hb, Ab, bb, config, init=init,
                            factors=cached_factors)[0].z


def _qp_fwd(Qb, pb, Gb, hb, Ab, bb, init, cached_factors,
            config: SolverConfig, meta):
    sol, factors = _forward_batched(Qb, pb, Gb, hb, Ab, bb, config,
                                    init=init, factors=cached_factors)
    if not (config.save_factors_for_backward
            and config.solver == QPSolvers.PDIPM_BATCHED):
        factors = None
    res = (sol.z, sol.lam, sol.s, sol.nu, Qb, Gb, Ab, factors, init,
           cached_factors)
    return sol.z, res


def _qp_bwd(config: SolverConfig, meta, res, dl_dz):
    """One extra KKT solve on the cached factorization (qp.py:127-182).

    The warm start carries no gradient: by the implicit-function theorem the
    solution (hence its vjp) is independent of the IPM's starting point.
    """
    zhat, lam, s, nu, Qb, Gb, Ab, factors, init, cached_factors = res
    # meta's B is the *global* batch (used only for the bug-compat mean
    # scaling); local shapes come from the cotangent — under shard_map the
    # local batch is B / num_shards.
    B_global, p_unb, h_unb, b_unb = meta
    B = dl_dz.shape[0]
    neq = Ab.shape[-2] if Ab is not None else 0
    nineq = Gb.shape[-2]
    dt = Qb.dtype
    if dl_dz.dtype != dt:
        # Refined forwards under x64 return a float64 solution from
        # float32 data; the implicit-KKT backward runs in the cached
        # factors' working dtype and must return cotangents in the
        # primals' dtype either way.
        dl_dz = dl_dz.astype(dt)
        zhat, lam, s = (v.astype(dt) for v in (zhat, lam, s))
        nu = nu.astype(dt) if nu is not None else None

    if factors is None:
        factors = _build_factors(Qb, Gb, Ab, config)

    # Numerical-safety clamp reproducing qp.py:145-148.
    c = config.grad_clamp
    d = jnp.maximum(lam, c) / jnp.maximum(s, c)

    # Equilibrated factors solve the SCALED KKT system: transform the
    # cotangent and the complementarity diagonal in, the directions out
    # (mappings derived in scaling.py's module docstring).
    sc = factors.scaling
    if sc is not None:
        d = d * (sc.c / (sc.RG * sc.RG))
        dl_dz = dl_dz * (sc.c * sc.E)
        # Scaled G/A recomputed as fusable elementwise expressions (only
        # the substitution-mode path below ever reads them; inverse mode
        # touches no matrices in the backward).
        Gb = scaling_mod.scale_G(Gb, sc)
        Ab = scaling_mod.scale_A(Ab, sc)

    backend = kkt_ops.resolve_backend(config.use_pallas, dt,
                                      m=nineq, B=B)
    solver_factors = backend.prepare(factors)
    # Backward RHS is (dl/dz, 0, 0, 0) — qp.py:151-155; the zero blocks are
    # structural, so their matvecs are skipped entirely, and the one KKT
    # solve runs fused with the factor completion.
    if factors.invQ_GT is not None:
        # Inverse-mode fast path (mirrors pdipm.solve's): the RHS and
        # backsub matvecs fold into the cached Q^-1 G^T / Q^-1 A^T
        # products — G and A are never read in the backward.
        fs = factors
        iQ_dl = kkt_ops.apply_invQ(fs, dl_dz)
        r2 = kkt_ops.btmv(fs.invQ_GT, dl_dz)          # G Q^-1 dl
        if neq > 0:
            r1 = kkt_ops.btmv(fs.invQ_AT, dl_dz)      # A Q^-1 dl
            u = kkt_ops.bmv(fs.invS11, -r1)
            rhs_T = -r2 - kkt_ops.bmv(fs.S21, u)
        else:
            u = None
            rhs_T = -r2
        _, dlam = backend.factor_solve(solver_factors.R, d, rhs_T)
        dnu = (u - kkt_ops.bmv(fs.W, dlam)) if neq > 0 else None
        dx = -iQ_dl - kkt_ops.bmv(fs.invQ_GT, dlam)
        if neq > 0:
            dx = dx - kkt_ops.bmv(fs.invQ_AT, dnu)
    else:
        rhs_T, u = kkt_ops.prepare_rhs_kkt(
            solver_factors, d, Gb, Ab, dl_dz, None, None, None,
            solve2=backend.solve2)
        _, dz_sol = backend.factor_solve(solver_factors.R, d, rhs_T)
        dx, _, dlam, dnu = kkt_ops.backsub_kkt(
            solver_factors, dz_sol, u, d, Gb, Ab, dl_dz, None,
            solve2=backend.solve2)

    if sc is not None:
        dx = dx * sc.E
        dlam = dlam * (sc.RG / sc.c)
        if neq > 0:
            dnu = dnu * (sc.RA / sc.c)

    # Gradient assembly (qp.py:157-177).
    dQ = 0.5 * (bger(dx, zhat) + bger(zhat, dx))
    dp = dx
    dG = bger(dlam, zhat) + bger(lam, dx)
    dh = -dlam
    if neq > 0:
        dA = bger(dnu, zhat) + bger(nu, dx)
        db = -dnu
    else:
        dA = db = None

    mean_mode = config.broadcast_grad_reduction == "mean"

    def reduce_mat(g, canon_batch):
        if g is None:
            return None
        if canon_batch == 1 and B > 1:
            g = g.sum(axis=0, keepdims=True)
            if mean_mode:
                g = g / B_global
        return g

    def reduce_vec(g, was_unbatched):
        # broadcast_to's own vjp performs the sum; only the bug-compat mean
        # mode needs a correction here.
        if g is not None and mean_mode and was_unbatched and B_global > 1:
            return g / B_global
        return g

    dQ = reduce_mat(dQ, Qb.shape[0])
    dG = reduce_mat(dG, Gb.shape[0])
    dA = reduce_mat(dA, Ab.shape[0] if Ab is not None else 1)
    dp = reduce_vec(dp, p_unb)
    dh = reduce_vec(dh, h_unb)
    db = reduce_vec(db, b_unb)

    d_init = (None if init is None
              else jax.tree_util.tree_map(jnp.zeros_like, init))
    # Cached factors are a solution operator, not an independent input:
    # gradients w.r.t. (Q, G, A) already flow through the implicit-KKT
    # formulas above, so their cotangent is structurally zero.
    d_cached = (None if cached_factors is None
                else jax.tree_util.tree_map(jnp.zeros_like, cached_factors))
    return (dQ, dp, dG, dh, dA, db, d_init, d_cached)


_qp_core.defvjp(_qp_fwd, _qp_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def solve_qp(Q, p, G, h, A=None, b=None,
             config: SolverConfig = DEFAULT_CONFIG, init=None,
             factors=None):
    """Differentiable batched QP solve; returns z* of shape (B, nz).

    Gradients flow to all six parameters. Parameters passed without a batch
    dimension receive summed (or, with
    ``config.broadcast_grad_reduction='mean'``, qpth-compatible averaged)
    cotangents.

    ``init``: optional warm start (x, s, z, y) with full-batch shapes
    (y may be None); carries no gradient (implicit-function theorem).

    ``factors``: optional cached :func:`prefactor_qp` result for repeated
    solves with fixed (Q, G, A) — skips the one-time pre-factorization
    (receding-horizon MPC re-solves change only p/h/b). Carries no
    gradient itself; (Q, G, A) gradients stay exact.

    ``nineq == 0`` (G/h None or zero-sized, the reference's empty-tensor
    convention) dispatches to the closed-form equality solver
    :func:`solve_qp_eq` — the case the reference rejects outright
    (qp.py:89). That path is differentiable via plain autodiff.
    """
    G, h = normalize_constraints(G, h)
    if G is None:
        return solve_qp_eq(Q, p, A, b)
    Qb, pb, Gb, hb, Ab, bb, meta = _canonicalize(Q, p, G, h, A, b)
    return _qp_core(Qb, pb, Gb, hb, Ab, bb, init, factors, config, meta)


def solve_qp_full(Q, p, G, h, A=None, b=None,
                  config: SolverConfig = DEFAULT_CONFIG,
                  init=None, factors=None) -> QPSolution:
    """Forward-only solve returning the full primal-dual solution and
    ``SolveStats`` (the jit-friendly replacement for the reference's prints).
    Not differentiable — use :func:`solve_qp` for gradients. Supports the
    same warm start as :func:`solve_qp` (pass the previous QPSolution's
    (z, s, lam, nu) as (x, s, z, y) for receding-horizon workloads) and the
    same cached ``factors`` (see :func:`prefactor_qp`).

    ``nineq == 0`` dispatches to the closed-form equality solver; the
    returned ``lam``/``s`` are zero-width and stats report convergence."""
    G, h = normalize_constraints(G, h)
    if G is None:
        x, y = _solve_qp_eq_core(Q, p, A, b)
        B = x.shape[0]
        dt = x.dtype
        stats = SolveStats(iterations=jnp.ones((), jnp.int32),
                           best_resids=jnp.zeros((B,), dt),
                           mu=jnp.zeros((B,), dt),
                           converged=jnp.ones((B,), bool))
        return QPSolution(z=x, nu=y, lam=jnp.zeros((B, 0), dt),
                          s=jnp.zeros((B, 0), dt), stats=stats)
    Qb, pb, Gb, hb, Ab, bb, _ = _canonicalize(Q, p, G, h, A, b)
    return _forward_batched(Qb, pb, Gb, hb, Ab, bb, config, init=init,
                            factors=factors)[0]


def prefactor_qp(Q, G, A=None, config: SolverConfig = DEFAULT_CONFIG):
    """One-time KKT pre-factorization of fixed (Q, G, A) for repeated
    solves (``factors=`` of :func:`solve_qp` / :func:`solve_qp_full`).

    The factorization-as-cached-artifact contract of the reference
    (Q_LU/S_LU/R on ctx, qp.py:93) promoted to a user-facing API: in a
    receding-horizon MPC loop only p/h/b change between steps, so the
    prefactor (the dominant one-time cost, ~11 ms of a ~53 ms batch-4096
    solve) is paid once instead of per step. The result is a pytree —
    jit/vmap/donate friendly.

    The ``config`` must match the one later passed to the solve (it fixes
    the inverse/substitution factor representation).
    """
    A, _ = normalize_constraints(A, A)
    Qb, _ = as_batched(Q, 3)
    Gb, _ = as_batched(G, 3)
    Ab = as_batched(A, 3)[0] if A is not None else None
    return _build_factors(Qb, Gb, Ab, config)


def solve_qp_eq(Q, p, A=None, b=None):
    """Equality-constrained (or unconstrained) batched QP:

        min_x 1/2 x^T Q x + p^T x   s.t.  A x = b

    solved in closed form via the Schur complement of the saddle system
    (one Cholesky of Q + one of A Q^-1 A^T — no IPM iterations).
    Fully differentiable through plain autodiff (no custom_vjp needed:
    the solution is a smooth function of the parameters).

    The reference rejects nineq == 0 outright (qp.py:89); this completes
    the API for the no-inequality case. Returns x of shape (B, nz).
    """
    return _solve_qp_eq_core(Q, p, A, b)[0]


def _solve_qp_eq_core(Q, p, A=None, b=None):
    """Closed-form equality-constrained solve returning (x, y) with y the
    equality duals ((B, 0) when A is None)."""
    A, b = normalize_constraints(A, b)
    B = extract_nbatch(Q, p, None, None, A, b)
    Qb, _ = as_batched(Q, 3)
    pb, _ = as_batched(p, 2)
    pb = jnp.broadcast_to(pb, (B,) + pb.shape[1:])
    from .ops.linalg import bmv, btmv, cho_solve, cho_solve_vec, cholesky

    L_Q = cholesky(Qb)
    if A is None:
        x = cho_solve_vec(L_Q, -pb)
        return x, jnp.zeros((B, 0), x.dtype)
    Ab, _ = as_batched(A, 3)
    bb, _ = as_batched(b, 2)
    bb = jnp.broadcast_to(bb, (B,) + bb.shape[1:])
    AT = jnp.swapaxes(Ab, -1, -2)
    invQ_AT = cho_solve(L_Q, AT)
    S11 = jnp.matmul(Ab, invQ_AT, precision=jax.lax.Precision.HIGHEST)
    L_S = cholesky(S11)
    iQp = cho_solve_vec(L_Q, pb)
    y = -cho_solve_vec(L_S, bb + bmv(Ab, iQp))
    y = jnp.broadcast_to(y, (B,) + y.shape[1:])
    x = cho_solve_vec(L_Q, -pb - btmv(Ab, y))
    return x, y


def QPFunction(eps: float = 1e-12, verbose: int = 0,
               notImprovedLim: int = 3, maxIter: int = 20,
               solver: QPSolvers = QPSolvers.PDIPM_BATCHED,
               check_Q_spd: bool = True, **kwargs):
    """Drop-in analog of the reference factory (qp.py:18-20).

    Returns a callable ``fn(Q, p, G, h, A=None, b=None) -> z`` that is fully
    differentiable and composes with jit/vmap/grad. Empty constraints follow
    the reference convention: pass None or a zero-sized array (qp.py:58-61).

    Extra keyword arguments are forwarded to :class:`SolverConfig` (e.g.
    ``kkt_solver=KKTSolver.IR``, ``broadcast_grad_reduction='mean'``).
    """
    config = SolverConfig(
        eps=eps, verbose=verbose, not_improved_lim=notImprovedLim,
        max_iter=maxIter, solver=solver, check_Q_spd=check_Q_spd, **kwargs)

    def fn(Q, p, G, h, A=None, b=None):
        return solve_qp(Q, p, G, h, A, b, config=config)

    return fn
