"""Batched Mehrotra predictor-corrector primal-dual interior-point method.

TPU-native re-design of the reference's production forward solver
(``/root/reference/qpth/solvers/pdipm/batch.py:47-207``).  Semantics kept:

* init solve with d = 1 and RHS (p, 0, -h, -b), then per-lane shift so
  s >= 1 and z >= 1 (batch.py:61-87);
* per-iteration residuals, duality measure mu, and the scalar score
  ``resids = |ry| + |rz| + |rx| + nineq * mu`` (batch.py:94-107);
* element-wise best-iterate tracking — the returned solution is the best
  scored iterate, not the last (batch.py:118-139);
* termination when no lane improved for ``not_improved_lim`` consecutive
  iterations, or max(resids) < eps, or min(mu) > 1e32, or max_iter
  (batch.py:140);
* Mehrotra predictor / step-to-boundary / cubic centering sigma / corrector
  / combined 0.999 step (batch.py:145-203).

Artifacts discarded: Python-driven iteration with per-iteration host syncs
(batch.py:127,140) becomes a ``lax.while_loop`` whose termination predicate
is a batch reduction (an all-reduce when the batch is sharded over a mesh);
in-place tensor surgery becomes functional updates; prints become returned
``SolveStats``; factorization failure becomes per-lane NaN masking instead of
a try/except bail-out (batch.py:110-113) — a stuck lane keeps its best
iterate while healthy lanes continue.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import KKTSolver, QPSolution, SolverConfig, SolveStats
from ..ops import kkt as kkt_ops
from ..utils import bdiag


def _runtime_supports_callbacks() -> bool:
    """Whether jax.debug.print works on the default backend (the axon
    PJRT tunnel rejects host send/recv callbacks entirely)."""
    try:
        return "axon" not in jax.devices()[0].client.platform_version
    except Exception:
        return True


def _greduce(val, op, axis_name):
    """Finish a batch reduction globally when running under shard_map."""
    if axis_name is None:
        return val
    if op == "max":
        return lax.pmax(val, axis_name)
    if op == "min":
        return lax.pmin(val, axis_name)
    if op == "sum":
        return lax.psum(val, axis_name)
    raise ValueError(op)


def _step_to_boundary(v, dv):
    """Per-lane max alpha in [0, inf) with v + alpha*dv >= 0 boundary.

    Reference ``get_step`` (batch.py:210-213): a = -v/dv over decreasing
    coordinates, min over the lane. Non-decreasing coordinates never bind.
    """
    big = jnp.asarray(jnp.inf, v.dtype)
    a = jnp.where(dv < 0, -v / dv, big)
    return a.min(axis=-1)


class _IPMState(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray          # (B, neq); zero-width when neq == 0
    best_x: jnp.ndarray
    best_s: jnp.ndarray
    best_z: jnp.ndarray
    best_y: jnp.ndarray
    best_resids: jnp.ndarray
    best_resids_o: jnp.ndarray    # (B,) original-coordinate score (fold mode)
    mu: jnp.ndarray
    n_not_improved: jnp.ndarray   # scalar int32 (global mode) / (B,) int32
    lane_done: jnp.ndarray        # (B,) bool; latched (per-lane mode only)
    it: jnp.ndarray               # scalar int32
    done: jnp.ndarray             # scalar bool
    pri: jnp.ndarray              # (B,) tracked primal-residual norm
    dual: jnp.ndarray             # (B,) tracked dual-residual norm
    reg: jnp.ndarray              # (B,) adaptive per-lane T-shift (0 = off)


def _refine_dw(final, Q, p, G, h, A, b, neq, nineq, B, dtype,
               kkt_factor_solve, kkt_solve, config: SolverConfig,
               maps=None, steps: int = 0, early_exit: bool = False):
    """Pure-float32 mixed-precision refinement via double-word arithmetic
    (ops/dw.py): the x64-free twin of :func:`_refine`, so accuracy mode
    runs ON TPU with the Pallas kernels live (Mosaic cannot compile under
    ``jax_enable_x64``; ops/kkt.py::pallas_hw_ok).

    Residuals are evaluated with compensated (two-float, ~2^-48) matvecs
    and the iterate is accumulated as a double-word pair; every
    factorization/solve stays plain f32. Returns ``(final, lo)`` where
    ``lo`` holds the iterate low words — a single f32 word cannot even
    represent a 1e-8-accurate solution (eps_f32 ~ 1.2e-7), so the exact
    refined solution is (hi + lo).

    ``maps`` (equilibration): (m_x, m_s, m_z, m_y, w_rx, w_rz, w_ry, c)
    pow2 coordinate maps. Iterates/solves stay in SCALED coordinates, but
    residuals and scores are of the ORIGINAL problem: the dw iterate maps
    to original by exact pow2 multiplies, the matvecs read the original
    matrices, and the solve RHS maps back by rx~ = w_rx rx (exact) — so
    the refined fixed point is the ORIGINAL problem's solution to dw
    precision, and the reported score needs no separate rescore.
    """
    from ..ops import dw

    if maps is not None:
        m_x, m_s, m_z, m_y, w_rx, w_rz, w_ry, _ = maps

    def score_dw(x, s, z, y):
        """ORIGINAL-problem KKT residuals of a (scaled) double-word
        iterate; norms/mu in f32 from the hi words (the dw matvec's hi
        word IS the true residual to 2^-24 relative — the cancellation
        happened in exact arithmetic)."""
        if maps is not None:
            x = dw.dw_mul_pow2(x, m_x)
            s = dw.dw_mul_pow2(s, m_s)
            z = dw.dw_mul_pow2(z, m_z)
            if neq > 0:
                y = dw.dw_mul_pow2(y, m_y)
        rx = dw.dw_add_dw(dw.dw_mv(Q, x), dw.dw_mtv(G, z))
        rx = dw.dw_add_f32(rx, p)
        if neq > 0:
            rx = dw.dw_add_dw(rx, dw.dw_mtv(A, y))
            ry = dw.dw_add_f32(dw.dw_mv(A, x), -b)
            pri_y = jnp.linalg.norm(ry.hi, axis=-1)
        else:
            ry = None
            pri_y = jnp.zeros((B,), dtype)
        rz = dw.dw_add_dw(dw.dw_mv(G, x), s)
        rz = dw.dw_add_f32(rz, -h)
        mu = jnp.abs(dw.dw_dot_last(s, z) / nineq)
        score = (pri_y + jnp.linalg.norm(rz.hi, axis=-1)
                 + jnp.linalg.norm(rx.hi, axis=-1) + nineq * mu)
        return rx, rz, ry, mu, score

    x = dw.from_f32(final.best_x)
    s = dw.from_f32(final.best_s)
    z = dw.from_f32(final.best_z)
    y = dw.from_f32(final.best_y)
    _, _, _, mu0, best_score = score_dw(x, s, z, y)
    best = (x, s, z, y, best_score, mu0)

    # Refinement is LINEAR iterative refinement of the KKT system at the
    # (near-)converged point — full Newton steps toward mu = 0, NOT more
    # interior-point iterations. Two deliberate deviations from the IPM
    # step (both learned from measured tail-lane stalls):
    #  * no fraction-to-boundary rule: the converged active set has slack
    #    components at (or numerically below) zero, where ANY noise-level
    #    negative ds freezes the whole lane's alpha at ~0 and refinement
    #    silently no-ops (measured: p90 tails stuck ~1e-6 while the
    #    median reached 1e-11). At the solution s_i = 0 EXACTLY for
    #    active rows — forbidding it is wrong at this stage;
    #  * the complementarity diagonal is clamped like the backward pass's
    #    d = max(z, c)/max(s, c) (reference qp.py:145-148): underflowed
    #    slack pairs (s, z ~ 1e-33 after 20 f32 Mehrotra steps) would
    #    otherwise make d garbage. Best-score tracking keeps the entry
    #    iterate if a lane's Newton step ever degrades it.
    rc = config.refine_clamp
    if rc is None:
        rc = 1e-5  # f32 auto: caps cond(T) at ~1e5 * |R| so the f32
        # factor still contracts on (near-)singular-R problems.
    c = jnp.asarray(rc, dtype)

    def step_once(x, s, z, y, best):
        rx, rz, ry, mu, _ = score_dw(x, s, z, y)
        s_hat = jnp.maximum(s.hi, c)
        d = jnp.maximum(z.hi, c) / s_hat
        # Complementarity residual scaled by the CLAMPED slack: (s z)/s_hat
        # -> z on interior rows, -> 0 on active rows (s ~ 0). Passing plain
        # z would inject ds = -z/d_clamped ~ -grad_clamp drift into every
        # active slack per step (measured: a 1e-8..1e-7 floor).
        rs_eff = z.hi * (s.hi / s_hat)
        # The solve runs in scaled coordinates: map the original-problem
        # residuals in by the exact pow2 weights.
        if maps is not None:
            rx_s, rz_s = rx.hi * w_rx, rz.hi * w_rz
            ry_s = (ry.hi * w_ry) if neq > 0 else None
        else:
            rx_s, rz_s = rx.hi, rz.hi
            ry_s = ry.hi if neq > 0 else None
        fac, dx, ds, dz, dy = kkt_factor_solve(d, rx_s, rs_eff, rz_s, ry_s)
        lane_bad = (jnp.isnan(dx).any(-1) | jnp.isnan(ds).any(-1)
                    | jnp.isnan(dz).any(-1))
        if neq > 0:
            lane_bad = lane_bad | jnp.isnan(dy).any(-1)
        msk = lane_bad[:, None]
        # The increments are single-precision — IR theory needs only the
        # RESIDUAL in extended precision; the correction's own rounding
        # (2^-24 relative to the increment, which itself shrinks
        # geometrically) is below the converged error.
        x = dw.dw_add_f32(x, jnp.where(msk, 0.0, dx))
        s = dw.dw_add_f32(s, jnp.where(msk, 0.0, ds))
        z = dw.dw_add_f32(z, jnp.where(msk, 0.0, dz))
        if neq > 0:
            y = dw.dw_add_f32(y, jnp.where(msk, 0.0, dy))
        _, _, _, mu_n, score_n = score_dw(x, s, z, y)
        take = (score_n < best[4])[:, None]
        best = (dw.dw_where(take, x, best[0]), dw.dw_where(take, s, best[1]),
                dw.dw_where(take, z, best[2]),
                dw.dw_where(take, y, best[3]) if neq > 0 else best[3],
                jnp.minimum(score_n, best[4]),
                jnp.where(take[:, 0], mu_n, best[5]))
        return x, s, z, y, best, score_n

    if not early_exit:
        for _ in range(steps):
            x, s, z, y, best, _ = step_once(x, s, z, y, best)
    else:
        # Auto-budget mode: stop as soon as a step no longer contracts
        # the global residual score by >= 2x (converged problems pay 1-2
        # steps; conditioning-limited lanes stop instead of burning the
        # budget on a plateau). The predicate is globally reduced, so it
        # is uniform across shards.
        axis = config.axis_name
        inf = jnp.asarray(jnp.inf, dtype)

        def cond_fn(st):
            k, _, _, _, _, _, prev_m, cur_m = st
            return (k < steps) & ((k == 0) | (cur_m < 0.5 * prev_m))

        def body_fn(st):
            k, x, s, z, y, best, prev_m, cur_m = st
            x, s, z, y, best, score_n = step_once(x, s, z, y, best)
            new_m = _greduce(score_n.max(), "max", axis)
            return (k + 1, x, s, z, y, best, cur_m, new_m)

        st0 = (jnp.zeros((), jnp.int32), x, s, z, y, best, inf,
               _greduce(best[4].max(), "max", config.axis_name))
        _, x, s, z, y, best, _, _ = lax.while_loop(cond_fn, body_fn, st0)

    bx, bs, bz, by = best[0], best[1], best[2], best[3]
    final = final._replace(best_x=bx.hi, best_s=bs.hi, best_z=bz.hi,
                           best_y=by.hi, best_resids=best[4], mu=best[5])
    lo = (bx.lo, bs.lo, bz.lo, by.lo)
    return final, lo


def _refine(final, Q, p, G, h, A, b, neq, nineq, B, dtype,
            kkt_factor_solve, kkt_solve, config: SolverConfig, maps=None,
            steps: int = 0, early_exit: bool = False):
    """Mixed-precision refinement (SolverConfig.refine_steps): extra
    Mehrotra iterations with float64 residuals and working-dtype solves.

    The f32 plateau exists because the Newton RHS is evaluated in f32 —
    once the true residual falls near eps_f32 * |operands|, the computed
    correction is noise. Recomputing the residuals in f64 (cheap: three
    batched matvecs per step, no f64 factorization) restores genuine
    Newton corrections as long as cond(KKT) < 1/eps_f32, and the iterate
    is accumulated — and returned — in float64. This is SURVEY §7
    hard-part 1's mitigation; the reference instead runs f64 end-to-end
    (reference test.py:69-96). Without x64 the double-word twin
    (:func:`_refine_dw`) runs instead — pure f32, Pallas kernels live.

    ``maps``: equilibration coordinate maps — same contract as
    :func:`_refine_dw` (iterates/solves scaled, residuals/scores of the
    ORIGINAL problem; all maps are exact pow2 multiplies).
    """
    f64 = jnp.float64
    Q64, G64 = Q.astype(f64), G.astype(f64)
    p64, h64 = p.astype(f64), h.astype(f64)
    A64 = A.astype(f64) if neq > 0 else None
    b64 = b.astype(f64) if neq > 0 else None
    wd = dtype
    if maps is not None:
        m_x, m_s, m_z, m_y, w_rx, w_rz, w_ry, _ = maps
        m_x, m_s, m_z = (v.astype(f64) for v in (m_x, m_s, m_z))
        m_y = m_y.astype(f64) if m_y is not None else None

    def score64(x, s, z, y):
        if maps is not None:
            x, s, z = x * m_x, s * m_s, z * m_z
            if neq > 0:
                y = y * m_y
        rx = kkt_ops.bmv(Q64, x) + p64 + kkt_ops.btmv(G64, z)
        if neq > 0:
            rx = rx + kkt_ops.btmv(A64, y)
            ry = kkt_ops.bmv(A64, x) - b64
            pri = jnp.linalg.norm(ry, axis=-1)
        else:
            ry = None
            pri = jnp.zeros((B,), f64)
        rz = kkt_ops.bmv(G64, x) + s - h64
        mu = jnp.abs((s * z).sum(axis=-1) / nineq)
        score = (pri + jnp.linalg.norm(rz, axis=-1)
                 + jnp.linalg.norm(rx, axis=-1) + nineq * mu)
        return rx, rz, ry, mu, score

    x = final.best_x.astype(f64)
    s = final.best_s.astype(f64)
    z = final.best_z.astype(f64)
    y = final.best_y.astype(f64)
    _, _, _, mu0, best_score = score64(x, s, z, y)
    best = (x, s, z, y, best_score, mu0)

    # Linear KKT iterative refinement: full Newton steps toward mu = 0
    # with a clamped complementarity diagonal and NO fraction-to-boundary
    # rule — see _refine_dw's comment for why interior-point stepping
    # stalls the converged tail lanes here. Best-score tracking keeps the
    # entry iterate whenever a step degrades a lane.
    rc = config.refine_clamp
    if rc is None:
        rc = 1e-10  # f64 auto (wd solves are f32 when inputs are f32,
        # but the f64 residuals keep the fixed point exact either way)
    c = jnp.asarray(rc, f64)

    def step_once(x, s, z, y, best):
        rx, rz, ry, mu, _ = score64(x, s, z, y)
        s_hat = jnp.maximum(s, c)
        d32 = (jnp.maximum(z, c) / s_hat).astype(wd)
        # (s z)/s_hat, not z — see _refine_dw's comment.
        rs_eff = (z * (s / s_hat)).astype(wd)
        # Map the original-problem residuals into scaled coordinates for
        # the solve (exact pow2 weights).
        if maps is not None:
            rx, rz = rx * w_rx, rz * w_rz
            ry = (ry * w_ry) if neq > 0 else None
        ry32 = ry.astype(wd) if neq > 0 else None
        fac, dx, ds, dz, dy = kkt_factor_solve(
            d32, rx.astype(wd), rs_eff, rz.astype(wd), ry32)
        lane_bad = (jnp.isnan(dx).any(-1) | jnp.isnan(ds).any(-1)
                    | jnp.isnan(dz).any(-1))
        if neq > 0:
            lane_bad = lane_bad | jnp.isnan(dy).any(-1)
        msk = lane_bad[:, None]
        x = x + jnp.where(msk, 0.0, dx).astype(f64)
        s = s + jnp.where(msk, 0.0, ds).astype(f64)
        z = z + jnp.where(msk, 0.0, dz).astype(f64)
        if neq > 0:
            y = y + jnp.where(msk, 0.0, dy).astype(f64)
        _, _, _, mu_n, score_n = score64(x, s, z, y)
        take = (score_n < best[4])[:, None]
        best = (jnp.where(take, x, best[0]), jnp.where(take, s, best[1]),
                jnp.where(take, z, best[2]),
                jnp.where(take, y, best[3]) if neq > 0 else best[3],
                jnp.minimum(score_n, best[4]),
                jnp.where(take[:, 0], mu_n, best[5]))
        return x, s, z, y, best, score_n

    if not early_exit:
        for _ in range(steps):
            x, s, z, y, best, _ = step_once(x, s, z, y, best)
    else:
        # Same auto-budget early exit as _refine_dw.
        axis = config.axis_name
        inf = jnp.asarray(jnp.inf, f64)

        def cond_fn(st):
            k, _, _, _, _, _, prev_m, cur_m = st
            return (k < steps) & ((k == 0) | (cur_m < 0.5 * prev_m))

        def body_fn(st):
            k, x, s, z, y, best, prev_m, cur_m = st
            x, s, z, y, best, score_n = step_once(x, s, z, y, best)
            new_m = _greduce(score_n.max(), "max", axis)
            return (k + 1, x, s, z, y, best, cur_m, new_m)

        st0 = (jnp.zeros((), jnp.int32), x, s, z, y, best, inf,
               _greduce(best[4].max(), "max", config.axis_name))
        _, x, s, z, y, best, _, _ = lax.while_loop(cond_fn, body_fn, st0)

    return final._replace(best_x=best[0], best_s=best[1], best_z=best[2],
                          best_y=best[3], best_resids=best[4], mu=best[5])


def _escalate_oracle(esc, x, s, z, y, lo_tuple, stats, Q, p, G, h, A, b,
                     neq, nineq, B, dtype, config: SolverConfig):
    """Escalate conditioning-limited lanes to the float64 CPU oracle
    (SolverConfig.escalate="oracle"): only the lanes whose post-refine
    original-coordinate score exceeds escalate_tol are solved host-side;
    healthy lanes never leave the device. The merged point is exactly
    rescored so stats stay honest, and per-lane success is reported in
    ``stats.escalated`` (the attempt mask — a lane the oracle also fails
    on keeps its device-side best iterate). The f64 re-solve is the
    honest fallback for cond >~ 1/eps_f32 problems, where every
    f32-factorization path is out of digits (the reference's whole
    pipeline is f64, test.py:69-96)."""
    import numpy as np

    np_dt = np.dtype(dtype)

    def host(esc_m, Q_, p_, G_, h_, A_=None, b_=None):
        from ..solvers.oracle import solve_qp_np

        esc_m = np.asarray(esc_m)
        Bn, n = p_.shape
        m = h_.shape[-1]
        # Double-word outputs: a single f32 word cannot even REPRESENT
        # the f64 solution (e.g. |x| ~ 2e4 rounds at ~1e-3 absolute), so
        # the hi/lo split carries the f64 answer exactly like the dw
        # refinement path does.
        hi = {k: np.zeros((Bn, d), np_dt)
              for k, d in (("x", n), ("s", m), ("z", m), ("y", neq))}
        lo = {k: np.zeros_like(v) for k, v in hi.items()}
        score = np.full((Bn,), np.inf, np_dt)
        mu_o = np.zeros((Bn,), np_dt)
        ok = np.zeros((Bn,), np.bool_)
        for i in np.nonzero(esc_m)[0]:
            Qi = (Q_[i] if Q_.shape[0] > 1 else Q_[0]).astype(np.float64)
            Gi = (G_[i] if G_.shape[0] > 1 else G_[0]).astype(np.float64)
            Ai = ((A_[i] if A_.shape[0] > 1 else A_[0]).astype(np.float64)
                  if A_ is not None else None)
            bi = b_[i].astype(np.float64) if b_ is not None else None
            pi = p_[i].astype(np.float64)
            hh = h_[i].astype(np.float64)
            try:
                _, xi, nui, lami, si = solve_qp_np(Qi, pi, Gi, hh, Ai, bi)
            except Exception:
                continue
            if not np.isfinite(xi).all():
                continue
            vals = {"x": xi, "s": si, "z": lami,
                    "y": (nui if (neq > 0 and nui is not None)
                          else np.zeros(neq))}
            for k, v in vals.items():
                hi[k][i] = v.astype(np_dt)
                lo[k][i] = (v - hi[k][i].astype(np.float64)).astype(np_dt)
            # Exact f64 score of the exact solution (the merged device
            # arrays are its f32 rounding; scoring those would report the
            # representation error, not the solve error).
            rx = Qi @ xi + pi + Gi.T @ lami
            rz = Gi @ xi + si - hh
            sc = (np.linalg.norm(rz) + np.linalg.norm(rx)
                  + abs(si @ lami))
            if Ai is not None:
                rx_eq = Ai.T @ vals["y"]
                sc = (np.linalg.norm(rz)
                      + np.linalg.norm(rx + rx_eq)
                      + np.linalg.norm(Ai @ xi - bi) + abs(si @ lami))
            score[i] = sc
            mu_o[i] = abs(si @ lami) / m
            ok[i] = True
        return (hi["x"], lo["x"], hi["s"], lo["s"], hi["z"], lo["z"],
                hi["y"], lo["y"], score, mu_o, ok)

    sd = jax.ShapeDtypeStruct
    n = p.shape[-1]
    out_shape = (sd((B, n), dtype), sd((B, n), dtype),
                 sd((B, nineq), dtype), sd((B, nineq), dtype),
                 sd((B, nineq), dtype), sd((B, nineq), dtype),
                 sd((B, neq), dtype), sd((B, neq), dtype),
                 sd((B,), dtype), sd((B,), dtype),
                 sd((B,), jnp.bool_))
    args = (esc, Q, p, G, h) + ((A, b) if neq > 0 else ())
    (xo, xl, so, sl, zo, zl, yo, yl,
     sc_o, mu_esc, ok) = jax.pure_callback(host, out_shape, *args)

    take1 = esc & ok
    take = take1[:, None]
    x = jnp.where(take, xo, x)
    s = jnp.where(take, so, s)
    z = jnp.where(take, zo, z)
    if neq > 0:
        y = jnp.where(take, yo, y)
    # Escalated lanes come back double-word (a single f32 word cannot
    # represent the f64 answer: |x| ~ 1e4 rounds at ~1e-3 absolute);
    # merge their low words into the lo channel.
    from ..config import QPSolutionLow

    if lo_tuple is None:
        lo_tuple = QPSolutionLow(
            z=jnp.where(take, xl, 0.0), nu=jnp.where(take, yl, 0.0),
            lam=jnp.where(take, zl, 0.0), s=jnp.where(take, sl, 0.0))
    else:
        lo_tuple = QPSolutionLow(
            z=jnp.where(take, xl, lo_tuple.z),
            nu=(jnp.where(take, yl, lo_tuple.nu)
                if neq > 0 else lo_tuple.nu),
            lam=jnp.where(take, zl, lo_tuple.lam),
            s=jnp.where(take, sl, lo_tuple.s))
    stats = stats._replace(
        best_resids=jnp.where(take1, sc_o, stats.best_resids),
        mu=jnp.where(take1, mu_esc, stats.mu),
        converged=jnp.where(take1, sc_o < config.eps, stats.converged),
        escalated=esc)
    return x, s, z, y, lo_tuple, stats


def solve(Q, p, G, h, A, b, factors: kkt_ops.KKTFactors,
          config: SolverConfig, init=None) -> QPSolution:
    """Run the batched IPM. Matrix params carry minimal batch dims
    (1 when shared); vector params p, h, b are (B, .) full-batch.
    All parameters are in ORIGINAL (user) coordinates.

    A/b are None when neq == 0. ``factors`` comes from
    ``kkt_ops.pre_factor_kkt`` (ignored by the FULL/IR paths).

    ``init``: optional warm start (x, s, z, y) — e.g. the previous
    receding-horizon solution; s and z are clipped to
    ``config.warm_start_min`` to restore strict interiority. y may be None
    when neq == 0.

    Equilibration (``factors.scaling``, scaling.py): the IPM iterates in
    SCALED coordinates (the factors are of the scaled problem), but the
    residual matvecs at exact scoring events read the ORIGINAL matrices —
    the scaled iterate maps to original coordinates by exact pow2
    elementwise multiplies, and the scaled residual norms (which drive
    termination and best-iterate selection, so the iteration path matches
    a scaled-data solve) are elementwise weightings of the same original
    residual vectors (rx~ = cE rx, rz~ = R_G rz, ry~ = R_A ry,
    mu~ = c mu). Full-size scaled matrix copies therefore never
    materialize, and the returned solution, duals, and stats are all in
    original coordinates.
    """
    B, nz = p.shape
    nineq = G.shape[-2]
    neq = A.shape[-2] if A is not None else 0
    dtype = p.dtype
    axis = config.axis_name

    sc = factors.scaling if factors is not None else None
    scaled = sc is not None
    if scaled:
        from .. import scaling as scaling_mod

        # Iterate coordinates (factors.scaling — identity values when the
        # probe's light branch kept the factors unscaled) vs SEMANTIC
        # coordinates (sem_scaling — the Ruiz scalings either way): the
        # algebra runs in iterate coordinates; the scale-sensitive
        # vector-space behaviors (init shift, clamps, selection scoring)
        # run in semantic coordinates, which is where equilibration's
        # entire effect lives for pow2 scalings (the factorization chains
        # are exactly scale-covariant). In the full (scale-inputs) branch
        # the two coincide.
        sem = factors.sem_scaling if factors.sem_scaling is not None else sc
        p_, h_, b_ = scaling_mod.scale_vecs(p, h, b, sc)
        w_rx = sc.c * sc.E           # rx~ = w_rx * rx (exact: pow2)
        w_rz = sc.RG
        w_ry = sc.RA
        c_flat = sc.c[..., 0]
        m_x, m_s = sc.E, 1.0 / sc.RG  # iterate -> original coordinates
        m_z = sc.RG / sc.c
        m_y = (sc.RA / sc.c) if sc.RA is not None else None
        # Semantic selection weights (original -> semantic coordinates)
        # and iterate -> semantic elementwise maps for s and z.
        sw_rx = sem.c * sem.E
        sw_rz = sem.RG
        sw_ry = sem.RA
        sem_c = sem.c[..., 0]
        ws_s = m_s * sem.RG
        ws_z = m_z * (sem.c / sem.RG)
        if init is not None:
            init = scaling_mod.scale_point(*init, sc)
        # The non-fast machinery (substitution-mode RHS prep, FULL/IR
        # saddle solves) consumes scaled matrices directly; defined as
        # fusable expressions — dead (never materialized) on the fast path.
        Qm = scaling_mod.scale_Q(Q, sc)
        Gm = scaling_mod.scale_G(G, sc)
        Am = scaling_mod.scale_A(A, sc)
    else:
        p_, h_, b_ = p, h, b
        Qm, Gm, Am = Q, G, A

    def to_orig(x, s, z, y):
        """Map a scaled-coordinates iterate to the original problem's
        (x, s, lam, nu) — identity when no scaling is active."""
        if not scaled:
            return x, s, z, y
        return (x * m_x, s * m_s, z * m_z,
                (y * m_y) if neq > 0 else y)

    # Dtype-aware plateau margin (see SolverConfig.improve_margin): strict
    # 0 at f64 for reference parity; 1e-3 below f64, where noise-level
    # "improvements" would otherwise reset the counter every iteration.
    improve_margin = config.improve_margin
    if improve_margin is None:
        improve_margin = 0.0 if jnp.dtype(dtype).itemsize >= 8 else 1e-3
    # Termination-rule scaling: the reference's window is GLOBAL — any
    # lane improving resets the shared counter (batch.py:127,140). That
    # rule cannot scale with batch: at thousands of lanes, the chance
    # that SOME lane bounces below best-by-margin at every iteration is
    # ~1, so plateaued batches (e.g. warm-started MPC re-solves) still
    # run to max_iter. With a nonzero margin the counters become
    # PER-LANE and latch: each lane individually gets the reference rule
    # (exactly what the reference does at B = 1), and the loop exits
    # once every lane has plateaued. margin == 0 keeps the reference's
    # global rule bit-for-bit (f64 parity mode).
    per_lane_term = improve_margin > 0.0

    backend = kkt_ops.resolve_backend(config.use_pallas, dtype,
                                      m=nineq, B=B)
    if config.kkt_solver == KKTSolver.CHOL_PARTIAL:
        solver_factors = backend.prepare(factors)
    else:
        solver_factors = factors

    # Fast per-iteration algebra (inverse mode + partial-Cholesky path):
    # fold the RHS/backsub matvecs against Q^-1 into the cached products
    # Q^-1 G^T / G Q^-1 G^T / S11 and the IPM identities
    #   rs = z  =>  rs / d = s            (predictor)
    #   G Q^-1 rx - rz = G Q^-1 p + G Q^-1 G^T z (+ S21 y) + h
    #   A Q^-1 rx - ry = A Q^-1 p + S21^T z (+ S11 y) + b
    # so neither Q^-1 itself nor a second G read appears in the loop.
    fast = (config.kkt_solver == KKTSolver.CHOL_PARTIAL
            and solver_factors.invQ_GT is not None)
    # Tracked-residual mode (see SolverConfig.resid_every): replace the
    # per-iteration residual matvecs by exact per-lane norm scaling
    # r_new = (1 - alpha) r, with exact recomputes at checkpoints.
    resid_every = config.resid_every
    if resid_every is None:
        # f32 default 7: measured Pareto point on the harsh headline
        # workload (95.7k QPs/sec at max true resid 0.401 vs 94.2k/0.398
        # at k=5, 92.6k/0.44 at k=4, 77.8k/0.32 at k=1 — the k=5 -> 7
        # step trades one in-loop exact checkpoint for ~1.6% throughput
        # at unchanged measured accuracy; see PERF.md round 3).
        resid_every = 1 if jnp.dtype(dtype).itemsize >= 8 else 7
    track = fast and resid_every != 1
    if fast:
        fs = solver_factors
        invQ_p = kkt_ops.apply_invQ(fs, p_)
        # G~ Q~^-1 p~ = (Q~^-1 G~^T)^T p~ — via the cached product, so the
        # (scaled) constraint matrices are never read here.
        G_invQ_p = kkt_ops.btmv(fs.invQ_GT, p_)
        A_invQ_p = kkt_ops.btmv(fs.invQ_AT, p_) if neq > 0 else None

    # Fully-fused IPM step (one Pallas kernel per iteration): lanes
    # backend, batched-or-shared operands, and everything fits VMEM.
    use_fused = use_fused_eq = False
    if fast and backend.fused_step is not None:
        from ..ops.pallas.lanes import ipm_step_supported

        ok_b = solver_factors.invQ_GT.shape[0] in (1, B)
        if neq == 0:
            use_fused = ok_b and ipm_step_supported(
                nz, nineq, B,
                xfree=(track and config.coeff_x is not False
                       and backend.fused_step_xfree is not None))
        else:
            use_fused_eq = (ok_b
                            and solver_factors.S21.shape[0] in (1, B)
                            and ipm_step_supported(nz, nineq, B, neq))
    # Coefficient-tracked x ("x-free" iterations). In the fast path the
    # combined direction's dx = -(x + Q^-1 p) - Q^-1 G^T (z + dz)
    # [- Q^-1 A^T (y + dy)] is affine in x and in loop-invariant
    # vectors, so the damped update x' = (1-a) x - a Q^-1 p
    # - a Q^-1 G^T (z+dz) [- a Q^-1 A^T (y+dy)] closes over
    #     x_k = e_k x0 - c_k Q^-1 p - Q^-1 G^T w_k [- Q^-1 A^T v_k]
    # with the elementwise recurrences e' = (1-a) e, c' = (1-a) c + a,
    # w' = (1-a) w + a (z + dz), v' = (1-a) v + a (y + dy). x is then
    # reconstructed only at residual checkpoints and after the loop, so
    # the per-iteration Q^-1 G^T (and Q^-1 A^T) HBM passes — a full
    # (B, nz, m) read per iteration in both the fused kernel and
    # fast_combined_dx — disappear. Exact in real arithmetic; enabled in
    # tracked mode only (f64 reference-parity mode has track=False and
    # keeps the reference's direct x recurrence). The eq-fused kernel
    # still owns its x/y updates internally, so it opts out.
    xfree = (fast and track and not use_fused_eq
             and config.coeff_x is not False
             and (not use_fused or backend.fused_step_xfree is not None))
    if use_fused:
        if xfree:
            q_t = backend.prepare_vec(-(h_ + G_invQ_p), 0.0)
        else:
            iGT_prep, q_t, ip_t = backend.prepare_fused(
                solver_factors.invQ_GT, -(h_ + G_invQ_p), invQ_p)
    if use_fused_eq:
        eq_ops, q_t, ip_t = backend.prepare_fused_eq(
            solver_factors, b_ + A_invQ_p, -(h_ + G_invQ_p), invQ_p)

    def fused_do_step(x, s, z):
        """Whole predictor+corrector(+Gondzio) iteration in one kernel."""
        return backend.fused_step(solver_factors.R, iGT_prep, x, s, z,
                                  q_t, ip_t, config.n_correctors)

    def fused_do_step_xfree(s, z):
        """x-free fused iteration: returns (zeta, s', z', alpha) with
        zeta = z + dz the w-recurrence anchor."""
        return backend.fused_step_xfree(solver_factors.R, s, z, q_t,
                                        config.n_correctors)

    def fused_do_step_eq(x, s, z, y):
        return backend.fused_step_eq(solver_factors.R, eq_ops, x, s, z, y,
                                     q_t, ip_t, config.n_correctors)

    def fast_predictor(x, s, z, y, d):
        """Factor + predictor solve via cached products; returns
        (fac, ds, dz, dy, u). The R @ z part of the RHS is folded into
        the factor kernel (backend.factor_solve_rz): note
        GiGT z = R z + S21 (W z), so only the small S21/W products stay
        outside. dx is NOT formed here — the IPM only ever uses
        dx_affine + dx_corrector, so the combined dx is assembled once in
        fast_combined (one invQ_GT read per iteration instead of two)."""
        fs = solver_factors
        q = -(h_ + G_invQ_p)
        if neq > 0:
            r1 = (b_ + A_invQ_p + kkt_ops.btmv(fs.S21, z)
                  + kkt_ops.bmv(fs.S11, y))
            u = kkt_ops.bmv(fs.invS11, -r1)
            wz = kkt_ops.bmv(fs.W, z)
            q = q - kkt_ops.bmv(fs.S21, wz + y + u)
        else:
            u = None
        fac, dz = backend.factor_solve_rz(fs.R, d, q, z)
        dy = (u - kkt_ops.bmv(fs.W, dz)) if neq > 0 else None
        ds = (-z - dz) / d
        return fac, ds, dz, dy, u

    def fast_corrector(fac, rs_c, d):
        """Corrector solve (RHS zero except rs) via cached products;
        returns (ds, dz, dy) — dx folded into fast_combined."""
        fs = solver_factors
        dz = backend.solve2(fac, -(rs_c / d))
        dy = -kkt_ops.bmv(fs.W, dz) if neq > 0 else None
        ds = (-rs_c - dz) / d
        return ds, dz, dy

    def fast_combined_dx(x, z, y, dz, dy):
        """Combined-direction dx = dx_affine + dx_corrector from the
        combined dz/dy (linearity of the backsubstitution):
        dx = -(x + Q^-1 p) - Q^-1 G^T (z + dz) - Q^-1 A^T (y + dy)."""
        fs = solver_factors
        dx = -(x + invQ_p) - kkt_ops.bmv(fs.invQ_GT, z + dz)
        if neq > 0:
            dx = dx - kkt_ops.bmv(fs.invQ_AT, y + dy)
        return dx

    def kkt_factor_solve(d, rx, rs, rz, ry):
        """Per-iteration factor completion + first solve, fused.

        The analog of batch.py:111's factor_kkt followed by solve_kkt —
        done ONCE per d (the reference re-factors inside each of the
        predictor and corrector solves; both use the same d, so the factor
        is hoisted and shared), with the first T-solve running inside the
        factor kernel while the factor is still in VMEM
        (backend.factor_solve). Returns (fac, dx, ds, dz, dy).
        """
        if config.kkt_solver == KKTSolver.CHOL_PARTIAL:
            rhs_T, u = kkt_ops.prepare_rhs_kkt(
                solver_factors, d, Gm, Am, rx, rs, rz, ry,
                solve2=backend.solve2)
            fac, dz = backend.factor_solve(solver_factors.R, d, rhs_T)
            out = kkt_ops.backsub_kkt(solver_factors, dz, u, d, Gm, Am,
                                      rx, rs, solve2=backend.solve2)
            return (fac,) + out
        return (None,) + kkt_solve(None, d, rx, rs, rz, ry)

    def kkt_solve(fac, d, rx, rs, rz, ry):
        """Dispatch on the (static) KKT strategy — batch.py:55-75,145-157.

        rx/rs/rz/ry may be None (structurally zero)."""
        if config.kkt_solver == KKTSolver.CHOL_PARTIAL:
            return kkt_ops.solve_kkt(solver_factors, fac, d, Gm, Am,
                                     rx, rs, rz, ry, solve2=backend.solve2)
        # The FULL / IR reference paths take dense RHS blocks.
        rx = rx if rx is not None else jnp.zeros((B, nz), dtype)
        rs = rs if rs is not None else jnp.zeros((B, nineq), dtype)
        rz = rz if rz is not None else jnp.zeros((B, nineq), dtype)
        if neq > 0 and ry is None:
            ry = jnp.zeros((B, neq), dtype)
        D = bdiag(d)
        if config.kkt_solver == KKTSolver.FULL:
            return kkt_ops.factor_solve_kkt(Qm, D, Gm, Am, rx, rs, rz, ry)
        if config.kkt_solver == KKTSolver.IR:
            return kkt_ops.solve_kkt_ir(Qm, D, Gm, Am, rx, rs, rz, ry,
                                        eps=config.ir_eps,
                                        niter=config.ir_iters)
        raise ValueError(config.kkt_solver)

    if init is None:
        # ---- Initialization: solve with d = 1, RHS (p, 0, -h, -b) ----
        # "d = 1" is in SEMANTIC coordinates: the init complementarity
        # diagonal is the one coordinate-DEPENDENT choice of the whole
        # iteration (T_init = R + diag(1/d) is not scale-covariant for a
        # fixed d), so the light branch maps it into iterate coordinates
        # (d_it = d_sem * ws_s / ws_z); the full branch's weights are
        # exactly 1 and this is the reference's plain d = 1
        # (batch.py:61-67). After this, every later d = z/s evolves
        # covariantly and the trajectory matches a scaled-data solve.
        ones_m = jnp.broadcast_to(
            (ws_s / ws_z) if scaled else jnp.ones((), dtype),
            (B, nineq)).astype(dtype)
        if fast:
            # The init system IS the fast predictor evaluated at
            # (x, z, y) = 0 with d = 1: rhs_T reduces to q - S21 u with
            # q = -(h + G Q^-1 p) already cached, so the generic
            # prepare_rhs/backsub path's three full-matrix reads
            # (Q^-1 rx, G/A matvecs) are skipped entirely.
            zeros_n = jnp.zeros((B, nz), dtype)
            zeros_m = jnp.zeros((B, nineq), dtype)
            y0 = jnp.zeros((B, neq), dtype) if neq > 0 else None
            # fast_predictor at (z, y) = 0 returns exactly the init
            # solution blocks: s = ds = -dz (rs = 0), z = dz, y = dy.
            _, s, z, y, _ = fast_predictor(zeros_n, ones_m, zeros_m, y0,
                                           ones_m)
            x = fast_combined_dx(zeros_n, zeros_m, y0, z, y)
        else:
            _, x, s, z, y = kkt_factor_solve(ones_m, p_, None, -h_,
                                             -b_ if neq > 0 else None)

        # Shift so every lane has s >= 1 and z >= 1 (batch.py:77-87) — in
        # SEMANTIC coordinates (the shift is the one scale-SENSITIVE step
        # of the whole iteration, and the equilibrated starting point is
        # what rescues borderline-factorizable f32 problems; in the full
        # branch the weights are exactly 1 and this is the plain shift).
        def shift_pos(v, w=None):
            vs = v * w if (scaled and w is not None) else v
            mn = vs.min(axis=-1, keepdims=True)
            vs = jnp.where(mn < 0, vs - mn + 1.0, vs)
            return vs / w if (scaled and w is not None) else vs

        s = shift_pos(s, ws_s if scaled else None)
        z = shift_pos(z, ws_z if scaled else None)
    else:
        x, s, z, y = init
        # Interiority clip in semantic coordinates (exact pow2 weights).
        if scaled:
            s = jnp.maximum(s, config.warm_start_min / ws_s)
            z = jnp.maximum(z, config.warm_start_min / ws_z)
        else:
            s = jnp.maximum(s, config.warm_start_min)
            z = jnp.maximum(z, config.warm_start_min)
    y = y if y is not None else jnp.zeros((B, 0), dtype)

    # Fail-soft init: a lane whose INIT solve NaN'd (f32 Schur chain
    # collapse before the loop even starts — best_resids would stay inf
    # and the lane would return garbage) restarts from the neutral
    # interior point (0, 1, 1, 0) with adaptive regularization pre-armed;
    # the loop then makes what progress the arithmetic allows instead of
    # returning NaNs. (The reference aborts the whole batch here,
    # batch.py:110-113.)
    bad0 = jnp.isnan(x).any(-1) | jnp.isnan(s).any(-1) | jnp.isnan(z).any(-1)
    if neq > 0:
        bad0 = bad0 | jnp.isnan(y).any(-1)
    b0 = bad0[:, None]
    x = jnp.where(b0, 0.0, x)
    # Neutral interior restart point (0, 1, 1, 0) — the "1"s in semantic
    # coordinates (identity weights in the full branch).
    s = jnp.where(b0, (1.0 / ws_s) if scaled else 1.0, s)
    z = jnp.where(b0, (1.0 / ws_z) if scaled else 1.0, z)
    if neq > 0:
        y = jnp.where(b0, 0.0, y)
    reg0 = jnp.where(bad0, jnp.asarray(config.ir_eps, dtype),
                     jnp.zeros((B,), dtype))

    # x-free mode: replace the (B, nz) x carry by the packed coefficient
    # vector [w (nineq) | v (neq) | e | c] with x = e x0 - c Q^-1 p
    # - Q^-1 G^T w [- Q^-1 A^T v]; x0 is the (fail-softened) init point,
    # so cold and warm starts use the same representation.
    if xfree:
        pw = nineq + neq
        x0_anchor = x

        def x_of(xp):
            fs2 = solver_factors
            xr = (xp[:, pw:pw + 1] * x0_anchor
                  - xp[:, pw + 1:] * invQ_p
                  - kkt_ops.bmv(fs2.invQ_GT, xp[:, :nineq]))
            if neq > 0:
                xr = xr - kkt_ops.bmv(fs2.invQ_AT, xp[:, nineq:pw])
            return xr

        def xp_step(xp, a_l, zeta, zy):
            """One damped step on the packed coefficients. a_l: (B,);
            zeta = z + dz; zy = y + dy (None when neq == 0). NaN-frozen
            lanes arrive with a_l = 0 and masked anchors, so they are
            exact no-ops."""
            a = a_l[:, None]
            na = 1.0 - a
            parts = [na * xp[:, :nineq] + a * zeta]
            if neq > 0:
                parts.append(na * xp[:, nineq:pw] + a * zy)
            parts.append(na * xp[:, pw:pw + 1])          # e
            parts.append(na * xp[:, pw + 1:] + a)        # c
            return jnp.concatenate(parts, axis=1)

        x = jnp.concatenate(
            [jnp.zeros((B, pw), dtype), jnp.ones((B, 1), dtype),
             jnp.zeros((B, 1), dtype)], axis=1)

    inf = jnp.asarray(jnp.inf, dtype)
    state = _IPMState(
        x=x, s=s, z=z, y=y,
        best_x=x, best_s=s, best_z=z, best_y=y,
        best_resids=jnp.full((B,), inf, dtype),
        best_resids_o=jnp.full((B,), inf, dtype),
        mu=jnp.zeros((B,), dtype),
        n_not_improved=jnp.zeros((B,) if per_lane_term else (),
                                 jnp.int32),
        lane_done=jnp.zeros((B,), bool),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        pri=jnp.zeros((B,), dtype),
        dual=jnp.zeros((B,), dtype),
        reg=reg0,
    )

    def mu_sel_of(mu):
        """Iterate-coordinate mu -> semantic-coordinate mu for the
        selection score (identity without scaling; exact pow2 either
        way)."""
        if not scaled:
            return mu
        return (mu / c_flat) * sem_c

    def exact_pri_dual(x, s, z, y):
        """(pri, dual, pri_o, dual_o) residual norms from scratch, reading
        the ORIGINAL matrices: the scaled iterate maps to original
        coordinates by exact elementwise multiplies, and the scaled norms
        (termination/selection basis) are elementwise weightings of the
        same original residual vectors — so the scaled matrices are never
        read (nor even materialized). Identity when no scaling is active.
        """
        xo, so, zo, yo = to_orig(x, s, z, y)
        rx = kkt_ops.bmv(Q, xo) + p + kkt_ops.btmv(G, zo)
        if neq > 0:
            rx = rx + kkt_ops.btmv(A, yo)
            ry = kkt_ops.bmv(A, xo) - b
        else:
            ry = None
        rz = kkt_ops.bmv(G, xo) + so - h
        pri_o = jnp.linalg.norm(rz, axis=-1)
        if neq > 0:
            pri_o = pri_o + jnp.linalg.norm(ry, axis=-1)
        dual_o = jnp.linalg.norm(rx, axis=-1)
        if not scaled:
            return pri_o, dual_o, pri_o, dual_o
        # Selection/termination norms in SEMANTIC coordinates.
        pri_s = jnp.linalg.norm(rz * sw_rz, axis=-1)
        if neq > 0:
            pri_s = pri_s + jnp.linalg.norm(ry * sw_ry, axis=-1)
        dual_s = jnp.linalg.norm(rx * sw_rx, axis=-1)
        return pri_s, dual_s, pri_o, dual_o

    def residuals(x, s, z, y):
        """batch.py:94-107 — SCALED-coordinate residual vectors (they feed
        the non-fast KKT solves' RHS) plus both coordinate systems' norms
        (original norms by exact inverse weighting)."""
        rx = kkt_ops.bmv(Qm, x) + p_ + kkt_ops.btmv(Gm, z)
        if neq > 0:
            rx = rx + kkt_ops.btmv(Am, y)
            ry = kkt_ops.bmv(Am, x) - b_
            y_resid = jnp.linalg.norm(ry, axis=-1)
        else:
            ry = None
            y_resid = jnp.zeros((B,), dtype)
        rz = kkt_ops.bmv(Gm, x) + s - h_
        mu = jnp.abs((s * z).sum(axis=-1) / nineq)
        if not scaled:
            pri = y_resid + jnp.linalg.norm(rz, axis=-1)
            dual = jnp.linalg.norm(rx, axis=-1)
            resids = pri + dual + nineq * mu
            return rx, rz, ry, mu, resids, pri, dual, pri, dual
        # Original-coordinate vectors by exact inverse weighting, then
        # SEMANTIC-coordinate selection norms (== iterate norms in the
        # full branch, where sc == sem).
        rz_o = rz / w_rz
        rx_o = rx / w_rx
        ry_o = ry / w_ry if neq > 0 else None
        pri_o = jnp.linalg.norm(rz_o, axis=-1)
        if neq > 0:
            pri_o = pri_o + jnp.linalg.norm(ry_o, axis=-1)
        dual_o = jnp.linalg.norm(rx_o, axis=-1)
        pri = jnp.linalg.norm(rz_o * sw_rz, axis=-1)
        if neq > 0:
            pri = pri + jnp.linalg.norm(ry_o * sw_ry, axis=-1)
        dual = jnp.linalg.norm(rx_o * sw_rx, axis=-1)
        mu_sel = (mu / c_flat) * sem_c
        resids = pri + dual + nineq * mu_sel
        return rx, rz, ry, mu, resids, pri, dual, pri_o, dual_o

    def cond_fn(st: _IPMState):
        return jnp.logical_and(~st.done, st.it < config.max_iter)

    def body_fn(st: _IPMState):
        x, s, z, y = st.x, st.s, st.z, st.y
        if track:
            # mu is exact every iteration (elementwise); the feasibility
            # norms are the carried (1 - alpha)-scaled values except at
            # checkpoints, where they are recomputed from scratch.
            mu = jnp.abs((s * z).sum(axis=-1) / nineq)
            if resid_every == 0:
                exact_now = st.it == 0
            else:
                exact_now = (st.it % resid_every) == 0
            pri, dual, pri_o, dual_o = lax.cond(
                exact_now,
                lambda: exact_pri_dual(
                    x_of(x) if xfree else x, s, z, y),
                # The _o fallbacks are never recorded (updates are gated
                # on exact_now below).
                lambda: (st.pri, st.dual, st.pri, st.dual))
            resids = pri + dual + nineq * mu_sel_of(mu)
            rx = rz = ry = None
        elif fast:
            # Fast path scores against the ORIGINAL matrices (the scaled
            # norms are elementwise weightings — see exact_pri_dual); the
            # residual vectors are never needed (the predictor RHS folds
            # into the cached products).
            mu = jnp.abs((s * z).sum(axis=-1) / nineq)
            pri, dual, pri_o, dual_o = exact_pri_dual(x, s, z, y)
            resids = pri + dual + nineq * mu_sel_of(mu)
            rx = rz = ry = None
        else:
            (rx, rz, ry, mu, resids, pri, dual,
             pri_o, dual_o) = residuals(x, s, z, y)
        if scaled:
            resids_o = pri_o + dual_o + nineq * (mu / c_flat)
        else:
            resids_o = resids

        if config.verbose >= 1 and _runtime_supports_callbacks():
            jax.debug.print(
                "iter: {i}, pri_resid: {p:.5e}, dual_resid: {d:.5e}, "
                "mu: {m:.5e}",
                i=st.it, p=pri.mean(), d=dual.mean(), m=mu.mean())

        # Best-iterate bookkeeping (batch.py:118-139). The improvement
        # test optionally requires a relative margin (see
        # SolverConfig.improve_margin); best-iterate tracking itself stays
        # strict so the returned solution is always the true best. In
        # tracked mode only checkpoint (exactly-scored) iterates enter the
        # bookkeeping — the final iterate is exactly rescored after the
        # loop, so no tracked (optimistic) score is ever recorded.
        improved_strict = resids < st.best_resids
        improved = resids < st.best_resids * (1.0 - improve_margin)
        if track:
            improved_strict = improved_strict & exact_now
            improved = improved & exact_now
        best_resids = jnp.where(improved_strict, resids, st.best_resids)
        best_resids_o = (jnp.where(improved_strict, resids_o,
                                   st.best_resids_o)
                         if scaled else st.best_resids_o)
        imp_col = improved_strict[:, None]
        best_x = jnp.where(imp_col, x, st.best_x)
        best_s = jnp.where(imp_col, s, st.best_s)
        best_z = jnp.where(imp_col, z, st.best_z)
        best_y = jnp.where(imp_col, y, st.best_y) if neq > 0 else st.best_y

        # The not-improved window advances once per scoring event: every
        # iteration normally, every checkpoint (by resid_every) in
        # tracked mode.
        inc = max(resid_every, 1) if track else 1
        tick = exact_now if track else True
        if per_lane_term:
            n_not = jnp.where(tick,
                              jnp.where(improved, 0,
                                        st.n_not_improved + inc),
                              st.n_not_improved)
            lane_done = st.lane_done | (n_not >= config.not_improved_lim)
            window_done = _greduce(lane_done.all(), "min", axis)
        else:
            any_improved = _greduce(improved.any(), "max", axis)
            n_not = jnp.where(tick,
                              jnp.where(any_improved, 0,
                                        st.n_not_improved + inc),
                              st.n_not_improved)
            lane_done = st.lane_done
            window_done = n_not >= config.not_improved_lim

        max_best = _greduce(best_resids.max(), "max", axis)
        if track:
            # Also test the current tracked score so a solve converging
            # between checkpoints exits promptly.
            max_best = jnp.minimum(max_best,
                                   _greduce(resids.max(), "max", axis))
        min_mu = _greduce(mu.min(), "min", axis)
        done = (
            window_done
            | (max_best < config.eps)
            | (min_mu > config.mu_divergence)
        )

        def do_step(args):
            """One predictor-corrector step; returns the updated state,
            the applied per-lane damped step length (0 on frozen lanes),
            and the per-lane adaptive regularization for the NEXT
            iteration."""
            x, s, z, y, reg = args       # x is packed in xfree mode
            if use_fused:
                if xfree:
                    zeta, s, z, a_l = fused_do_step_xfree(s, z)
                    return xp_step(x, a_l, zeta, None), s, z, y, a_l, reg
                x, s, z, a_l = fused_do_step(x, s, z)
                return x, s, z, y, a_l, reg
            if use_fused_eq:
                x, s, z, y, a_l = fused_do_step_eq(x, s, z, y)
                return x, s, z, y, a_l, reg
            d = z / s
            # Adaptive per-lane regularization (the reference's answer is
            # a globally eps-shifted refactor, factor_solve_kkt_reg at
            # batch.py:273-310; here it is per-lane and only where a
            # factorization already failed): a lane whose last direction
            # was NaN re-factors T + reg*I, implemented as the exact
            # elementwise transform d' = d/(1 + reg*d) (T = R + diag(1/d),
            # so 1/d' = 1/d + reg) — no backend/kernel changes, works for
            # the lanes/hybrid/XLA paths alike. Healthy lanes (reg = 0)
            # are bit-identical to the unregularized step.
            d = d / (1.0 + reg[:, None] * d)
            # Predictor: affine direction with RHS (rx, z, rz, ry)
            # (batch.py:98 sets rs := z); factor fused with this solve,
            # then shared by the corrector.
            if fast:
                fac, ds_a, dz_a, dy_a, _ = fast_predictor(x, s, z, y, d)
            else:
                fac, dx_a, ds_a, dz_a, dy_a = kkt_factor_solve(
                    d, rx, z, rz, ry)

            alpha = jnp.minimum(
                jnp.minimum(_step_to_boundary(z, dz_a),
                            _step_to_boundary(s, ds_a)),
                1.0,
            )[:, None]
            # Mehrotra centering sigma (batch.py:163-168).
            t1 = ((s + alpha * ds_a) * (z + alpha * dz_a)).sum(axis=-1)
            t2 = (s * z).sum(axis=-1)
            sig = (t1 / t2) ** 3

            # Corrector RHS is zero in every block but rs
            # (batch.py:170-173) — structural zeros skip their matvecs.
            rs_c = ((-mu * sig)[:, None] + ds_a * dz_a) / s
            if fast:
                ds_c, dz_c, dy_c = fast_corrector(fac, rs_c, d)
                ds, dz = ds_a + ds_c, dz_a + dz_c
                dy = (dy_a + dy_c) if neq > 0 else None
                dx = None  # assembled after the corrector loop
            else:
                dx_c, ds_c, dz_c, dy_c = kkt_solve(
                    fac, d, None, rs_c, None, None)
                dx, ds, dz = dx_a + dx_c, ds_a + ds_c, dz_a + dz_c
                dy = (dy_a + dy_c) if neq > 0 else None

            # Gondzio multiple centrality corrections (beyond the
            # reference): push trial complementarity products back into
            # the cone [0.1, 10] * (sigma mu) with one extra back-solve
            # each, accepted per-lane only when the step lengthens
            # (Gondzio 1996, "Multiple centrality corrections in a
            # primal-dual method for linear programming").
            for _ in range(config.n_correctors):
                a_g = jnp.minimum(
                    jnp.minimum(_step_to_boundary(z, dz),
                                _step_to_boundary(s, ds)), 1.0)
                a_t = jnp.minimum(1.08 * a_g + 0.08, 1.0)[:, None]
                v = (s + a_t * ds) * (z + a_t * dz)
                mu_t = (sig * mu)[:, None]
                rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
                if fast:
                    dds, ddz, ddy = fast_corrector(fac, rs_g, d)
                    ddx = None
                else:
                    ddx, dds, ddz, ddy = kkt_solve(
                        fac, d, None, rs_g, None, None)
                dz_n, ds_n = dz + ddz, ds + dds
                a_n = jnp.minimum(
                    jnp.minimum(_step_to_boundary(z, dz_n),
                                _step_to_boundary(s, ds_n)), 1.0)
                acc = (a_n > a_g)[:, None]
                dz = jnp.where(acc, dz_n, dz)
                ds = jnp.where(acc, ds_n, ds)
                if neq > 0:
                    dy = jnp.where(acc, dy + ddy, dy)
                if not fast:
                    dx = jnp.where(acc, dx + ddx, dx)

            if fast and not xfree:
                dx = fast_combined_dx(x, z, y, dz, dy)
            alpha = jnp.minimum(
                0.999 * jnp.minimum(_step_to_boundary(z, dz),
                                    _step_to_boundary(s, ds)),
                1.0,
            )
            # A lane whose factorization failed produces NaNs; freeze it so
            # healthy lanes keep running (replaces the global try/except
            # bail-out at batch.py:110-113). In xfree mode dx is never
            # formed; it is NaN exactly when dz is (affine in dz with
            # finite loop-invariant coefficients), so (ds, dz[, dy]) cover
            # the check.
            lane_bad = jnp.isnan(ds).any(-1) | jnp.isnan(dz).any(-1)
            if not xfree:
                lane_bad = lane_bad | jnp.isnan(dx).any(-1)
            if neq > 0:
                lane_bad = lane_bad | jnp.isnan(dy).any(-1)
            # Zero both alpha AND the directions for bad lanes: 0 * NaN is
            # NaN, so masking alpha alone would permanently poison the
            # lane's running iterate; with the directions masked too a
            # transiently bad lane resumes on the next iteration.
            mask = lane_bad[:, None]
            alpha = jnp.where(mask, 0.0, alpha[:, None])
            if xfree:
                zeta = z + jnp.where(mask, 0.0, dz)
                zy = ((y + jnp.where(mask, 0.0, dy))
                      if neq > 0 else None)
                x = xp_step(x, alpha[:, 0], zeta, zy)
            else:
                x = x + alpha * jnp.where(mask, 0.0, dx)
            s = s + alpha * jnp.where(mask, 0.0, ds)
            z = z + alpha * jnp.where(mask, 0.0, dz)
            if neq > 0:
                y = y + alpha * jnp.where(mask, 0.0, dy)
            # Escalate failed lanes: start at ir_eps (the reference's
            # regularization scale, batch.py:248) and grow 8x per repeat
            # failure; healthy lanes keep their current shift (no decay —
            # a lane that needed it once is conditioning-limited).
            reg = jnp.where(lane_bad,
                            jnp.maximum(reg * 8.0, config.ir_eps), reg)
            return x, s, z, y, alpha[:, 0], reg

        x, s, z, y, alpha_l, reg = lax.cond(
            done,
            lambda a: a[:4] + (jnp.zeros((B,), dtype), a[4]),
            do_step, (x, s, z, y, st.reg))

        if track:
            # The combined direction solves the Newton system exactly, so
            # each feasibility residual becomes (1 - alpha) r — the norms
            # scale by the same nonnegative factor.
            scale = 1.0 - alpha_l
            pri, dual = pri * scale, dual * scale

        return _IPMState(
            x=x, s=s, z=z, y=y,
            best_x=best_x, best_s=best_s, best_z=best_z, best_y=best_y,
            best_resids=best_resids, best_resids_o=best_resids_o, mu=mu,
            n_not_improved=n_not, lane_done=lane_done,
            it=st.it + 1, done=done,
            pri=pri, dual=dual, reg=reg,
        )

    final = lax.while_loop(cond_fn, body_fn, state)

    if xfree:
        # Back to actual iterates: one Q^-1 G^T [/ Q^-1 A^T] read per
        # solve instead of one per iteration.
        final = final._replace(x=x_of(final.x), best_x=x_of(final.best_x))

    if track:
        # Exactly rescore the final iterate (its iterations since the last
        # checkpoint were never scored) and return it wherever it beats
        # the recorded checkpoint best — all reported residuals are exact.
        pri_f, dual_f, pri_fo, dual_fo = exact_pri_dual(
            final.x, final.s, final.z, final.y)
        mu_f = jnp.abs((final.s * final.z).sum(axis=-1) / nineq)
        score_f = pri_f + dual_f + nineq * mu_sel_of(mu_f)
        take1 = score_f < final.best_resids
        take = take1[:, None]
        if scaled:
            score_fo = pri_fo + dual_fo + nineq * (mu_f / c_flat)
            best_o = jnp.where(take1, score_fo, final.best_resids_o)
        else:
            best_o = final.best_resids_o  # unused when not scaled
        final = final._replace(
            best_x=jnp.where(take, final.x, final.best_x),
            best_s=jnp.where(take, final.s, final.best_s),
            best_z=jnp.where(take, final.z, final.best_z),
            best_y=(jnp.where(take, final.y, final.best_y)
                    if neq > 0 else final.best_y),
            best_resids=jnp.minimum(score_f, final.best_resids),
            best_resids_o=best_o,
        )

    lo = None
    from ..config import resolve_refine_steps

    refine_budget, refine_early = resolve_refine_steps(config, dtype)
    refined = refine_budget > 0
    maps = ((m_x, m_s, m_z, m_y, w_rx, w_rz, w_ry, c_flat)
            if scaled else None)
    if refined:
        # Effective x64 state (respects jax.enable_x64(False)
        # scopes, unlike reading the global flag).
        x64_live = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64
        if x64_live:
            final = _refine(final, Q, p, G, h, A, b, neq, nineq, B, dtype,
                            kkt_factor_solve, kkt_solve, config, maps=maps,
                            steps=refine_budget, early_exit=refine_early)
        else:
            final, lo = _refine_dw(final, Q, p, G, h, A, b, neq, nineq, B,
                                   dtype, kkt_factor_solve, kkt_solve,
                                   config, maps=maps, steps=refine_budget,
                                   early_exit=refine_early)

    # The reference prints INACC_ERR when the best residual exceeds 1
    # unless silenced with verbose < 0 (batch.py:141-142, 205-206) — same
    # gate here. Runtimes without host-callback support (the axon TPU
    # tunnel) cannot debug.print at all; there the jit-friendly signal is
    # stats.best_resids / stats.converged.
    if config.verbose >= 0 and _runtime_supports_callbacks():
        max_best = _greduce(final.best_resids.max(), "max", axis)
        lax.cond(
            max_best > 1.0,
            lambda: jax.debug.print(
                "qpth_tpu warning: returning an inaccurate solution "
                "(max residual {r:.3e} > 1); the problem may be infeasible "
                "or badly conditioned. Try SolverConfig(kkt_solver="
                "KKTSolver.IR) or the CPU oracle.", r=max_best),
            lambda: None,
        )

    # Stats are ALWAYS in original coordinates. When scaled: the refined
    # paths score original directly; the in-loop path recorded the
    # original-coordinate score at its exact scoring events, and the best
    # point's mu comes from the elementwise identity s z = (s~ lam~)/c
    # (see scaling.py's solution mapping).
    if scaled and not refined:
        mu_best_o = (jnp.abs((final.best_s * final.best_z).sum(axis=-1))
                     / nineq / c_flat)
        stats = SolveStats(
            iterations=final.it,
            best_resids=final.best_resids_o,
            mu=mu_best_o,
            converged=final.best_resids_o < config.eps,
        )
    else:
        stats = SolveStats(
            iterations=final.it,
            best_resids=final.best_resids,
            mu=final.mu,
            converged=final.best_resids < config.eps,
        )

    # Map the returned primal-dual point back to original coordinates
    # (exact pow2 multiplies; identity when no scaling).
    bx, bs_, bz, by = to_orig(final.best_x, final.best_s, final.best_z,
                              final.best_y)
    from ..config import QPSolutionLow

    lo_tuple = None
    if lo is not None:
        lx, ls, lz, ly = to_orig(lo[0], lo[1], lo[2], lo[3])
        lo_tuple = QPSolutionLow(z=lx, nu=ly, lam=lz, s=ls)

    if config.escalate is not None:
        if config.escalate != "oracle":
            raise ValueError(f"escalate: {config.escalate!r}")
        esc = stats.best_resids > config.escalate_tol
        if _runtime_supports_callbacks():
            bx, bs_, bz, by, lo_tuple, stats = _escalate_oracle(
                esc, bx, bs_, bz, by, lo_tuple, stats, Q, p, G, h, A, b,
                neq, nineq, B, dtype, config)
        else:
            # No host callbacks on this runtime (the axon tunnel): flag
            # the lanes that need escalation so the caller can act.
            stats = stats._replace(escalated=esc)

    return QPSolution(z=bx, nu=by, lam=bz, s=bs_, stats=stats,
                      lo=lo_tuple)
