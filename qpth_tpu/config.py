"""Solver configuration and statistics.

The reference (qpth) exposes tunables as ``QPFunction`` kwargs
(``/root/reference/qpth/qp.py:18-20``) plus an internal ``KKTSolvers`` enum
(``/root/reference/qpth/solvers/pdipm/batch.py:41-44``).  Here they are a
frozen, hashable dataclass so they can be passed as static arguments under
``jax.jit`` / ``jax.custom_vjp``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional

import jax


class KKTSolver(enum.Enum):
    """Which KKT linear-system strategy the IPM uses.

    Mirrors the reference's ``KKTSolvers`` enum (batch.py:41-44), with the
    LU-based paths replaced by Cholesky: every block the reference LU-factors
    (``Q``, ``A Q^-1 A^T``, ``R + diag(1/d)``) is symmetric positive definite,
    so on TPU we use pivot-free Cholesky by construction instead of the
    reference's ``lu_hack`` pivot-free LU (batch.py:8-20).
    """

    #: Pre-factor once, re-factor only the iteration-varying Schur block
    #: (analog of the reference's LU_PARTIAL production path).
    CHOL_PARTIAL = "chol_partial"
    #: Build and factor the full saddle system fresh every solve
    #: (analog of LU_FULL; reference/baseline path used by tests).
    FULL = "full"
    #: Regularized saddle system + iterative refinement
    #: (analog of IR_UNOPT; batch.py:244-310).
    IR = "ir"


class QPSolvers(enum.Enum):
    """Forward-solver choice, mirroring qp.py:13-15.

    The reference's CVXPY fallback (a per-instance CPU solve used as ground
    truth, qp.py:97-120) is replaced by this package's independent float64
    CPU oracle (numpy, with an optional native C++ implementation).
    """

    PDIPM_BATCHED = 1
    #: Per-instance CPU oracle solve (float64). Slow; for debugging/ground truth.
    CPU_ORACLE = 2
    #: Alias kept for API familiarity with the reference.
    CVXPY = 2


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver configuration (hashable; safe as a jit static arg).

    Defaults match the reference's ``QPFunction`` signature (qp.py:18-20).
    """

    #: Residual convergence target (qp.py:18 ``eps=1e-12``).
    eps: float = 1e-12
    #: Max IPM iterations (qp.py:19 ``maxIter=20``).
    max_iter: int = 20
    #: Stop after this many consecutive iterations with no per-lane
    #: improvement (qp.py:18 ``notImprovedLim=3``).
    not_improved_lim: int = 3
    #: Relative margin for counting an iterate as "improved":
    #: resid < best * (1 - improve_margin). The reference uses a strict
    #: comparison (batch.py:124), i.e. margin 0 — but at float32 noise-level
    #: improvements keep resetting the counter and every solve runs to
    #: max_iter. Default None = dtype-aware auto: 1e-3 below float64,
    #: strict 0.0 at float64 (bit-level reference parity). Pass an
    #: explicit float to override. With a nonzero margin the
    #: not-improved window is additionally tracked PER LANE with
    #: latching (each lane individually gets the reference's rule; the
    #: loop exits when every lane has plateaued) — the reference's
    #: global any-lane reset cannot scale with batch size (some lane
    #: noise-bounces below best at every iteration once B is in the
    #: thousands). Margin 0 keeps the global reference rule exactly.
    improve_margin: float | None = None
    #: -1 silence warnings, 0 warnings only, 1 per-iteration prints
    #: (batch.py:115-117, 141-142).
    verbose: int = 0
    #: KKT linear-algebra path.
    kkt_solver: KKTSolver = KKTSolver.CHOL_PARTIAL
    #: Forward solver: the batched TPU IPM or the per-instance CPU oracle
    #: (qp.py:92-120's PDIPM_BATCHED / CVXPY dispatch).
    solver: QPSolvers = QPSolvers.PDIPM_BATCHED
    #: Raise if Q is not SPD (checked eagerly when inputs are concrete;
    #: a no-op under tracing — the solver itself is NaN-robust). qp.py:81-85.
    check_Q_spd: bool = True
    #: Divergence guard: stop when min(mu) exceeds this (batch.py:140).
    mu_divergence: float = 1e32
    #: Backward-pass clamp on (lams, slacks) before forming d = lam/s,
    #: reproducing the reference's documented numerical-safety hack
    #: (qp.py:145-148).
    grad_clamp: float = 1e-8
    #: Cotangent reduction for parameters passed without a batch dimension:
    #: "sum" is the mathematically correct vjp of broadcasting; "mean"
    #: bug-compatibly reproduces the reference (qp.py:159-177 ``.mean(0)``).
    broadcast_grad_reduction: str = "sum"
    #: Regularization epsilon for the IR path (batch.py:248 ``eps=1e-7``).
    ir_eps: float = 1e-7
    #: Refinement steps for the IR path (batch.py:244 ``niter=1``).
    ir_iters: int = 1
    #: Cache the pre-factorization as custom_vjp residuals (the reference
    #: stores Q_LU/S_LU/R on ctx, qp.py:93). If False, recompute in backward
    #: (trades FLOPs for memory, like jax.checkpoint).
    save_factors_for_backward: bool = True
    #: Use Pallas TPU kernels for the hot per-iteration factor/solve path:
    #: "auto" (on TPU backends), True (always; interpret mode off-TPU,
    #: for testing), or False (pure XLA).
    use_pallas: bool | str = "auto"
    #: How the fixed Q / S11 systems are applied per iteration:
    #: "subst" = triangular substitution on Cholesky factors;
    #: "inverse" = precompute explicit SPD inverses once (blocked triangular
    #: inversion) so every application is one MXU matvec;
    #: "auto" = "inverse" whenever the Pallas path is active.
    solve_method: str = "auto"
    #: Optional shard_map axis name for global termination reductions
    #: (None = rely on jit's automatic collectives for sharded inputs).
    axis_name: str | None = None
    #: Warm starts: lower clip applied to the provided (s, z) so the start
    #: is strictly interior. The reference has no warm-start support; this
    #: is the MPC-style receding-horizon extension (SURVEY §5.4).
    warm_start_min: float = 1e-3
    #: Opt-in: fuse the diagonal solver's per-iteration factor+solves+
    #: step into one Pallas kernel (ops/pallas/diagstep.py). Measured
    #: neutral-to-slightly-slower than the composed path at the sudoku
    #: shape (B=2048, nz=64, neq=40: 4.9 vs 4.0 ms/solve — the composed
    #: path's small lanes kernels plus XLA's own elementwise fusion
    #: already saturate); kept for larger-neq experimentation.
    fused_diag_step: bool = False
    #: How often the true KKT residuals (the per-iteration Q x / G^T z /
    #: G x matvecs of batch.py:94-107, ~25% of fused-path iteration time)
    #: are recomputed. 1 = every iteration (reference semantics).
    #: k > 1 = recompute only every k-th iteration ("checkpoints") and in
    #: between track the residual norms analytically: the combined IPM
    #: direction satisfies the Newton equations exactly, so every
    #: feasibility residual scales by exactly (1 - alpha) per step —
    #: r_new = (1 - alpha) r — and the norms are per-lane scalars
    #: (complementarity mu is always computed exactly; it is elementwise).
    #: Best-iterate selection and the not-improved window then operate on
    #: the exact checkpoint scores (the window counter advances by k per
    #: non-improving checkpoint), and after the loop the final iterate's
    #: exact score is computed and wins where it beats the checkpoint
    #: best, so the returned solution and reported stats are always
    #: exactly scored. 0 = no in-loop recompute at all (score at init +
    #: final exact rescore only — maximum throughput).
    #: None = auto: 1 at float64 (bit-level reference parity), 7 below
    #: (the measured throughput/accuracy Pareto point on the harsh
    #: headline workload; see PERF.md).
    #: Only the cached-product fast path tracks; other paths recompute
    #: every iteration regardless.
    resid_every: int | None = None
    #: Coefficient-tracked x ("x-free" iterations): in tracked fast mode
    #: the x iterate is carried as packed recurrence coefficients and
    #: reconstructed only at residual checkpoints, removing the
    #: per-iteration Q^-1 G^T (and Q^-1 A^T) HBM pass (see
    #: core/pdipm.py). None = auto (on wherever tracked mode is active);
    #: False = force the direct x recurrence (A/B measurement + tests).
    coeff_x: bool | None = None
    #: Mixed-precision refinement: after the IPM loop, run this many extra
    #: Mehrotra iterations whose KKT residuals are computed in float64
    #: (TPU: software-emulated, exact) while every factorization/solve
    #: stays in the working dtype — the classic mixed-precision iterative
    #: refinement pattern applied to the interior-point method. This
    #: breaks the float32 residual plateau (the fast path's RHS
    #: identities assume exact arithmetic; recomputing residuals in f64
    #: restores true Newton corrections) and the refined solution is
    #: returned in float64. Requires ``jax.config.jax_enable_x64``; the
    #: cost is refine_steps * (3 f64 matvecs + 1 f32 factor+solve pair).
    #: SURVEY §7 hard-part 1's mitigation; anchor: the reference achieves
    #: its accuracy by running f64 end-to-end (reference test.py:69-96).
    #: Applies to the dense path (solve_qp / QPFunction) and, as post-loop
    #: Newton-IR, to the banded/general structured tiers.
    #:
    #: "auto" (default): accuracy is a dial driven by ``eps`` — the
    #: reference's accuracy knob (qp.py:18). At float64, 0 (the f64 IPM
    #: already meets the reference's accuracy contract). Below float64:
    #: eps > 1e-6 -> 0 (the plain f32 plateau suffices); explicit
    #: eps in [1e-7, 1e-6] -> budget 6; eps in [1e-11, 1e-7) -> budget 12
    #: (the measured parity-gate setting, PERF.md) — in both cases with
    #: EARLY EXIT: refinement stops as soon as a step no longer contracts
    #: the global residual score by >= 2x (converged problems pay 1-2
    #: steps of the budget, conditioning-limited ones stop instead of
    #: burning the budget on a plateau). eps < 1e-11 (including the
    #: reference-default 1e-12) is treated as the reference's
    #: run-to-improvement-window SENTINEL, not an accuracy demand — the
    #: reference's own eps=1e-12 never fires as a threshold (f64 residuals
    #: bottom out ~1e-10; it exists to disable eps-termination) — so auto
    #: refinement stays off and ``QPFunction()`` keeps headline
    #: throughput. ``QPFunction(eps=1e-8)`` therefore "just works" at the
    #: BASELINE <=1e-8 parity gate while the default stays fast.
    #: An explicit integer runs exactly that many steps (no early exit).
    refine_steps: int | str = "auto"
    #: Ruiz equilibration of the problem data (scaling.py): "auto" = on
    #: below float64 (f32 factorizations need the conditioning help; the
    #: power-of-two scalings add zero rounding error), off at float64
    #: (bit-level reference parity). True/False force it. The IPM runs on
    #: the scaled problem; the returned solution/duals/gradients are in
    #: original coordinates. SolveStats residuals refer to the scaled
    #: problem (the better-conditioned one the solver actually worked on).
    equilibrate: bool | str = "auto"
    #: Ruiz iterations (each reads Q/G/A once at prefactor time).
    ruiz_iters: int = 4
    #: Clamp for the refinement steps' complementarity diagonal
    #: d = max(z, c)/max(s, c) (and the matching residual scaling
    #: (s z)/max(s, c)). Unlike grad_clamp this does NOT change the
    #: converged answer — the IR fixed point is set by the residuals, the
    #: clamp only shapes the iteration operator: 1/c caps the refactored
    #: T's condition number, so too-small c stalls f32 contraction on
    #: problems whose R is (near-)singular (e.g. the sudoku projection
    #: structure), while too-large c weakens active-set enforcement per
    #: step. None = dtype-aware auto.
    refine_clamp: float | None = None
    #: Gondzio multiple centrality correctors per iteration (beyond the
    #: reference's single Mehrotra corrector). Each one costs a single
    #: back-solve on the cached factorization and is accepted per-lane
    #: only when it lengthens the step. 0 = reference behavior.
    n_correctors: int = 0
    #: Escalation hook for conditioning-limited lanes (VERDICT r4 #6):
    #: after the loop (and refinement), lanes whose original-coordinate
    #: residual score still exceeds ``escalate_tol`` are re-solved by a
    #: stronger fallback. "oracle" = per-lane float64 CPU solve through a
    #: host callback (only the failing lanes are solved host-side; needs
    #: a callback-capable runtime — works on CPU and standard TPU
    #: runtimes, a no-op marking ``stats.escalated`` under the axon
    #: tunnel; under shard_map the callback runs per shard on its local
    #: lanes). None = off (default; pure-device semantics). The f32
    #: factorization chain genuinely cannot solve cond >~ 1/eps_f32
    #: problems — dw residuals don't help when the FACTOR is the garbage
    #: part (IR contraction ~ cond * eps_f32 >= 1) — so the honest
    #: escalation is a higher-precision solve, which on TPU means the
    #: host (the reference runs f64 everywhere; test.py:69-96).
    escalate: str | None = None
    #: Residual-score threshold above which a lane escalates.
    escalate_tol: float = 1e-4

    def __post_init__(self):
        if self.broadcast_grad_reduction not in ("sum", "mean"):
            raise ValueError("broadcast_grad_reduction must be 'sum' or 'mean'")
        if self.refine_steps != "auto" and not isinstance(
                self.refine_steps, int):
            raise ValueError("refine_steps must be an int or 'auto'")


def resolve_refine_steps(config: "SolverConfig", dtype) -> tuple[int, bool]:
    """Resolve ``SolverConfig.refine_steps`` to ``(budget, early_exit)``
    for a working dtype — the auto policy documented on the field."""
    rs = config.refine_steps
    if rs != "auto":
        return int(rs), False
    eps = config.eps
    if eps < 1e-11 or eps > 1e-6:
        # The reference-default eps=1e-12 is a run-to-window sentinel
        # (see the field docstring), eps > 1e-6 an explicit low-accuracy
        # choice: refinement off, any dtype.
        return 0, False
    # Explicit accuracy demand: engage the budget at EVERY dtype. At f64
    # this is not redundant — the reference's own Mehrotra loop can stall
    # with tiny feasibility residuals but mu ~ 1e-3 on degenerate
    # instances (reproduced bit-for-bit against the reference on a fuzz
    # case: both return the same wrong point; 3 refinement steps recover
    # the true solution to 2.5e-7). The early exit makes converged
    # problems pay ~1 cheap step.
    return (6 if eps >= 1e-7 else 12), True


class SolveStats(NamedTuple):
    """Structured, jit-friendly solve diagnostics.

    Replaces the reference's prints (batch.py:115-117) with returned data.
    """

    #: Number of IPM iterations executed (scalar int32).
    iterations: jax.Array
    #: Best per-lane residual score achieved (batch,) — the quantity the
    #: reference tracks in best['resids'] (batch.py:118-139).
    best_resids: jax.Array
    #: Final duality-measure mu per lane (batch,).
    mu: jax.Array
    #: Per-lane convergence flag: best_resids < eps.
    converged: jax.Array
    #: Per-lane escalation flag (SolverConfig.escalate): True where the
    #: lane's score exceeded escalate_tol after the loop + refinement —
    #: i.e. where the fallback solve ran (or would have run, on runtimes
    #: without host callbacks). None when escalation is off.
    escalated: Optional[jax.Array] = None


class QPSolutionLow(NamedTuple):
    """Low words of a double-word-refined solution (ops/dw.py): the exact
    solution is (z + lo.z) etc., evaluated in float64 on the host. Produced
    by ``refine_steps > 0`` in float32 mode, where a single f32 word cannot
    even represent a 1e-8-accurate solution (eps_f32 ~ 1.2e-7)."""

    z: jax.Array
    nu: jax.Array
    lam: jax.Array
    s: jax.Array


class QPSolution(NamedTuple):
    """Full primal-dual solution of a batch of QPs.

    Fields mirror what the reference's forward returns / stores on ctx
    (qp.py:94: zhats, nus, lams, slacks).
    """

    #: Primal solution (batch, nz).
    z: jax.Array
    #: Equality duals (batch, neq) — zero-width array when neq == 0.
    nu: jax.Array
    #: Inequality duals (batch, nineq).
    lam: jax.Array
    #: Slacks s = h - Gz (batch, nineq).
    s: jax.Array
    stats: SolveStats
    #: Double-word low words (float32 refinement only); None otherwise.
    lo: Optional[QPSolutionLow] = None
