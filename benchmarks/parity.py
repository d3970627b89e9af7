#!/usr/bin/env python3
"""Accuracy-parity gate: f32 + double-word refinement vs the f64 oracle.

BASELINE.md's accuracy target ("match qpth/Gurobi primal-dual residuals
(<= 1e-8 gap) on the prof-linear suite and the OptNet sudoku/cls examples")
measured ON CHIP with no jax_enable_x64 anywhere: the solver runs pure
float32 (Pallas kernels live), equilibration + `refine_steps` double-word
refinement produce a two-float (hi, lo) solution, and the gap is evaluated
host-side in float64 against the independent CPU oracle on identical
f32-representable data.

Shapes: the reference's prof-linear suite (nBatch=128,
nz = nineq in {10, 50, 100, 500}, neq = 0 — /root/reference/prof-linear.py:
41-44) plus the two OptNet example QPs (cls notebook cell 3's
Q = LL^T + eps I / h = G z0 + s0 construction; sudoku notebook cell 10's
Q = eps I, G = -I, h = 0, dense equality block).

Usage (repo root, no PYTHONPATH — the axon TPU backend breaks under it):
    python benchmarks/parity.py [--refine 6] [--batch 128] [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cases(rng, B, quick=False):
    """Returns [(name, Q, p, G, h, A, b)] with f32-representable f64 data."""
    cases = []

    def r32(v):
        return None if v is None else np.float64(np.float32(v))

    # prof-linear suite (reference prof-linear.py:41-44): random feasible
    # QPs in the reference test fixture's style (test.py:42-66).
    sizes = [10, 50, 100] if quick else [10, 50, 100, 500]
    for nz in sizes:
        nineq = nz
        L = rng.randn(nz, nz)
        Q = L @ L.T + 1e-3 * np.eye(nz)
        G = rng.randn(B, nineq, nz)
        z0 = rng.randn(B, nz)
        s0 = rng.rand(B, nineq)
        h = np.einsum("bmn,bn->bm", G, z0) + s0
        p = rng.randn(B, nz)
        cases.append((f"prof-linear nz={nz}",) + tuple(
            map(r32, (Q, p, G, h, None, None))))

    # cls-layer QP (cls nb cell 3): shared SPD Q and G, h = G z0 + s0
    # feasible by construction, per-example p — the OptNet layer pattern.
    n_cls, n_ineq = 10, 50
    Lc = rng.randn(n_cls, n_cls)
    Qc = Lc @ Lc.T + 1e-3 * np.eye(n_cls)
    Gc = rng.randn(n_ineq, n_cls)
    z0 = rng.randn(n_cls)
    s0 = rng.rand(n_ineq)
    hc = Gc @ z0 + s0
    pc = rng.randn(B, n_cls)
    cases.append(("cls-layer",) + tuple(
        map(r32, (Qc, pc, Gc, hc, None, None))))

    # sudoku QP (sudoku nb cell 10): Q = eps I, G = -I, h = 0, learned
    # dense A with b from a feasible interior point.
    nz, neq = 64, 40
    Qs = 0.1 * np.eye(nz)
    Gs = -np.eye(nz)
    hs = np.zeros(nz)
    As = rng.rand(neq, nz)
    zfeas = rng.rand(B, nz) + 0.05
    bs = np.einsum("en,bn->be", As, zfeas)
    ps = -rng.rand(B, nz)
    cases.append(("sudoku",) + tuple(map(r32, (Qs, ps, Gs, hs, As, bs))))
    return cases


def polish_np(Q, p, G, h, A, b, x, lam, nu, steps=3, c=1e-10):
    """f64 Newton polish of an oracle solution: full steps on the
    unreduced KKT system with a clamped complementarity diagonal — the
    same linear-IR scheme as the solver's refine path, in numpy. Needed
    because on (near-)degenerate active sets the IPM oracle itself stops
    with ~1e-10 complementarity, which amplifies into ~1e-7 solution
    error — without the polish the parity table measures the ORACLE's
    error, not ours (observed: our refined f32+dw point had comp 2.6e-19
    vs the oracle's 2.6e-10 on the sudoku fixture's lane 11)."""
    n, m = len(p), len(h)
    neq = 0 if A is None else A.shape[0]
    s = h - G @ x
    for _ in range(steps):
        sh = np.maximum(s, c)
        d = np.maximum(lam, c) / sh
        rx = Q @ x + p + G.T @ lam + (A.T @ nu if neq else 0.0)
        rz = G @ x + s - h
        rs = lam * (s / sh)
        K = np.zeros((n + 2 * m + neq,) * 2)
        K[:n, :n] = Q
        K[:n, n + m:n + 2 * m] = G.T
        K[n:n + m, n:n + m] = np.diag(d)
        K[n:n + m, n + m:n + 2 * m] = np.eye(m)
        K[n + m:n + 2 * m, :n] = G
        K[n + m:n + 2 * m, n:n + m] = np.eye(m)
        rhs = np.concatenate([rx, rs, rz])
        if neq:
            K[:n, n + 2 * m:] = A.T
            K[n + 2 * m:, :n] = A
            rhs = np.concatenate([rhs, A @ x - b])
        try:
            dlt = np.linalg.solve(K, -rhs)
        except np.linalg.LinAlgError:
            break
        x = x + dlt[:n]
        s = s + dlt[n:n + m]
        lam = lam + dlt[n + m:n + 2 * m]
        if neq:
            nu = nu + dlt[n + 2 * m:]
    return x


def oracle_batch(Q, p, G, h, A, b, cache_key=None):
    """f64 oracle solutions, disk-cached (the nz=500 oracle costs ~15 min
    per run; sweeps over solver settings reuse it)."""
    if cache_key is not None:
        cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".parity_cache")
        os.makedirs(cdir, exist_ok=True)
        cfile = os.path.join(cdir, cache_key + ".npy")
        if os.path.exists(cfile):
            return np.load(cfile)
    out = _oracle_batch_impl(Q, p, G, h, A, b)
    if cache_key is not None:
        np.save(cfile, out)
    return out


def _oracle_batch_impl(Q, p, G, h, A, b):
    from qpth_tpu import native
    from qpth_tpu.solvers.oracle import solve_qp_batch_np

    B = p.shape[0]
    bc = lambda v, nd: (None if v is None
                        else (np.broadcast_to(v, (B,) + v.shape[-nd:])
                              if v.ndim < nd + 1 else v))
    Qb, Gb = bc(Q, 2), bc(G, 2)
    Ab = bc(A, 2) if A is not None else None
    hb = bc(h, 1)
    bb = bc(b, 1) if b is not None else None
    solve = (native.solve_qp_batch_native if native.is_available()
             else solve_qp_batch_np)
    x, nu, lam, s = solve(Qb, p, Gb, hb, Ab, bb)
    out = np.empty_like(x)
    for i in range(B):
        Qi = Qb[i] if Qb.ndim == 3 else Qb
        Gi = Gb[i] if Gb.ndim == 3 else Gb
        Ai = (Ab[i] if Ab.ndim == 3 else Ab) if Ab is not None else None
        out[i] = polish_np(Qi, p[i], Gi, hb[i], Ai,
                           bb[i] if bb is not None else None,
                           x[i], lam[i], nu[i] if Ai is not None else None)
    return out


def main():
    ap = argparse.ArgumentParser()
    # int, or "auto": the shipped accuracy dial — QPFunction(eps=1e-8)
    # semantics (refine_steps="auto" maps eps<=1e-8 to budget 12 with
    # 2x-contraction early exit; config.py resolve_refine_steps).
    ap.add_argument("--refine", default="auto")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import qpth_tpu
    from qpth_tpu import SolverConfig

    assert not jax.config.jax_enable_x64, \
        "parity gate must run WITHOUT x64 (that is the point)"
    print(f"# backend: {jax.default_backend()}, refine={args.refine}, "
          f"B={args.batch}")

    rng = np.random.RandomState(args.seed)
    cases = build_cases(rng, args.batch, quick=args.quick)
    if args.refine == "auto":
        # The user-facing accuracy dial: eps=1e-8 engages the auto
        # refinement budget (the parity gate "just works").
        cfg = SolverConfig(check_Q_spd=False, verbose=-1, eps=1e-8)
    else:
        cfg = SolverConfig(check_Q_spd=False, verbose=-1,
                           refine_steps=int(args.refine))
    cfg0 = SolverConfig(check_Q_spd=False, verbose=-1)

    print(f"{'case':>20} | {'f32 base':>10} | {'refined':>10} | gate")
    worst = 0.0
    for name, Q, p, G, h, A, b in cases:
        f32 = lambda v: None if v is None else jnp.asarray(v, jnp.float32)
        jargs = [f32(v) for v in (Q, p, G, h, A, b)]
        t0 = time.time()
        key = f"{name.replace(' ', '_').replace('=', '')}" \
              f"_B{args.batch}_s{args.seed}"
        zo = oracle_batch(Q, p, G, h, A, b, cache_key=key)
        t_oracle = time.time() - t0
        base = qpth_tpu.solve_qp_full(*jargs, config=cfg0)
        sol = qpth_tpu.solve_qp_full(*jargs, config=cfg)
        zb = np.asarray(base.z, np.float64)
        zr = np.asarray(sol.z, np.float64)
        if sol.lo is not None:
            zr = zr + np.asarray(sol.lo.z, np.float64)
        e_base = np.abs(zb - zo).max()
        e_ref = np.abs(zr - zo).max()
        worst = max(worst, e_ref)
        ok = "PASS" if e_ref <= 1e-8 else "FAIL"
        print(f"{name:>20} | {e_base:10.2e} | {e_ref:10.2e} | {ok}"
              f"   (oracle {t_oracle:.1f}s)")
    print(f"# worst refined gap: {worst:.2e}  "
          f"{'<= 1e-8: GATE MET' if worst <= 1e-8 else '> 1e-8'}")


if __name__ == "__main__":
    main()
