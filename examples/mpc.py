#!/usr/bin/env python3
"""Receding-horizon MPC with qpth_tpu: warm starts + cached factors.

A batch of box-constrained double-integrator tracking problems is
re-solved as the horizon recedes. The QP data (Q, G, A) is fixed across
steps — only the linear term p and the equality RHS b (current state)
change — so the KKT pre-factorization is built ONCE with
``prefactor_qp`` and every step warm-starts from the previous solution.

    JAX_PLATFORMS=cpu python examples/mpc.py [--batch 64] [--horizon 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_mpc_qp(T, dt=0.1, rho=0.1, u_max=1.0):
    """Condensed double-integrator MPC: state x=(pos, vel), control u.

    Decision variable z = (u_0..u_{T-1}); Q from the tracking objective,
    G z <= h encodes |u| <= u_max, and one equality sum(u)*dt = v_goal -
    v_0 pins the terminal velocity (to exercise the neq > 0 path).
    Returns (Q, G, A) shared across the batch; p/h/b are built per step.
    """
    import numpy as np

    # Position response matrix: pos_t = pos_0 + t*dt*v_0 + sum_k S[t,k] u_k.
    S = np.zeros((T, T))
    for t in range(T):
        for k in range(t + 1):
            S[t, k] = dt * dt * (t - k + 0.5)
    Q = S.T @ S + rho * np.eye(T)
    G = np.vstack([np.eye(T), -np.eye(T)])
    A = np.full((1, T), dt)
    return Q.astype(np.float32), G.astype(np.float32), A.astype(np.float32)


def run_banded(args):
    """Multiple-shooting (non-condensed) MPC on the banded structured
    tier: stage variables w_t = (pos_{t+1}, vel_{t+1}, u_t) make Q
    block-diagonal, |u| <= u_max is a separable box (two one-variable
    rows per u via ``g_cols``), and the dynamics equalities couple
    adjacent stages. `SpQPFunction`-style sparsity without densifying:
    per-iteration cost O(T * bs^3) instead of O((3T)^3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import qpth_tpu

    B, T = args.batch, args.horizon
    dt, rho, u_max = 0.1, 0.1, 1.0
    bs, nb = 3, T
    n = nb * bs
    npr = np.random.RandomState(0)

    # Q block-diagonal: tracking on pos, tiny vel regularizer, rho on u.
    Qd = np.zeros((nb, bs, bs), np.float32)
    Qd[:, 0, 0], Qd[:, 1, 1], Qd[:, 2, 2] = 2.0, 1e-3, 2.0 * rho
    Qe = np.zeros((nb - 1, bs, bs), np.float32)

    # Dynamics: pos_{t+1} - pos_t - dt vel_t - dt^2/2 u_t = 0 and
    # vel_{t+1} - vel_t - dt u_t = 0 (t = 0 rows move the known initial
    # state to the RHS).
    A = np.zeros((2 * T, n), np.float32)
    for t in range(T):
        A[2 * t, 3 * t] = 1.0                      # pos_{t+1}
        A[2 * t + 1, 3 * t + 1] = 1.0              # vel_{t+1}
        A[2 * t, 3 * t + 2] = -0.5 * dt * dt       # u_t
        A[2 * t + 1, 3 * t + 2] = -dt
        if t > 0:
            A[2 * t, 3 * (t - 1)] = -1.0           # -pos_t
            A[2 * t, 3 * (t - 1) + 1] = -dt        # -dt vel_t
            A[2 * t + 1, 3 * (t - 1) + 1] = -1.0   # -vel_t

    # Box |u_t| <= u_max as separable rows.
    u_idx = [3 * t + 2 for t in range(T)]
    g_cols = u_idx + u_idx
    g = np.concatenate([np.ones(T), -np.ones(T)]).astype(np.float32)
    h = np.full(2 * T, u_max, np.float32)

    pos = jnp.asarray(npr.randn(B).astype(np.float32))
    vel = jnp.asarray(np.zeros(B, np.float32))
    target = jnp.asarray(npr.randn(B).astype(np.float32))
    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)
    Qdj, Qej, Aj = map(jnp.asarray, (Qd, Qe, A))
    gj, hj = jnp.asarray(g), jnp.asarray(h)

    @jax.jit
    def plan(pos, vel, target, init):
        p = jnp.zeros((B, n), jnp.float32)
        p = p.at[:, 0::3].set(-2.0 * target[:, None])   # track pos
        b = jnp.zeros((B, 2 * T), jnp.float32)
        b = b.at[:, 0].set(pos + dt * vel)
        b = b.at[:, 1].set(vel)
        return qpth_tpu.solve_qp_banded_full(
            Qdj, Qej, p, gj, hj, Aj, b, config=cfg, init=init,
            g_cols=g_cols)

    init = None
    t0 = time.time()
    for step in range(args.steps):
        sol = plan(pos, vel, target, init)
        u0 = sol.z[:, 2]
        pos = pos + dt * vel + 0.5 * dt * dt * u0
        vel = vel + dt * u0
        init = (sol.z, sol.s, sol.lam, sol.nu)
        if step % 5 == 0 or step == args.steps - 1:
            err = float(jnp.abs(pos - target).mean())
            print(f"step {step:3d}  mean|pos-target| {err:.4f}  "
                  f"ipm iters {int(sol.stats.iterations)}  "
                  f"({time.time()-t0:.1f}s)")
    u = sol.z[:, 2::3]
    sat = float(jnp.mean(jnp.abs(u) > 0.99 * u_max))
    print(f"done (banded multiple-shooting); control saturation {sat:.2f}")


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--formulation", choices=["condensed", "banded"],
                    default="condensed")
    args = ap.parse_args()

    if args.formulation == "banded":
        return run_banded(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import qpth_tpu

    B, T = args.batch, args.horizon
    npr = np.random.RandomState(0)
    Qm, Gm, Am = build_mpc_qp(T)
    u_max = 1.0
    h = jnp.asarray(
        np.broadcast_to(np.full(2 * T, u_max, np.float32), (B, 2 * T)))

    # Per-instance initial states and targets.
    pos = jnp.asarray(npr.randn(B).astype(np.float32))
    vel = jnp.asarray(np.zeros(B, np.float32))
    target = jnp.asarray(npr.randn(B).astype(np.float32))

    cfg = qpth_tpu.SolverConfig(check_Q_spd=False)
    Qj, Gj, Aj = map(jnp.asarray, (Qm, Gm, Am))
    factors = qpth_tpu.prefactor_qp(Qj, Gj, Aj, config=cfg)  # once!

    S = np.zeros((T, T), np.float32)
    for t in range(T):
        for k in range(t + 1):
            S[t, k] = 0.01 * (t - k + 0.5)
    Sj = jnp.asarray(S)

    @jax.jit
    def plan(pos, vel, target, init, factors):
        # p from the tracking objective at the current state.
        tvec = jnp.arange(1, T + 1, dtype=jnp.float32) * 0.1
        pos_free = pos[:, None] + tvec[None, :] * vel[:, None]
        err = pos_free - target[:, None]
        p = err @ Sj
        b = (-vel)[:, None]  # terminal velocity 0
        sol = qpth_tpu.solve_qp_full(Qj, p, Gj, h, Aj, b, config=cfg,
                                     init=init, factors=factors)
        return sol

    init = None
    t0 = time.time()
    for step in range(args.steps):
        sol = plan(pos, vel, target, init, factors)
        u0 = sol.z[:, 0]
        pos = pos + 0.1 * vel + 0.005 * u0
        vel = vel + 0.1 * u0
        init = (sol.z, sol.s, sol.lam, sol.nu)  # warm start next step
        if step % 5 == 0 or step == args.steps - 1:
            err = float(jnp.abs(pos - target).mean())
            it = int(sol.stats.iterations)
            print(f"step {step:3d}  mean|pos-target| {err:.4f}  "
                  f"ipm iters {it}  ({time.time()-t0:.1f}s)")
    sat = float(jnp.mean(jnp.abs(sol.z) > 0.99 * u_max))
    print(f"done; control saturation rate {sat:.2f}")


if __name__ == "__main__":
    main()
