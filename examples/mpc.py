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


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

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
