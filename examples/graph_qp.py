#!/usr/bin/env python3
"""Learning a graph-structured QP layer with the general sparse tier.

A signal-denoising QP over an arbitrary graph (here: a randomly-labeled
chain — the construction-time RCM reordering of the pattern recovers
the ordering, so the solver runs at banded cost no matter how the user
numbers the nodes):

    minimize_z  1/2 sum_i q_i (z_i - y_i)^2 + 1/2 sum_(i,j) w_ij (z_i - z_j)^2
    subject to  z_i - z_j <= c_ij   on a set of difference constraints

The quadratic expands to a Q whose pattern is the graph adjacency; the
difference constraints are 2-entry inequality rows. We learn the edge
weights w_ij (pattern VALUES — gradients land on the COO values through
the structured solver) so that denoised outputs match clean targets.

This exercises the `SpQPFunction` general tier end-to-end: arbitrary
COO patterns (the reference's sparse contract, spbatch.py) with training
through the QP layer.

    JAX_PLATFORMS=cpu python examples/graph_qp.py [--steps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=48)
    ap.add_argument("--lr", type=float, default=0.15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import qpth_tpu

    rng = np.random.RandomState(0)
    n, B = args.nodes, args.batch

    # Chain graph with scrambled node labels: edge (label[i], label[i+1]).
    label = rng.permutation(n)
    edges = [(int(label[i]), int(label[i + 1])) for i in range(n - 1)]

    # Q pattern: diagonal + both triangles of each edge.
    qi = [(i, i) for i in range(n)]
    for (a, b) in edges:
        qi += [(a, b), (b, a)]
    Qi = np.array(qi).T
    n_edges = len(edges)

    # Difference constraints on a random subset of edges: z_a - z_b <= c.
    cons = [edges[k] for k in rng.choice(n_edges, size=n // 3,
                                         replace=False)]
    gi = []
    for r, (a, b) in enumerate(cons):
        gi += [(r, a), (r, b)]
    Gi = np.array(gi).T
    m = len(cons)

    f = qpth_tpu.SpQPFunction(
        Qi, (n, n), Gi, (m, n), np.zeros((2, 0), int), (0, n),
        config=qpth_tpu.SolverConfig(verbose=-1, check_Q_spd=False))
    print(f"pattern: n={n}, {n_edges} edges, {m} difference constraints "
          f"-> structure={f.structure} "
          f"(bs={f._band[1]}, nb={f._band[2]} after RCM)")
    assert f.structure == "general"

    # Ground truth: piecewise-constant signals + noise; targets are the
    # clean signals. True smoothing weight 1.0 on every edge.
    def make_batch(key):
        ks = jax.random.split(key, 3)
        # Piecewise-constant along the CHAIN (cumulative sparse jumps in
        # chain position), then scattered to the scrambled node labels.
        jumps = ((jax.random.uniform(ks[0], (B, n)) < 0.08)
                 * jax.random.normal(ks[1], (B, n)))
        chain = jnp.cumsum(jumps, axis=1)
        clean = jnp.zeros((B, n)).at[:, jnp.asarray(label)].set(chain)
        noisy = clean + 0.3 * jax.random.normal(ks[2], (B, n))
        return noisy, clean

    # Learnable log edge weights (shared across batch, broadcast to B).
    params = {"logw": jnp.zeros((n_edges,), jnp.float32)}

    q_diag = jnp.ones((n,), jnp.float32)

    def qp_denoise(params, noisy):
        w = jnp.exp(params["logw"])
        # Q values: diag q_i + sum of incident w; off-diag -w per edge.
        deg = jnp.zeros((n,)).at[Qi[0, n:n + 2 * n_edges:2]].add(
            jnp.repeat(w, 1)).at[Qi[1, n:n + 2 * n_edges:2]].add(w)
        diag_vals = q_diag + deg
        off_vals = jnp.repeat(-w, 2)[None] * jnp.ones((B, 1))
        Qv = jnp.concatenate(
            [jnp.broadcast_to(diag_vals, (B, n)), off_vals], axis=1)
        p = -q_diag * noisy
        Gv = jnp.concatenate(
            [jnp.ones((B, m, 1)), -jnp.ones((B, m, 1))],
            axis=-1).reshape(B, 2 * m)
        h = jnp.full((B, m), 0.8)
        return f(Qv, p, Gv, h, jnp.zeros((B, 0)), jnp.zeros((B, 0)))

    def loss_fn(params, noisy, clean):
        z = qp_denoise(params, noisy)
        return jnp.mean((z - clean) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    key = jax.random.PRNGKey(1)
    noisy0, clean0 = make_batch(key)
    base = float(jnp.mean((noisy0 - clean0) ** 2))
    print(f"noisy-input MSE {base:.4f}")

    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        noisy, clean = make_batch(sub)
        loss, g = grad_fn(params, noisy, clean)
        params = jax.tree_util.tree_map(
            lambda p_, g_: p_ - args.lr * g_, params, g)
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}: loss {float(loss):.4f}")
    print(f"{args.steps} steps in {time.time()-t0:.1f}s; final loss "
          f"{float(loss):.4f} (vs {base:.4f} un-denoised)")
    assert float(loss) < base, "training through the QP layer should help"


if __name__ == "__main__":
    main()
