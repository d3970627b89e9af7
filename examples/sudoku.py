#!/usr/bin/env python3
"""OptNet sudoku example — script port of the reference's
``example-sudoku.ipynb``: learn the constraint matrix A of 2x2 sudoku purely
from (puzzle, solution) pairs via the implicit KKT gradients dA/db."""

import argparse
import time

import jax

# The reference runs this example in double precision (sudoku notebook
# cell 10 casts everything .double()): the random uniform A has a highly
# ill-conditioned Gram matrix that f32 cannot factor reliably.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

from qpth_tpu.nn import OptNetSudoku


def gen_sudoku_data(rng, n_samples, n=2):
    """Tiny 2x2 sudoku generator: one-hot boards (n^2, n^2, n^2) with a
    random subset revealed as the puzzle."""
    N = n ** 2
    boards = []
    base = np.array([[1, 2, 3, 4], [3, 4, 1, 2], [2, 1, 4, 3], [4, 3, 2, 1]])
    for _ in range(n_samples):
        perm = rng.permutation(N) + 1
        board = perm[base - 1]
        # random row/col swaps within bands keep validity
        boards.append(board)
    boards = np.stack(boards)  # (S, 4, 4) values 1..4
    onehot = np.eye(N)[boards - 1]  # (S, 4, 4, 4)
    mask = rng.rand(n_samples, N, N) < 0.5
    puzzles = onehot * mask[..., None]
    return puzzles.reshape(n_samples, -1).astype(np.float64), \
        onehot.reshape(n_samples, -1).astype(np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    puzzles, solutions = gen_sudoku_data(rng, args.samples)

    model = OptNetSudoku(n=2, n_eq=40)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(puzzles[:args.batch]))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(params):
            pred = model.apply(params, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    t0 = time.time()
    for i in range(args.steps):
        idx = rng.choice(args.samples, args.batch, replace=False)
        loss, params, opt_state = step(
            params, opt_state, jnp.asarray(puzzles[idx]),
            jnp.asarray(solutions[idx]))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  mse {float(loss):.5f}  "
                  f"({time.time() - t0:.1f}s)")

    pred = np.asarray(model.apply(params, jnp.asarray(puzzles)))
    cell_acc = float(
        (pred.reshape(-1, 4).argmax(-1)
         == solutions.reshape(-1, 4).argmax(-1)).mean())
    print(f"final cell accuracy: {cell_acc:.3f}")


if __name__ == "__main__":
    main()
