#!/usr/bin/env python3
"""OptNet classification-layer example — script port of the reference's
``example-cls-layer.ipynb``: train FC-ReLU-FC-ReLU-QP-softmax on a synthetic
denoising/classification task, gradients flowing through the QP layer into
L, G, z0, s0 and the FC weights."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qpth_tpu.nn import OptNetClassifier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-features", type=int, default=50)
    ap.add_argument("--n-hidden", type=int, default=64)
    ap.add_argument("--n-cls", type=int, default=10)
    ap.add_argument("--n-ineq", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    # Synthetic task: class = argmax of a random linear map of the input.
    W_true = rng.randn(args.n_features, args.n_cls)
    x_all = rng.randn(args.batch * 4, args.n_features).astype(np.float32)
    y_all = (x_all @ W_true).argmax(-1)

    model = OptNetClassifier(
        n_features=args.n_features, n_hidden=args.n_hidden,
        n_cls=args.n_cls, n_ineq=args.n_ineq)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(x_all[:args.batch]))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(params):
            logp = model.apply(params, x)
            return -jnp.mean(logp[jnp.arange(x.shape[0]), y])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    t0 = time.time()
    for i in range(args.steps):
        idx = rng.choice(len(x_all), args.batch, replace=False)
        loss, params, opt_state = step(
            params, opt_state, jnp.asarray(x_all[idx]), jnp.asarray(y_all[idx]))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.1f}s)")

    logp = model.apply(params, jnp.asarray(x_all))
    acc = float((np.asarray(logp).argmax(-1) == y_all).mean())
    print(f"final train accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
