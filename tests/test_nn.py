"""OptNet Flax models: end-to-end forward + training-step gradients through
the QP layer (the reference's notebook examples as tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qpth_tpu.nn import OptNetClassifier, OptNetSudoku


def test_classifier_forward_and_grad(rng):
    model = OptNetClassifier(n_features=20, n_hidden=16, n_cls=4, n_ineq=8)
    x = jnp.asarray(rng.randn(6, 20), jnp.float64)
    params = model.init(jax.random.PRNGKey(0), x)
    logp = model.apply(params, x)
    assert logp.shape == (6, 4)
    assert np.isfinite(np.asarray(logp)).all()
    # log_softmax rows normalize
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               atol=1e-6)

    labels = jnp.asarray(rng.randint(0, 4, size=6))

    def loss_fn(params):
        lp = model.apply(params, x)
        return -jnp.mean(lp[jnp.arange(6), labels])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


@pytest.mark.slow
def test_classifier_training_step_improves(rng):
    model = OptNetClassifier(n_features=10, n_hidden=8, n_cls=3, n_ineq=6)
    x = jnp.asarray(rng.randn(12, 10), jnp.float64)
    labels = jnp.asarray(rng.randint(0, 3, size=12))
    params = model.init(jax.random.PRNGKey(1), x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(params):
        lp = model.apply(params, x)
        return -jnp.mean(lp[jnp.arange(12), labels])

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        if l0 is None:
            l0 = float(loss)
    assert float(loss_fn(params)) < l0


def test_sudoku_structure_tiers_agree(rng):
    """The sudoku layer's default diagonal-structure solver and the forced
    dense path produce the same output for the same params."""
    model_d = OptNetSudoku(n=2, n_eq=10)
    model_f = OptNetSudoku(n=2, n_eq=10, structure="dense")
    puzzles = jnp.asarray(rng.rand(2, 64), jnp.float64)
    params = model_d.init(jax.random.PRNGKey(0), puzzles)
    out_d = model_d.apply(params, puzzles)
    out_f = model_f.apply(params, puzzles)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               atol=1e-7)


@pytest.mark.slow
def test_sudoku_layer_learns_A(rng):
    """The sudoku layer exercises the neq > 0 Schur path end to end with a
    *learned* constraint matrix A (sudoku notebook cell 10)."""
    model = OptNetSudoku(n=2, n_eq=10)
    puzzles = jnp.asarray(rng.rand(2, 64), jnp.float64)
    params = model.init(jax.random.PRNGKey(0), puzzles)
    out = model.apply(params, puzzles)
    assert out.shape == puzzles.shape

    target = jnp.asarray(rng.rand(2, 64), jnp.float64)

    def loss_fn(params):
        return jnp.mean((model.apply(params, puzzles) - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    gA = np.asarray(grads["params"]["A"])
    assert np.isfinite(gA).all()
    assert np.abs(gA).max() > 0
