"""Double-word (two-float) arithmetic: ops/dw.py.

Pins the error-free-transformation identities numerically against float64
— the foundation under the pure-f32 refinement path (the TPU-native
substitute for the reference's end-to-end float64,
/root/reference/test.py:69-96). These identities require IEEE
round-to-nearest per op with no reassociation/contraction; a failure here
means XLA broke that contract on this backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpth_tpu.ops import dw


@pytest.fixture
def vals(rng):
    # Wide dynamic range, including near-cancelling pairs.
    a = np.float32(10.0 ** rng.uniform(-8, 8, size=256)) * \
        np.sign(rng.randn(256)).astype(np.float32)
    b = (a * np.float32(1 + 1e-7 * rng.randn(256))).astype(np.float32) * \
        np.sign(rng.randn(256)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_two_sum_exact(vals):
    a, b = vals
    s, e = jax.jit(dw.two_sum)(a, b)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(got, want)


def test_two_prod_exact(vals):
    a, b = vals
    p, e = jax.jit(dw.two_prod)(a, b)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    # a*b in f64 is exact (24+24 < 53 mantissa bits), so equality is exact.
    np.testing.assert_array_equal(got, want)


def test_dw_add_dw_accuracy(vals):
    a, b = vals
    x = dw.DW(a, a * jnp.float32(1e-9))
    y = dw.DW(b, b * jnp.float32(-3e-9))
    r = jax.jit(dw.dw_add_dw)(x, y)
    got = dw.to_f64_np(r)
    want = (dw.to_f64_np(x) + dw.to_f64_np(y))
    # The guarantee compensated summation gives (and refinement needs) is
    # ABSOLUTE: |err| <~ u^2 * |operands| (u = 2^-24). Under the fixture's
    # engineered 1e-7 cancellation the error relative to the tiny result
    # can reach ~u^2/1e-7; asserting relative-to-operands instead.
    scale = np.abs(dw.to_f64_np(x)) + np.abs(dw.to_f64_np(y))
    err = np.abs(got - want) / np.maximum(scale, 1e-300)
    assert err.max() < 1e-13


def test_dw_mv_vs_f64(rng):
    B, m, n = 4, 33, 50
    M = jnp.asarray(rng.randn(B, m, n), jnp.float32)
    xh = jnp.asarray(rng.randn(B, n), jnp.float32)
    xl = xh * jnp.float32(1e-8)
    x = dw.DW(xh, xl)
    y = jax.jit(dw.dw_mv)(M, x)
    got = dw.to_f64_np(y)
    want = np.einsum("bmn,bn->bm", np.asarray(M, np.float64),
                     dw.to_f64_np(x))
    # The f64 oracle itself rounds at 2^-52; the dw result is ~2^-48.
    scale = np.abs(np.asarray(M, np.float64)).sum(-1) * \
        np.abs(dw.to_f64_np(x)).max(-1, keepdims=True)
    assert (np.abs(got - want) / np.maximum(scale, 1e-300)).max() < 1e-12


def test_dw_mv_cancellation(rng):
    """The case f32 dots cannot do: residual-style near-total cancellation.

    y = Q x - Q x_perturbed picked so the true result is ~1e-9 relative —
    a plain f32 matvec returns pure noise there; the dw matvec must
    recover it to ~1e-5 relative (2^-48 / 1e-9 headroom).
    """
    n = 64
    Q = rng.randn(1, n, n)
    xs = rng.randn(1, n)
    rhs = np.einsum("bmn,bn->bm", Q, xs)
    Q32 = jnp.asarray(Q, jnp.float32)
    # x solves Q32 x = rhs32 to f64 accuracy, represented as a dw pair.
    x64 = np.linalg.solve(np.asarray(Q32, np.float64)[0],
                          np.asarray(jnp.asarray(rhs, jnp.float32),
                                     np.float64)[0])[None]
    xh = jnp.asarray(x64, jnp.float32)
    xl = jnp.asarray(x64 - np.asarray(xh, np.float64), jnp.float32)
    x = dw.DW(xh, xl)
    y = jax.jit(dw.dw_mv)(Q32, x)
    resid = dw.to_f64_np(y) - np.asarray(jnp.asarray(rhs, jnp.float32),
                                         np.float64)
    # True residual of the rounded solve is ~n * eps_dw * |Q||x| ~ 1e-12.
    assert np.abs(resid).max() < 1e-9
    # And the f32 matvec's noise floor for comparison:
    y32 = np.einsum("bmn,bn->bm", np.asarray(Q32), np.asarray(xh))
    resid32 = y32 - np.asarray(jnp.asarray(rhs, jnp.float32))
    assert np.abs(resid32).max() > 10 * np.abs(resid).max()


def test_dw_mul_pow2_exact():
    x = dw.DW(jnp.float32(1.2345678), jnp.float32(3.14e-9))
    y = dw.dw_mul_pow2(x, jnp.float32(0.25))
    assert float(y.hi) == float(x.hi) * 0.25
    assert float(y.lo) == float(x.lo) * 0.25
