"""Honest per-op timing on the axon-tunneled TPU.

The tunnel memoizes repeated identical (executable, inputs) dispatches, so
every timed call here uses FRESH on-device inputs generated from a PRNG key
(only the key crosses the tunnel). Reported cost = median over trials of
(chain of REPS dependent ops) minus the 1-op baseline, divided by REPS-1 —
this also cancels dispatch latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from qpth_tpu.ops.linalg import bmv
from qpth_tpu.ops.pallas import (
    cho_solve_vec_t_pallas,
    factor_kkt_t_pallas,
    spd_inverse,
    trinv_pallas,
)

B, N = 4096, 100
REPS = 16
TRIALS = 5


@jax.jit
def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    L0 = jax.random.uniform(k1, (B, N, N), jnp.float32)
    R = L0 @ jnp.swapaxes(L0, -1, -2) + N * jnp.eye(N, dtype=jnp.float32)
    d = jax.random.uniform(k2, (B, N), jnp.float32) + 0.5
    v = jax.random.normal(k3, (B, N), jnp.float32)
    return R, d, v


def chained(op_fn, nreps):
    """Build jit of nreps dependent applications of op_fn(R, d, v)->v'."""

    @jax.jit
    def run(R, d, v):
        def body(i, vv):
            return op_fn(R, d, vv)

        return lax.fori_loop(0, nreps, body, v)

    return run


def measure(name, op_fn):
    f1 = chained(op_fn, 1)
    fN = chained(op_fn, REPS)
    # compile both
    R, d, v = make_inputs(jax.random.PRNGKey(999))
    jax.block_until_ready(f1(R, d, v))
    jax.block_until_ready(fN(R, d, v))
    t1s, tNs = [], []
    for t in range(TRIALS):
        R, d, v = jax.block_until_ready(
            make_inputs(jax.random.PRNGKey(2 * t)))
        t0 = time.perf_counter()
        jax.block_until_ready(f1(R, d, v))
        t1s.append(time.perf_counter() - t0)
        R, d, v = jax.block_until_ready(
            make_inputs(jax.random.PRNGKey(2 * t + 1)))
        t0 = time.perf_counter()
        jax.block_until_ready(fN(R, d, v))
        tNs.append(time.perf_counter() - t0)
    per_op = (np.median(tNs) - np.median(t1s)) / (REPS - 1) * 1e3
    print(f"{name:44s} {per_op:8.3f} ms/op   "
          f"(1op {np.median(t1s)*1e3:7.2f} ms, {REPS}op "
          f"{np.median(tNs)*1e3:7.2f} ms)")
    return per_op


def op_factor(R, d, v):
    Lt = factor_kkt_t_pallas(R, d + 1e-12 * v ** 2)
    return v + 1e-20 * Lt[:, 0, :]


def op_solve(R, d, v):
    Lt0 = R * 0.0 + jnp.eye(N, dtype=R.dtype) * 2.0  # cheap triangular-ish
    return cho_solve_vec_t_pallas(Lt0 + jnp.tril(R) * 1e-3, v)


def op_bmv(R, d, v):
    return bmv(R, v) * 1e-3


def op_spdinv(R, d, v):
    inv = spd_inverse(R + bmv(jnp.eye(N, dtype=R.dtype)[None] * 0, v)[:, :, None] * 0 + 1e-9 * v[:, :, None] ** 2)
    return v + 1e-20 * inv[:, 0, :]


def op_trinv(R, d, v):
    Tl = trinv_pallas(jnp.tril(R) + 1e-12 * v[:, :, None])
    return v + 1e-20 * Tl[:, 0, :]


measure("bmv (B,n,n)@(B,n)  [164MB read]", op_bmv)
measure("factor_kkt_t_pallas (chol R+diag)", op_factor)
measure("cho_solve_vec_t_pallas (2 trisolves)", op_solve)
measure("trinv_pallas", op_trinv)
measure("spd_inverse (chol+trinv+gram)", op_spdinv)
