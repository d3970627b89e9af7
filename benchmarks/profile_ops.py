"""Per-op timing of the IPM's hot kernels at the headline bench shape.

Answers: where do the ~28 ms/iteration actually go at B=4096, n=m=100?
Each op is timed standalone under jit (block_until_ready, best of N).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from qpth_tpu.ops import kkt as kkt_ops
from qpth_tpu.ops.linalg import bmv, btmv
from qpth_tpu.ops.pallas import (
    cho_solve_vec_t_pallas,
    cholesky_t_pallas,
    factor_kkt_t_pallas,
    spd_inverse,
    trinv_pallas,
)

B, N, M = 4096, 100, 100
TRIALS = 10

npr = np.random.RandomState(0)
L = npr.rand(B, N, N).astype(np.float32)
Q = np.matmul(L, L.transpose(0, 2, 1)) + N * np.eye(N, dtype=np.float32)
R = jnp.asarray(Q)
d = jnp.asarray(npr.rand(B, M).astype(np.float32) + 0.5)
v = jnp.asarray(npr.randn(B, M).astype(np.float32))
Mat = jnp.asarray(npr.randn(B, M, N).astype(np.float32))


def timeit(name, fn, *args, hbm_bytes=None):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    bw = f"  {hbm_bytes / min(ts) / 1e9:7.0f} GB/s" if hbm_bytes else ""
    print(f"{name:42s} {ms:8.3f} ms{bw}")
    return ms


nn4 = B * N * N * 4
print(f"shape: B={B}, n={N}, m={M}; one (B,n,n) f32 array = {nn4/1e6:.0f} MB")
timeit("bmv (B,n,n)@(B,n)", bmv, Mat, v, hbm_bytes=nn4)
timeit("btmv", btmv, Mat, v, hbm_bytes=nn4)
timeit("factor_kkt_t_pallas (chol R+diag)", factor_kkt_t_pallas, R, d,
       hbm_bytes=2 * nn4)
timeit("cholesky_t_pallas", cholesky_t_pallas, R, hbm_bytes=2 * nn4)
Lt = cholesky_t_pallas(R)
timeit("cho_solve_vec_t_pallas (2 trisolves)", cho_solve_vec_t_pallas, Lt, v,
       hbm_bytes=nn4)
timeit("trinv_pallas", trinv_pallas, Lt, hbm_bytes=2 * nn4)
timeit("spd_inverse (chol+trinv+gram)", spd_inverse, R, hbm_bytes=2 * nn4)
timeit("xla cholesky", jnp.linalg.cholesky, R, hbm_bytes=2 * nn4)

# one full IPM iteration-equivalent group for context
from qpth_tpu import SolverConfig, solve_qp_full

cfg = SolverConfig(check_Q_spd=False)
G = Mat
h = jnp.abs(v) + 1.0
p = jnp.asarray(npr.randn(B, N).astype(np.float32))


def full(Q, p, G, h):
    return solve_qp_full(Q, p, G, h, config=cfg)


sol = jax.jit(full)(R, p, G, h)
it = int(sol.stats.iterations)
ms = timeit("solve_qp_full (whole solve)", full, R, p, G, h)
print(f"  iterations={it}  -> {ms / max(it,1):.3f} ms/iter")
