"""Test harness config: CPU backend with 8 virtual devices, float64.

The reference tests run on CPU (test.py:38 ``cuda = False``); ours do too,
in float64, plus a fake 8-device mesh so the multi-chip sharding path is
exercised without a TPU pod (SURVEY §4's implications list).
"""

import os

# Must be set before the first jax backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize pins jax_platforms to the axon TPU tunnel;
# tests run on CPU (and the axon runtime lacks host-callback support).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def make_feasible_qp(rng, nz=10, nineq=3, neq=0, nbatch=None,
                     q_scale=1.0, g_scale=1.0, a_scale=1.0):
    """Random strictly-feasible QP in the style of the reference's
    ``get_grads`` fixture (test.py:42-66): Q = LL^T, h = G z0 + s0,
    b = A z0 so a strictly feasible point exists."""
    def maybe_batch(shape):
        return (nbatch,) + shape if nbatch else shape

    L = rng.randn(nz, nz)
    Q = q_scale * (L @ L.T) + 1e-6 * np.eye(nz)
    G = g_scale * rng.randn(*maybe_batch((nineq, nz)))
    z0 = rng.randn(nz)
    s0 = rng.rand(*maybe_batch((nineq,)))
    h = G @ z0 + s0
    p = rng.randn(*maybe_batch((nz,)))
    if neq > 0:
        A = a_scale * rng.randn(*maybe_batch((neq, nz)))
        b = A @ z0
    else:
        A = b = None
    return Q, p, G, h, A, b


def fd_grad(f, x, eps=1e-6):
    """Central finite differences of a scalar function (float64).

    Replaces the reference's numdifftools dependency (test.py:19)."""
    x = np.asarray(x, dtype=np.float64)
    flat = x.ravel()
    g = np.zeros_like(flat)
    for i in range(flat.size):
        e = np.zeros_like(flat)
        e[i] = eps
        g[i] = (f((flat + e).reshape(x.shape))
                - f((flat - e).reshape(x.shape))) / (2 * eps)
    return g.reshape(x.shape)


# Persistent XLA compile cache: DISABLED for the test suite. It cut
# reruns ~5-10x, but XLA:CPU executable DESERIALIZATION segfaults
# nondeterministically on this toolchain (observed three times across
# full-suite runs, always inside jax compilation_cache._cache_read on a
# cache HIT; the crashing test then passes standalone once its entry is
# recompiled). Correctness beats rerun speed; CI runners start with no
# cache, so CI timing is unaffected. Opt back in explicitly with
# QPTH_TPU_JAX_CACHE=/path if a future jaxlib fixes the loader.
_cache = os.environ.get("QPTH_TPU_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
