"""Randomized property sweep over the SpQPFunction tiers (round-5
fuzzer, seeded): random diag/banded/general patterns with random
batches and equality blocks — every draw must match the densified dense
path, round-trip warm starts through solve_full (including the general
tier's RCM permutation), and propagate finite pattern-value gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qpth_tpu
from qpth_tpu import SolverConfig, SpQPFunction


def _densify(idx, vals, shape):
    B = vals.shape[0]
    out = np.zeros((B,) + shape)
    for bi in range(B):
        np.add.at(out[bi], (idx[0], idx[1]), vals[bi])
    return out


def _case(rng):
    B = int(rng.choice([1, 2, 4]))
    kind = rng.choice(["diag", "banded", "general"])
    if kind == "diag":
        n = int(rng.choice([1, 3, 8, 17]))
        m = n
        Qi = np.stack([np.arange(n), np.arange(n)])
        Qv = rng.rand(B, n) + 0.2
        Gi = np.stack([np.arange(n), np.arange(n)])
        Gv = np.where(np.abs(rng.randn(B, n)) < 0.2, 0.6, rng.randn(B, n))
    elif kind == "banded":
        w = int(rng.choice([1, 2, 3]))
        n = int(rng.choice([12, 22, 30]))
        m = n
        rows, cols = [], []
        for i in range(n):
            for j in range(max(0, i - w), min(n, i + w + 1)):
                if i != j:
                    rows.append(i), cols.append(j)
        off = 0.25 * rng.randn(B, len(rows))
        pair = {}
        for k, (i, j) in enumerate(zip(rows, cols)):
            key = (min(i, j), max(i, j))
            if key in pair:
                off[:, k] = off[:, pair[key]]
            else:
                pair[key] = k
        Qi = np.array([rows + list(range(n)), cols + list(range(n))])
        dv = np.abs(off).sum(axis=1).max() + 1.5 + rng.rand(B, n)
        Qv = np.concatenate([off, dv], axis=1)
        Gi = np.stack([np.arange(n), np.arange(n)])
        Gv = np.where(np.abs(rng.randn(B, n)) < 0.2, 0.6, rng.randn(B, n))
    else:
        w = int(rng.choice([2, 3]))
        n = int(rng.choice([24, 30]))
        m = int(rng.choice([12, 20]))
        perm0 = rng.permutation(n)
        qi = [(i, j) for i in range(n) for j in range(n)
              if abs(i - j) <= w]
        Qi = np.array([(perm0[i], perm0[j]) for (i, j) in qi]).T
        Qv = np.zeros((B, Qi.shape[1]))
        look = {}
        for k, (i, j) in enumerate(zip(*Qi)):
            if i == j:
                Qv[:, k] = 2.0 * w + 1 + rng.rand(B)
            elif (int(j), int(i)) in look:
                Qv[:, k] = Qv[:, look[(int(j), int(i))]]
            else:
                Qv[:, k] = rng.randn(B) * 0.3
                look[(int(i), int(j))] = k
        gi = []
        for r_ in range(m):
            base = rng.randint(0, n - 3)
            for c in range(base, base + rng.randint(2, 4)):
                gi.append((r_, perm0[c]))
        Gi = np.array(gi).T
        Gv = rng.randn(B, Gi.shape[1])
    neq = min(int(rng.choice([0, 2])), n - 1) if n > 1 else 0
    if neq:
        Ai = np.stack(np.nonzero(np.ones((neq, n))))
        Av = rng.randn(B, neq * n) * 0.4
    else:
        Ai = np.zeros((2, 0), int)
        Av = np.zeros((B, 0))
    z0 = rng.randn(B, n)
    Gd = _densify(Gi, Gv, (m, n))
    h = np.einsum("bmn,bn->bm", Gd, z0) + rng.rand(B, m) + 0.1
    p = rng.randn(B, n)
    Ad = _densify(Ai, Av, (neq, n)) if neq else None
    b = (np.einsum("ben,bn->be", Ad, z0) if neq
         else np.zeros((B, 0)))
    return (kind, B, n, m, neq, Qi, Qv, Gi, Gv, Ai, Av, p, h, b,
            Gd, Ad)


def _run_sweep(seed, n_cases):
    rng = np.random.RandomState(seed)
    for case in range(n_cases):
        (kind, B, n, m, neq, Qi, Qv, Gi, Gv, Ai, Av, p, h, b,
         Gd, Ad) = _case(rng)
        desc = f"case {case}: kind={kind} B={B} n={n} m={m} neq={neq}"
        f = SpQPFunction(Qi, (n, n), Gi, (m, n), Ai, (neq, n))
        jargs = list(map(jnp.asarray, (Qv, p, Gv, h, Av, b)))
        z_sp = np.asarray(f(*jargs))
        assert np.isfinite(z_sp).all(), desc
        Qd = _densify(Qi, Qv, (n, n))
        cfg = SolverConfig(check_Q_spd=False, verbose=-1)
        z_d = np.asarray(qpth_tpu.solve_qp(
            jnp.asarray(Qd), jnp.asarray(p), jnp.asarray(Gd),
            jnp.asarray(h), None if Ad is None else jnp.asarray(Ad),
            None if Ad is None else jnp.asarray(b), config=cfg))
        zs = max(1.0, np.abs(z_d).max())
        err = np.abs(z_sp - z_d).max() / zs
        assert err < 2e-4, f"{desc} [{f.structure}]: err {err:.3g}"
        sol = f.solve_full(*jargs)
        assert np.abs(np.asarray(sol.z) - z_sp).max() < 1e-9, desc
        sol2 = f.solve_full(*jargs, init=(sol.z, sol.s, sol.lam, sol.nu))
        assert np.abs(np.asarray(sol2.z)
                      - np.asarray(sol.z)).max() / zs < 1e-3, desc
        g = jax.grad(lambda qv: (f(qv, *jargs[1:]) ** 2).sum())(jargs[0])
        assert np.isfinite(np.asarray(g)).all(), desc


@pytest.mark.slow
def test_sparse_tier_property_sweep():
    _run_sweep(0, 12)


def test_sparse_tier_property_smoke():
    _run_sweep(3, 4)
