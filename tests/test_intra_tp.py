"""Intra-QP tensor parallelism: TP-sharded prefactor on a
("batch", "model") mesh matches the single-axis result and solves
identically (SURVEY §2.5 stretch row / VERDICT r1 next-round #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import Mesh

import qpth_tpu
from qpth_tpu.parallel import prefactor_qp_tp

from conftest import make_feasible_qp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _mesh2d():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("batch", "model"))


@pytest.mark.parametrize("neq", [0, 4])
def test_tp_prefactor_matches_plain(rng, neq):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=32, nineq=16, neq=neq,
                                        nbatch=8)
    args = [jnp.asarray(v) if v is not None else None
            for v in (Q, p, G, h, A, b)]
    f_tp = prefactor_qp_tp(args[0], args[2], args[4], mesh=_mesh2d())
    f_plain = qpth_tpu.prefactor_qp(args[0], args[2], args[4])
    for name, a, e in zip(f_tp._fields, f_tp, f_plain):
        if e is None:
            assert a is None, name
            continue
        npt.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-9,
                            err_msg=name)


def test_tp_factors_solve_and_differentiate(rng):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=24, nineq=12, neq=4,
                                        nbatch=8)
    args = [jnp.asarray(v) for v in (Q, p, G, h, A, b)]
    f_tp = prefactor_qp_tp(args[0], args[2], args[4], mesh=_mesh2d())
    sol_tp = qpth_tpu.solve_qp_full(*args, factors=f_tp)
    sol = qpth_tpu.solve_qp_full(*args)
    npt.assert_allclose(np.asarray(sol_tp.z), np.asarray(sol.z), atol=1e-9)

    g_tp = jax.grad(lambda p_: jnp.sum(qpth_tpu.solve_qp(
        args[0], p_, *args[2:], factors=f_tp) ** 2))(args[1])
    g = jax.grad(lambda p_: jnp.sum(qpth_tpu.solve_qp(
        args[0], p_, *args[2:]) ** 2))(args[1])
    npt.assert_allclose(np.asarray(g_tp), np.asarray(g), atol=1e-8)


def test_tp_hybrid_factor_m1024(rng):
    """VERDICT round-3 #7: the per-iteration (m, m) factorization sharded
    over a 4-way model axis — m=1024, B=2 — matches the single-device
    blocked factor-solve to 1e-6, and the compiled partitioning cuts
    per-device argument bytes ~4x."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from qpth_tpu.ops.hybrid import factor_solve_hybrid
    from qpth_tpu.parallel.intra import factor_solve_hybrid_tp

    m, B, nm = 1024, 2, 4
    L = np.tril(rng.randn(B, m, m).astype(np.float32) * 0.1) \
        + 3 * np.eye(m, dtype=np.float32)
    T = jnp.asarray(L @ L.transpose(0, 2, 1))
    v = jnp.asarray(rng.randn(B, m), jnp.float32)
    dinv = jnp.asarray(0.5 + rng.rand(B, m), jnp.float32)

    _, x_ref = jax.jit(
        lambda T_, v_, d_: factor_solve_hybrid(T_, v_, dinv=d_))(T, v, dinv)

    mesh = Mesh(np.asarray(jax.devices()[:nm]), ("model",))
    T_sh = jax.device_put(T, NamedSharding(mesh, P(None, "model", None)))
    fac, x_tp = factor_solve_hybrid_tp(T_sh, v, dinv=dinv, mesh=mesh)
    np.testing.assert_allclose(np.asarray(x_tp), np.asarray(x_ref),
                               atol=1e-6, rtol=1e-5)

    # per-device memory: the sharded lowering's argument bytes must be
    # ~1/nm of the replicated matrix (plus the small replicated vectors).
    from qpth_tpu.ops.hybrid import solve_hybrid

    def run(T_, v_, d_):
        import jax as _jax
        T_ = _jax.lax.with_sharding_constraint(
            T_, NamedSharding(mesh, P(None, "model", None)))
        f, x = factor_solve_hybrid(T_, v_, dinv=d_)
        return solve_hybrid(f, x)

    with mesh:
        comp = jax.jit(run).lower(T_sh, v, dinv).compile()
    arg_bytes = comp.memory_analysis().argument_size_in_bytes
    full = B * m * m * 4
    assert arg_bytes < full / nm * 1.5, (arg_bytes, full)


def test_tp_hybrid_misaligned_raises(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from qpth_tpu.parallel.intra import factor_solve_hybrid_tp

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("model",))
    T = jnp.eye(256)[None]
    v = jnp.ones((1, 256))
    with pytest.raises(ValueError, match="divisible"):
        factor_solve_hybrid_tp(T, v, mesh=mesh)


@pytest.mark.slow
def test_tp_end_to_end_huge_qp():
    """VERDICT round-4 #4: ONE huge QP (m = nz = 2048, B = 1) solved with
    the ENTIRE IPM loop model-sharded over 4 shards (solve_qp_tp:
    TP prefactor + blocked per-iteration T factor + sharded backsubs),
    matching the single-device solve end to end, with the compiled
    lowering's per-device argument bytes ~1/4 of replicated."""
    import dataclasses

    from qpth_tpu import SolverConfig
    from qpth_tpu.parallel.intra import solve_qp_tp

    rng = np.random.RandomState(11)
    n = m = 2048
    with jax.enable_x64(False):
        # Well-conditioned SPD Q at f32: banded gram + ridge.
        W = rng.randn(n, n).astype(np.float32) * (1.0 / np.sqrt(n))
        Q = (W @ W.T + 1.0 * np.eye(n, dtype=np.float32))
        G = rng.randn(m, n).astype(np.float32) / np.sqrt(n)
        z0 = rng.randn(n).astype(np.float32)
        s0 = rng.rand(m).astype(np.float32)
        h = G @ z0 + s0
        p = rng.randn(n).astype(np.float32)
        args = [jnp.asarray(v)[None] for v in (Q, p, G, h)]

        cfg = SolverConfig(check_Q_spd=False, verbose=-1, max_iter=8)
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                    ("batch", "model"))
        sol_tp = solve_qp_tp(*args, mesh=mesh, config=cfg)

        # Single-device arm: identical algorithm/backend, no mesh.
        from qpth_tpu.core import pdipm
        from qpth_tpu import qp as qp_mod

        cfg1 = dataclasses.replace(cfg, use_pallas="hybrid_xla")
        Qb, pb, Gb, hb, Ab, bb, _ = qp_mod._canonicalize(
            *args, None, None)
        fac = qp_mod._build_factors(Qb, Gb, Ab, cfg1)
        sol_1 = pdipm.solve(Qb, pb, Gb, hb, Ab, bb, fac, cfg1)

    scale = np.abs(np.asarray(sol_1.z)).max()
    err = np.abs(np.asarray(sol_tp.z) - np.asarray(sol_1.z)).max() / scale
    assert err < 1e-5, err
    assert np.isfinite(np.asarray(sol_tp.stats.best_resids)).all()


@pytest.mark.slow
def test_tp_end_to_end_with_equalities():
    """solve_qp_tp with neq > 0: the sharded S11/S21/W Schur blocks and
    the equality backsubstitutions also run model-sharded."""
    import dataclasses

    from qpth_tpu import SolverConfig
    from qpth_tpu.parallel.intra import solve_qp_tp

    rng = np.random.RandomState(5)
    n = m = 512
    neq = 32
    with jax.enable_x64(False):
        W = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
        Q = W @ W.T + np.eye(n, dtype=np.float32)
        G = rng.randn(m, n).astype(np.float32) / np.sqrt(n)
        A = rng.randn(neq, n).astype(np.float32) / np.sqrt(n)
        z0 = rng.randn(n).astype(np.float32)
        h = G @ z0 + rng.rand(m).astype(np.float32) + 0.1
        b = A @ z0
        p = rng.randn(n).astype(np.float32)
        args = [jnp.asarray(v)[None] for v in (Q, p, G, h, A, b)]

        cfg = SolverConfig(check_Q_spd=False, verbose=-1, max_iter=6)
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                    ("batch", "model"))
        sol_tp = solve_qp_tp(*args, mesh=mesh, config=cfg)

        from qpth_tpu.core import pdipm
        from qpth_tpu import qp as qp_mod

        cfg1 = dataclasses.replace(cfg, use_pallas="hybrid_xla")
        Qb, pb, Gb, hb, Ab, bb, _ = qp_mod._canonicalize(*args)
        fac = qp_mod._build_factors(Qb, Gb, Ab, cfg1)
        sol_1 = pdipm.solve(Qb, pb, Gb, hb, Ab, bb, fac, cfg1)

    scale = np.abs(np.asarray(sol_1.z)).max()
    err = np.abs(np.asarray(sol_tp.z) - np.asarray(sol_1.z)).max() / scale
    assert err < 1e-5, err
    assert np.isfinite(np.asarray(sol_tp.nu)).all()
