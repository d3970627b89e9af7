"""Multi-device batch sharding on the fake 8-device CPU mesh — the test
surface the reference lacks entirely (SURVEY §2.5: no distributed code)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu
from qpth_tpu.parallel import batch_mesh, batch_sharding, solve_qp_sharded

from conftest import make_feasible_qp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the 8-device CPU mesh")


def _args(rng, B=16, nz=8, m=6, neq=2, batched_mats=False):
    Q, p, G, h, A, b = make_feasible_qp(
        rng, nz=nz, nineq=m, neq=neq,
        nbatch=B if batched_mats else None)
    if not batched_mats:
        p = rng.randn(B, nz)
    return [jnp.asarray(v) if v is not None else None
            for v in (Q, p, G, h, A, b)]


@pytest.mark.parametrize(
    "batched_mats",
    [pytest.param(False, marks=pytest.mark.slow), True])
def test_sharded_matches_single_device(rng, batched_mats):
    args = _args(rng, batched_mats=batched_mats)
    z_single = qpth_tpu.solve_qp(*args)
    mesh = batch_mesh()
    z_sharded = solve_qp_sharded(*args, mesh=mesh)
    npt.assert_allclose(np.asarray(z_sharded), np.asarray(z_single),
                        atol=1e-9, rtol=1e-9)


@pytest.mark.slow
def test_sharded_gradients(rng):
    """Gradients through the sharded solve: per-lane grads match the
    single-device ones; shared-parameter grads are psum'd correctly."""
    args = _args(rng)
    mesh = batch_mesh()

    def loss_sharded(p_, h_):
        z = solve_qp_sharded(args[0], p_, args[2], h_, args[4], args[5],
                             mesh=mesh)
        return jnp.sum(z ** 2)

    def loss_single(p_, h_):
        z = qpth_tpu.solve_qp(args[0], p_, args[2], h_, args[4], args[5])
        return jnp.sum(z ** 2)

    gs = jax.grad(loss_sharded, argnums=(0, 1))(args[1], args[3])
    g1 = jax.grad(loss_single, argnums=(0, 1))(args[1], args[3])
    npt.assert_allclose(np.asarray(gs[0]), np.asarray(g1[0]),
                        atol=1e-8, rtol=1e-8)
    npt.assert_allclose(np.asarray(gs[1]), np.asarray(g1[1]),
                        atol=1e-8, rtol=1e-8)


def test_jit_with_sharded_inputs(rng):
    """The transparent path: plain jit + NamedSharding'd inputs (XLA SPMD
    inserts the collectives for the termination reductions)."""
    args = _args(rng)
    mesh = batch_mesh()
    sh = batch_sharding(mesh)
    p_sharded = jax.device_put(args[1], sh)

    f = jax.jit(lambda p_: qpth_tpu.solve_qp(args[0], p_, args[2], args[3],
                                             args[4], args[5]))
    z = f(p_sharded)
    z_ref = qpth_tpu.solve_qp(*args)
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref),
                        atol=1e-9, rtol=1e-9)


@pytest.mark.slow
def test_sharded_f32_per_lane_termination(rng):
    """f32 activates the per-lane latched termination window; its
    all-lanes-done reduction must compose with shard_map collectives and
    match the single-device run."""
    args = _args(rng)
    args32 = [jnp.asarray(v, jnp.float32) if v is not None else None
              for v in args]
    cfg = qpth_tpu.SolverConfig(max_iter=8)  # equivalence, not convergence
    z_single = qpth_tpu.solve_qp(*args32, config=cfg)
    z_sharded = solve_qp_sharded(*args32, mesh=batch_mesh(), config=cfg)
    npt.assert_allclose(np.asarray(z_sharded), np.asarray(z_single),
                        atol=1e-6, rtol=1e-5)


def test_diag_path_with_sharded_inputs(rng):
    """The structured diagonal solver composes with jit+SPMD batch
    sharding (its termination reductions are plain batch reductions that
    GSPMD lowers to collectives)."""
    B, n, neq = 16, 8, 3
    q = 0.5 + rng.rand(B, n)
    g = -(0.5 + rng.rand(B, n))
    x0 = rng.randn(n)
    h = g * x0 + rng.rand(B, n)
    p = rng.randn(B, n)
    A = rng.randn(neq, n)
    b = np.broadcast_to(A @ x0, (B, neq)).copy()
    args = [jnp.asarray(v) for v in (q, p, g, h, A, b)]

    mesh = batch_mesh()
    sh = batch_sharding(mesh)
    p_sharded = jax.device_put(args[1], sh)
    f = jax.jit(lambda p_: qpth_tpu.solve_qp_diag(
        args[0], p_, args[2], args[3], args[4], args[5]))
    z = f(p_sharded)
    z_ref = qpth_tpu.solve_qp_diag(*args)
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-9)


def test_banded_path_with_sharded_inputs(rng):
    """The block-Thomas banded solver composes with jit+SPMD batch
    sharding the same way (all reductions are batch-wise)."""
    B, nb, bs = 16, 4, 4
    n = nb * bs
    Ld = np.tril(rng.randn(B, nb, bs, bs) * 0.3) + np.eye(bs) * 1.5
    Qd = np.einsum("bnij,bnkj->bnik", Ld, Ld)
    Qe = 0.2 * rng.randn(B, nb - 1, bs, bs)
    Qd[:, 1:] += np.einsum("bnij,bnkj->bnik", Qe, Qe)  # keep SPD-ish
    g = np.where(np.abs(rng.randn(B, n)) < 0.3, 0.7, rng.randn(B, n))
    z0 = rng.randn(B, n)
    h = g * z0 + rng.rand(B, n) + 0.2
    p = rng.randn(B, n)
    args = [jnp.asarray(v) for v in (Qd, Qe, p, g, h)]

    mesh = batch_mesh()
    sh = batch_sharding(mesh)
    p_sharded = jax.device_put(args[2], sh)
    f = jax.jit(lambda p_: qpth_tpu.solve_qp_banded(
        args[0], args[1], p_, args[3], args[4]))
    z = f(p_sharded)
    z_ref = qpth_tpu.solve_qp_banded(*args)
    npt.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-9)


def test_uneven_batch_raises(rng):
    args = _args(rng, B=10)
    mesh = batch_mesh()
    if mesh.shape["batch"] in (1, 2, 5, 10):
        pytest.skip("batch happens to divide mesh")
    with pytest.raises(ValueError, match="not divisible"):
        solve_qp_sharded(*args, mesh=mesh)

def test_collective_count_and_shapes(rng):
    """Pin the sharded solver's ENTIRE cross-device traffic in compiled
    HLO: the termination reductions only — scalar all-reduces (the window
    predicate, max best-residual, min mu, + the post-loop INACC check),
    and nothing tensor-shaped. This is the durable form of the
    weak-scaling argument (BASELINE.md >= 90% gate needs chips; the
    collective count is hardware-independent): per-lane IPM compute scales
    embarrassingly, and the only traffic is O(1) scalars per iteration
    (replacing the reference's host-synced reductions, batch.py:127,140).
    """
    import re

    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=2)
    p = rng.randn(16, 8)
    mesh = batch_mesh()
    for dt in (jnp.float64, jnp.float32):
        args = [jnp.asarray(v, dt) for v in (Q, p, G, h, A, b)]
        txt = (jax.jit(lambda *a: solve_qp_sharded(*a, mesh=mesh))
               .lower(*args).compile().as_text())
        reduces = re.findall(r"= (\S+) all-reduce(?:-start)?\(", txt)
        assert 1 <= len(reduces) <= 5, reduces
        for shape in reduces:
            assert shape in ("f32[]", "f64[]", "pred[]", "u32[]",
                             "s32[]"), (shape, reduces)
        # No other collective families appear at all.
        for op in ("all-gather", "all-to-all", "collective-permute",
                   "reduce-scatter"):
            assert f" {op}(" not in txt, op


@pytest.mark.slow
def test_sharded_mixed_batch_f32_equilibration(rng):
    """Mixed-batch inputs (shared Q, batched G) under shard_map: the
    batch-collapsed Ruiz scalings must be computed over the GLOBAL batch
    (pmax over the mesh axis), so the sharded f32 solve matches the
    single-device one exactly."""
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=6, neq=0,
                                        nbatch=16)
    args32 = [jnp.asarray(v, jnp.float32) if v is not None else None
              for v in (Q, p, G, h, A, b)]
    cfg = qpth_tpu.SolverConfig(max_iter=8)  # equivalence, not convergence
    z_single = qpth_tpu.solve_qp(*args32, config=cfg)
    z_sharded = solve_qp_sharded(*args32, mesh=batch_mesh(), config=cfg)
    npt.assert_allclose(np.asarray(z_sharded), np.asarray(z_single),
                        atol=1e-6, rtol=1e-5)
