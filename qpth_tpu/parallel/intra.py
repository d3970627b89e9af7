"""Intra-QP (tensor) parallelism: shard the KKT pre-factorization's Schur
GEMMs over a second ("model") mesh axis.

SURVEY §2.5's stretch row / §5.7(b): for very large nz the one-time
products Q^-1 G^T, G Q^-1 G^T, A Q^-1 A^T (reference batch.py:396-424)
dominate the solve (O(nz^3) and O(m nz^2) FLOPs vs the loop's O(m^3)), and
a single chip's HBM must hold the (nz, nz) blocks. Sharding the nz
dimension over a model axis splits both the FLOPs and the memory; XLA
GSPMD inserts the reduce-scatter/all-gather collectives around
``dot_general`` automatically (the "How to Scale Your Model" recipe: pick
a mesh, annotate shardings, let XLA place collectives on ICI).

The iteration-varying work (T = R + diag(1/d) factor/solves, (m, m))
stays batch-sharded only — it is the small dimension in the large-nz
regime this axis targets.

Usage::

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("batch", "model"))
    factors = prefactor_qp_tp(Q, G, A, mesh=mesh)        # TP prefactor
    sol = qpth_tpu.solve_qp_full(Q, p, G, h, A, b, factors=factors)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..ops import kkt as kkt_ops
from ..qp import DEFAULT_CONFIG
from ..utils import as_batched, normalize_constraints


def _nshard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def prefactor_qp_tp(Q, G, A=None, *, mesh: Mesh,
                    batch_axis: str = "batch", model_axis: str = "model",
                    config: SolverConfig = DEFAULT_CONFIG):
    """Tensor-parallel one-time KKT pre-factorization.

    Lays out the big operands with their nz dimension sharded over
    ``model_axis`` (and any real batch dimension over ``batch_axis``),
    then runs the standard pre-factorization under those constraints —
    GSPMD turns the Schur GEMMs into collective GEMMs over ICI. Returns
    the same ``KKTFactors`` pytree as :func:`qpth_tpu.prefactor_qp`
    (resulting arrays carry their computed shardings; pass to
    ``solve_qp``/``solve_qp_full`` as ``factors=``).
    """
    A, _ = normalize_constraints(A, A)
    Qb, _ = as_batched(Q, 3)
    Gb, _ = as_batched(G, 3)
    Ab = as_batched(A, 3)[0] if A is not None else None

    def bspec(M):
        return batch_axis if M.shape[0] > 1 else None

    # Q: shard rows of the (nz, nz) block; G/A: shard the nz (column) dim.
    q_s = _nshard(mesh, bspec(Qb), model_axis, None)
    g_s = _nshard(mesh, bspec(Gb), None, model_axis)
    # Pure-XLA kernels only: GSPMD partitions dot_general/cholesky freely
    # but cannot partition a pallas_call, so the lanes SPD-inverse kernel
    # is disabled under TP (the inverse representation itself is kept).
    modes = dict(kkt_ops.resolve_prefactor_modes(config, Qb.dtype),
                 use_pallas_kernels=False)

    csc = jax.lax.with_sharding_constraint

    def build(Qb, Gb, Ab):
        Qb = csc(Qb, q_s)
        Gb = csc(Gb, g_s)
        if Ab is not None:
            Ab = csc(Ab, _nshard(mesh, bspec(Ab), None, model_axis))
        return kkt_ops.pre_factor_kkt(Qb, Gb, Ab, **modes)

    args = (Qb, Gb) + ((Ab,) if Ab is not None else (None,))
    with mesh:
        return jax.jit(build)(*args)


def solve_qp_tp(Q, p, G, h, A=None, b=None, *, mesh: Mesh,
                batch_axis: str = "batch", model_axis: str = "model",
                config: SolverConfig = DEFAULT_CONFIG, init=None):
    """END-TO-END tensor-parallel IPM solve: the whole solve — TP
    prefactor, every per-iteration ``T = R + diag(1/d)`` blocked
    factorization, both per-iteration solves, and the backsubstitutions —
    runs model-sharded under a ("batch", "model") mesh. This is the path
    for FEW HUGE QPs (B < n_devices), where batch sharding alone leaves
    devices idle and one chip's HBM cannot hold the (nz, nz)/(m, m)
    blocks (SURVEY §5.7(b); the sharded algebra is the reference's Schur
    chain, batch.py:396-424, 435-470).

    Mechanism: inputs get their nz/m dimensions sharded over
    ``model_axis`` via ``with_sharding_constraint``; the solver runs with
    ``use_pallas="hybrid_xla"`` — the blocked right-looking hybrid
    factorization with NO pallas_call anywhere, so GSPMD can partition
    every op. Each device owns a band of block rows of R/T: panel GEMMs
    and triangle-only trailing updates are sharded dots (GSPMD places the
    diagonal-block broadcasts and panel all-gathers on ICI), and the
    substitution sweeps are sharded GEMVs. Per-device argument memory and
    trailing-update FLOPs drop by the model-axis size (measured:
    PERF.md round 5 / benchmarks/tp_accounting.py).

    Returns a :class:`qpth_tpu.QPSolution` (same contract as
    :func:`qpth_tpu.solve_qp_full`; original coordinates, honest stats).
    Forward-only — for training huge-QP layers differentiate
    :func:`qpth_tpu.solve_qp` with ``factors=prefactor_qp_tp(...)``.
    """
    import dataclasses

    from .. import qp as qp_mod
    from ..core import pdipm

    cfg = dataclasses.replace(config, use_pallas="hybrid_xla")
    Qb, pb, Gb, hb, Ab, bb, _ = qp_mod._canonicalize(Q, p, G, h, A, b)
    csc = jax.lax.with_sharding_constraint

    def bspec(M):
        return batch_axis if M.shape[0] > 1 else None

    def run(Qb, pb, Gb, hb, Ab, bb):
        Qb = csc(Qb, _nshard(mesh, bspec(Qb), model_axis, None))
        Gb = csc(Gb, _nshard(mesh, bspec(Gb), None, model_axis))
        if Ab is not None:
            Ab = csc(Ab, _nshard(mesh, bspec(Ab), None, model_axis))
        factors = qp_mod._build_factors(Qb, Gb, Ab, cfg)
        # Pin the iteration-critical cached products to a block-row
        # sharding so the while_loop's factor/solve work partitions the
        # same way every iteration (no resharding inside the loop).
        row = lambda M: _nshard(mesh, bspec(M), model_axis, None)
        repl = dict(
            R=csc(factors.R, row(factors.R)),
            invQ=csc(factors.invQ, row(factors.invQ)),
            invQ_GT=csc(factors.invQ_GT, row(factors.invQ_GT)),
            GiGT=(csc(factors.GiGT, row(factors.GiGT))
                  if factors.GiGT is not None else None),
        )
        if factors.S21 is not None:
            repl.update(
                invQ_AT=csc(factors.invQ_AT, row(factors.invQ_AT)),
                S21=csc(factors.S21, row(factors.S21)))
        factors = factors._replace(**repl)
        return pdipm.solve(Qb, pb, Gb, hb, Ab, bb, factors, cfg,
                           init=init)

    with mesh:
        if Ab is None:
            return jax.jit(lambda q, pp, g, hh: run(q, pp, g, hh, None,
                                                    None))(Qb, pb, Gb, hb)
        return jax.jit(run)(Qb, pb, Gb, hb, Ab, bb)


def factor_solve_hybrid_tp(T, v, *, mesh: Mesh, dinv=None,
                           model_axis: str = "model",
                           batch_axis: str | None = None):
    """Tensor-parallel per-iteration factorization: the blocked (hybrid)
    Cholesky of ``T (+ diag(dinv))`` with the matrix ROW dimension sharded
    over ``model_axis``, fused with the first solve.

    This extends the TP story past the prefactor (round-3's gap: the
    iteration-varying (m, m) T-factor stayed single-device, so one huge QP
    had no multi-chip path). The blocked right-looking algorithm
    (ops/hybrid.py) partitions naturally under a row sharding: each
    device owns a contiguous band of block rows; the panel GEMMs and
    triangle-only trailing updates stay device-local per block row, and
    GSPMD inserts the broadcast of each step's diagonal-block inverse and
    the panel all-gathers over ICI. Per-device memory and trailing-update
    FLOPs drop by the model-axis size (measured table in PERF.md).

    Returns ``(HybridFactor, x)`` with ``(T + diag(dinv)) x = v``; the
    factor's arrays keep their computed shardings, so subsequent
    :func:`qpth_tpu.ops.hybrid.solve_hybrid` calls under the mesh reuse
    the distributed layout.

    The m/model-axis split must align to the 128-block grid (m divisible
    by 128 * mesh.shape[model_axis]) so block rows never straddle
    devices.
    """
    from ..ops.hybrid import BLOCK, factor_solve_hybrid

    m = T.shape[-1]
    n_model = mesh.shape[model_axis]
    if m % (BLOCK * n_model) != 0:
        raise ValueError(
            f"m={m} must be divisible by {BLOCK} * n_model({n_model}) so "
            f"block rows align with shards")
    t_s = _nshard(mesh, batch_axis, model_axis, None)

    csc = jax.lax.with_sharding_constraint

    def run(T_, v_, dinv_):
        T_ = csc(T_, t_s)
        return factor_solve_hybrid(T_, v_, dinv=dinv_)

    with mesh:
        return jax.jit(run)(T, v, dinv)
