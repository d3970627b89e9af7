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
