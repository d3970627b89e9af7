"""Batch sharding of the QP solver over a TPU device mesh.

The reference has **no** multi-device code (SURVEY §2.5: the batch dimension
is its entire parallelism model, on one accelerator). The TPU framework makes
the batch a first-class mesh axis:

* QP instances are partitioned over devices (embarrassingly parallel IPM);
* the only cross-device communication the algorithm needs is the global
  termination predicate — "did any lane improve" and "max/min residual"
  (the reference's host-synced ``I.sum() > 0`` / ``best['resids'].max()``
  at batch.py:127,140) — which become ``lax.pmax``/``lax.pmin`` over the
  mesh axis, riding ICI;
* the backward pass needs zero communication (per-element outer products,
  qp.py:157-177) except the cotangent reduction for broadcast-shared
  parameters, which shard_map's autodiff inserts as a psum automatically.

Two entry points:
  * :func:`solve_qp_sharded` — explicit ``shard_map`` wrapper (collectives
    visible, guaranteed local compute);
  * plain ``jax.jit`` of :func:`qpth_tpu.solve_qp` with sharded inputs also
    works — XLA SPMD inserts the same collectives; use :func:`batch_sharding`
    to build the input shardings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..qp import DEFAULT_CONFIG, _canonicalize, _qp_core

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def batch_mesh(devices=None, axis: str = "batch") -> Mesh:
    """A 1-D mesh over all (or the given) devices for batch parallelism."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def solve_qp_sharded(Q, p, G, h, A=None, b=None, *,
                     mesh: Mesh,
                     config: SolverConfig = DEFAULT_CONFIG,
                     axis: str = "batch"):
    """Differentiable batched QP solve with the batch sharded over ``mesh``.

    Matrix parameters with a batch dimension are sharded with the batch;
    shared (unbatched) parameters are replicated — each shard then factors
    the shared problem once locally (no communication).

    The batch size must be divisible by the mesh axis size.
    """
    cfg = dataclasses.replace(config, axis_name=axis)
    Qb, pb, Gb, hb, Ab, bb, meta = _canonicalize(Q, p, G, h, A, b)
    B = meta[0]
    n_dev = mesh.shape[axis]
    if B % n_dev != 0:
        raise ValueError(
            f"Batch size {B} not divisible by mesh axis '{axis}' "
            f"size {n_dev}; pad the batch.")

    def mat_spec(M):
        return P(axis if (M is not None and M.shape[0] > 1) else None)

    in_specs = (mat_spec(Qb), P(axis), mat_spec(Gb), P(axis))
    args = [Qb, pb, Gb, hb]
    if Ab is not None:
        in_specs += (mat_spec(Ab), P(axis))
        args += [Ab, bb]

        def local(Qs, ps, Gs, hs, As, bs):
            return _qp_core(Qs, ps, Gs, hs, As, bs, None, None, cfg, meta)
    else:

        def local(Qs, ps, Gs, hs):
            return _qp_core(Qs, ps, Gs, hs, None, None, None, None, cfg,
                            meta)

    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
                   check_vma=False)
    return fn(*args)
