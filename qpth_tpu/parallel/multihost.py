"""Multi-host (multi-process) initialization and mesh construction.

The reference has no distributed runtime at all (SURVEY §2.5 — grep for
nccl/mpi/distributed matches only LICENSE boilerplate); this module is the
TPU-native equivalent layer: JAX's multi-controller runtime over ICI
(intra-slice) and DCN (cross-host), with the QP batch as the single mesh
axis. The IPM needs exactly two global reductions per iteration (the
improvement flag and the max-residual termination predicate,
reference batch.py:127,140) and none in the backward pass, so batch
sharding weak-scales to pod slices with negligible communication.

Typical multi-host entry:

    import qpth_tpu.parallel as qp_par
    qp_par.init_multihost()                  # jax.distributed.initialize()
    mesh = qp_par.batch_mesh()               # all chips across all hosts
    z = qp_par.solve_qp_sharded(Q, p, G, h, mesh=mesh)

Each process feeds its local shard of the batch (use
``jax.make_array_from_process_local_data`` for host-local loading).
"""

from __future__ import annotations

from typing import Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-controller runtime (no-op if single
    process or already initialized).

    With no arguments, relies on the cluster environment (TPU pod
    metadata, SLURM, or GKE) to auto-configure — the common case on Cloud
    TPU. Explicit arguments mirror ``jax.distributed.initialize``.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            if jax.process_count() > 1:
                return  # already initialized by the runtime
        except RuntimeError:
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # Already initialized, or single-process environment without
        # cluster metadata — both fine for single-host use.
        pass


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) slice of the global batch this process owns under
    batch sharding with equal per-process shards."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n}")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
