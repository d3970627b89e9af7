"""Shape/broadcast utilities.

TPU-native rethink of the reference's ``qpth/util.py``: the reference
materializes every parameter at full batch size via ``expandParam``
(util.py:44-50) and then runs batched kernels over B identical copies.  Here
parameters keep a *minimal* leading batch dimension (1 when shared across the
batch, B when per-instance); all downstream linear algebra broadcasts, so a
shared ``Q``/``G``/``A`` is factored once and batched matvecs against shared
matrices become true MXU GEMMs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def is_empty(x) -> bool:
    """The reference's empty-constraint convention: ``torch.Tensor()``
    (qp.py:58-61, detected by ``nelement() > 0`` at qp.py:88). Here: None or
    any zero-sized array means "no constraints of this kind"."""
    return x is None or x.size == 0


def extract_nbatch(Q, p, G, h, A, b) -> int:
    """Infer the batch size from whichever parameter carries a batch dim.

    Mirror of util.py:53-59 (static — shapes are known at trace time).
    """
    dims = [3, 2, 3, 2, 3, 2]
    for param, d in zip((Q, p, G, h, A, b), dims):
        if param is not None and param.ndim == d:
            return param.shape[0]
    return 1


def as_batched(x, ndim: int):
    """Give ``x`` a leading batch dim of size 1 or B without copying.

    Unlike the reference's ``expandParam`` (util.py:44-50) this never
    materializes B copies: unbatched params become shape (1, ...) and rely on
    broadcasting downstream.

    Returns (batched_array, was_unbatched).
    """
    if x is None:
        return None, False
    if x.ndim == ndim:
        return x, False
    if x.ndim == ndim - 1:
        return x[None], True
    raise ValueError(
        f"Unexpected rank {x.ndim} for parameter expected at rank "
        f"{ndim - 1} or {ndim}."
    )


def get_sizes(G, A=None):
    """(nineq, nz, neq, nbatch) from batched G/A — util.py:22-33."""
    if G.ndim == 2:
        nineq, nz = G.shape
        nbatch = 1
    else:
        nbatch, nineq, nz = G.shape
    neq = None
    if A is not None:
        neq = A.shape[-2] if A.size > 0 else 0
    return nineq, nz, neq, nbatch


def bger(x, y):
    """Batched outer product — util.py:18-19. x: (B,m), y: (B,n) -> (B,m,n)."""
    return x[..., :, None] * y[..., None, :]


def bdiag(d):
    """Batched diag-embed — util.py:36-41 (without the boolean-mask trick)."""
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def normalize_constraints(A, b):
    """Map the empty-constraint convention to (None, None)."""
    if is_empty(A) or is_empty(b):
        return None, None
    return A, b
