"""Differentiable block-tridiagonal (banded) QP layer: ``solve_qp_banded``.

Public entry point of the banded structured tier (see
:mod:`qpth_tpu.core.banded` for the algebra): batched QPs

    min_x 1/2 x^T Q x + p^T x   s.t.  G x <= h,  A x = b

with *separable* G — every inequality row touches one variable
(diagonal G, box stacks [I; -I], variable bounds; see ``g_cols``) —

where Q is block-tridiagonal — Qd the (nb, bs, bs) diagonal blocks and Qe
the (nb-1, bs, bs) subdiagonal blocks (the superdiagonal blocks are the
implied transposes) — with exact implicit-KKT gradients to
(Qd, Qe, p, g, h, A, b).  The gradient formulas are the block restriction
of the reference's dense ones (/root/reference/qpth/qp.py:157-177):

    dQ = 1/2 (dx z^T + z dx^T)  restricted to the pattern gives
    dQd_i = 1/2 (dx_i z_i^T + z_i dx_i^T)  and, because Qe parameterizes
    both the (i+1, i) block and its transpose,
    dQe_i = dx_{i+1} z_i^T + z_{i+1} dx_i^T.

``SpQPFunction`` dispatches here automatically when its COO patterns are
banded-Q / diagonal-G (the MPC-chain workload); it can also be used
directly for receding-horizon layers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import QPSolution, SolverConfig
from .core import banded as band_core
from .qp import DEFAULT_CONFIG
from .utils import bger, normalize_constraints


def _canon_banded(Qd, Qe, p, g, h, A, b):
    """Canonicalize: blocks at minimal batch (1 when shared), vectors
    broadcast to (B, n) differentiably (the broadcast's vjp performs the
    unbatched-param sum reduction)."""
    A, b = normalize_constraints(A, b)
    Qd = jnp.asarray(Qd)
    Qe = jnp.asarray(Qe)
    if Qd.ndim == 3:
        Qd = Qd[None]
    if Qe.ndim == 3:
        Qe = Qe[None]
    arrs = [jnp.asarray(v) for v in (p, g, h)]
    B = max([a.shape[0] if a.ndim == 2 else 1 for a in arrs]
            + [Qd.shape[0]])
    if b is not None:
        b = jnp.asarray(b)
        B = max(B, b.shape[0] if b.ndim == 2 else 1)

    unb = [a.ndim == 1 for a in arrs]

    def vec(v):
        v = v[None] if v.ndim == 1 else v
        return jnp.broadcast_to(v, (B,) + v.shape[1:])

    pb, gb, hb = map(vec, arrs)
    if A is not None:
        A = jnp.asarray(A)
        Ab = A[None] if A.ndim == 2 else A
        bb = vec(b)
        unb.append(b.ndim == 1)
    else:
        Ab = bb = None
        unb.append(False)
    return Qd, Qe, pb, gb, hb, Ab, bb, (B,) + tuple(unb)


def _cols(meta):
    gc = meta[5]
    return None if gc is None else __import__("numpy").asarray(gc)


def _spec(meta):
    """The GeneralG spec (arbitrary-pattern G) or None (separable G)."""
    return meta[6]


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _band_core_fn(Qd, Qe, pb, gb, hb, Ab, bb, init, config: SolverConfig,
                  meta):
    return band_core.solve_banded(Qd, Qe, pb, gb, hb, Ab, bb, config,
                                  init=init, g_cols=_cols(meta),
                                  gen_g=_spec(meta)).z


def _band_fwd(Qd, Qe, pb, gb, hb, Ab, bb, init, config: SolverConfig,
              meta):
    sol = band_core.solve_banded(Qd, Qe, pb, gb, hb, Ab, bb, config,
                                 init=init, g_cols=_cols(meta),
                                 gen_g=_spec(meta))
    return sol.z, (sol.z, sol.lam, sol.s, sol.nu, Qd, Qe, gb, Ab, init)


def _band_bwd(config: SolverConfig, meta, res, dl_dz):
    """One extra banded KKT solve (qp.py:148-155's implicit
    differentiation restricted to the block pattern)."""
    zhat, lam, s, nu, Qd, Qe, gb, Ab, init = res
    B_global, p_unb, g_unb, h_unb, b_unb = meta[:5]
    B, n = zhat.shape
    nb, bs = Qd.shape[1], Qd.shape[-1]
    neq = Ab.shape[-2] if Ab is not None else 0
    dt = dl_dz.dtype

    c = config.grad_clamp
    d = jnp.maximum(lam, c) / jnp.maximum(s, c)
    Qd_full = jnp.broadcast_to(Qd, (B, nb, bs, bs))
    Qe_full = jnp.broadcast_to(Qe, (B, max(nb - 1, 0), bs, bs))
    g_cols = _cols(meta)
    spec = _spec(meta)
    dx, _, dlam, dnu = band_core.solve_kkt_banded(
        Qd_full, Qe_full, gb, Ab, d, dl_dz, config, g_cols=g_cols,
        gen_g=spec)
    import numpy as _np
    ci = (_np.arange(n) if g_cols is None else g_cols)

    # Block restriction of the dense gradient assembly (qp.py:157-177).
    dx_b = dx.reshape(B, nb, bs)
    z_b = zhat.reshape(B, nb, bs)
    dQd = 0.5 * (jnp.einsum("bni,bnj->bnij", dx_b, z_b)
                 + jnp.einsum("bni,bnj->bnij", z_b, dx_b))
    if nb > 1:
        dQe = (jnp.einsum("bni,bnj->bnij", dx_b[:, 1:], z_b[:, :-1])
               + jnp.einsum("bni,bnj->bnij", z_b[:, 1:], dx_b[:, :-1]))
    else:
        dQe = jnp.zeros((B, 0, bs, bs), dt)
    dp = dx
    if spec is not None:
        # Pattern restriction of dG = dlam z^T + lam dx^T: entry k is
        # (rows[k], cols[k]).
        gr_, gc_ = spec.rows, spec.cols
        dg = dlam[:, gr_] * zhat[:, gc_] + lam[:, gr_] * dx[:, gc_]
    else:
        # Separable-G restriction: row r touches only column ci[r].
        dg = dlam * zhat[:, ci] + lam * dx[:, ci]
    dh = -dlam
    mean_mode = config.broadcast_grad_reduction == "mean"
    if neq > 0:
        dA = bger(dnu, zhat) + bger(nu, dx)
        db = -dnu
        if Ab.shape[0] == 1 and B > 1:
            dA = dA.sum(axis=0, keepdims=True)
            if mean_mode:
                dA = dA / B_global
    else:
        dA = db = None

    def rmat(gr, canon_batch):
        if canon_batch == 1 and B > 1:
            gr = gr.sum(axis=0, keepdims=True)
            if mean_mode:
                gr = gr / B_global
        return gr

    dQd = rmat(dQd, Qd.shape[0])
    dQe = rmat(dQe, Qe.shape[0])

    def rvec(gr, was_unb):
        if gr is not None and mean_mode and was_unb and B_global > 1:
            return gr / B_global
        return gr

    dp, dg, dh = rvec(dp, p_unb), rvec(dg, g_unb), rvec(dh, h_unb)
    db = rvec(db, b_unb)
    d_init = (None if init is None
              else jax.tree_util.tree_map(jnp.zeros_like, init))
    return (dQd, dQe, dp, dg, dh, dA, db, d_init)


_band_core_fn.defvjp(_band_fwd, _band_bwd)


def solve_qp_banded(Qd, Qe, p, g, h, A=None, b=None,
                    config: SolverConfig = DEFAULT_CONFIG, init=None,
                    g_cols=None, g_spec=None):
    """Differentiable batched banded-structure QP solve; returns z*.

    Qd: (B?, nb, bs, bs) symmetric diagonal blocks of Q; Qe: (B?, nb-1,
    bs, bs) subdiagonal blocks; p: (B?, n) with n = nb*bs.

    G is separable (one variable per inequality row): g (B?, m) holds the
    row coefficients and ``g_cols`` (static, length m) the column each
    row touches. g_cols=None means G = diag(g) with m = n; box
    constraints [I; -I] are g_cols = list(range(n)) * 2 with
    g = [1]*n + [-1]*n. Alternatively ``g_spec``
    (:class:`qpth_tpu.core.banded.GeneralG`) describes an ARBITRARY
    fixed-pattern sparse G; ``g`` is then the (B?, nnz) entry values and
    its cotangent lands on the pattern. h: (B?, m); A: (B?, neq, n)
    dense or None; b matching. Unbatched parameters receive summed
    cotangents (``broadcast_grad_reduction`` as in
    :func:`qpth_tpu.solve_qp`).
    """
    if g_cols is not None and g_spec is not None:
        raise ValueError("g_cols and g_spec are mutually exclusive")
    Qd, Qe, pb, gb, hb, Ab, bb, meta = _canon_banded(Qd, Qe, p, g, h, A, b)
    gc = None if g_cols is None else tuple(int(c) for c in g_cols)
    return _band_core_fn(Qd, Qe, pb, gb, hb, Ab, bb, init, config,
                         meta + (gc, g_spec))


def solve_qp_banded_full(Qd, Qe, p, g, h, A=None, b=None,
                         config: SolverConfig = DEFAULT_CONFIG,
                         init=None, g_cols=None, g_spec=None) -> QPSolution:
    """Forward-only banded-structure solve with full primal-dual solution
    and stats (not differentiable). Same G contract as
    :func:`solve_qp_banded`."""
    Qd, Qe, pb, gb, hb, Ab, bb, _ = _canon_banded(Qd, Qe, p, g, h, A, b)
    import numpy as _np
    gc = None if g_cols is None else _np.asarray(g_cols)
    return band_core.solve_banded(Qd, Qe, pb, gb, hb, Ab, bb, config,
                                  init=init, g_cols=gc, gen_g=g_spec)
