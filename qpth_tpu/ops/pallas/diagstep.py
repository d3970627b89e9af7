"""Fused IPM step for the diagonal-Q/G structured solver.

One pallas_call per iteration covering everything downstream of the MXU
M-assembly (M = A diag(1/H) A^T is a batched GEMM and stays in XLA):
in-kernel Cholesky + triangular inverse of the small (neq x neq) M,
predictor and corrector solves, the shared-A matvecs, Mehrotra centering,
optional Gondzio correctors, and the damped NaN-frozen state update —
the structured analog of ``lanes.py``'s ``ipm_step_eq_lanes``, an order
of magnitude smaller because the factored system is (neq x neq) instead
of (nineq x nineq).

Newton algebra (see core/diag.py):

    rt  = -rx + g*rs - g*d*rz          (rs = z for the predictor)
    dy  = M^-1 (A (rt/H) + ry)
    dx  = (rt - A^T dy) / H
    ds  = -rz - g*dx ;  dz = -rs - d*ds

Requires shared A (batch dim 1) — the OptNet constraint-learning layout;
batched-A problems use the composed path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanes import (SUB, _chol_inv_inplace_v, _default_interpret,
                    _inv_apply, _mtv_slabs, _mv_slabs, _step_lanes,
                    _write_eye, pad_up, pick_bt)

#: VMEM budget for the [M | inv] scratch (see lanes._VMEM_BUDGET).
_VMEM_BUDGET = 19 * 1024 * 1024


def diag_step_supported(n: int, neq: int, B: int) -> bool:
    """VMEM feasibility: [M | Minv] scratch + A + vector blocks."""
    if neq == 0:
        return False  # nothing to factor; XLA fuses the elementwise step
    q_p, n_p = pad_up(max(neq, 1)), pad_up(max(n, 1))
    import jax as _jax

    bt = 128 if _jax.default_backend() == "tpu" else min(B, 128)
    words = 2 * q_p * q_p * bt + q_p * n_p + 10 * n_p * bt + 4 * q_p * bt
    return words * 4 <= _VMEM_BUDGET


def _kernel(m_ref, a_ref, g_ref, h_ref, rx_ref, rz_ref, ry_ref,
            x_ref, s_ref, z_ref, y_ref,
            xo_ref, so_ref, zo_ref, yo_ref, u_vmem,
            *, n, n_p, q, q_p, bt, n_correctors):
    dtype = x_ref.dtype

    # [M | I] into scratch; factor+invert in place (no diagonal shift).
    u_vmem[:, 0:q_p, :] = m_ref[...]
    _write_eye(u_vmem, q_p, q_p, bt, dtype)
    zero_d = jnp.zeros((q_p, bt), dtype)
    _chol_inv_inplace_v(u_vmem, zero_d, q, q_p, bt)

    def apply_M(r):
        # r: (q, BT) -> M^-1 r via the cached triangular inverse.
        return _inv_apply(
            lambda k0, rows: u_vmem[k0:k0 + rows, q_p:, :], r, q, q_p)

    def padn(v):
        return jnp.pad(v, ((0, n_p - n), (0, 0))) if n_p != n else v

    def padq(v):
        return jnp.pad(v, ((0, q_p - q), (0, 0))) if q_p != q else v

    def a_mv(v):
        # A @ v: (q, BT) from v (n, BT); A rows in the tile dim.
        return _mv_slabs(lambda k0, r: a_ref[k0:k0 + r, :, :], padn(v), q)

    def a_mtv(v):
        # A^T @ v: (n, BT) from v (q, BT).
        return _mtv_slabs(lambda k0, r: a_ref[k0:k0 + r, :, :], v, q,
                          n_p, bt, dtype)[:n]

    x = x_ref[...]
    s = s_ref[...]
    z = z_ref[...]
    y = y_ref[...]
    g = g_ref[...]          # (n, 1) shared or (n, BT)
    H = h_ref[...]          # (n, BT)
    rx = rx_ref[...]
    rz = rz_ref[...]
    ry = ry_ref[...]
    d = z / s

    def newton(rt, ry_blk):
        rhs = a_mv(rt / H)
        if ry_blk is not None:
            rhs = rhs + ry_blk
        dy = apply_M(rhs)
        dx = (rt - a_mtv(dy)) / H
        return dx, dy

    # Predictor: rs = z.
    rt_a = -rx + g * z - g * d * rz
    dx_a, dy_a = newton(rt_a, ry)
    gdx_a = g * dx_a
    ds_a = -rz - gdx_a
    dz_a = -z - d * ds_a
    one = jnp.ones_like(d[0:1, :])
    alpha = jnp.minimum(
        jnp.minimum(_step_lanes(z, dz_a), _step_lanes(s, ds_a)), one)
    t2 = jnp.sum(s * z, axis=0, keepdims=True)
    t1 = jnp.sum((s + alpha * ds_a) * (z + alpha * dz_a), axis=0,
                 keepdims=True)
    sig = (t1 / t2) ** 3
    mu = jnp.abs(t2) / n

    # Corrector: RHS zero except rs.
    rs_c = (-(mu * sig) + ds_a * dz_a) / s
    rt_c = g * rs_c
    dx_c, dy_c = newton(rt_c, None)
    ds_c = -g * dx_c
    dz_c = -rs_c - d * ds_c
    dx, ds, dz = dx_a + dx_c, ds_a + ds_c, dz_a + dz_c
    dy = dy_a + dy_c

    for _ in range(n_correctors):
        a_g = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
        a_t = jnp.minimum(1.08 * a_g + 0.08, one)
        v = (s + a_t * ds) * (z + a_t * dz)
        mu_t = sig * mu
        rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
        rt_g = g * rs_g
        dx_g, dy_g = newton(rt_g, None)
        ds_g = -g * dx_g
        dz_g = -rs_g - d * ds_g
        dz_n, ds_n = dz + dz_g, ds + ds_g
        a_n = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz_n), _step_lanes(s, ds_n)), one)
        acc = a_n > a_g
        dz = jnp.where(acc, dz_n, dz)
        ds = jnp.where(acc, ds_n, ds)
        dx = jnp.where(acc, dx + dx_g, dx)
        dy = jnp.where(acc, dy + dy_g, dy)

    alpha2 = jnp.minimum(
        0.999 * jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
    bad = (jnp.max(jnp.where(jnp.isnan(dz) | jnp.isnan(ds), 1.0, 0.0),
                   axis=0, keepdims=True)
           + jnp.max(jnp.where(jnp.isnan(dx), 1.0, 0.0), axis=0,
                     keepdims=True)
           + jnp.max(jnp.where(jnp.isnan(dy), 1.0, 0.0), axis=0,
                     keepdims=True))
    frozen = bad > 0
    alpha2 = jnp.where(frozen, 0.0, alpha2)
    xo_ref[...] = x + alpha2 * jnp.where(frozen, 0.0, dx)
    so_ref[...] = s + alpha2 * jnp.where(frozen, 0.0, ds)
    zo_ref[...] = z + alpha2 * jnp.where(frozen, 0.0, dz)
    yo_ref[...] = y + alpha2 * jnp.where(frozen, 0.0, dy)


@functools.partial(jax.jit,
                   static_argnames=("n_correctors", "interpret"))
def diag_step_lanes(M_t, A_t, g_t, H_t, rx_t, rz_t, ry_t,
                    x_t, s_t, z_t, y_t, *,
                    n_correctors: int = 0, interpret: bool | None = None):
    """One fused structured-IPM iteration. Lanes layout:
    M_t (q_p, q_p, B) fresh per iteration; A_t (q_p, n_p, 1) shared;
    g_t (n, 1) or (n, B); H_t/rx_t/rz_t (n, B); ry_t (q, B);
    x (n, B); s/z (n, B); y (q, B). Returns (x', s', z', y')."""
    if interpret is None:
        interpret = _default_interpret()
    n, B = x_t.shape
    q = y_t.shape[0]
    q_p, n_p = M_t.shape[0], A_t.shape[1]
    assert q_p == pad_up(q) and n_p == pad_up(n)
    bt = pick_bt(B)
    g_shared = g_t.shape[-1] == 1

    def kernel(m_ref, a_ref, g_ref, h_ref, rx_ref, rz_ref, ry_ref,
               x_ref, s_ref, z_ref, y_ref,
               xo_ref, so_ref, zo_ref, yo_ref, u_vmem):
        _kernel(m_ref, a_ref, g_ref, h_ref, rx_ref, rz_ref, ry_ref,
                x_ref, s_ref, z_ref, y_ref,
                xo_ref, so_ref, zo_ref, yo_ref, u_vmem,
                n=n, n_p=n_p, q=q, q_p=q_p, bt=bt,
                n_correctors=n_correctors)

    vec = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i),  # noqa
                                    memory_space=pltpu.VMEM)
    gspec = (pl.BlockSpec((n, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
             if g_shared else vec(n))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((q_p, q_p, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_p, n_p, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            gspec, vec(n), vec(n), vec(n), vec(q),
            vec(n), vec(n), vec(n), vec(q),
        ],
        out_specs=[vec(n), vec(n), vec(n), vec(q)],
        out_shape=[
            jax.ShapeDtypeStruct((n, B), x_t.dtype),
            jax.ShapeDtypeStruct((n, B), x_t.dtype),
            jax.ShapeDtypeStruct((n, B), x_t.dtype),
            jax.ShapeDtypeStruct((q, B), x_t.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((q_p, 2 * q_p, bt), x_t.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(M_t, A_t, g_t, H_t, rx_t, rz_t, ry_t, x_t, s_t, z_t, y_t)
