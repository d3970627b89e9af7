"""Double-word (two-float) compensated arithmetic — float64-grade residuals
in pure float32, so mixed-precision refinement runs on TPU with the Pallas
kernels live (Mosaic cannot compile under ``jax_enable_x64``; see
ops/kkt.py::pallas_hw_ok).

A value is represented as an unevaluated sum ``hi + lo`` of two float32
words with ``|lo| <= ulp(hi)/2``, giving ~2^-48 relative precision
(~3.6e-15) — comfortably below the 1e-8 parity gate. The algorithms are
the classic error-free transformations (Dekker 1971, Knuth TAOCP v2,
Joldes/Muller/Popescu 2017 "Tight and rigorous error bounds for basic
building blocks of double-word arithmetic"):

* ``two_sum`` — 6-op branch-free exact addition (Knuth);
* ``split``/``two_prod`` — Veltkamp splitting + Dekker exact product
  (no FMA dependence: TPU XLA exposes no fused-multiply-add primitive,
  and relying on implicit contraction would be fragile);
* ``dw_add`` / accurate renormalization (Joldes et al. AccurateDWPlusDW).

These rely on IEEE round-to-nearest of each individual op. XLA does not
re-associate or contract float arithmetic by default, so the identities
hold under jit on CPU and TPU; ``tests/test_dw.py`` pins them numerically
against float64 on both the elementwise ops and the matvec.

The reference instead runs float64 end-to-end
(``/root/reference/qpth/solvers/pdipm/batch.py`` with the f64 test contract
``/root/reference/test.py:69-96``); this module is the TPU-native substitute
for the residual computations where f64 hardware does not exist.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

#: Veltkamp splitting constant for float32: 2^12 + 1 (24-bit mantissa
#: splits into two 12-bit halves whose products are exact in f32).
_SPLIT_F32 = 4097.0


class DW(NamedTuple):
    """A double-word value: the unevaluated sum hi + lo."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape


def from_f32(x) -> DW:
    """Lift an exact single-word value (lo = 0)."""
    return DW(x, jnp.zeros_like(x))


def to_f64_np(x: DW):
    """Host-side exact read-out (for tests/parity measurement)."""
    import numpy as np

    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def fast_two_sum(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_sum(a, b):
    """Exact a + b = s + e, branch-free (Knuth; 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def split(a):
    """Veltkamp split: a = hi + lo with 12-bit halves (f32)."""
    c = _SPLIT_F32 * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact a * b = p + e (Dekker; no FMA)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dw_add_dw(x: DW, y: DW) -> DW:
    """Double-word + double-word (Joldes et al. alg. 6; ~2^-49 rel err)."""
    sh, sl = two_sum(x.hi, y.hi)
    th, tl = two_sum(x.lo, y.lo)
    c = sl + th
    vh, vl = fast_two_sum(sh, c)
    w = tl + vl
    return DW(*fast_two_sum(vh, w))


def dw_add_f32(x: DW, y) -> DW:
    """Double-word + single-word (Joldes et al. alg. 4)."""
    sh, sl = two_sum(x.hi, y)
    v = x.lo + sl
    return DW(*fast_two_sum(sh, v))


def dw_neg(x: DW) -> DW:
    return DW(-x.hi, -x.lo)


def dw_sub(x: DW, y: DW) -> DW:
    return dw_add_dw(x, dw_neg(y))


def dw_mul_f32(x: DW, y) -> DW:
    """Double-word * single-word (Joldes et al. alg. 9)."""
    ph, pl = two_prod(x.hi, y)
    pl = pl + x.lo * y
    return DW(*fast_two_sum(ph, pl))


def dw_mul_pow2(x: DW, y) -> DW:
    """Double-word * exact power of two: both words scale exactly —
    the reason scaling.py rounds its equilibration factors to powers
    of two."""
    return DW(x.hi * y, x.lo * y)


def dw_where(cond, x: DW, y: DW) -> DW:
    return DW(jnp.where(cond, x.hi, y.hi), jnp.where(cond, x.lo, y.lo))


def _dw_sum_last(h, l) -> DW:
    """Compensated reduction over the last axis via a binary tree of
    dw additions (log2(n) levels; each level is elementwise/vectorized,
    so the whole reduction stays on the VPU with no serial chain)."""
    n = h.shape[-1]
    # pad to a power of two with exact zeros
    np2 = 1
    while np2 < n:
        np2 *= 2
    if np2 != n:
        pad = [(0, 0)] * (h.ndim - 1) + [(0, np2 - n)]
        h = jnp.pad(h, pad)
        l = jnp.pad(l, pad)
    x = DW(h, l)
    while x.hi.shape[-1] > 1:
        m = x.hi.shape[-1] // 2
        a = DW(x.hi[..., :m], x.lo[..., :m])
        b = DW(x.hi[..., m:], x.lo[..., m:])
        x = dw_add_dw(a, b)
    return DW(x.hi[..., 0], x.lo[..., 0])


def dw_mv(M, x: DW) -> DW:
    """Compensated batched matvec  y = M @ x.

    M: (b, m, n) float32 (single-word data); x: DW over (B, n).
    Per element: two_prod(M, x.hi) is exact; M * x.lo (|x.lo| <=
    2^-24 |x.hi|) contributes below the 2^-48 target, so a plain product
    suffices. The n-term accumulation is the compensated tree above —
    the step single-precision dot products can't take (their f32
    accumulation is where the 1e-6-level residual plateau comes from).
    """
    ph, pe = two_prod(M, x.hi[..., None, :])
    pl = pe + M * x.lo[..., None, :]
    return _dw_sum_last(ph, pl)


def dw_mtv(M, x: DW) -> DW:
    """Compensated batched matvec with the transpose: y = M^T @ x."""
    MT = jnp.swapaxes(M, -1, -2)
    return dw_mv(MT, x)


def dw_dot_last(x: DW, y: DW) -> jnp.ndarray:
    """sum_j x_j * y_j over the last axis, hi word only (used for the
    duality measure, which needs relative — not absolute — accuracy)."""
    ph, pe = two_prod(x.hi, y.hi)
    pl = pe + x.hi * y.lo + x.lo * y.hi
    return _dw_sum_last(ph, pl).hi
