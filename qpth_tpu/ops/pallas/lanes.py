"""Batch-in-lanes Pallas kernels for the per-iteration KKT factor/solve.

The hot per-IPM-iteration work is a batched Cholesky of ``T = R + diag(1/d)``
plus triangular solves — thousands of independent small (m x m) problems.
Direct factorizations have an irreducible chain of m sequential pivot steps,
so the only lever on TPU is making every sequential step a *full-width*
vector operation.

Layout: matrices are stored **transposed to (m_p, m_p, B)** — batch in the
lane (minor-most) dimension, matrix row in the leading (tile) dimension,
matrix column in the sublane dimension, with m_p = m rounded up to the
sublane tile (8). Every step of the recurrence then operates on
(m_p, 128)-shaped slabs at 100% VPU lane utilization, processing 128
independent QPs per vector op. Contrast the batch-major layout, where each
step touches a (BT, b) sliver at <=20% lane use and is latency-bound.

Kernels:
  * ``factor_kkt_lanes(R_t, dinv_t)`` -> ``Lt_t``: in-place right-looking
    rank-1 Cholesky of R + diag(dinv); the diagonal shift is folded into the
    pivot step (never materialized). One VMEM buffer per program, so batch
    tiles of 128 fit comfortably (~5.5 MB at m=100).
  * ``cho_solve_lanes(Lt_t, rhs_t)`` -> x: forward+back substitution; each
    step reads one row-slab ``Lt[j]``.
  * ``factor_solve_kkt_lanes``: both fused (the first solve reuses the
    factor while it is still in VMEM, saving one HBM round-trip of Lt).

These replace cuBLAS ``getrfBatched``/``getrsBatched`` in the reference
stack (lu_hack, /root/reference/qpth/solvers/pdipm/batch.py:8-20, call sites
292-470); SPD blocks make pivot-free Cholesky exact where the reference
disables LU pivoting on GPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # f32 sublane tile


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pick_bt(B: int, cap: int = 128) -> int:
    """Lane-tile size. Lane-dim DMA slices must be 128-aligned, so the
    only legal tilings are the whole array (B <= 128, no slicing) or
    128-wide slices (requires B % 128 == 0 — callers pad the batch)."""
    if B <= cap:
        return B
    if B % cap:
        raise ValueError(
            f"batch {B} > {cap} must be a multiple of {cap} for the lanes "
            f"kernels; pad the batch (see pad_batch_lanes)")
    return cap


def pad_batch_lanes(B: int) -> int:
    """Batch size after lane padding: next multiple of 128 when B > 128."""
    return B if B <= 128 else pad_up(B, 128)


#: Usable per-core VMEM for the fused kernel's [T | G] buffer (the v5e
#: scoped limit is ~20.9 MB; leave room for vector blocks and temps).
_VMEM_BUDGET = 19 * 1024 * 1024


def _support_bt(B: int) -> int:
    """Lane-tile size the kernel will actually run with. On hardware every
    batch is padded to a multiple of 128 lanes (pallas_lanes_backend's
    _padded_B), so bt is always 128 there even for tiny B; only interpret
    mode (CPU tests) runs unpadded."""
    import jax

    if jax.default_backend() == "tpu":
        return 128
    return min(pad_batch_lanes(B), 128)


def lanes_supported(m: int, B: int) -> bool:
    """Whether the lanes kernels fit VMEM for this problem size. The
    [T | G] working buffer is (m_p, 2 m_p, bt) f32 with bt the real lane
    tile (128 on hardware — see _support_bt); beyond m ~ 136 it cannot fit
    and callers must fall back to the XLA path."""
    m_p = pad_up(max(m, 1))
    bt = _support_bt(B)
    return 2 * m_p * m_p * bt * 4 <= _VMEM_BUDGET


def pad_up(n: int, m: int = SUB) -> int:
    return -(-n // m) * m


def pad_spd_lanes(R_t):
    """Zero-pad a lanes-layout matrix (m, m, b) to (m_p, m_p, b). Called
    once per solve (prepare step), never in the per-iteration path."""
    m = R_t.shape[0]
    m_p = pad_up(m)
    if m_p == m:
        return R_t
    return jnp.pad(R_t, ((0, m_p - m), (0, m_p - m), (0, 0)))


# ---------------------------------------------------------------------------
# In-place rank-1 Cholesky (lanes layout)
# ---------------------------------------------------------------------------

def _chol_inplace(t_ref, dinv_ref, n, n_p):
    """Right-looking rank-1 Cholesky of T = t_ref + diag(dinv), in place.

    t_ref: (n_p, n_p, BT); only the leading (n, n) block is factored. On
    exit row-slabs hold Lt: t_ref[j, k, :] = L[k, j] for n > k >= j (other
    entries are zero/garbage; consumers only read masked slabs). The
    diagonal shift dinv is folded into the pivot of step j — by then
    t_ref[j, j] has accumulated all rank-1 downdates, so adding dinv[j]
    lazily is exact. All slab reads/writes are full-width (alignment-free);
    the trailing update's column window starts at the aligned offset below
    j+1, touching a few already-dead columns (harmless, never read).
    """
    sub = lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    for j in range(n):
        row = t_ref[j, :, :]                          # (n_p, BT)
        piv = row[j:j + 1, :] + dinv_ref[j:j + 1, :]  # (1, BT)
        isq = lax.rsqrt(piv)
        lrow = jnp.where(sub == j, piv, row) * isq
        lrow = jnp.where(sub >= j, lrow, 0.0)
        t_ref[j, :, :] = lrow
        if j + 1 < n:
            c0 = ((j + 1) // SUB) * SUB               # aligned col window
            # Column j of the (symmetric) trailing block, scaled: the
            # per-row coefficients l[r] already live in the tile dim here,
            # avoiding a sublane->tile relayout of lrow.
            colj = t_ref[j + 1:n, j:j + 1, :] * isq[None]   # (n-j-1, 1, BT)
            lrow_w = jnp.expand_dims(lax.slice_in_dim(lrow, c0, n_p, axis=0),
                                     0)                     # (1, n_p-c0, BT)
            t_ref[j + 1:n, c0:, :] = (
                t_ref[j + 1:n, c0:, :] - colj * lrow_w)


def _solve_from_rows(lt_read, rhs, n):
    """Solve (L L^T) x = rhs given row access lt_read(j) -> (n, BT) slab
    (= column j of L over rows; zero-masked below the diagonal).
    rhs: (n, BT)."""
    sub = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # Forward substitution, SAXPY form: after step j, r[j] holds y_j.
    r = rhs
    for j in range(n):
        trow = lt_read(j)
        yj = r[j:j + 1, :] / trow[j:j + 1, :]
        r = jnp.where(sub == j, yj, r - jnp.where(sub > j, trow * yj, 0.0))
    # Back substitution, dot form: x_j = (y_j - Lt[j, j+1:] . x[j+1:]) / Ljj.
    x = jnp.zeros_like(r)
    for j in range(n - 1, -1, -1):
        trow = lt_read(j)
        s = jnp.sum(jnp.where(sub > j, trow * x, 0.0), axis=0, keepdims=True)
        xj = (r[j:j + 1, :] - s) / trow[j:j + 1, :]
        x = jnp.where(sub == j, xj, x)
    return x


# ---------------------------------------------------------------------------
# factor kernel (+ optional fused first solve)
# ---------------------------------------------------------------------------

def _factor_kernel(r_hbm, dinv_ref, lt_hbm, t_vmem, sem_in, sem_out,
                   *, n, n_p, bt, shared_r, whole, rhs_ref=None,
                   x_ref=None, r1_vmem=None):
    i = pl.program_id(0)

    def lane_slice(ref):
        return ref if whole else ref.at[:, :, pl.ds(i * bt, bt)]

    if shared_r:
        cp_in = pltpu.make_async_copy(r_hbm, r1_vmem, sem_in)
        cp_in.start()
        cp_in.wait()
        t_vmem[...] = jnp.broadcast_to(r1_vmem[...], (n_p, n_p, bt))
    else:
        cp_in = pltpu.make_async_copy(lane_slice(r_hbm), t_vmem, sem_in)
        cp_in.start()
        cp_in.wait()

    _chol_inplace(t_vmem, dinv_ref, n, n_p)

    if rhs_ref is not None:
        x_ref[...] = _solve_from_rows(
            lambda j: t_vmem[j, :, :][:n], rhs_ref[...], n)

    cp_out = pltpu.make_async_copy(t_vmem, lane_slice(lt_hbm), sem_out)
    cp_out.start()
    cp_out.wait()


def _factor_specs(n, n_p, B, bt, dtype, with_rhs, shared=False):
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((n_p, n_p, B), dtype)
    if with_rhs:
        in_specs.append(
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((n, bt), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((n, B), dtype)]
    scratch = [
        pltpu.VMEM((n_p, n_p, bt), dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if shared:
        scratch.append(pltpu.VMEM((n_p, n_p, 1), dtype))
    return in_specs, out_specs, out_shape, scratch


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_kkt_lanes(R_t, dinv_t, *, interpret: bool | None = None):
    """Lt_t = chol(R + diag(dinv))^T in lanes layout.

    R_t: (m_p, m_p, bR) zero-padded (see pad_spd_lanes), bR in {1, B};
    dinv_t: (m, B). Returns (m_p, m_p, B) where [j, k, b] = L_b[k, j] for
    m > k >= j (zero below the diagonal in each valid row slab).
    """
    if interpret is None:
        interpret = _default_interpret()
    n, B = dinv_t.shape
    n_p = R_t.shape[0]
    assert n_p == pad_up(n), (n, n_p)
    bt = pick_bt(B)
    shared = R_t.shape[-1] == 1
    def kernel(r_hbm, dinv_ref, lt_hbm, t_vmem, sem_in, sem_out, *scr):
        _factor_kernel(r_hbm, dinv_ref, lt_hbm, t_vmem, sem_in, sem_out,
                       n=n, n_p=n_p, bt=bt, shared_r=shared, whole=bt == B,
                       r1_vmem=scr[0] if scr else None)

    in_specs, out_specs, out_shape, scratch = _factor_specs(
        n, n_p, B, bt, dinv_t.dtype, with_rhs=False, shared=shared)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(R_t, dinv_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_solve_kkt_lanes(R_t, dinv_t, rhs_t, *,
                           interpret: bool | None = None):
    """Fused factor + first solve: returns (Lt_t, x_t) with
    (R + diag(dinv)) x = rhs."""
    if interpret is None:
        interpret = _default_interpret()
    n, B = dinv_t.shape
    n_p = R_t.shape[0]
    assert n_p == pad_up(n), (n, n_p)
    bt = pick_bt(B)
    shared = R_t.shape[-1] == 1

    def kernel(r_hbm, dinv_ref, rhs_ref, lt_hbm, x_ref, t_vmem,
               sem_in, sem_out, *scr):
        _factor_kernel(r_hbm, dinv_ref, lt_hbm, t_vmem, sem_in, sem_out,
                       n=n, n_p=n_p, bt=bt, shared_r=shared, whole=bt == B,
                       rhs_ref=rhs_ref, x_ref=x_ref,
                       r1_vmem=scr[0] if scr else None)

    in_specs, out_specs, out_shape, scratch = _factor_specs(
        n, n_p, B, bt, dinv_t.dtype, with_rhs=True, shared=shared)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(R_t, dinv_t, rhs_t)


# ---------------------------------------------------------------------------
# Fused Cholesky + triangular inverse: the fast path.
#
# A substitution solve is a ~2m-step latency chain no matter how wide each
# step is. Computing G = inv(L) once per factorization turns every
# subsequent solve into two issue-bound matvec sweeps (x = G^T (G r) as a
# sum of rank-1 applications), ~8x faster per solve. The inverse recurrence
# interleaves with the factorization: both consume the same freshly-updated
# column of the trailing matrix, so no transposed/mirrored copy of L is
# ever materialized.
# ---------------------------------------------------------------------------

def _write_eye(u_ref, col0, n_p, bt, dtype, chunk=SUB):
    """Initialize u_ref[:, col0:col0+n_p, :] = I without materializing the
    full (n_p, n_p, BT) broadcast (VMEM peak control)."""
    i1 = lax.broadcasted_iota(jnp.int32, (chunk, n_p, 1), 1)
    for k0 in range(0, n_p, chunk):
        i0 = lax.broadcasted_iota(jnp.int32, (chunk, n_p, 1), 0) + k0
        blk = jnp.broadcast_to((i0 == i1).astype(dtype), (chunk, n_p, bt))
        u_ref[k0:k0 + chunk, col0:col0 + n_p, :] = blk


def _chol_inv_inplace(u_ref, dinv_ref, n, n_p, bt):
    """Factor T (left half of u_ref) and simultaneously build G = inv(L)
    into the right half, in place.

    u_ref: (n_p, 2*n_p, BT) holding [T | G]; G half pre-initialized to I.
    Inverse recurrence (forward substitution on L G = I, interleaved):
        G[j]   <- G[j] / L[j,j]         (row j final at step j)
        G[k>j] <- G[k] - L[k,j] G[j]
    with L[k, j] tile-indexed for free: it is the freshly-downdated column
    j of the symmetric trailing block, scaled by rsqrt(pivot). Keeping T
    and G adjacent in the sublane dim means each step's two trailing
    updates (T cols >= j+1, G cols <= j) are ONE contiguous fused
    read-modify-write on the window [c0, n_p + cg) — halving the per-step
    dependency chain, which is what bounds this latency-dominated loop.
    """
    sub2 = lax.broadcasted_iota(jnp.int32, (2 * n_p, 1), 0)

    def scaled_row(urow, j):
        """Scale row j by rsqrt of its (shifted) pivot; T half zeroed below
        the diagonal, G half untouched (its support mask is structural —
        cols > j of G[j] are still exactly zero)."""
        piv = urow[j:j + 1, :] + dinv_ref[j:j + 1, :]  # (1, BT)
        isq = lax.rsqrt(piv)
        uj = jnp.where(sub2 == j, piv,
                       jnp.where(sub2 < j, 0.0, urow)) * isq
        return uj, isq

    def window(uj, c0, w1):
        """Aligned [c0, w1) slab of uj — T and G are adjacent in the
        sublane dim, so both trailing updates are one contiguous window."""
        return jnp.expand_dims(lax.slice_in_dim(uj, c0, w1, axis=0), 0)

    # Two pivot columns per trip: the trailing window gets ONE fused
    # rank-2 read-modify-write, halving its load/store traffic (the
    # issue-bound cost of this loop).
    j = 0
    while j < n:
        uj, isq = scaled_row(u_ref[j, :, :], j)
        u_ref[j, :, :] = uj
        if j + 1 == n:
            break
        colj = u_ref[j + 1:n, j:j + 1, :] * isq[None]   # (n-j-1, 1, BT)
        # Row j+1: apply column j's rank-1, then take its pivot.
        row1 = u_ref[j + 1, :, :] - colj[0] * uj
        uj1, isq1 = scaled_row(row1, j + 1)
        u_ref[j + 1, :, :] = uj1
        if j + 2 < n:
            # Column j+1 of the trailing rows, downdated by column j
            # (L[k,j]·L[j+1,j]) then scaled: col_j already carries L[k,j]
            # and colj[0] is L[j+1,j].
            colj1 = (u_ref[j + 2:n, j + 1:j + 2, :]
                     - colj[1:] * colj[0:1]) * isq1[None]
            # T cols >= j+2 start at the aligned offset below; G cols
            # <= j+1 end at the aligned offset above n_p + j+2.
            c0 = ((j + 1) // SUB) * SUB
            w1 = n_p + pad_up(j + 2)
            ujw, uj1w = window(uj, c0, w1), window(uj1, c0, w1)
            # Row-chunked RMW: caps the live temporary at (RC, ~n_p, BT)
            # so the kernel stays inside the VMEM scoped-allocation limit.
            RC = 4
            for r0 in range(j + 2, n, RC):
                r1_ = min(r0 + RC, n)
                s0, s1 = r0 - (j + 1), r1_ - (j + 1)
                u_ref[r0:r1_, c0:w1, :] = (
                    u_ref[r0:r1_, c0:w1, :]
                    - colj[s0:s1] * ujw
                    - colj1[s0 - 1:s1 - 1] * uj1w)
        j += 2


def _inv_apply(g_slab, rhs, n, n_p):
    """x = G^T (G rhs) = T^-1 rhs as a sum of rank-1 applications
    processed in 8-row slabs:
        w8 = sum_cols(G8 * r)        (8, BT)  independent reduces
        x += sum_rows(G8 * w8)       (n_p, BT)
    g_slab(k0, rows) -> (rows, n_p, BT). Slab grouping cuts the op count
    ~8x vs row-at-a-time; two alternating accumulators break the FMA
    chain. rhs: (n, BT). Padding rows of G are identity rows and r is
    zero there, so they contribute nothing."""
    if n_p != n:
        r = jnp.pad(rhs, ((0, n_p - n), (0, 0)))
    else:
        r = rhs
    acc = [jnp.zeros_like(r), jnp.zeros_like(r)]
    for idx, k0 in enumerate(range(0, n, SUB)):
        rows = min(SUB, n - k0)
        g8 = g_slab(k0, rows)                          # (rows, n_p, BT)
        w8 = jnp.sum(g8 * r[None], axis=1)             # (rows, BT)
        acc[idx % 2] = acc[idx % 2] + jnp.sum(
            g8 * w8[:, None, :], axis=0)               # (n_p, BT)
    return (acc[0] + acc[1])[:n]


def _factor_inv_kernel(r_hbm, dinv_ref, g_hbm, u_vmem, sem_in, sem_out,
                       *, n, n_p, bt, shared_r, whole,
                       rhs_ref=None, x_ref=None, r1_vmem=None,
                       z_ref=None):
    i = pl.program_id(0)

    def lane_slice(ref):
        # Lane-dim DMA slices must be 128-aligned; with a single program
        # (B == bt) the whole ref is used instead.
        return ref if whole else ref.at[:, :, pl.ds(i * bt, bt)]

    if shared_r:
        # A 1-lane slice of u_vmem is not a legal DMA target (lane
        # alignment); land the shared R in its own (n_p, n_p, 1) scratch
        # and lane-broadcast from there.
        cp_in = pltpu.make_async_copy(r_hbm, r1_vmem, sem_in)
        cp_in.start()
        # Identity init of the G half overlaps the in-flight DMA (the DMA
        # targets the disjoint T half / scratch).
        _write_eye(u_vmem, n_p, n_p, bt, dinv_ref.dtype)
        cp_in.wait()
        u_vmem[:, 0:n_p, :] = jnp.broadcast_to(
            r1_vmem[...], (n_p, n_p, bt))
    else:
        cp_in = pltpu.make_async_copy(
            lane_slice(r_hbm), u_vmem.at[:, 0:n_p, :], sem_in)
        cp_in.start()
        _write_eye(u_vmem, n_p, n_p, bt, dinv_ref.dtype)
        cp_in.wait()

    rhs = rhs_ref[...] if rhs_ref is not None else None
    if z_ref is not None:
        # Fold the R @ z matvec into this kernel — R is already resident
        # (the T half of U, before the lazy diagonal shift), so this saves
        # a full HBM read of R in the IPM's predictor RHS. Independent
        # row-dot reductions, issue-bound.
        z = z_ref[...]
        if n_p != n:
            z = jnp.pad(z, ((0, n_p - n), (0, 0)))
        rz_rows = [jnp.sum(u_vmem[k0:k0 + min(SUB, n - k0), 0:n_p, :]
                           * z[None], axis=1)
                   for k0 in range(0, n, SUB)]
        rhs = rhs - jnp.concatenate(rz_rows, axis=0)[:n]

    _chol_inv_inplace(u_vmem, dinv_ref, n, n_p, bt)

    # The out-DMA and the in-VMEM solve both only READ the finished G
    # half, so the solve runs under the DMA.
    cp_out = pltpu.make_async_copy(
        u_vmem.at[:, n_p:, :], lane_slice(g_hbm), sem_out)
    cp_out.start()
    if rhs is not None:
        x_ref[...] = _inv_apply(
            lambda k0, rows: u_vmem[k0:k0 + rows, n_p:, :], rhs, n, n_p)
    cp_out.wait()


def _factor_inv_call(R_t, dinv_t, rhs_t, interpret, z_t=None):
    n, B = dinv_t.shape
    n_p = R_t.shape[0]
    assert n_p == pad_up(n), (n, n_p)
    bt = pick_bt(B)
    shared = R_t.shape[-1] == 1
    with_rhs = rhs_t is not None
    assert z_t is None or with_rhs
    dtype = dinv_t.dtype

    whole = bt == B

    if z_t is not None:
        def kernel(r_hbm, dinv_ref, rhs_ref, z_ref, g_hbm, x_ref, u_vmem,
                   sem_in, sem_out, *scr):
            _factor_inv_kernel(r_hbm, dinv_ref, g_hbm, u_vmem,
                               sem_in, sem_out, n=n, n_p=n_p, bt=bt,
                               shared_r=shared, whole=whole,
                               rhs_ref=rhs_ref, x_ref=x_ref, z_ref=z_ref,
                               r1_vmem=scr[0] if scr else None)
    elif with_rhs:
        def kernel(r_hbm, dinv_ref, rhs_ref, g_hbm, x_ref, u_vmem,
                   sem_in, sem_out, *scr):
            _factor_inv_kernel(r_hbm, dinv_ref, g_hbm, u_vmem,
                               sem_in, sem_out, n=n, n_p=n_p, bt=bt,
                               shared_r=shared, whole=whole,
                               rhs_ref=rhs_ref, x_ref=x_ref,
                               r1_vmem=scr[0] if scr else None)
    else:
        def kernel(r_hbm, dinv_ref, g_hbm, u_vmem, sem_in, sem_out, *scr):
            _factor_inv_kernel(r_hbm, dinv_ref, g_hbm, u_vmem,
                               sem_in, sem_out, n=n, n_p=n_p, bt=bt,
                               shared_r=shared, whole=whole,
                               r1_vmem=scr[0] if scr else None)

    vec_spec = pl.BlockSpec((n, bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), vec_spec]
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((n_p, n_p, B), dtype)
    if with_rhs:
        in_specs.append(vec_spec)
        if z_t is not None:
            in_specs.append(vec_spec)
        out_specs = [out_specs, vec_spec]
        out_shape = [out_shape, jax.ShapeDtypeStruct((n, B), dtype)]
    args = ((R_t, dinv_t) + ((rhs_t,) if with_rhs else ())
            + ((z_t,) if z_t is not None else ()))
    scratch = [
        pltpu.VMEM((n_p, 2 * n_p, bt), dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if shared:
        scratch.append(pltpu.VMEM((n_p, n_p, 1), dtype))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_inv_lanes(R_t, dinv_t, *, interpret: bool | None = None):
    """G = inv(chol(R + diag(dinv))) in lanes layout: (m_p, m_p, B) with
    G[i, k, b] = inv(L_b)[i, k]."""
    if interpret is None:
        interpret = _default_interpret()
    return _factor_inv_call(R_t, dinv_t, None, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_inv_solve_lanes(R_t, dinv_t, rhs_t, *,
                           interpret: bool | None = None):
    """Fused inverse-factor + first solve: (G, x) with
    (R + diag(dinv)) x = rhs."""
    if interpret is None:
        interpret = _default_interpret()
    return _factor_inv_call(R_t, dinv_t, rhs_t, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_inv_solve_rz_lanes(R_t, dinv_t, q_t, z_t, *,
                              interpret: bool | None = None):
    """Fused inverse-factor + solve with in-kernel RHS assembly:
    (G, x) with (R + diag(dinv)) x = q - R z. The R @ z matvec reads R
    from VMEM (already loaded for the factorization), saving one full HBM
    pass over R versus computing the RHS outside."""
    if interpret is None:
        interpret = _default_interpret()
    return _factor_inv_call(R_t, dinv_t, q_t, interpret, z_t=z_t)


def _inv_solve_kernel(g_ref, rhs_ref, x_ref, *, n, n_p):
    x_ref[...] = _inv_apply(lambda k0, rows: g_ref[k0:k0 + rows, :, :],
                            rhs_ref[...], n, n_p)


@functools.partial(jax.jit, static_argnames=("interpret",))
def inv_solve_lanes(G_t, rhs_t, *, interpret: bool | None = None):
    """x = T^-1 rhs from the cached triangular inverse G = inv(L).
    G_t: (m_p, m_p, B); rhs_t: (m, B) -> (m, B)."""
    if interpret is None:
        interpret = _default_interpret()
    n, B = rhs_t.shape
    n_p = G_t.shape[0]
    bt = pick_bt(B)
    return pl.pallas_call(
        functools.partial(_inv_solve_kernel, n=n, n_p=n_p),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((n_p, n_p, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), rhs_t.dtype),
        interpret=interpret,
    )(G_t, rhs_t)


# ---------------------------------------------------------------------------
# Fused whole-IPM-step kernel (neq == 0 fast path).
#
# One pallas_call per IPM iteration doing: T = R + diag(s/z) factor +
# triangular inverse, predictor RHS (R @ z folded), predictor solve,
# step-to-boundary, Mehrotra centering, corrector solve(s), combined dx
# via Q^-1 G^T (DMA'd in under the factorization), and the damped state
# update. The inverse never leaves VMEM and per-lane reductions (alpha,
# mu, sigma) run in the lane layout, eliminating the separate corrector
# kernel, the G HBM round-trip, and several XLA matvecs + transposes.
# ---------------------------------------------------------------------------

def _step_lanes(v, dv, big=3.4e38):
    """Per-lane max step with v + a dv >= 0: min over the sublane dim of
    -v/dv on decreasing coords (batch.py:210-213). v, dv: (m, BT)."""
    a = jnp.where(dv < 0, -v / dv, big)
    return jnp.min(a, axis=0, keepdims=True)         # (1, BT)


def _ipm_step_kernel(r_hbm, igt_hbm, x_ref, s_ref, z_ref, q_ref, ip_ref,
                     xo_ref, so_ref, zo_ref, ao_ref, u_vmem, igt_vmem,
                     sem_r, sem_g, *, nz, nz_p, m, m_p, bt, whole,
                     shared_r, shared_g, n_correctors, r1_vmem=None):
    i = pl.program_id(0)

    def lane_slice(ref):
        return ref if whole else ref.at[:, :, pl.ds(i * bt, bt)]

    # Start both input DMAs; Q^-1 G^T is only needed at the very end, so
    # its transfer hides entirely under the factorization.
    if shared_r:
        cp_r = pltpu.make_async_copy(r_hbm, r1_vmem, sem_r)
    else:
        cp_r = pltpu.make_async_copy(
            lane_slice(r_hbm), u_vmem.at[:, 0:m_p, :], sem_r)
    cp_r.start()
    # Shared Q^-1 G^T (the OptNet-layer pattern: shared constraints,
    # per-example p) lands in a 1-lane scratch and broadcasts at use.
    cp_g = pltpu.make_async_copy(
        igt_hbm if shared_g else lane_slice(igt_hbm), igt_vmem, sem_g)
    cp_g.start()
    _write_eye(u_vmem, m_p, m_p, bt, x_ref.dtype)
    cp_r.wait()
    if shared_r:
        u_vmem[:, 0:m_p, :] = jnp.broadcast_to(
            r1_vmem[...], (m_p, m_p, bt))

    x = x_ref[...]                                    # (nz, BT)
    s = s_ref[...]                                    # (m, BT)
    z = z_ref[...]
    d = z / s
    dinv = s / z

    # Predictor RHS: q - R z (T half still holds raw R).
    zp = jnp.pad(z, ((0, m_p - m), (0, 0))) if m_p != m else z
    rz_rows = [jnp.sum(u_vmem[k0:k0 + min(SUB, m - k0), 0:m_p, :]
                       * zp[None], axis=1)
               for k0 in range(0, m, SUB)]
    rhs_a = q_ref[...] - jnp.concatenate(rz_rows, axis=0)[:m]

    dinv_pad = jnp.pad(dinv, ((0, m_p - m), (0, 0)),
                       constant_values=1.0) if m_p != m else dinv
    _chol_inv_inplace_v(u_vmem, dinv_pad, m, m_p, bt)

    def apply_T(rhs):
        return _inv_apply(
            lambda k0, rows: u_vmem[k0:k0 + rows, m_p:, :], rhs, m, m_p)

    # Predictor.
    dz_a = apply_T(rhs_a)
    ds_a = (-z - dz_a) / d
    one = jnp.ones_like(d[0:1, :])
    alpha = jnp.minimum(
        jnp.minimum(_step_lanes(z, dz_a), _step_lanes(s, ds_a)), one)
    # Mehrotra centering (batch.py:163-168); mu per lane.
    t2 = jnp.sum(s * z, axis=0, keepdims=True)        # (1, BT)
    t1 = jnp.sum((s + alpha * ds_a) * (z + alpha * dz_a), axis=0,
                 keepdims=True)
    sig = (t1 / t2) ** 3
    mu = jnp.abs(t2) / m

    # Corrector (RHS zero except rs).
    rs_c = (-(mu * sig) + ds_a * dz_a) / s
    dz_c = apply_T(-(rs_c / d))
    ds_c = (-rs_c - dz_c) / d
    dz = dz_a + dz_c
    ds = ds_a + ds_c

    # Optional Gondzio centrality corrections (config.n_correctors).
    for _ in range(n_correctors):
        a_g = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
        a_t = jnp.minimum(1.08 * a_g + 0.08, one)
        v = (s + a_t * ds) * (z + a_t * dz)
        mu_t = sig * mu
        rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
        ddz = apply_T(-(rs_g / d))
        dds = (-rs_g - ddz) / d
        dz_n, ds_n = dz + ddz, ds + dds
        a_n = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz_n), _step_lanes(s, ds_n)), one)
        acc = a_n > a_g
        dz = jnp.where(acc, dz_n, dz)
        ds = jnp.where(acc, ds_n, ds)

    # Combined dx = -(x + Q^-1 p) - Q^-1 G^T (z + dz).
    cp_g.wait()
    zdz = z + dz
    zdzp = jnp.pad(zdz, ((0, m_p - m), (0, 0))) if m_p != m else zdz
    dx_rows = [
        -jnp.sum(igt_vmem[k0:k0 + min(SUB, nz - k0), 0:m_p, :]
                 * zdzp[None], axis=1)
        for k0 in range(0, nz, SUB)
    ]  # shared_g: the 1-lane slab broadcasts against (m_p, BT) zdzp
    dx = jnp.concatenate(dx_rows, axis=0)[:nz] - (x + ip_ref[...])

    # Damped update with per-lane NaN freeze (batch.py:189-203 + the
    # try/except bail-out replaced by lane masking).
    alpha2 = jnp.minimum(
        0.999 * jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
    bad = (jnp.max(jnp.where(jnp.isnan(dz) | jnp.isnan(ds), 1.0, 0.0),
                   axis=0, keepdims=True)
           + jnp.max(jnp.where(jnp.isnan(dx), 1.0, 0.0), axis=0,
                     keepdims=True))
    # Freeze bad lanes by masking alpha AND the directions (0 * NaN = NaN
    # would otherwise poison the lane's running state permanently).
    frozen = bad > 0
    alpha2 = jnp.where(frozen, 0.0, alpha2)
    xo_ref[...] = x + alpha2 * jnp.where(frozen, 0.0, dx)
    so_ref[...] = s + alpha2 * jnp.where(frozen, 0.0, ds)
    zo_ref[...] = z + alpha2 * jnp.where(frozen, 0.0, dz)
    # The applied damped step length, for the caller's incremental
    # residual tracking (the feasibility residuals scale by exactly
    # 1 - alpha per iteration; see pdipm.solve's tracked-residual mode).
    ao_ref[...] = alpha2


def _mv_slabs(read, v_pad, out_n):
    """Rows-in-tile matvec: out[i] = sum_k M[i, k] v[k], 8-row slabs.
    read(k0, rows) -> (rows, in_p, BT); v_pad (in_p, BT)."""
    rows = [jnp.sum(read(k0, min(SUB, out_n - k0)) * v_pad[None], axis=1)
            for k0 in range(0, out_n, SUB)]
    return jnp.concatenate(rows, axis=0)[:out_n]


def _mtv_slabs(read, v, in_n, out_p, bt, dtype):
    """Transposed matvec: out[c] = sum_r M[r, c] v[r], accumulating over
    8-row slabs. read(k0, rows) -> (rows, out_p, BT); v (in_n, BT)."""
    acc = jnp.zeros((out_p, bt), dtype)
    for k0 in range(0, in_n, SUB):
        rows = min(SUB, in_n - k0)
        vs = v[k0:k0 + rows]
        acc = acc + jnp.sum(read(k0, rows) * vs[:, None, :], axis=0)
    return acc


def _ipm_step_eq_kernel(r_hbm, igt_hbm, s21_hbm, w_hbm, is11_hbm, s11_hbm,
                        iat_hbm, x_ref, s_ref, z_ref, y_ref, q_ref, ip_ref,
                        rb_ref, xo_ref, so_ref, zo_ref, yo_ref, ao_ref,
                        u_vmem, igt_vmem, s21_vmem, w_vmem, is11_vmem,
                        s11_vmem, iat_vmem, sems,
                        *, nz, nz_p, m, m_p, neq, neq_p, bt, whole,
                        shared_r, shared_g, shared_eq, n_correctors,
                        r1_vmem=None):
    """Equality-constrained variant of the fused IPM step: adds the
    S11/S21/W Schur algebra (reference batch.py:349-372's dy path) to the
    in-kernel iteration. All equality operands stream in under the
    factorization."""
    i = pl.program_id(0)

    def lane_slice(ref, shared):
        if shared:
            return ref
        return ref if whole else ref.at[:, :, pl.ds(i * bt, bt)]

    if shared_r:
        cp_r = pltpu.make_async_copy(r_hbm, r1_vmem, sems.at[0])
    else:
        cp_r = pltpu.make_async_copy(
            lane_slice(r_hbm, False), u_vmem.at[:, 0:m_p, :], sems.at[0])
    cp_r.start()
    copies = [
        pltpu.make_async_copy(lane_slice(igt_hbm, shared_g), igt_vmem,
                              sems.at[1]),
        pltpu.make_async_copy(lane_slice(s21_hbm, shared_eq), s21_vmem,
                              sems.at[2]),
        pltpu.make_async_copy(lane_slice(w_hbm, shared_eq), w_vmem,
                              sems.at[3]),
        pltpu.make_async_copy(lane_slice(is11_hbm, shared_eq), is11_vmem,
                              sems.at[4]),
        pltpu.make_async_copy(lane_slice(s11_hbm, shared_eq), s11_vmem,
                              sems.at[5]),
        pltpu.make_async_copy(lane_slice(iat_hbm, shared_eq), iat_vmem,
                              sems.at[6]),
    ]
    for cp in copies:
        cp.start()
    _write_eye(u_vmem, m_p, m_p, bt, x_ref.dtype)
    cp_r.wait()
    if shared_r:
        u_vmem[:, 0:m_p, :] = jnp.broadcast_to(
            r1_vmem[...], (m_p, m_p, bt))
    for cp in copies[1:]:   # eq operands are needed before the solve
        cp.wait()

    dtype = x_ref.dtype
    x = x_ref[...]
    s = s_ref[...]
    z = z_ref[...]
    y = y_ref[...]                                    # (neq, BT)
    d = z / s
    dinv = s / z

    def padm(v):
        return jnp.pad(v, ((0, m_p - m), (0, 0))) if m_p != m else v

    def padq(v):
        return (jnp.pad(v, ((0, neq_p - neq), (0, 0)))
                if neq_p != neq else v)

    zp = padm(z)
    # r1 = rb + S21^T z + S11 y;  u = S11^-1 (-r1)
    s21t_z = _mtv_slabs(lambda k0, r: s21_vmem[k0:k0 + r, :, :], z, m,
                        neq_p, bt, dtype)[:neq]
    s11_y = _mv_slabs(lambda k0, r: s11_vmem[k0:k0 + r, :, :], padq(y),
                      neq)
    r1 = rb_ref[...] + s21t_z + s11_y
    u = _mv_slabs(lambda k0, r: is11_vmem[k0:k0 + r, :, :], padq(-r1),
                  neq)
    # W z and the RHS correction S21 (Wz + y + u)
    wz = _mv_slabs(lambda k0, r: w_vmem[k0:k0 + r, :, :], zp, neq)
    v_eq = padq(wz + y + u)
    s21_v = _mv_slabs(lambda k0, r: s21_vmem[k0:k0 + r, :, :], v_eq, m)
    rz_rows = [jnp.sum(u_vmem[k0:k0 + min(SUB, m - k0), 0:m_p, :]
                       * zp[None], axis=1)
               for k0 in range(0, m, SUB)]
    rhs_a = q_ref[...] - s21_v - jnp.concatenate(rz_rows, axis=0)[:m]

    dinv_pad = jnp.pad(dinv, ((0, m_p - m), (0, 0)),
                       constant_values=1.0) if m_p != m else dinv
    _chol_inv_inplace_v(u_vmem, dinv_pad, m, m_p, bt)

    def apply_T(rhs):
        return _inv_apply(
            lambda k0, rows: u_vmem[k0:k0 + rows, m_p:, :], rhs, m, m_p)

    def w_apply(dzv):
        return _mv_slabs(lambda k0, r: w_vmem[k0:k0 + r, :, :],
                         padm(dzv), neq)

    # Predictor.
    dz_a = apply_T(rhs_a)
    dy_a = u - w_apply(dz_a)
    ds_a = (-z - dz_a) / d
    one = jnp.ones_like(d[0:1, :])
    alpha = jnp.minimum(
        jnp.minimum(_step_lanes(z, dz_a), _step_lanes(s, ds_a)), one)
    t2 = jnp.sum(s * z, axis=0, keepdims=True)
    t1 = jnp.sum((s + alpha * ds_a) * (z + alpha * dz_a), axis=0,
                 keepdims=True)
    sig = (t1 / t2) ** 3
    mu = jnp.abs(t2) / m

    rs_c = (-(mu * sig) + ds_a * dz_a) / s
    dz_c = apply_T(-(rs_c / d))
    ds_c = (-rs_c - dz_c) / d
    dz = dz_a + dz_c
    ds = ds_a + ds_c
    dy = dy_a - w_apply(dz_c)

    for _ in range(n_correctors):
        a_g = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
        a_t = jnp.minimum(1.08 * a_g + 0.08, one)
        v = (s + a_t * ds) * (z + a_t * dz)
        mu_t = sig * mu
        rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
        ddz = apply_T(-(rs_g / d))
        dds = (-rs_g - ddz) / d
        dz_n, ds_n = dz + ddz, ds + dds
        a_n = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz_n), _step_lanes(s, ds_n)), one)
        acc = a_n > a_g
        dz = jnp.where(acc, dz_n, dz)
        ds = jnp.where(acc, ds_n, ds)
        dy = jnp.where(acc, dy - w_apply(ddz), dy)

    # dx = -(x + Q^-1 p) - Q^-1 G^T (z+dz) - Q^-1 A^T (y+dy)
    cp_g = copies[0]
    cp_g.wait()
    igt_zdz = _mv_slabs(lambda k0, r: igt_vmem[k0:k0 + r, :, :],
                        padm(z + dz), nz)
    iat_ydy = _mv_slabs(lambda k0, r: iat_vmem[k0:k0 + r, :, :],
                        padq(y + dy), nz)
    dx = -(x + ip_ref[...]) - igt_zdz - iat_ydy

    alpha2 = jnp.minimum(
        0.999 * jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
    bad = (jnp.max(jnp.where(jnp.isnan(dz) | jnp.isnan(ds), 1.0, 0.0),
                   axis=0, keepdims=True)
           + jnp.max(jnp.where(jnp.isnan(dx), 1.0, 0.0), axis=0,
                     keepdims=True)
           + jnp.max(jnp.where(jnp.isnan(dy), 1.0, 0.0), axis=0,
                     keepdims=True))
    # Mask alpha AND directions: see _ipm_step_kernel's freeze comment.
    frozen = bad > 0
    alpha2 = jnp.where(frozen, 0.0, alpha2)
    xo_ref[...] = x + alpha2 * jnp.where(frozen, 0.0, dx)
    so_ref[...] = s + alpha2 * jnp.where(frozen, 0.0, ds)
    zo_ref[...] = z + alpha2 * jnp.where(frozen, 0.0, dz)
    yo_ref[...] = y + alpha2 * jnp.where(frozen, 0.0, dy)
    ao_ref[...] = alpha2    # see _ipm_step_kernel's alpha-output comment


def _chol_inv_inplace_v(u_vmem, dinv_pad, m, m_p, bt):
    """_chol_inv_inplace with dinv given as a padded (m_p, BT) value
    instead of a ref."""

    class _Wrap:
        def __getitem__(self, idx):
            return dinv_pad[idx]

    _chol_inv_inplace(u_vmem, _Wrap(), m, m_p, bt)


@functools.partial(jax.jit,
                   static_argnames=("n_correctors", "interpret"))
def ipm_step_lanes(R_t, iGT_t, x_t, s_t, z_t, q_t, ip_t, *,
                   n_correctors: int = 0, interpret: bool | None = None):
    """One fused IPM iteration (neq == 0). Lanes layout:
    R_t (m_p, m_p, bR); iGT_t = (Q^-1 G^T)^T-layout (nz_p, m_p, B);
    x_t (nz, B); s_t, z_t, q_t (m, B); ip_t = (Q^-1 p)^T (nz, B).
    Returns updated (x_t, s_t, z_t, alpha_t) with alpha_t (1, B) the
    applied damped step length (0 for NaN-frozen lanes)."""
    if interpret is None:
        interpret = _default_interpret()
    m, B = s_t.shape
    nz = x_t.shape[0]
    m_p = R_t.shape[0]
    nz_p = iGT_t.shape[0]
    assert m_p == pad_up(m) and nz_p == pad_up(nz)
    bt = pick_bt(B)
    shared = R_t.shape[-1] == 1
    shared_g = iGT_t.shape[-1] == 1
    whole = bt == B

    def kernel(r_hbm, igt_hbm, x_ref, s_ref, z_ref, q_ref, ip_ref,
               xo_ref, so_ref, zo_ref, ao_ref, u_vmem, igt_vmem,
               sem_r, sem_g, *scr):
        _ipm_step_kernel(r_hbm, igt_hbm, x_ref, s_ref, z_ref, q_ref,
                         ip_ref, xo_ref, so_ref, zo_ref, ao_ref,
                         u_vmem, igt_vmem,
                         sem_r, sem_g, nz=nz, nz_p=nz_p, m=m, m_p=m_p,
                         bt=bt, whole=whole, shared_r=shared,
                         shared_g=shared_g, n_correctors=n_correctors,
                         r1_vmem=scr[0] if scr else None)

    vec = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i),  # noqa
                                    memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((m_p, 2 * m_p, bt), x_t.dtype),
        pltpu.VMEM((nz_p, m_p, 1 if shared_g else bt), x_t.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if shared:
        scratch.append(pltpu.VMEM((m_p, m_p, 1), x_t.dtype))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vec(nz), vec(m), vec(m), vec(m), vec(nz),
        ],
        out_specs=[vec(nz), vec(m), vec(m), vec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((nz, B), x_t.dtype),
            jax.ShapeDtypeStruct((m, B), x_t.dtype),
            jax.ShapeDtypeStruct((m, B), x_t.dtype),
            jax.ShapeDtypeStruct((1, B), x_t.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(R_t, iGT_t, x_t, s_t, z_t, q_t, ip_t)


def ipm_step_supported(nz: int, m: int, B: int, neq: int = 0,
                       xfree: bool = False) -> bool:
    """VMEM feasibility of the fused step: [T | G] buffer + Q^-1 G^T
    (+ the equality-constraint operands S21/W/S11/S11^-1/Q^-1 A^T).

    ``xfree``: the coefficient-tracked-x variant never touches Q^-1 G^T /
    Q^-1 A^T inside the kernel (x is reconstructed at residual
    checkpoints from carried scalars; see core/pdipm.py), so its VMEM
    bound is independent of nz."""
    m_p, nz_p = pad_up(max(m, 1)), pad_up(max(nz, 1))
    bt = _support_bt(B)
    words = 2 * m_p * m_p + (0 if xfree else nz_p * m_p)
    if neq > 0:
        q_p = pad_up(neq)
        words += 2 * m_p * q_p + 2 * q_p * q_p
        if not xfree:
            words += nz_p * q_p
    return words * bt * 4 <= _VMEM_BUDGET


def _ipm_step_xfree_kernel(r_hbm, s_ref, z_ref, q_ref,
                           zto_ref, so_ref, zo_ref, ao_ref, u_vmem,
                           sem_r, *, m, m_p, bt, whole, shared_r,
                           n_correctors, r1_vmem=None):
    """x-free fused IPM step (neq == 0): identical predictor/corrector/
    Gondzio algebra to _ipm_step_kernel, but x never enters the kernel.
    The caller tracks x = e*x0 - c*Q^-1 p - Q^-1 G^T w through the scalar
    recurrences e' = (1-a)e, c' = (1-a)c + a, w' = (1-a)w + a*(z + dz)
    (exact by linearity of the combined-dx formula, core/pdipm.py), so
    this kernel needs neither the Q^-1 G^T stream (one full HBM pass per
    iteration in _ipm_step_kernel) nor the x/ip vectors. Outputs the
    direction anchor zeta = z + dz (NaN-frozen lanes masked to zeta = z)
    alongside (s', z', alpha)."""
    i = pl.program_id(0)

    def lane_slice(ref):
        return ref if whole else ref.at[:, :, pl.ds(i * bt, bt)]

    if shared_r:
        cp_r = pltpu.make_async_copy(r_hbm, r1_vmem, sem_r)
    else:
        cp_r = pltpu.make_async_copy(
            lane_slice(r_hbm), u_vmem.at[:, 0:m_p, :], sem_r)
    cp_r.start()
    _write_eye(u_vmem, m_p, m_p, bt, s_ref.dtype)
    cp_r.wait()
    if shared_r:
        u_vmem[:, 0:m_p, :] = jnp.broadcast_to(
            r1_vmem[...], (m_p, m_p, bt))

    s = s_ref[...]                                    # (m, BT)
    z = z_ref[...]
    d = z / s
    dinv = s / z

    # Predictor RHS: q - R z (T half still holds raw R).
    zp = jnp.pad(z, ((0, m_p - m), (0, 0))) if m_p != m else z
    rz_rows = [jnp.sum(u_vmem[k0:k0 + min(SUB, m - k0), 0:m_p, :]
                       * zp[None], axis=1)
               for k0 in range(0, m, SUB)]
    rhs_a = q_ref[...] - jnp.concatenate(rz_rows, axis=0)[:m]

    dinv_pad = jnp.pad(dinv, ((0, m_p - m), (0, 0)),
                       constant_values=1.0) if m_p != m else dinv
    _chol_inv_inplace_v(u_vmem, dinv_pad, m, m_p, bt)

    def apply_T(rhs):
        return _inv_apply(
            lambda k0, rows: u_vmem[k0:k0 + rows, m_p:, :], rhs, m, m_p)

    # Predictor.
    dz_a = apply_T(rhs_a)
    ds_a = (-z - dz_a) / d
    one = jnp.ones_like(d[0:1, :])
    alpha = jnp.minimum(
        jnp.minimum(_step_lanes(z, dz_a), _step_lanes(s, ds_a)), one)
    t2 = jnp.sum(s * z, axis=0, keepdims=True)        # (1, BT)
    t1 = jnp.sum((s + alpha * ds_a) * (z + alpha * dz_a), axis=0,
                 keepdims=True)
    sig = (t1 / t2) ** 3
    mu = jnp.abs(t2) / m

    # Corrector (RHS zero except rs).
    rs_c = (-(mu * sig) + ds_a * dz_a) / s
    dz_c = apply_T(-(rs_c / d))
    ds_c = (-rs_c - dz_c) / d
    dz = dz_a + dz_c
    ds = ds_a + ds_c

    for _ in range(n_correctors):
        a_g = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
        a_t = jnp.minimum(1.08 * a_g + 0.08, one)
        v = (s + a_t * ds) * (z + a_t * dz)
        mu_t = sig * mu
        rs_g = (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t)) / s
        ddz = apply_T(-(rs_g / d))
        dds = (-rs_g - ddz) / d
        dz_n, ds_n = dz + ddz, ds + dds
        a_n = jnp.minimum(
            jnp.minimum(_step_lanes(z, dz_n), _step_lanes(s, ds_n)), one)
        acc = a_n > a_g
        dz = jnp.where(acc, dz_n, dz)
        ds = jnp.where(acc, ds_n, ds)

    alpha2 = jnp.minimum(
        0.999 * jnp.minimum(_step_lanes(z, dz), _step_lanes(s, ds)), one)
    # NaN freeze from (dz, ds) only: dx = -(x + ip) - iGT (z+dz) is NaN
    # exactly when dz is (x/ip/iGT are finite loop invariants — a NaN
    # there poisons the init solve and is caught by pdipm's fail-soft
    # init), so dropping dx from the check loses nothing.
    frozen = jnp.max(jnp.where(jnp.isnan(dz) | jnp.isnan(ds), 1.0, 0.0),
                     axis=0, keepdims=True) > 0
    alpha2 = jnp.where(frozen, 0.0, alpha2)
    dz_m = jnp.where(frozen, 0.0, dz)
    zto_ref[...] = z + dz_m
    so_ref[...] = s + alpha2 * jnp.where(frozen, 0.0, ds)
    zo_ref[...] = z + alpha2 * dz_m
    ao_ref[...] = alpha2


@functools.partial(jax.jit,
                   static_argnames=("n_correctors", "interpret"))
def ipm_step_xfree_lanes(R_t, s_t, z_t, q_t, *,
                         n_correctors: int = 0,
                         interpret: bool | None = None):
    """One fused x-free IPM iteration (neq == 0, coefficient-tracked x).
    Lanes layout: R_t (m_p, m_p, bR); s_t, z_t, q_t (m, B). Returns
    (zeta_t, s_t', z_t', alpha_t) with zeta = z + dz (the w-recurrence
    anchor) and alpha_t (1, B) the applied damped step length."""
    if interpret is None:
        interpret = _default_interpret()
    m, B = s_t.shape
    m_p = R_t.shape[0]
    assert m_p == pad_up(m)
    bt = pick_bt(B)
    shared = R_t.shape[-1] == 1
    whole = bt == B

    def kernel(r_hbm, s_ref, z_ref, q_ref, zto_ref, so_ref, zo_ref,
               ao_ref, u_vmem, sem_r, *scr):
        _ipm_step_xfree_kernel(r_hbm, s_ref, z_ref, q_ref,
                               zto_ref, so_ref, zo_ref, ao_ref, u_vmem,
                               sem_r, m=m, m_p=m_p, bt=bt, whole=whole,
                               shared_r=shared, n_correctors=n_correctors,
                               r1_vmem=scr[0] if scr else None)

    vec = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i),  # noqa
                                    memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((m_p, 2 * m_p, bt), s_t.dtype),
        pltpu.SemaphoreType.DMA,
    ]
    if shared:
        scratch.append(pltpu.VMEM((m_p, m_p, 1), s_t.dtype))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vec(m), vec(m), vec(m),
        ],
        out_specs=[vec(m), vec(m), vec(m), vec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((m, B), s_t.dtype),
            jax.ShapeDtypeStruct((m, B), s_t.dtype),
            jax.ShapeDtypeStruct((m, B), s_t.dtype),
            jax.ShapeDtypeStruct((1, B), s_t.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(R_t, s_t, z_t, q_t)


@functools.partial(jax.jit,
                   static_argnames=("n_correctors", "interpret"))
def ipm_step_eq_lanes(R_t, iGT_t, S21_t, W_t, iS11_t, S11_t, iAT_t,
                      x_t, s_t, z_t, y_t, q_t, ip_t, rb_t, *,
                      n_correctors: int = 0, interpret: bool | None = None):
    """One fused IPM iteration with equality constraints. Lanes layout:
    R_t (m_p, m_p, bR); iGT_t (nz_p, m_p, bG); S21_t (m_p, neq_p, bE);
    W_t (neq_p, m_p, bE); iS11_t/S11_t (neq_p, neq_p, bE);
    iAT_t (nz_p, neq_p, bE); vectors x (nz, B), s/z/q (m, B),
    y/rb (neq, B), ip (nz, B). Returns (x', s', z', y', alpha_t)."""
    if interpret is None:
        interpret = _default_interpret()
    m, B = s_t.shape
    nz = x_t.shape[0]
    neq = y_t.shape[0]
    m_p, nz_p, neq_p = R_t.shape[0], iGT_t.shape[0], W_t.shape[0]
    bt = pick_bt(B)
    shared_r = R_t.shape[-1] == 1
    shared_g = iGT_t.shape[-1] == 1
    shared_eq = S21_t.shape[-1] == 1
    whole = bt == B

    def kernel(r_hbm, igt_hbm, s21_hbm, w_hbm, is11_hbm, s11_hbm, iat_hbm,
               x_ref, s_ref, z_ref, y_ref, q_ref, ip_ref, rb_ref,
               xo_ref, so_ref, zo_ref, yo_ref, ao_ref,
               u_vmem, igt_vmem, s21_vmem, w_vmem, is11_vmem, s11_vmem,
               iat_vmem, sems, *scr):
        _ipm_step_eq_kernel(
            r_hbm, igt_hbm, s21_hbm, w_hbm, is11_hbm, s11_hbm, iat_hbm,
            x_ref, s_ref, z_ref, y_ref, q_ref, ip_ref, rb_ref,
            xo_ref, so_ref, zo_ref, yo_ref, ao_ref,
            u_vmem, igt_vmem, s21_vmem, w_vmem, is11_vmem, s11_vmem,
            iat_vmem, sems, nz=nz, nz_p=nz_p, m=m, m_p=m_p, neq=neq,
            neq_p=neq_p, bt=bt, whole=whole, shared_r=shared_r,
            shared_g=shared_g, shared_eq=shared_eq,
            n_correctors=n_correctors, r1_vmem=scr[0] if scr else None)

    vec = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i),  # noqa
                                    memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    be = 1 if shared_eq else bt
    scratch = [
        pltpu.VMEM((m_p, 2 * m_p, bt), x_t.dtype),
        pltpu.VMEM((nz_p, m_p, 1 if shared_g else bt), x_t.dtype),
        pltpu.VMEM((m_p, neq_p, be), x_t.dtype),
        pltpu.VMEM((neq_p, m_p, be), x_t.dtype),
        pltpu.VMEM((neq_p, neq_p, be), x_t.dtype),
        pltpu.VMEM((neq_p, neq_p, be), x_t.dtype),
        pltpu.VMEM((nz_p, neq_p, be), x_t.dtype),
        pltpu.SemaphoreType.DMA((7,)),
    ]
    if shared_r:
        scratch.append(pltpu.VMEM((m_p, m_p, 1), x_t.dtype))
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[any_] * 7 + [vec(nz), vec(m), vec(m), vec(neq), vec(m),
                               vec(nz), vec(neq)],
        out_specs=[vec(nz), vec(m), vec(m), vec(neq), vec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((nz, B), x_t.dtype),
            jax.ShapeDtypeStruct((m, B), x_t.dtype),
            jax.ShapeDtypeStruct((m, B), x_t.dtype),
            jax.ShapeDtypeStruct((neq, B), x_t.dtype),
            jax.ShapeDtypeStruct((1, B), x_t.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(R_t, iGT_t, S21_t, W_t, iS11_t, S11_t, iAT_t,
      x_t, s_t, z_t, y_t, q_t, ip_t, rb_t)


# ---------------------------------------------------------------------------
# solve kernel (factor already in HBM)
# ---------------------------------------------------------------------------

def _solve_kernel(lt_ref, rhs_ref, x_ref, *, n):
    x_ref[...] = _solve_from_rows(
        lambda j: lt_ref[j, :, :][:n], rhs_ref[...], n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cho_solve_lanes(Lt_t, rhs_t, *, interpret: bool | None = None):
    """Solve (L L^T) x = rhs in lanes layout. Lt_t: (m_p, m_p, B) from
    factor_kkt_lanes; rhs_t: (m, B). Returns (m, B)."""
    if interpret is None:
        interpret = _default_interpret()
    n, B = rhs_t.shape
    n_p = Lt_t.shape[0]
    bt = pick_bt(B)
    return pl.pallas_call(
        functools.partial(_solve_kernel, n=n),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((n_p, n_p, bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), rhs_t.dtype),
        interpret=interpret,
    )(Lt_t, rhs_t)
