"""Ruiz equilibration of the QP data (problem scaling).

The reference sidesteps conditioning entirely by running float64 with
pivoted CPU LU (``/root/reference/qpth/solvers/pdipm/batch.py:450-467``
and the f64 test contract ``/root/reference/test.py:69-96``).  A TPU-native
float32 solver cannot: the f32 Schur-complement chain loses ~cond(KKT) * eps
per solve, so badly row/column-scaled problems (MPC chains, mixed-unit
models) hit 1e-1-to-NaN residuals that no amount of iterative refinement
recovers.  The standard tool — used by every production f32/mixed-precision
IPM (OSQP, HPIPM, Clarabel) — is *Ruiz equilibration*: symmetric diagonal
scaling of the KKT data matrix

    M = [[Q, G^T, A^T],
         [G,  0,   0 ],
         [A,  0,   0 ]]

to unit infinity-norm rows/columns, plus a scalar cost normalization.

Scaled problem (E: variable scaling, R_G / R_A: constraint row scalings,
c: cost scaling):

    Q~ = c E Q E      p~ = c E p
    G~ = R_G G E      h~ = R_G h
    A~ = R_A A E      b~ = R_A b

Solution/dual mapping back to the original problem (derivation: substitute
x = E x~ into the scaled KKT conditions and divide the stationarity row
by c E):

    x = E x~      lam = R_G lam~ / c      nu = R_A nu~ / c      s = s~ / R_G

and the backward pass's KKT solve maps the same way: feeding the scaled
system rx~ = c E rx returns (dx~, dlam~, dnu~) with dx = E dx~,
dlam = R_G dlam~ / c, dnu = R_A dnu~ / c, where the scaled complementarity
diagonal is d~ = c d / R_G^2 (since lam~/s~ = (c lam / R_G)/(R_G s)).

Two TPU-motivated design choices beyond textbook Ruiz:

* **Power-of-two scalings** (default): every scaling factor is rounded to
  the nearest power of two, so applying and un-applying the scaling is
  EXACT in floating point — equilibration adds zero rounding error of its
  own, and the double-word refinement's low words survive unscaling by a
  plain two-float multiply. Equilibration quality loses at most a factor
  sqrt(2) per entry, which the iteration absorbs.

* **Batch-collapsed scalings on mixed-batch inputs**: scalings are
  per-lane only when every supplied matrix carries the same batch > 1.
  If any matrix is shared (batch 1) the norms are max-reduced over the
  batch and one shared scaling is used — a per-lane scaling would
  otherwise materialize the shared matrix at full batch (B x nz x nz),
  destroying the shared-problem prefactor-once fast path (the OptNet
  layer pattern: shared Q/G/h, per-example p).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Scaling(NamedTuple):
    """Diagonal equilibration of a batch of QPs (minimal batch dims)."""

    #: Variable scaling, (b, nz).
    E: jnp.ndarray
    #: Inequality row scaling, (b, nineq).
    RG: jnp.ndarray
    #: Equality row scaling, (b, neq); None when neq == 0.
    RA: Optional[jnp.ndarray]
    #: Cost scaling, (b, 1) — broadcasts against (B, nz) vectors.
    c: jnp.ndarray


def _pow2(x):
    """Round positive values to the nearest power of two (exact scaling).

    ldexp with an integer exponent is exact by construction; jnp.exp2 is
    NOT (XLA lowers it to exp(x * ln 2), which rounds — measured
    2^4 -> 15.999999999999996 on CPU f64)."""
    return jnp.ldexp(jnp.ones_like(x), jnp.round(jnp.log2(x)).astype(jnp.int32))


def _safe(n):
    """Guard zero norms (empty rows/cols scale by 1)."""
    return jnp.where(n > 0, n, 1.0)


def _colmax(M, b):
    """max_i |M[i, j]| per column j, batch max-reduced to b lanes."""
    m = jnp.abs(M).max(axis=-2)
    if M.shape[0] > b:
        m = m.max(axis=0, keepdims=True)
    return m


def _rowmax(M, b):
    m = jnp.abs(M).max(axis=-1)
    if M.shape[0] > b:
        m = m.max(axis=0, keepdims=True)
    return m


def _wcolmax(aM, r, b):
    """Column norms of diag(r) @ aM: max_i r_i aM[i, j], batch-collapsed.

    aM is an |original-matrix| EXPRESSION (never materialized — the
    row-weighting multiply fuses into the reduction's read of M), r the
    accumulated row scaling. With pow2 scalings every multiply is exact,
    so this equals the column norm of the materialized scaled matrix
    bit-for-bit."""
    m = (aM * r[..., :, None]).max(axis=-2)
    if aM.shape[0] > b:
        m = m.max(axis=0, keepdims=True)
    return m


def _wrowmax(aM, cw, b):
    """Row norms of aM @ diag(cw): max_j aM[i, j] cw_j, batch-collapsed."""
    m = (aM * cw[..., None, :]).max(axis=-1)
    if aM.shape[0] > b:
        m = m.max(axis=0, keepdims=True)
    return m


def scale_Q(Q, s: Scaling):
    """Apply the scaling to Q: Q~ = c E Q E (exact: pow2 factors)."""
    return Q * (s.c[..., None] * s.E[..., :, None] * s.E[..., None, :])


def scale_G(G, s: Scaling):
    """Apply the scaling to G: G~ = R_G G E."""
    return G * (s.RG[..., :, None] * s.E[..., None, :])


def scale_A(A, s: Scaling):
    """Apply the scaling to A: A~ = R_A A E (None passes through)."""
    if A is None:
        return None
    return A * (s.RA[..., :, None] * s.E[..., None, :])


def ruiz_scalings(Q, G, A=None, iters: int = 4, pow2: bool = True,
                  axis_name=None, probe: bool = False,
                  probe_spread: float = 16.0, return_ok: bool = False):
    """Compute Ruiz scalings (NOT the scaled matrices — apply with
    :func:`scale_Q`/:func:`scale_G`/:func:`scale_A`, whose elementwise
    multiplies fuse into the consumers' first read).

    Q: (bQ, nz, nz) SPD; G: (bG, nineq, nz); A: (bA, neq, nz) or None —
    minimal batch dims as produced by qp._canonicalize.

    ``axis_name``: when running inside shard_map with mixed-batch inputs,
    the batch-collapse reduction must span the GLOBAL batch (a local max
    would give each shard different scalings for the same shared matrix);
    collapsed norms are pmax'd over this axis.

    ``probe``: one-iteration fast path for already-well-scaled data. When
    the per-lane row/column norm spreads (max/min) are <= ``probe_spread``
    and magnitudes sit inside [2^-32, 2^32], Ruiz converges in ONE
    iteration (the norms are near-uniform; pow2 rounding makes further
    sweeps exact no-ops — verified on the fail-soft fixture, identical
    result at iters 1/2/4) — and that one iteration's scalings come
    straight from the probe's norms, with the cost scalar approximated
    from the same norms, so the light branch performs ZERO matrix reads
    beyond the probe itself. Badly scaled data takes the full
    ``iters``-sweep branch via ``lax.cond``. Well-scaled workloads (the
    headline's random dense QPs) then pay ~one |Q|/|G| read instead of
    ~3 ms of sweeps, while KEEPING the block-rebalancing benefit of
    equilibration (scaling the Q block against the constraint norms is
    what rescues borderline-factorizable f32 problems — a pure
    skip-to-identity measurably loses it). Measured: PERF.md round 5.
    """
    dt = Q.dtype
    bQ, nz = Q.shape[0], Q.shape[-1]
    bG, nineq = G.shape[0], G.shape[-2]
    bA = A.shape[0] if A is not None else None
    batches = [bQ, bG] + ([bA] if A is not None else [])
    bmax = max(batches)
    # Per-lane scalings only when every matrix carries the same batch.
    b = bmax if all(x == bmax for x in batches) else 1
    collapsing = (b == 1 and bmax > 1)

    def _gmax(v):
        """Finish a batch-collapsed max globally under shard_map."""
        if collapsing and axis_name is not None:
            return jax.lax.pmax(v, axis_name)
        return v

    # Norm-only computation: the scaled matrices are NEVER materialized.
    # Each iteration needs only the row/column infinity norms of the
    # currently-scaled KKT blocks, and with diagonal scalings those are
    # weighted norms of the ORIGINAL data (|Qs_ij| = E_i |Q_ij| E_j,
    # |Gs_ij| = RG_i |G_ij| E_j) — computed by fused read-only passes.
    # Materializing per iteration would cost ~2 full read+write passes
    # over (Q, G) per Ruiz step: ~3.6 ms of pure HBM traffic at the
    # headline shape (B=4096, nz=m=100). With pow2 scalings the weighted
    # norms (and the one-shot application) are bit-identical to the
    # materializing loop.
    aQ, aG = jnp.abs(Q), jnp.abs(G)
    aA = jnp.abs(A) if A is not None else None

    probe = probe and iters > 0

    # First-iteration norms (unit scalings) — shared by the probe and the
    # full branch's first step, so the probe read is never wasted.
    caQ = _gmax(_colmax(aQ, b))
    cn0 = jnp.maximum(caQ, _gmax(_colmax(aG, b)))
    if A is not None:
        cn0 = jnp.maximum(cn0, _gmax(_colmax(aA, b)))
    rg0 = _gmax(_rowmax(aG, b))
    ra0 = _gmax(_rowmax(aA, b)) if A is not None else None

    def run_ruiz(_):
        E = jnp.ones((b, nz), dt)
        RG = jnp.ones((b, nineq), dt)
        RA = jnp.ones((b, A.shape[-2]), dt) if A is not None else None
        for k in range(iters):
            if k == 0:
                cn, rg, ra = cn0, rg0, ra0
            else:
                # Column norms of the full KKT matrix per variable: the Q
                # block's columns plus G's (and A's) columns.
                cn = jnp.maximum(_wcolmax(aQ, E, b) * E,
                                 _wcolmax(aG, RG, b) * E)
                if A is not None:
                    cn = jnp.maximum(cn, _wcolmax(aA, RA, b) * E)
                cn = _gmax(cn)
                rg = _gmax(_wrowmax(aG, E, b) * RG)
                ra = (_gmax(_wrowmax(aA, E, b) * RA)
                      if A is not None else None)
            dE = 1.0 / jnp.sqrt(_safe(cn))
            dG = 1.0 / jnp.sqrt(_safe(rg))
            dA = 1.0 / jnp.sqrt(_safe(ra)) if A is not None else None
            if pow2:
                dE, dG = _pow2(dE), _pow2(dG)
                dA = _pow2(dA) if dA is not None else None
            E, RG = E * dE, RG * dG
            RA = RA * dA if A is not None else None

        # Cost normalization from Q alone (using p would make the scaling
        # per-solve and per-lane, materializing shared matrices — see
        # module docstring). Mean scaled-column norm of Q, as in OSQP's
        # rho rule.
        qn = _gmax(_wcolmax(aQ, E, b) * E).mean(axis=-1, keepdims=True)
        c = 1.0 / _safe(qn)
        if pow2:
            c = _pow2(c)
        if A is None:
            return E, RG, c
        return E, RG, RA, c

    if not probe:
        out = run_ruiz(None)
    else:
        def light(_):
            """One Ruiz iteration from the probe's norms — no matrix
            reads. The cost scalar uses the column's own E as a proxy for
            the (near-uniform, by the probe's precondition) row weight:
            qn ~ mean(E^2 colmax|Q|), within the spread tolerance of the
            exact read — and ANY pow2 c is applied and undone exactly."""
            E1 = 1.0 / jnp.sqrt(_safe(cn0))
            RG1 = 1.0 / jnp.sqrt(_safe(rg0))
            RA1 = (1.0 / jnp.sqrt(_safe(ra0))) if A is not None else None
            if pow2:
                E1, RG1 = _pow2(E1), _pow2(RG1)
                RA1 = _pow2(RA1) if RA1 is not None else None
            qn = (E1 * E1 * caQ).mean(axis=-1, keepdims=True)
            c1 = 1.0 / _safe(qn)
            if pow2:
                c1 = _pow2(c1)
            if A is None:
                return E1, RG1, c1
            return E1, RG1, RA1, c1

        def spread(v):
            vs = _safe(v)
            return (vs.max(axis=-1) / vs.min(axis=-1)).max()

        norms = [cn0, rg0] + ([ra0] if A is not None else [])
        ok = jnp.asarray(True)
        hi = jnp.asarray(0.0, dt)
        lo = jnp.asarray(jnp.inf, dt)
        for v in norms:
            ok = ok & (spread(v) <= probe_spread)
            hi = jnp.maximum(hi, _safe(v).max())
            lo = jnp.minimum(lo, _safe(v).min())
        # Comfortably inside the exponent range only (the light path's
        # caller may factor the UNSCALED data and weight the outputs —
        # valid exactly when no intermediate over/underflows); scale fully
        # near the edges. (cn0/rg0/ra0 are already globally reduced, so ok
        # is uniform across shards — no extra collective for the cond.)
        ok = ok & (hi < 2.0 ** 10) & (lo > 2.0 ** -10)
        out = jax.lax.cond(ok, light, run_ruiz, None)

    if A is None:
        E, RG, c = out
        RA = None
    else:
        E, RG, RA, c = out
    sc = Scaling(E=E, RG=RG, RA=RA, c=c)
    if return_ok:
        return sc, (ok if probe else None)
    return sc


def ruiz_equilibrate(Q, G, A=None, iters: int = 4, pow2: bool = True,
                     axis_name=None, probe: bool = False):
    """Compute Ruiz scalings AND the scaled matrices (compat wrapper
    around :func:`ruiz_scalings` + the scale_* appliers).

    Returns (scaling, Q_scaled, G_scaled, A_scaled); the scaled matrices
    keep their input batch dims (see the batch-collapse rule above).
    """
    scaling = ruiz_scalings(Q, G, A, iters=iters, pow2=pow2,
                            axis_name=axis_name, probe=probe)
    return (scaling, scale_Q(Q, scaling), scale_G(G, scaling),
            scale_A(A, scaling))


def identity_like(s: Scaling) -> Scaling:
    """All-ones scaling with s's shapes (the identity coordinates)."""
    return Scaling(
        E=jnp.ones_like(s.E), RG=jnp.ones_like(s.RG),
        RA=jnp.ones_like(s.RA) if s.RA is not None else None,
        c=jnp.ones_like(s.c))


def select_scaling(ok, a: Scaling, b: Scaling) -> Scaling:
    """Elementwise runtime select between two scalings (tiny vectors —
    no lax.cond needed)."""
    w = lambda x, y: (jnp.where(ok, x, y)
                      if x is not None and y is not None else None)
    return Scaling(E=w(a.E, b.E), RG=w(a.RG, b.RG), RA=w(a.RA, b.RA),
                   c=w(a.c, b.c))


def scale_vecs(p, h, b, s: Scaling):
    """Scale the per-solve vectors (B, .) into equilibrated coordinates."""
    ps = p * (s.c * s.E)
    hs = h * s.RG
    bs = b * s.RA if b is not None else None
    return ps, hs, bs


def unscale_z(z, s: Scaling):
    return z * s.E


def unscale_solution(z, nu, lam, slacks, s: Scaling):
    """Map a scaled-problem primal-dual point back to original coordinates."""
    z = z * s.E
    lam = lam * (s.RG / s.c)
    slacks = slacks / s.RG
    if nu is not None and nu.shape[-1] > 0 and s.RA is not None:
        nu = nu * (s.RA / s.c)
    return z, nu, lam, slacks


def scale_point(x, slacks, z, y, s: Scaling):
    """Map an original-coordinates point (e.g. a warm start) into scaled
    coordinates: the inverse of unscale_solution."""
    x = x / s.E
    z = z * (s.c / s.RG)
    slacks = slacks * s.RG
    if y is not None and y.shape[-1] > 0 and s.RA is not None:
        y = y * (s.c / s.RA)
    return x, slacks, z, y


def resolve_equilibrate(config, dtype) -> bool:
    """SolverConfig.equilibrate policy: "auto" = on below float64 (where
    the f32 factorizations need the conditioning help), off at float64
    (bit-level reference parity)."""
    eq = config.equilibrate
    if eq == "auto":
        import numpy as np

        return np.dtype(dtype).itemsize < 8
    return bool(eq)
