"""Unrolled small-matrix linear algebra for TPU.

XLA lowers ``jnp.linalg.cholesky/solve`` to batched LAPACK-style
custom-calls; on TPU (v5e via the round-5 ENMPC xprof) a batched tiny
factorization is catastrophic — a (1024, 9, 9) LU costs ~2.3 ms and a
(1024·8, 5, 5) Cholesky ~4 ms PER CALL, together 58% of the traced ENMPC
step wall.  For the n <= ~24 systems this framework solves (dense-IPM KKT
of target/MHE NLPs, Riccati stage blocks, estimator gains), a fully
unrolled factorization in plain vector ops is orders of magnitude faster
when BATCHED: n is static, the loops unroll at trace time, every op is an
elementwise (batch,)-shaped VPU op, and XLA fuses the whole factorization
into a few kernels.

Batch awareness (round-5 latency A/B): at B=1 the trade flips — the
unrolled form's hundreds of tiny sequential ops cost ~60 ms per
closed-loop step on the latency-bound single-lane path (nmpc target
p50 143 vs 83 ms), while the single small custom-call is fine.  The
public ``chol/cho_solve/solve_lu/inv`` are therefore ``custom_vmap``
functions: an UNBATCHED call keeps the LAPACK custom-call; under ``vmap``
with axis_size >= MIN_BATCH (and f32, n <= MAX_UNROLL) the rule runs the
unrolled kernels.  f64 (the CPU parity/test regime) always keeps LAPACK,
so existing pins are bit-unchanged.

The ``*_unrolled`` variants are exported for call sites that are
DIFFERENTIATED (custom_vmap does not compose with AD) — e.g. the
collocation Newton root whose IFT step the stage sweep jacfwd traverses.

Algorithms: standard Cholesky-Crout; Gaussian elimination with partial
pivoting (row swaps via batched `where` on a static index comparison —
no gathers).  Reference analog: the dense linear solves inside IPOPT
(MA27/MUMPS) that back every reference NLP iteration.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap

MAX_UNROLL = int(os.environ.get("MPC_TPU_SMALLLIN_MAX", "24"))
MIN_BATCH = int(os.environ.get("MPC_TPU_SMALLLIN_MIN_BATCH", "8"))


def _unrolled_ok(a, axis_size=None) -> bool:
    if os.environ.get("MPC_TPU_SMALLLIN", "1") == "0":
        return False
    if axis_size is not None and axis_size < MIN_BATCH:
        return False
    return (a.dtype == jnp.float32 and a.shape[-1] <= MAX_UNROLL
            and a.shape[-1] > 0)


# ---------------------------------------------------------------------------
# unrolled kernels (arbitrary leading batch dims, vmappable, differentiable)
# ---------------------------------------------------------------------------


def chol_unrolled(A):
    """Cholesky factor (lower) of (..., n, n); NaN rows on indefinite
    input exactly like ``jnp.linalg.cholesky`` (callers probe isnan)."""
    n = A.shape[-1]
    cols = [[None] * n for _ in range(n)]  # cols[j][i] = L[i, j], i >= j
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - cols[k][j] * cols[k][j]
        d = jnp.sqrt(s)           # NaN when s < 0 — propagates like lapack
        cols[j][j] = d
        inv_ = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - cols[k][i] * cols[k][j]
            cols[j][i] = s * inv_
    rows = []
    for i in range(n):
        entries = [cols[j][i] if j <= i else jnp.zeros_like(A[..., 0, 0])
                   for j in range(n)]
        rows.append(jnp.stack(entries, axis=-1))
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(L, b):
    """Solve A x = b from the lower Cholesky factor; b (..., n) or
    (..., n, k)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    ys = []
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * ys[k]
        ys.append(s / L[..., i, i][..., None])
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i][..., None] * xs[k]
        xs[i] = s / L[..., i, i][..., None]
    out = jnp.stack(xs, axis=-2)
    return out[..., 0] if vec else out


def solve_lu_unrolled(A, b):
    """Solve A x = b by Gaussian elimination with partial pivoting,
    unrolled; A (..., n, n), b (..., n) or (..., n, k).  Singular pivots
    produce inf/NaN exactly like ``jnp.linalg.solve``."""
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    rows = [jnp.concatenate([A[..., i, :], b[..., i, :]], axis=-1)
            for i in range(n)]
    for col in range(n):
        # partial pivot: the remaining row with the largest |col| entry —
        # a max-scan over a STATIC row list (batched `where`, no gathers)
        piv_val = jnp.abs(rows[col][..., col])
        piv_idx = jnp.full(piv_val.shape, col, dtype=jnp.int32)
        for r in range(col + 1, n):
            v = jnp.abs(rows[r][..., col])
            better = v > piv_val
            piv_val = jnp.where(better, v, piv_val)
            piv_idx = jnp.where(better, r, piv_idx)
        pivot_row = rows[col]
        for r in range(col + 1, n):
            sel = (piv_idx == r)[..., None]
            pivot_row = jnp.where(sel, rows[r], pivot_row)
        for r in range(col + 1, n):
            sel = (piv_idx == r)[..., None]
            rows[r] = jnp.where(sel, rows[col], rows[r])
        rows[col] = pivot_row
        inv_ = 1.0 / rows[col][..., col]
        for r in range(col + 1, n):
            f = (rows[r][..., col] * inv_)[..., None]
            rows[r] = rows[r] - f * rows[col]
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = rows[i][..., n:]
        for k in range(i + 1, n):
            s = s - rows[i][..., k][..., None] * xs[k]
        xs[i] = s / rows[i][..., i][..., None]
    out = jnp.stack(xs, axis=-2)
    return out[..., 0] if vec else out


# ---------------------------------------------------------------------------
# lapack reference paths
# ---------------------------------------------------------------------------


def _solve_lapack(A, b):
    if b.ndim == A.ndim - 1:   # batched vector rhs (jax >= 0.5 rules)
        return jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.linalg.solve(A, b)


def _bcast(axis_size, in_batched, args):
    return [jnp.broadcast_to(a, (axis_size,) + jnp.shape(a)) if not bt else a
            for a, bt in zip(args, jax.tree_util.tree_leaves(in_batched))]


# ---------------------------------------------------------------------------
# public batch-aware entry points
# ---------------------------------------------------------------------------


def solve_lu_ad(A, b):
    """Differentiable solve for call sites whose result is traversed by
    AD (e.g. the collocation IFT Newton step): a plain function — the
    custom_vmap wrappers do not compose with jvp — unrolled for small
    f32, LAPACK otherwise."""
    if _unrolled_ok(A):
        return solve_lu_unrolled(A, b)
    return _solve_lapack(A, b)


@custom_vmap
def chol(A):
    """Cholesky: LAPACK unbatched; unrolled under vmap (f32, small n)."""
    return jnp.linalg.cholesky(A)


@chol.def_vmap
def _chol_rule(axis_size, in_batched, A):
    (A,) = _bcast(axis_size, in_batched, (A,))
    if _unrolled_ok(A, axis_size):
        return chol_unrolled(A), True
    return jax.vmap(jnp.linalg.cholesky)(A), True


@custom_vmap
def cho_solve(L, b):
    """Solve from a lower Cholesky factor (pairs with `chol`)."""
    return jax.scipy.linalg.cho_solve((L, True), b)


@cho_solve.def_vmap
def _cho_solve_rule(axis_size, in_batched, L, b):
    L, b = _bcast(axis_size, in_batched, (L, b))
    if _unrolled_ok(L, axis_size):
        return cho_solve_unrolled(L, b), True
    return jax.vmap(lambda l, bb: jax.scipy.linalg.cho_solve((l, True),
                                                             bb))(L, b), True


@custom_vmap
def solve_lu(A, b):
    """General solve: LAPACK unbatched; unrolled pivoted GE under vmap."""
    return _solve_lapack(A, b)


@solve_lu.def_vmap
def _solve_lu_rule(axis_size, in_batched, A, b):
    A, b = _bcast(axis_size, in_batched, (A, b))
    if _unrolled_ok(A, axis_size):
        return solve_lu_unrolled(A, b), True
    return jax.vmap(_solve_lapack)(A, b), True


@custom_vmap
def inv(A):
    """Inverse: LAPACK unbatched; unrolled pivoted GE under vmap."""
    return jnp.linalg.inv(A)


@inv.def_vmap
def _inv_rule(axis_size, in_batched, A):
    (A,) = _bcast(axis_size, in_batched, (A,))
    if _unrolled_ok(A, axis_size):
        n = A.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        return solve_lu_unrolled(A, eye), True
    return jax.vmap(jnp.linalg.inv)(A), True
