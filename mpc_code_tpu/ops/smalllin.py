"""Unrolled small-matrix linear algebra for TPU.

XLA lowers ``jnp.linalg.cholesky/solve`` to batched LAPACK-style
custom-calls; on TPU (v5e via the round-5 ENMPC xprof) a batched tiny
factorization is catastrophic — a (1024, 9, 9) LU costs ~2.3 ms and a
(1024·8, 5, 5) Cholesky ~4 ms PER CALL, together 58% of the traced ENMPC
step wall.  For the n <= ~24 systems this framework solves (dense-IPM KKT
of target/MHE NLPs, Riccati stage blocks, estimator gains), a fully
unrolled factorization in plain vector ops is orders of magnitude faster:
n is static, the loops unroll at trace time, every op is an elementwise
(batch,)-shaped VPU op, and XLA fuses the whole factorization into a few
kernels.

``chol/cho_solve/solve_lu`` dispatch to the unrolled path for f32 inputs
with n <= MAX_UNROLL (the TPU production dtype) and keep the LAPACK
custom-calls for f64 (CPU parity/test regime, where LAPACK is fast and
bit-stability of existing pins matters).

Algorithms: standard Cholesky-Crout; Gaussian elimination with partial
pivoting (row swaps via batched `where` on a static index comparison —
no gathers).  Reference analog: the dense linear solves inside IPOPT
(MA27/MUMPS) that back every reference NLP iteration.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

MAX_UNROLL = int(os.environ.get("MPC_TPU_SMALLLIN_MAX", "24"))


def _unrolled(a) -> bool:
    if os.environ.get("MPC_TPU_SMALLLIN", "1") == "0":
        return False
    return (a.dtype == jnp.float32 and a.shape[-1] <= MAX_UNROLL
            and a.shape[-1] > 0)


def chol(A):
    """Cholesky factor (lower) of (..., n, n); NaN rows on indefinite
    input exactly like ``jnp.linalg.cholesky`` (callers probe isnan)."""
    if not _unrolled(A):
        return jnp.linalg.cholesky(A)
    n = A.shape[-1]
    # column-by-column Crout, unrolled at trace time
    cols = [[None] * n for _ in range(n)]  # cols[j][i] = L[i, j], i >= j
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - cols[k][j] * cols[k][j]
        d = jnp.sqrt(s)           # NaN when s < 0 — propagates like lapack
        cols[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - cols[k][i] * cols[k][j]
            cols[j][i] = s * inv
    rows = []
    for i in range(n):
        entries = [cols[j][i] if j <= i else jnp.zeros_like(A[..., 0, 0])
                   for j in range(n)]
        rows.append(jnp.stack(entries, axis=-1))
    return jnp.stack(rows, axis=-2)


def cho_solve(L, b):
    """Solve A x = b from the lower Cholesky factor; b (..., n) or
    (..., n, k)."""
    if not _unrolled(L):
        return jax.scipy.linalg.cho_solve((L, True), b)
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward substitution L y = b
    ys = []
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * ys[k]
        ys.append(s / L[..., i, i][..., None])
    # back substitution L' x = y
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i][..., None] * xs[k]
        xs[i] = s / L[..., i, i][..., None]
    out = jnp.stack(xs, axis=-2)
    return out[..., 0] if vec else out


def inv(A):
    """Inverse via the unrolled pivoted solve (small f32) or lapack."""
    if not _unrolled(A):
        return jnp.linalg.inv(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return solve_lu(A, eye)


def solve_lu(A, b):
    """Solve A x = b by Gaussian elimination with partial pivoting,
    unrolled; A (..., n, n), b (..., n) or (..., n, k).  Singular pivots
    produce inf/NaN exactly like ``jnp.linalg.solve``."""
    if not _unrolled(A):
        if b.ndim == A.ndim - 1:  # batched vector rhs (jax >= 0.5 rules)
            return jnp.linalg.solve(A, b[..., None])[..., 0]
        return jnp.linalg.solve(A, b)
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    # augmented rows as a python list of (..., n + k) arrays
    rows = [jnp.concatenate([A[..., i, :], b[..., i, :]], axis=-1)
            for i in range(n)]
    for col in range(n):
        # partial pivot: the remaining row with the largest |col| entry.
        # Selection is a max-scan over a STATIC row list — batched
        # `where`, no gathers.
        piv_val = jnp.abs(rows[col][..., col])
        piv_idx = jnp.full(piv_val.shape, col, dtype=jnp.int32)
        for r in range(col + 1, n):
            v = jnp.abs(rows[r][..., col])
            better = v > piv_val
            piv_val = jnp.where(better, v, piv_val)
            piv_idx = jnp.where(better, r, piv_idx)
        # swap rows[col] <-> rows[piv_idx] (batched select per candidate)
        pivot_row = rows[col]
        for r in range(col + 1, n):
            sel = (piv_idx == r)[..., None]
            pivot_row = jnp.where(sel, rows[r], pivot_row)
        for r in range(col + 1, n):
            sel = (piv_idx == r)[..., None]
            rows[r] = jnp.where(sel, rows[col], rows[r])
        rows[col] = pivot_row
        # eliminate below
        inv = 1.0 / rows[col][..., col]
        for r in range(col + 1, n):
            f = (rows[r][..., col] * inv)[..., None]
            rows[r] = rows[r] - f * rows[col]
    # back substitution
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = rows[i][..., n:]
        for k in range(i + 1, n):
            s = s - rows[i][..., k][..., None] * xs[k]
        xs[i] = s / rows[i][..., i][..., None]
    out = jnp.stack(xs, axis=-2)
    return out[..., 0] if vec else out
