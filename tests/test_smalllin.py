"""Unrolled small-matrix linear algebra (ops/smalllin.py) vs LAPACK.

The unrolled path engages only for f32 inputs (the TPU production
dtype); the suite's f64 regime uses the LAPACK custom-calls, so these
tests pin the unrolled kernels explicitly at f32 against f64 references.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_code_tpu.ops.smalllin import (
    chol, cho_solve, inv, solve_lu,
    chol_unrolled, cho_solve_unrolled, solve_lu_unrolled,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 9, 17, 24])
def test_chol_and_solve_match_lapack(n):
    rng = np.random.default_rng(n)
    A = rng.normal(size=(16, n, n))
    spd = (A @ np.swapaxes(A, -1, -2) + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(16, n)).astype(np.float32)
    L = np.asarray(chol_unrolled(jnp.asarray(spd)))
    Lr = np.linalg.cholesky(np.asarray(spd, np.float64))
    assert np.abs(L - Lr).max() < 1e-3 * n
    x = np.asarray(cho_solve_unrolled(jnp.asarray(L), jnp.asarray(b)))
    xr = np.linalg.solve(np.asarray(spd, np.float64), b[..., None])[..., 0]
    assert np.abs(x - xr).max() < 5e-2


@pytest.mark.parametrize("n", [2, 5, 9, 13])
def test_pivoted_lu_indefinite(n):
    # saddle-point (indefinite) systems — the dense IPM KKT shape; the
    # zero diagonal head forces actual pivoting
    rng = np.random.default_rng(n + 100)
    K = rng.normal(size=(8, n, n))
    K = (K + np.swapaxes(K, -1, -2)).astype(np.float32)
    K[:, 0, 0] = 0.0
    b = rng.normal(size=(8, n)).astype(np.float32)
    x = np.asarray(solve_lu_unrolled(jnp.asarray(K), jnp.asarray(b)))
    xr = np.linalg.solve(np.asarray(K, np.float64), b[..., None])[..., 0]
    rel = np.abs(x - xr).max() / max(1.0, np.abs(xr).max())
    assert rel < 5e-3, rel


def test_matrix_rhs_and_inv():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(4, 6, 6)).astype(np.float32)
    A = A + 6 * np.eye(6, dtype=np.float32)
    B = rng.normal(size=(4, 6, 3)).astype(np.float32)
    X = np.asarray(solve_lu_unrolled(jnp.asarray(A), jnp.asarray(B)))
    Xr = np.linalg.solve(np.asarray(A, np.float64), B)
    assert np.abs(X - Xr).max() < 2e-3
    Ai = np.asarray(solve_lu_unrolled(jnp.asarray(A), jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (4, 6, 6))))
    assert np.abs(Ai @ A - np.eye(6)).max() < 2e-3


def test_indefinite_chol_propagates_nan():
    # callers (inertia probes, Riccati ok-flags) detect failure via NaN,
    # exactly like jnp.linalg.cholesky
    neg = jnp.asarray(-np.eye(3, dtype=np.float32)[None].repeat(4, 0))
    assert np.isnan(np.asarray(chol_unrolled(neg))).any()


def test_unbatched_under_vmap():
    # the solver call sites run per-lane (unbatched trace) under vmap —
    # the unrolled loops must be vmappable
    rng = np.random.default_rng(3)
    A = rng.normal(size=(12, 5, 5)).astype(np.float32)
    A = A + 5 * np.eye(5, dtype=np.float32)
    b = rng.normal(size=(12, 5)).astype(np.float32)
    f = jax.vmap(lambda a, bb: solve_lu(a, bb))
    x = np.asarray(f(jnp.asarray(A), jnp.asarray(b)))
    xr = np.linalg.solve(np.asarray(A, np.float64), b[..., None])[..., 0]
    assert np.abs(x - xr).max() < 2e-3


def test_custom_vmap_dispatch():
    # public entry points: unbatched calls take the LAPACK path, vmapped
    # calls (axis >= MIN_BATCH, f32) take the unrolled path — both agree
    rng = np.random.default_rng(9)
    A = rng.normal(size=(16, 7, 7)).astype(np.float32)
    spd = A @ np.swapaxes(A, -1, -2) + 7 * np.eye(7, dtype=np.float32)
    b = rng.normal(size=(16, 7)).astype(np.float32)
    xv = np.asarray(jax.vmap(solve_lu)(jnp.asarray(spd), jnp.asarray(b)))
    x0 = np.asarray(solve_lu(jnp.asarray(spd[0]), jnp.asarray(b[0])))
    xr = np.linalg.solve(np.asarray(spd, np.float64), b[..., None])[..., 0]
    assert np.abs(xv - xr).max() < 5e-2
    assert np.abs(x0 - xr[0]).max() < 5e-2
    Lv = np.asarray(jax.vmap(chol)(jnp.asarray(spd)))
    assert np.abs(Lv - np.linalg.cholesky(spd)).max() < 1e-2
    yv = np.asarray(jax.vmap(cho_solve)(jnp.asarray(Lv), jnp.asarray(b)))
    assert np.abs(yv - xr).max() < 5e-2
    Iv = np.asarray(jax.vmap(inv)(jnp.asarray(spd))) @ spd
    assert np.abs(Iv - np.eye(7)).max() < 1e-2
