"""Discrete algebraic Riccati equation (DARE) in pure JAX.

TPU-native, batchable replacement for ``scipy.linalg.solve_discrete_are``,
which the reference uses for the Riccati terminal cost
(reference: Utilities.py:409) and the steady-state Kalman gain
(reference: Estimator.py:217).  Uses the structure-preserving doubling
algorithm (SDA): quadratically convergent, only `solve`s and matmuls, so it
jits, vmaps and differentiates cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def solve_dare(A, B, Q, R, iters: int = 30):
    """Solve ``A'PA - P - A'PB (B'PB + R)^{-1} B'PA + Q = 0`` for P.

    Same equation and argument convention as
    ``scipy.linalg.solve_discrete_are(A, B, Q, R)``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Q = jnp.asarray(Q)
    R = jnp.asarray(R)
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)

    # SDA initialization: A0 = A, G0 = B R^{-1} B', H0 = Q.
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = eye + Gk @ Hk            # I + G H
        WinvA = jnp.linalg.solve(W, Ak)      # (I+GH)^{-1} A
        WinvG = jnp.linalg.solve(W, Gk)      # (I+GH)^{-1} G   (used transposed)
        A_next = Ak @ WinvA
        G_next = Gk + Ak @ WinvG @ Ak.T
        H_next = Hk + WinvA.T @ (Hk @ Ak)
        # Symmetrize to control round-off drift.
        G_next = 0.5 * (G_next + G_next.T)
        H_next = 0.5 * (H_next + H_next.T)
        return (A_next, G_next, H_next), None

    (_, _, H), _ = lax.scan(body, (A, G0, Q), None, length=iters)
    return 0.5 * (H + H.T)


def dare_gain(A, C, Q, R, iters: int = 30):
    """Steady-state Kalman gain ``K = P C' (C P C' + R)^{-1}``.

    P solves the estimation DARE (the control DARE on the transposed pair,
    as the reference computes it at Estimator.py:213-223).
    """
    A = jnp.asarray(A)
    C = jnp.asarray(C)
    P = solve_dare(A.T, C.T, jnp.asarray(Q), jnp.asarray(R), iters=iters)
    S = C @ P @ C.T + jnp.asarray(R)
    K = jnp.linalg.solve(S.T, (P @ C.T).T).T
    return K, P
