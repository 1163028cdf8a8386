"""Small dense linear-algebra helpers (batch- and jit-friendly).

Replaces the reference's scipy.linalg calls (`sqrtm` at MPC_code.py:539,825,
`inv`/`solve` sprinkled through Estimator.py) with eigh/solve-based
equivalents that vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqrtm_psd(M):
    """Symmetric PSD matrix square root via eigendecomposition."""
    M = jnp.asarray(M)
    w, V = jnp.linalg.eigh(0.5 * (M + M.T))
    w = jnp.clip(w, 0.0, None)
    return (V * jnp.sqrt(w)) @ V.T


def solve_sym(M, b, reg: float = 0.0):
    """Solve ``M x = b`` for symmetric M with optional Tikhonov regularization."""
    M = jnp.asarray(M)
    if reg:
        M = M + reg * jnp.eye(M.shape[0], dtype=M.dtype)
    return jnp.linalg.solve(M, b)
