"""Extended Kalman filter.

TPU-native replacement for the reference's `ekf` (Estimator.py:313-386).
The update order mirrors the reference exactly: output Jacobian C at the
*predicted* state, gain/correction, then state Jacobian A at the *corrected*
state for the covariance prediction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_code_tpu.estimators.linear import AugmentedModel
from mpc_code_tpu.ops.smalllin import solve_lu as _ssolve


def ekf(aug: AugmentedModel, h: float, y_k, u_k, Q, R, P_min, xhat_min, t_k, p_x, p_y):
    """One EKF step. Returns (P_plus, P_corr, xhat_corr)."""
    yhat = aug.fy(xhat_min, u_k, t_k, p_y)                 # Estimator.py:340
    C_k = jax.jacfwd(aug.fy)(xhat_min, u_k, t_k, p_y)      # Estimator.py:343-348
    S = C_k @ P_min @ C_k.T + R
    K_k = _ssolve(S.T, (P_min @ C_k.T).T).T       # Estimator.py:354-355
    P_corr = P_min - K_k @ C_k @ P_min                     # Estimator.py:358
    xhat_corr = xhat_min + K_k @ (y_k - yhat)              # Estimator.py:367
    A_k = jax.jacfwd(aug.fx)(xhat_corr, u_k, h, t_k, p_x)  # Estimator.py:370-376
    P_plus = A_k @ P_corr @ A_k.T + Q                      # Estimator.py:381
    return P_plus, P_corr, xhat_corr
