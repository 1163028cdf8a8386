"""Linear estimators: time-varying KF, static-gain correction (steady-state
KF / Luenberger), and the steady-state Kalman gain computation.

TPU-native replacements for the reference's `kalman` (Estimator.py:263-311),
`kalss` (Estimator.py:231-261) and `Kkalss` (Estimator.py:103-229).  CasADi
symbolic Jacobians are replaced by `jax.jacfwd` on the same augmented model
functions; the DARE is solved with the doubling algorithm.

Augmented-model convention (the driver builds this every step at
MPC_code.py:546-575; we build it once):
    Fx_es(csi, u, k, t, px) = [Fx_model(x, u, k, d, t, px); d],  csi = [x; d]
    Fy_es(csi, u, t, py)    = Fy_model(x, u, d, t, py)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.models.model import ModelFns
from mpc_code_tpu.ops.dare import dare_gain
from mpc_code_tpu.ops.smalllin import solve_lu as _ssolve


class AugmentedModel(NamedTuple):
    fx: Callable  # Fx_es(csi, u, k, t, px)
    fy: Callable  # Fy_es(csi, u, t, py)
    n: int        # augmented state size (nx + nd, or nx when offree == 'no')


def build_augmented(cfg: MPCConfig, model: ModelFns) -> AugmentedModel:
    nx, nd = cfg.nx, cfg.nd
    if cfg.dist.offree != "no":

        def fx_es(csi, u, k, t, px):
            x, d = csi[:nx], csi[nx : nx + nd]
            return jnp.concatenate([model.fx(x, u, k, d, t, px), d])

        def fy_es(csi, u, t, py):
            x, d = csi[:nx], csi[nx : nx + nd]
            return model.fy(x, u, d, t, py)

        return AugmentedModel(fx=fx_es, fy=fy_es, n=nx + nd)

    def fx_es(x, u, k, t, px):
        return model.fx(x, u, k, jnp.zeros(0, dtype=x.dtype), t, px)

    def fy_es(x, u, t, py):
        return model.fy(x, u, jnp.zeros(0, dtype=x.dtype), t, py)

    return AugmentedModel(fx=fx_es, fy=fy_es, n=nx)


def kalman(aug: AugmentedModel, h: float, y_k, u_k, Q, R, P_min, xhat_min, t_k, p_x, p_y):
    """Time-varying Kalman filter step (reference: Estimator.kalman,
    Estimator.py:263-311 — valid for linear models, guarded by the driver at
    MPC_code.py:643-646).

    Returns (P_plus, P_corr, xhat_corr).
    """
    A = jax.jacfwd(aug.fx)(xhat_min, u_k, h, t_k, p_x)
    C = jax.jacfwd(aug.fy)(xhat_min, u_k, t_k, p_y)
    yhat = aug.fy(xhat_min, u_k, t_k, p_y)
    S = C @ P_min @ C.T + R
    K = _ssolve(S.T, (P_min @ C.T).T).T
    P_corr = (jnp.eye(A.shape[0], dtype=P_min.dtype) - K @ C) @ P_min
    xhat_corr = xhat_min + K @ (y_k - yhat)
    P_plus = A @ P_corr @ A.T + Q
    return P_plus, P_corr, xhat_corr


def kalss(aug: AugmentedModel, y_k, u_k, K, xhat_min, t_k, p_y):
    """Static-gain correction x+ = x + K(y - yhat): steady-state KF,
    Luenberger observer, or identity-gain StateFeedback
    (reference: Estimator.kalss, Estimator.py:231-261; MPC_code.py:577-581).
    """
    yhat = aug.fy(xhat_min, u_k, t_k, p_y)
    return xhat_min + K @ (y_k - yhat)


def kalss_gain(cfg: MPCConfig, model: ModelFns) -> jnp.ndarray:
    """Steady-state Kalman gain on the disturbance-augmented pair
    (reference: Estimator.Kkalss, Estimator.py:103-229).

    The reference distinguishes four linearization modes (full/onlyA/onlyC/
    no) depending on which of A, C the example supplies; with JAX we obtain
    the missing Jacobians by `jax.jacfwd` of the model maps at the user's
    (x_ss, u_ss) point — numerically identical for the linear cases and the
    exact analog of the symbolic jacobian for nonlinear ones.
    """
    est = cfg.estimator
    nx, nd, ny = cfg.nx, cfg.nd, cfg.ny
    offree = cfg.dist.offree

    from mpc_code_tpu.config import LinearModel

    m = cfg.model
    if isinstance(m, LinearModel):
        A = jnp.asarray(m.A, dtype=float)
        C = jnp.asarray(m.C, dtype=float) if m.C is not None else None
    else:
        A = None
        C = None

    d_ss = jnp.zeros(nd)
    x_ss = jnp.zeros(nx) if est.x_ss is None else jnp.asarray(est.x_ss, dtype=float)
    u_ss = jnp.zeros(cfg.nu) if est.u_ss is None else jnp.asarray(est.u_ss, dtype=float)
    px_ss = jnp.zeros(cfg.npx) if est.px_ss is None else jnp.asarray(est.px_ss, dtype=float)
    py_ss = jnp.zeros(cfg.npy) if est.py_ss is None else jnp.asarray(est.py_ss, dtype=float)

    if A is None:
        if offree == "nl":
            aug = build_augmented(cfg, model)
            A = jax.jacfwd(aug.fx)(jnp.concatenate([x_ss, d_ss]), u_ss, cfg.h, 0.0, px_ss)
        else:
            A = jax.jacfwd(lambda x: model.fx(x, u_ss, cfg.h, d_ss, 0.0, px_ss))(x_ss)
    if C is None or cfg.StateFeedback:
        if cfg.StateFeedback:
            C = jnp.eye(ny, nx)
        else:
            C = jax.jacfwd(lambda x: model.fy(x, u_ss, d_ss, 0.0, py_ss))(x_ss)

    naug = nx + nd
    Aaug = jnp.eye(naug)
    Caug = jnp.zeros((ny, naug))
    if offree == "nl" and A.shape[1] == naug:
        Aaug = A
    else:
        Aaug = Aaug.at[:nx, :nx].set(A[:nx, :nx])
    if offree == "nl" and C.shape[1] == naug:
        Caug = C
    else:
        Caug = Caug.at[:, :nx].set(C[:, :nx])
    if offree == "lin":                      # Estimator.py:206-211
        Aaug = Aaug.at[:nx, nx:].set(jnp.asarray(cfg.dist.Bd, dtype=float))
        Caug = Caug.at[:, nx:].set(jnp.asarray(cfg.dist.Cd, dtype=float))

    K, _ = dare_gain(Aaug, Caug, jnp.asarray(est.Q_kf, dtype=float),
                     jnp.asarray(est.R_kf, dtype=float))
    # reference solves the DARE on (Aaug', Caug') and forms P C'(CPC'+R)^-1
    # (Estimator.py:213-223) — dare_gain implements exactly that.
    return K
