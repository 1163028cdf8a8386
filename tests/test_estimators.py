"""Estimator unit tests (KF/EKF/kalss vs hand-rolled numpy oracles)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg as scla

from mpc_code_tpu.config import (
    Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
    MPCConfig, SSCost, StageCost,
)
from mpc_code_tpu.estimators.linear import build_augmented, kalman, kalss_gain
from mpc_code_tpu.estimators.ekf import ekf
from mpc_code_tpu.models.model import build_model


def _lin_cfg(offree="lin"):
    A = np.array([[0.9, 0.1], [0.0, 0.8]])
    B = np.array([[0.0], [1.0]])
    C = np.array([[1.0, 0.0]])
    nd = 1 if offree == "lin" else 0
    return MPCConfig(
        nx=2, nu=1, ny=1, nd=nd,
        Nsim=5, N=5, h=1.0,
        model=LinearModel(A=A, B=B, C=C),
        plant=LinearPlant(Ap=A, Bp=B, Cp=C),
        dist=DisturbanceModel(offree=offree,
                              Bd=np.zeros((2, nd)) if nd else None,
                              Cd=np.eye(1) if nd else None),
        x0_p=np.zeros(2), x0_m=np.zeros(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(1), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=np.eye(1)),
        estimator=EstimatorConfig(kind="kal", Q_kf=np.eye(2 + nd),
                                  R_kf=0.1 * np.eye(1), P0=np.eye(2 + nd)),
    ), A, B, C


def test_kalman_step_matches_numpy():
    cfg, A, B, C = _lin_cfg("no")
    model = build_model(cfg)
    aug = build_augmented(cfg, model)
    Q, R = np.eye(2), 0.1 * np.eye(1)
    P = np.eye(2)
    xh = np.array([0.5, -0.2])
    u = np.array([0.3])
    y = np.array([0.7])
    P_plus, P_corr, x_corr = kalman(aug, 1.0, jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(Q), jnp.asarray(R), jnp.asarray(P),
                                    jnp.asarray(xh), 0.0, jnp.zeros(2), jnp.zeros(1))
    # numpy oracle
    K = P @ C.T @ np.linalg.inv(C @ P @ C.T + R)
    x_ref = xh + K @ (y - C @ xh)
    P_corr_ref = (np.eye(2) - K @ C) @ P
    P_plus_ref = A @ P_corr_ref @ A.T + Q
    assert np.allclose(x_corr, x_ref, atol=1e-12)
    assert np.allclose(P_corr, P_corr_ref, atol=1e-12)
    assert np.allclose(P_plus, P_plus_ref, atol=1e-12)


def test_ekf_equals_kf_on_linear_model():
    cfg, A, B, C = _lin_cfg("no")
    model = build_model(cfg)
    aug = build_augmented(cfg, model)
    Q, R = np.eye(2), 0.1 * np.eye(1)
    P = np.eye(2)
    xh = np.array([0.5, -0.2])
    u = np.array([0.3])
    y = np.array([0.7])
    args = (jnp.asarray(y), jnp.asarray(u), jnp.asarray(Q), jnp.asarray(R),
            jnp.asarray(P), jnp.asarray(xh), 0.0, jnp.zeros(2), jnp.zeros(1))
    Pp_kf, Pc_kf, x_kf = kalman(aug, 1.0, *args)
    Pp_ek, Pc_ek, x_ek = ekf(aug, 1.0, *args)
    assert np.allclose(x_kf, x_ek, atol=1e-12)
    assert np.allclose(Pp_kf, Pp_ek, atol=1e-12)


def test_kalss_gain_is_kf_fixed_point():
    cfg, A, B, C = _lin_cfg("lin")
    cfg.estimator.kind = "kalss"
    model = build_model(cfg)
    K = np.asarray(kalss_gain(cfg, model))
    # oracle: iterate the time-varying KF covariance to convergence on the
    # augmented pair and compare gains
    Aaug = np.block([[A, np.zeros((2, 1))], [np.zeros((1, 2)), np.eye(1)]])
    Caug = np.hstack([C, np.eye(1)])
    Q, R = np.eye(3), 0.1 * np.eye(1)
    P = np.eye(3)
    for _ in range(500):
        Kk = P @ Caug.T @ np.linalg.inv(Caug @ P @ Caug.T + R)
        P = Aaug @ (P - Kk @ Caug @ P) @ Aaug.T + Q
    K_ref = P @ Caug.T @ np.linalg.inv(Caug @ P @ Caug.T + R)
    assert np.allclose(K, K_ref, atol=1e-8)
