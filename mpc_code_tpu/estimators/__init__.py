"""Estimator family: Luenberger, KF, steady-state KF, EKF, MHE."""

from mpc_code_tpu.estimators.linear import kalman, kalss, kalss_gain, build_augmented
from mpc_code_tpu.estimators.ekf import ekf

__all__ = ["kalman", "kalss", "kalss_gain", "build_augmented", "ekf"]
