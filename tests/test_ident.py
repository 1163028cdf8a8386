"""SS identification / auto-linearization tests (reference: SS_JAC_ID.py)."""

import numpy as np

from mpc_code_tpu.config import (
    Bounds, ContinuousModel, DisturbanceModel, EstimatorConfig, LinearModel,
    MPCConfig, SSCost, StageCost,
)
from mpc_code_tpu.ident import ss_p_jac_id


def _nl_cfg():
    import jax.numpy as jnp

    # 2-state nonlinear system with known steady state at x=(u, u^2)
    def fx(x, u, d, t, px):
        return jnp.stack([u[0] - x[0], x[0] ** 2 - x[1]])

    return MPCConfig(
        nx=2, nu=1, ny=2, nd=0,
        Nsim=5, N=5, h=0.5,
        model=ContinuousModel(fx=fx, Mx=10, C=np.eye(2)),
        Fp_nominal=True,
        dist=DisturbanceModel(offree="no"),
        x0_p=np.array([0.4, 0.2]), x0_m=np.array([0.4, 0.2]), u0=np.array([0.5]),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(f_dis=lambda x, u, y, xs, us, ys: x @ x + u @ u),
        estimator=EstimatorConfig(kind="lue", K=np.zeros((2, 2))),
        bounds=Bounds(umin=np.array([0.1]), umax=np.array([2.0]),
                      xmin=np.zeros(2), xmax=2 * np.ones(2)),
    )


def test_ss_jac_id_finds_steady_state_and_jacobians():
    cfg = _nl_cfg()
    A, B, C, D, xlin, ulin, ylin = ss_p_jac_id(cfg)
    # steady state: x1 = u, x2 = u^2
    assert abs(xlin[0] - ulin[0]) < 1e-6
    assert abs(xlin[1] - ulin[0] ** 2) < 1e-6
    # C is the linear output map, D = 0
    assert np.allclose(C, np.eye(2), atol=1e-10)
    assert np.allclose(D, 0.0, atol=1e-10)
    # A must match the matrix exponential of the continuous Jacobian over h
    import scipy.linalg as scla

    Jc = np.array([[-1.0, 0.0], [2 * xlin[0], -1.0]])
    A_ref = scla.expm(Jc * cfg.h)
    assert np.allclose(A, A_ref, atol=1e-6)
