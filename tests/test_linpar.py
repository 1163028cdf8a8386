"""LinPar=False: user-sized px/py parameters consumed by the model maps
(not added linearly) — reference MPC_code.py:36-48, Utilities.py:180-183."""

import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import (
    Bounds, ContinuousModel, DisturbanceModel, EstimatorConfig, MPCConfig,
    SSCost, StageCost,
)
from mpc_code_tpu.loop import ClosedLoop


def test_linpar_false_parametric_model():
    # model gain is the single parameter px[0]; scheduled over time
    def fx(x, u, d, t, px):
        return jnp.atleast_1d(px[0] * u[0] - x[0])

    cfg = MPCConfig(
        nx=1, nu=1, ny=1, nd=0,
        Nsim=12, N=6, h=0.5,
        LinPar=False, npx_user=1, npy_user=1,
        model=ContinuousModel(fx=fx, Mx=5, C=np.eye(1)),
        Fp_nominal=True,
        dist=DisturbanceModel(offree="no"),
        x0_p=np.zeros(1), x0_m=np.zeros(1), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(1), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(1), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(kind="lue", K=np.zeros((1, 1))),
        bounds=Bounds(umin=np.array([-5.0]), umax=np.array([5.0])),
        defSP=lambda t: (np.array([1.0]), np.zeros(1), np.zeros(1)),
        def_px=lambda t: np.array([2.0]),   # gain = 2
        def_py=lambda t: np.array([0.0]),
    )
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # steady state: x = px*u -> y=1 needs u = 0.5 with gain 2
    assert abs(H["Yp"][-1][0] - 1.0) < 0.05
    assert abs(H["U"][-1][0] - 0.5) < 0.05
