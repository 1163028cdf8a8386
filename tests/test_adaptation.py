"""Modifier-adaptation (ISOPE) tests — reference C12:
opt_ssp/opt_ssp2/defLambdaT (Utilities.py:498-672, MPC_code.py:265-288,
829-874).  With plant/model parameter mismatch the filtered modifier lambda
must become nonzero and steer the target input toward the true plant
optimum computed by the plant-optimum NLP (Upopt history).
"""

import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import (
    Bounds, ContinuousModel, ContinuousPlant, DisturbanceModel,
    EstimatorConfig, MPCConfig, SSCost, StageCost, TerminalCost,
)
from mpc_code_tpu.loop import ClosedLoop

CA0, V = 1.0, 1.0
K1M, K2M = 1.0, 0.05       # model kinetics
K1P, K2P = 1.3, 0.05       # plant kinetics (mismatch)


def _rhs(x, u, k1, k2):
    return jnp.stack([
        u[0] * (CA0 - x[0]) / V - k1 * x[0],
        -u[0] * x[1] / V + k1 * x[0] - k2 * x[1],
    ])


def fxm(x, u, d, t, px):
    return _rhs(x, u, K1M, K2M)


def fxp(x, t, u, pxp, pxmp):
    return _rhs(x, u, K1P, K2P)


def fss_obj(x, u, y, xsp, usp, ysp):
    return u[0] * (CA0 - 4.0 * y[1])


def fobj_dis(x, u, y, xs, us, ys):
    return 0.5 * ((x - xs) @ (x - xs) + 10.0 * (u - us) @ (u - us))


def vfin(dx, xs):
    return 100.0 * (dx @ dx)


def make_adaptation_config(Nsim=25):
    nd = 2
    return MPCConfig(
        nx=2, nxp=2, nu=1, ny=2, nd=nd,
        Nsim=Nsim, N=10, h=2.0,
        StateFeedback=True,
        model=ContinuousModel(fx=fxm, Mx=10),
        plant=ContinuousPlant(fx=fxp, Mx=10),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, nd)), Cd=np.eye(nd)),
        x0_p=np.array([0.9, 0.1]), x0_m=np.array([0.9, 0.1]), u0=np.array([0.5]),
        ss_cost=SSCost(f_obj=fss_obj),
        stage_cost=StageCost(f_dis=fobj_dis),
        terminal=TerminalCost(vfin=vfin),
        estimator=EstimatorConfig(kind="lue",
                                  K=np.vstack([np.zeros((2, 2)), np.eye(2)])),
        bounds=Bounds(umin=np.array([0.05]), umax=np.array([2.0]),
                      xmin=np.zeros(2), xmax=np.ones(2)),
        Adaptation=True,
    )


def test_modifier_adaptation_tracks_plant_optimum():
    cfg = make_adaptation_config()
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # the modifier must activate under mismatch
    assert np.abs(H["LAMBDA"][-1]).max() > 1e-3
    # plant-optimum problem solved every step
    assert H["Upopt"].shape[0] == 25
    u_plant_opt = H["Upopt"][-1][0]
    # adapted target input ends much closer to the plant optimum than the
    # unadapted (first-step) target input
    err0 = abs(H["US"][1][0] - u_plant_opt)
    errN = abs(H["US"][-1][0] - u_plant_opt)
    assert errN < 0.5 * err0 or errN < 0.02
