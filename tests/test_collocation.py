"""Collocation transcription tests (reference: Control_Calc.opt_dyn_CM).

The reference never ships a runnable collocation example (the Ex_ENMPC
variant is commented out), so the oracle here is internal consistency: a
tracking problem transcribed with Gauss-Legendre collocation must produce
the same closed-loop behavior as the multiple-shooting transcription of the
same continuous dynamics.
"""

import numpy as np

from mpc_code_tpu.config import StageCost
from mpc_code_tpu.loop import ClosedLoop
from mpc_code_tpu.models.costs import xQx


def _reactor_cfg(collocation: bool):
    from mpc_code_tpu.examples import enmpc as ex

    Q = np.eye(2)
    R = np.eye(1)

    if collocation:
        def cost(x, u, y, xs, us, ys, s_coll):
            return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

        sc = StageCost(f_coll=cost)
    else:
        def cost(x, u, y, xs, us, ys):
            return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

        sc = StageCost(f_dis=cost)

    cfg = ex.make_config(Nsim=8).replace(N=8, stage_cost=sc, ContForm=False,
                                         Collocation=collocation)
    cfg.estimator.N_mhe = 4
    return cfg


def test_collocation_tracks_like_shooting():
    H_sh = ClosedLoop(_reactor_cfg(False)).run()
    H_cm = ClosedLoop(_reactor_cfg(True)).run()
    assert (np.asarray(H_cm["STATUS_DYN"]) != 2).all()
    # same continuous dynamics, same cost: inputs must agree closely
    # (GL2 vs RK4 discretization error only)
    assert np.abs(H_cm["U"] - H_sh["U"]).max() < 5e-2
    assert np.abs(H_cm["Yp"][-1] - H_sh["Yp"][-1]).max() < 1e-2
