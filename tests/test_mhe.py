"""MHE tests: ENMPC integration (smooth + filter updates), and an
estimation-only consistency oracle on a linear system.
"""

import numpy as np

from mpc_code_tpu.loop import ClosedLoop


def _enmpc(N, steps, up):
    from mpc_code_tpu.examples.enmpc import make_config

    cfg = make_config(Nsim=steps).replace(N=N)
    cfg.estimator.mhe_up = up
    cfg.estimator.N_mhe = 5
    return ClosedLoop(cfg).run()


def test_enmpc_mhe_smooth():
    H = _enmpc(10, 12, "smooth")
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # disturbance estimate must vanish (plant == model structure here)
    assert np.abs(H["D_HAT"][-1]).max() < 1e-2
    # closed loop approaches the economic optimum u* ~ 1.04
    assert abs(H["U"][-1][0] - 1.04) < 0.1
    # X_KF bookkeeping history exists (one entry per step)
    assert H["X_KF"].shape[0] == 12


def test_enmpc_mhe_filter():
    H = _enmpc(10, 12, "filter")
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert np.abs(H["D_HAT"][-1]).max() < 5e-2
    assert abs(H["U"][-1][0] - 1.04) < 0.15


def test_mhe_estimation_only_linear():
    # estimation-only mode (MPC_code.py §3.3): linear plant with an output
    # step disturbance; the MHE's augmented estimate must reconstruct it.
    import jax.numpy as jnp

    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MHECost, MPCConfig,
    )

    A = np.array([[0.8, 0.1], [0.0, 0.7]])
    B = np.array([[1.0], [0.5]])
    C = np.eye(2)

    def def_pyp(t):
        return np.array([0.3, 0.0]) if t >= 3 else np.zeros(2)

    cfg = MPCConfig(
        nx=2, nu=1, ny=2, nd=2,
        Nsim=25, N=5, h=1.0,
        estimating=True,
        model=LinearModel(A=A, B=B, C=C),
        plant=LinearPlant(Ap=A, Bp=B, Cp=C),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.array([1.0, -1.0]), x0_m=np.array([0.5, 0.0]), u0=np.zeros(1),
        estimator=EstimatorConfig(
            kind="mhe", N_mhe=5, mhe_up="filter",
            mhe_cost=MHECost(Q=np.eye(4), R=10.0 * np.eye(2)),
            P0=np.eye(4),
            x_bar0=np.array([0.5, 0.0, 0.0, 0.0]),
        ),
        bounds=Bounds(),
        def_pyp=def_pyp,
    )
    H = ClosedLoop(cfg).run()
    # output disturbance [0.3, 0] appears at t=3 and must be reconstructed
    assert abs(H["D_HAT"][-1][0] - 0.3) < 0.05
    assert abs(H["D_HAT"][-1][1]) < 0.05
    # state estimate converges to the plant state
    assert np.abs(H["X_HAT"][-1] - H["Xp"][-1]).max() < 0.05
