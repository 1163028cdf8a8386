"""Closed-loop integration tests (SURVEY.md §4: golden-oracle strategy).

Without CasADi/IPOPT in the environment, parity oracles are analytic:
- unconstrained LQ MPC with Riccati terminal cost == infinite-horizon LQR
- offset-free disturbance rejection drives y -> ysp despite plant/model
  mismatch (the reference's WB example behavior)
"""

import jax.numpy as jnp
import numpy as np
import scipy.linalg as scla

from mpc_code_tpu.config import (
    Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
    MPCConfig, SSCost, StageCost,
)
from mpc_code_tpu.loop import ClosedLoop


def _lqr_gain(A, B, Q, R):
    P = scla.solve_discrete_are(A, B, Q, R)
    return np.linalg.solve(B.T @ P @ B + R, B.T @ P @ A)


def test_unconstrained_lq_mpc_equals_lqr():
    # 2-state system, no bounds, no disturbance, plant == model, setpoint 0:
    # the OCP's first input must equal -K_lqr x0 for any x0.
    A = np.array([[1.0, 0.2], [0.0, 0.95]])
    B = np.array([[0.0], [0.5]])
    Q = np.eye(2)
    R = np.array([[0.5]])
    cfg = MPCConfig(
        nx=2, nu=1, ny=2, nd=0,
        Nsim=5, N=12, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        Fp_nominal=True,
        StateFeedback=False,
        dist=DisturbanceModel(offree="no"),
        x0_p=np.array([1.0, -0.5]), x0_m=np.array([1.0, -0.5]), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=Q, R=R),
        estimator=EstimatorConfig(kind="lue", K=np.zeros((2, 2))),  # no correction
    )
    loop = ClosedLoop(cfg)
    H = loop.run()
    K = _lqr_gain(A, B, Q, R)
    x = np.array([1.0, -0.5])
    for k in range(5):
        u_ref = -K @ x
        assert np.allclose(H["U"][k], u_ref, atol=5e-6), (k, H["U"][k], u_ref)
        x = A @ x + B @ u_ref
    assert (np.asarray(H["STATUS_DYN"]) == 0).all()


def test_wb_offset_free_tracking_small():
    # scaled-down Wood-Berry config (N=15) — offset-free tracking through
    # plant/model mismatch with the output-disturbance Luenberger observer.
    from mpc_code_tpu.examples.lmpc_wb import make_config

    cfg = make_config(Nsim=60)
    cfg = cfg.replace(N=15)
    loop = ClosedLoop(cfg)
    H = loop.run()
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert (np.abs(H["U"]) <= 0.5 + 1e-8).all()
    # after the t=10 setpoint step, outputs must be converging to [1, -1]
    err_mid = np.abs(H["Yp"][30] - np.array([1.0, -1.0])).max()
    err_end = np.abs(H["Yp"][-1] - np.array([1.0, -1.0])).max()
    assert err_end < err_mid
    assert err_end < 0.05


def test_check_numerics_mode():
    # check-numerics config flag (SURVEY.md §5): clean run passes with
    # jax_debug_nans armed; a non-finite history entry raises
    import jax

    from mpc_code_tpu.examples.lmpc_wb import make_config

    cfg = make_config(Nsim=3).replace(check_numerics=True)
    try:
        loop = ClosedLoop(cfg)
        assert loop.check_numerics
        H = loop.run()
        assert np.isfinite(H["U"]).all()
    finally:
        jax.config.update("jax_debug_nans", False)

    # poisoned schedule: def_px returning NaN must surface as an error, not
    # silently propagate through the loop
    import pytest as _pytest

    bad = make_config(Nsim=3).replace(
        check_numerics=True,
        def_px=lambda t: np.full(4, np.nan))
    try:
        with _pytest.raises(Exception):
            ClosedLoop(bad).run()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_continuous_plant_clip_guard():
    """ContinuousPlant clip_lo/clip_hi saturates the ODE input state (the
    reference's own stability-guard pattern, Ex_NMPC_dis.py:75-77) — an
    exploding plant stays finite with the guard and overflows without."""
    from mpc_code_tpu.config import ContinuousPlant
    from mpc_code_tpu.models.model import build_plant

    def fxp(x, t, u, pxp, pxmp):
        # super-linear growth: x' = x^3 (finite-time blowup from x0=2)
        return x ** 3

    base = MPCConfig(
        nx=1, nxp=1, nu=1, ny=1, nd=0, Nsim=1, N=2, h=1.0,
        model=LinearModel(A=np.eye(1), B=np.eye(1), C=np.eye(1)),
        plant=ContinuousPlant(fx=fxp, Mx=10, Cp=np.eye(1)),
        x0_p=2.0 * np.ones(1), x0_m=2.0 * np.ones(1), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(1), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(1), R=np.eye(1)),
        estimator=EstimatorConfig(kind="kalss"),
    )
    from mpc_code_tpu.models import build_model

    mdl = build_model(base)
    plant = build_plant(base, mdl)
    # signature fx(x, u, pxp, t, h, pxmp) — 5th slot is the step length
    x_bad = plant.fx(jnp.ones(1) * 2.0, jnp.zeros(1), jnp.zeros(1),
                     0.0, 1.0, jnp.zeros(1))
    assert not np.isfinite(np.asarray(x_bad)).all()

    import dataclasses as dc

    guarded = base.replace(plant=dc.replace(
        base.plant, clip_lo=np.array([-2.5]), clip_hi=np.array([2.5])))
    plant_g = build_plant(guarded, mdl)
    x_ok = plant_g.fx(jnp.ones(1) * 2.0, jnp.zeros(1), jnp.zeros(1),
                      0.0, 1.0, jnp.zeros(1))
    assert np.isfinite(np.asarray(x_ok)).all()
