"""Feature-coverage tests: slacks, user g/h constraints, LP costs,
estimation-only mode with KF — the reference option surface not exercised
by the seven example configs.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import (
    Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
    MPCConfig, SSCost, StageCost,
)
from mpc_code_tpu.loop import ClosedLoop


def _base(n_extra=None, **kw):
    A = np.array([[0.85, 0.1], [0.0, 0.9]])
    B = np.array([[0.2], [1.0]])
    C = np.eye(2)

    def defSP(t):
        return np.array([0.8, 0.4]), np.zeros(1), np.zeros(2)

    d = dict(
        nx=2, nu=1, ny=2, nd=2,
        Nsim=20, N=10, h=1.0,
        model=LinearModel(A=A, B=B, C=C),
        plant=LinearPlant(Ap=A, Bp=B, Cp=C),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.zeros(2), x0_m=np.zeros(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(kind="lue",
                                  K=np.vstack([np.zeros((2, 2)), np.eye(2)])),
        bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0])),
        defSP=defSP,
    )
    d.update(kw)
    return MPCConfig(**d)


def test_soft_output_constraints_slacks():
    # slacks=True relaxes output bounds with a shared slack vector and a
    # quadratic Ws penalty (reference: Control_Calc.py:187, 232-239).
    # Start OUTSIDE the output bounds: the hard-bound OCP is infeasible at
    # step 0 (pinned x0 violates stage-0 y-bounds) while the soft variant
    # recovers with a positive slack.
    ny = 2
    bounds = Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                    ymin=np.array([-0.1, -0.1]), ymax=np.array([0.55, 0.45]))
    x0 = np.array([1.0, 0.8])  # y = x exceeds ymax at stage 0

    hard = _base(bounds=bounds, x0_p=x0, x0_m=x0)
    Hh = ClosedLoop(hard).run()
    assert Hh["STATUS_DYN"][0] == 2  # reference fallback path engaged

    soft = _base(bounds=bounds, x0_p=x0, x0_m=x0, slacks=True,
                 Ws=10.0 * np.eye(2 * ny))
    Hs = ClosedLoop(soft).run()
    assert (np.asarray(Hs["STATUS_DYN"]) != 2).all()
    assert Hs["Sl"].shape[1] == 2 * ny
    assert Hs["Sl"][0].max() > 1e-3   # slack absorbs the initial violation
    assert (Hs["Sl"] >= -1e-9).all()
    # both loops settle on the constrained equilibrium (y2 bound binds:
    # u = 0.045, y = [0.36, 0.45])
    assert np.allclose(Hs["Yp"][-1], [0.36, 0.45], atol=0.02)


def test_soft_constraints_batched_matches_host():
    # the traced batched step routes slacks configs through the structured
    # (constant-slack-augmented Riccati) solver; it must reproduce the
    # host-driven dense loop input-for-input
    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step

    ny = 2
    bounds = Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                    ymin=np.array([-0.1, -0.1]), ymax=np.array([0.55, 0.45]))
    x0 = np.array([1.0, 0.8])
    cfg = _base(bounds=bounds, x0_p=x0, x0_m=x0, slacks=True,
                Ws=10.0 * np.eye(2 * ny), Nsim=12)
    H = ClosedLoop(cfg).run()

    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.8, 0.4])))
    c = init_carry(cfg)
    us = []
    for _ in range(12):
        c, out = step(c)
        us.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    assert np.abs(np.asarray(H["U"])[:, 0] - np.asarray(us)).max() < 1e-6


def test_user_inequality_constraint():
    # stagewise user g(x,u,y,...) <= 0 (reference: MPC_code.py:306-314)
    def G_ineq(x, u, y, d, t, px, py):
        return jnp.atleast_1d(x[0] + x[1] - 1.0)  # x1 + x2 <= 1

    cfg = _base(G_ineq=G_ineq)
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    s = H["X_HAT"][:, 0] + H["X_HAT"][:, 1]
    assert (s <= 1.0 + 1e-5).all()


def test_user_inequality_batched_matches_host():
    # G_ineq rows are stagewise-local, so the traced batched step solves
    # them through the structured Riccati path; must match the host-driven
    # dense loop
    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step
    from mpc_code_tpu.solver.riccati import structured_supported

    def G_ineq(x, u, y, d, t, px, py):
        return jnp.atleast_1d(x[0] + x[1] - 1.0)

    cfg = _base(G_ineq=G_ineq)
    assert structured_supported(cfg)
    H = ClosedLoop(cfg).run()

    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.8, 0.4])))
    c = init_carry(cfg)
    us = []
    for _ in range(cfg.Nsim):
        c, out = step(c)
        us.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    assert np.abs(np.asarray(H["U"])[:, 0] - np.asarray(us)).max() < 1e-5


def test_slacksg_structured_matches_dense():
    # slack-softened user inequalities (slacksG): the shared slack vector
    # gains ng_user entries that relax the G rows (Control_Calc.py:133-136);
    # structured (constant-slack augmentation) vs the dense transcription
    from mpc_code_tpu.solver.riccati import structured_supported

    def G_ineq(x, u, y, d, t, px, py):
        return jnp.atleast_1d(x[0] + x[1] - 0.9)

    ny = 2
    bounds = Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                    ymin=np.array([-0.5, -0.5]), ymax=np.array([2.0, 2.0]))
    # start where the G row is violated at the pinned x0 -> the hard
    # variant is infeasible at step 0, the soft variant recovers via slack
    x0 = np.array([0.8, 0.6])
    cfg = _base(G_ineq=G_ineq, slacks=True, slacksG=True,
                Ws=10.0 * np.eye(2 * ny + 1), bounds=bounds,
                x0_p=x0, x0_m=x0)
    assert structured_supported(cfg)
    H = ClosedLoop(cfg).run()       # dense transcription host loop
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()

    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step

    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.8, 0.4])))
    c = init_carry(cfg)
    us = []
    for _ in range(cfg.Nsim):
        c, out = step(c)
        us.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    assert np.abs(np.asarray(H["U"])[:, 0] - np.asarray(us)).max() < 1e-4


def test_user_equality_constraint_ss():
    # steady-state user equality pins the target input (Target_Calc.py:91-106)
    def H_eq_SS(x, u, y, d, t, px, py):
        return jnp.atleast_1d(u[0] - 0.25)

    cfg = _base(H_eq_SS=H_eq_SS)
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    assert np.allclose(H["US"][-5:], 0.25, atol=1e-5)


def test_lp_costs():
    # LP stage and steady-state costs (reference: Utilities.py:284-296,
    # 341-352): r_x|x| + r_u|u| stage cost, rss_y y + rss_u |u| target cost
    cfg = _base(
        ss_cost=SSCost(rss_y=np.array([[1.0, 1.0]]), rss_u=np.array([[0.1]])),
        stage_cost=StageCost(r_x=np.array([[1.0, 1.0]]), r_u=np.array([[0.1]])),
    )
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert np.isfinite(H["Yp"]).all()
    # LP target cost minimizes r_y'y: drives toward the lower bound region
    # (no setpoint tracking term) — just require a sane bounded loop
    assert np.abs(H["U"]).max() <= 3.0 + 1e-9


def test_estimating_mode_with_kf():
    # estimation-only mode skips target/OCP (MPC_code.py:200,675);
    # offree='no' for unambiguous state estimation
    cfg = _base(
        estimating=True,
        nd=0,
        dist=DisturbanceModel(offree="no"),
        estimator=EstimatorConfig(kind="kal", Q_kf=np.eye(2),
                                  R_kf=0.01 * np.eye(2), P0=np.eye(2)),
        x0_p=np.array([1.0, -0.5]),
        x0_m=np.array([0.0, 0.0]),
        u0=np.array([0.5]),
    )
    H = ClosedLoop(cfg).run()
    assert len(H["U"]) == 0          # input never recomputed
    # history convention (same as the reference): X_HAT[k] holds the
    # correction from step k-1, i.e. xhat(k-1|k-1) — compare against Xp[k-1]
    assert np.abs(H["X_HAT"][-1] - H["Xp"][-2]).max() < 0.02


def test_estimating_mode_batched_matches_host():
    # estimating=True in the traced step: no target/OCP built, input never
    # recomputed, the correction is carried — matches the host loop exactly
    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step

    cfg = _base(
        estimating=True, nd=0,
        dist=DisturbanceModel(offree="no"),
        estimator=EstimatorConfig(kind="kal", Q_kf=np.eye(2),
                                  R_kf=0.01 * np.eye(2), P0=np.eye(2)),
        x0_p=np.array([1.0, -0.5]), x0_m=np.zeros(2), u0=np.array([0.5]),
    )
    H = ClosedLoop(cfg).run()

    step = jax.jit(make_mpc_step(cfg))
    c = init_carry(cfg)
    xh_tr = []
    for _ in range(cfg.Nsim):
        c, out = step(c)
        xh_tr.append(np.asarray(out.xhat))
    # host stores X_HAT[k+1] = correction at step k
    assert np.abs(np.asarray(H["X_HAT"])[1:] - np.asarray(xh_tr)[:-1]).max() < 1e-12
    assert len(H["U"]) == 0


def test_continuous_model_state_saturation():
    # ContinuousModel.clip_lo/clip_hi saturates the ODE input (the
    # reference's Ex_NMPC_dis.py:75-77 stability-guard pattern): an
    # ignition-prone rollout stays finite with the guard
    import dataclasses
    import jax.numpy as jnp

    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import build_model

    cfg = make_config()
    hot = jnp.asarray(np.array([0.91, 336.0, 0.55]))
    us = jnp.asarray(np.array([300.157, 0.1]))
    d = jnp.asarray(np.array([0.0, 0.1]))

    raw = build_model(cfg)
    guarded = build_model(cfg.replace(model=dataclasses.replace(
        cfg.model, clip_lo=np.array([0.0, 280.0, 0.4]),
        clip_hi=np.array([2.0, 420.0, 1.0]))))

    x_raw, x_g = hot, hot
    for _ in range(8):
        x_raw = raw.fx(x_raw, us, cfg.h, d, 0.0, jnp.zeros(3))
        x_g = guarded.fx(x_g, us, cfg.h, d, 0.0, jnp.zeros(3))
    assert not np.isfinite(np.asarray(x_raw)).all()   # raw model ignites
    assert np.isfinite(np.asarray(x_g)).all()         # guard keeps it finite


def test_duform_econ():
    # DUFormEcon: us slot of the economic stage cost receives Delta-u
    # (reference: Control_Calc.py:183; Default_Values.py:99)
    def f_dis(x, u, y, xs, us, ys):
        # tracking + Delta-u penalty through the us slot
        return (x - xs) @ (x - xs) + 10.0 * (us @ us)

    cfg = _base(stage_cost=StageCost(f_dis=f_dis), DUFormEcon=True)
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # heavy Delta-u penalty: input moves smoothly
    du = np.abs(np.diff(H["U"], axis=0))
    assert du.max() < 1.0


def test_kalss_auto_gain_closed_loop():
    # kind='kalss' with no user K computes the steady-state Kalman gain from
    # the DARE on the augmented pair (reference: MPC_code.py:339-363)
    cfg = _base(estimator=EstimatorConfig(
        kind="kalss", Q_kf=np.eye(4), R_kf=0.01 * np.eye(2)))
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # offset-free: with the y2-bound-free default config the loop tracks the
    # constrained equilibrium direction
    assert np.isfinite(H["Yp"]).all()
    assert np.abs(H["D_HAT"][-1]).max() < 1.0


def test_user_equality_structured_matches_dense():
    # stagewise user equality h(x,u,...) = 0 through the bordered-stage
    # Riccati (structured) vs the dense transcription host loop
    # (Control_Calc.py:140-145)
    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step
    from mpc_code_tpu.solver.riccati import structured_supported

    def H_eq(x, u, y, d, t, px, py):
        # control pinned to a state-dependent line: u = 0.2 - 0.5 x2
        return jnp.atleast_1d(u[0] + 0.5 * x[1] - 0.2)

    cfg = _base(H_eq=H_eq)
    assert structured_supported(cfg)
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # the equality holds along the executed trajectory
    viol = np.abs(H["U"][:, 0] + 0.5 * H["X_HAT"][:, 1] - 0.2)
    assert viol.max() < 1e-6

    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.8, 0.4])))
    c = init_carry(cfg)
    us = []
    for _ in range(cfg.Nsim):
        c, out = step(c)
        us.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    assert np.abs(np.asarray(H["U"])[:, 0] - np.asarray(us)).max() < 1e-5


def test_slacksh_structured_matches_dense():
    # slack-softened user stage EQUALITIES (slacksH): the shared slack
    # vector gains nh_user entries relaxing the H rows to H_k = s_k >= 0
    # (Control_Calc.py:140-143); structured vs dense, host vs traced
    from mpc_code_tpu.solver.riccati import structured_supported

    def H_eq(x, u, y, d, t, px, py):
        # pinned-u line inconsistent with the unconstrained optimum at the
        # start -> the slack absorbs the residual
        return jnp.atleast_1d(u[0] - 0.05 - 0.2 * x[1])

    ny = 2
    bounds = Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                    ymin=np.array([-0.5, -0.5]), ymax=np.array([2.0, 2.0]))
    x0 = np.array([0.6, 0.5])
    cfg = _base(H_eq=H_eq, slacks=True, slacksH=True,
                Ws=10.0 * np.eye(2 * ny + 1), bounds=bounds,
                x0_p=x0, x0_m=x0)
    assert structured_supported(cfg)
    H = ClosedLoop(cfg).run()       # dense transcription host loop
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert np.isfinite(H["Yp"]).all()

    import jax

    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step

    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.8, 0.4])))
    c = init_carry(cfg)
    us = []
    for _ in range(cfg.Nsim):
        c, out = step(c)
        us.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    assert np.abs(np.asarray(H["U"])[:, 0] - np.asarray(us)).max() < 1e-4
