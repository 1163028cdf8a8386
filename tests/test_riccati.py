"""Structured (Riccati) solver vs dense IPM oracle (SURVEY.md §4 item 2:
Riccati-recursion solve vs dense-KKT solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_code_tpu.config import SolverOptions
from mpc_code_tpu.models import build_model, build_stage_cost, build_terminal_cost
from mpc_code_tpu.ocp.shooting import build_ocp
from mpc_code_tpu.solver.ipm import make_solver
from mpc_code_tpu.solver.riccati import build_structured_ocp, make_structured_solver


def _setup(N=12):
    from mpc_code_tpu.examples.nmpc import make_config

    cfg = make_config().replace(N=N, R_wn=None)
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    return cfg, model, f_obj, vfin


def _par(cfg, N, x0):
    xs = np.array([0.874317, 325.0, 0.6528])
    us = np.array([300.157, 0.1])
    return dict(x0=jnp.asarray(x0), xs=jnp.asarray(xs), us=jnp.asarray(us),
                d=jnp.asarray([0.0, 0.1]), um1=jnp.asarray(us), t=jnp.asarray(0.0),
                lam=jnp.zeros((cfg.ny, cfg.nu)), px=jnp.zeros((N, cfg.npx)),
                py=jnp.zeros((N, cfg.npy))), us


def test_structured_matches_dense_on_cstr():
    N = 12
    cfg, model, f_obj, vfin = _setup(N)
    spec = build_ocp(cfg, model, f_obj, vfin)
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=100)))
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=100)))

    nx, nu = cfg.nx, cfg.nu
    nxu = nx + nu
    x0 = np.array([0.6, 330.0, 0.60])
    par, us = _par(cfg, N, x0)

    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    for k in range(N):
        w0[k * nxu + nx : (k + 1) * nxu] = us
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(x0), (N + 1, 1)),
                jnp.tile(jnp.asarray(us), (N, 1)))

    assert int(rd.status) == 0 and int(rs.status) == 0
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)).max() < 5e-4
    assert abs(float(rd.f) - float(rs.f)) < 1e-5 * max(1.0, abs(float(rd.f)))


def test_structured_du_bounds_augmentation():
    # Delta-u bounds exercise the state augmentation with u_{k-1}
    import dataclasses

    N = 10
    cfg, model, f_obj, vfin = _setup(N)
    cfg = cfg.replace(bounds=dataclasses.replace(
        cfg.bounds, Dumin=np.array([-0.5, -0.01]), Dumax=np.array([0.5, 0.01])))
    spec = build_ocp(cfg, model, f_obj, vfin)
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=100)))
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    assert socp.nxa == cfg.nx + cfg.nu  # augmented
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=100)))

    nx, nu = cfg.nx, cfg.nu
    nxu = nx + nu
    x0 = np.array([0.7, 328.0, 0.62])
    par, us = _par(cfg, N, x0)
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    for k in range(N):
        w0[k * nxu + nx : (k + 1) * nxu] = us
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(np.concatenate([x0, us])), (N + 1, 1))[:, :socp.nxa] * 0
                + jnp.concatenate([jnp.asarray(x0), jnp.asarray(us)]),
                jnp.tile(jnp.asarray(us), (N, 1)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)).max() < 5e-4
    # Delta-u bounds hold
    du = np.diff(np.vstack([us, np.asarray(rs.U)]), axis=0)
    assert (du[:, 1] <= 0.01 + 1e-6).all() and (du[:, 1] >= -0.01 - 1e-6).all()


def test_structured_vmap_batch():
    N = 8
    cfg, model, f_obj, vfin = _setup(N)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    struct = make_structured_solver(socp, SolverOptions(max_iter=100))
    us = np.array([300.157, 0.1])

    def lane(x0):
        par, _ = _par(cfg, N, x0)
        par["x0"] = x0
        return struct(par, jnp.tile(x0, (N + 1, 1)), jnp.tile(jnp.asarray(us), (N, 1)))

    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform([0.4, 320, 0.56], [0.9, 335, 0.68], size=(8, 3)))
    res = jax.jit(jax.vmap(lane))(x0s)
    assert (np.asarray(res.status) == 0).all()
    assert np.asarray(res.kkt_err).max() < 1e-7


def test_structured_contform_matches_dense():
    # ContForm: RK4 state integration + continuous economic-cost quadrature
    # per stage (the ENMPC transcription, Control_Calc.py:102-111,153-158)
    # through the Riccati structure vs the dense oracle
    from mpc_code_tpu.examples.enmpc import make_config

    cfg = make_config().replace(N=8)
    assert cfg.ContForm
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    spec = build_ocp(cfg, model, f_obj, vfin)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    N, nx, nu = cfg.N, cfg.nx, cfg.nu
    nxu = nx + nu
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=200)))
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=200)))
    x0 = np.asarray(cfg.x0_m, float)
    us0 = np.asarray(cfg.u0, float)
    par = dict(x0=jnp.asarray(x0), xs=jnp.asarray(x0), us=jnp.asarray(us0),
               d=jnp.zeros(cfg.nd), um1=jnp.asarray(us0), t=jnp.asarray(0.0),
               lam=jnp.zeros((cfg.ny, cfg.nu)), px=jnp.zeros((N, cfg.npx)),
               py=jnp.zeros((N, cfg.npy)))
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    for k in range(N):
        w0[k * nxu + nx : (k + 1) * nxu] = us0
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(x0), (N + 1, 1)),
                jnp.tile(jnp.asarray(us0), (N, 1)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)).max() < 1e-6
    assert abs(float(rd.f) - float(rs.f)) < 1e-6 * abs(float(rd.f))


def test_structured_slacks_matches_dense():
    # soft output constraints: the shared slack pair is folded into the
    # Riccati structure as a constant-slack augmentation (decided at stage
    # 0, carried as extra states); must agree with the dense IPM on the
    # reference formulation (Control_Calc.py:187, 217, 232-239)
    from mpc_code_tpu.config import (
        Bounds, DisturbanceModel, EstimatorConfig, LinearModel, LinearPlant,
        MPCConfig, SSCost, StageCost,
    )

    A = np.array([[0.85, 0.1], [0.0, 0.9]])
    B = np.array([[0.2], [1.0]])
    ny, N = 2, 10
    cfg = MPCConfig(
        nx=2, nu=1, ny=2, nd=2, Nsim=5, N=N, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
        dist=DisturbanceModel(offree="lin", Bd=np.zeros((2, 2)), Cd=np.eye(2)),
        x0_p=np.array([1.0, 0.8]), x0_m=np.array([1.0, 0.8]), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        estimator=EstimatorConfig(kind="lue",
                                  K=np.vstack([np.zeros((2, 2)), np.eye(2)])),
        bounds=Bounds(umin=np.array([-3.0]), umax=np.array([3.0]),
                      ymin=np.array([-0.1, -0.1]), ymax=np.array([0.55, 0.45])),
        slacks=True, Ws=10.0 * np.eye(2 * ny),
    )
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    spec = build_ocp(cfg, model, f_obj, vfin)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    assert socp.ns == 2 * ny and socp.nu == 1 + 2 * ny

    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=150)))
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=150)))

    nx, nu = 2, 1
    nxu = nx + nu
    x0 = np.array([1.0, 0.8])   # outside ymax: slack must engage
    par = dict(x0=jnp.asarray(x0), xs=jnp.asarray([0.36, 0.45]),
               us=jnp.asarray([0.045]), d=jnp.zeros(2), um1=jnp.zeros(1),
               t=jnp.asarray(0.0), lam=jnp.zeros((cfg.ny, cfg.nu)),
               px=jnp.zeros((N, cfg.npx)), py=jnp.zeros((N, cfg.npy)))
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(np.concatenate([x0, np.zeros(socp.ns)])),
                              (N + 1, 1)),
                jnp.zeros((N, socp.nu)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)[:, :socp.nu_ctrl]).max() < 1e-6
    Sl_d = wd[spec.nw - spec.ns :]
    Sl_s = np.asarray(rs.X)[1, nx:]
    assert np.abs(Sl_d - Sl_s).max() < 1e-3   # both ~[0.45, 0.35, 0, 0]
    assert Sl_s[0] > 0.4                      # slack engaged
    assert abs(float(rd.f) - float(rs.f)) < 1e-5 * abs(float(rd.f))


def test_adaptive_mu_matches_monotone():
    # mu_strategy='adaptive' (LOQO centrality rule) reaches the same KKT
    # point as the monotone Fiacco-McCormick schedule, in no more iterations
    N = 12
    cfg, model, f_obj, vfin = _setup(N)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    mono = jax.jit(make_structured_solver(
        socp, SolverOptions(max_iter=100, tol=1e-8)))
    adap = jax.jit(make_structured_solver(
        socp, SolverOptions(max_iter=100, tol=1e-8, mu_strategy="adaptive")))
    x0 = np.array([0.6, 330.0, 0.60])
    par_p, us = _par(cfg, N, x0)
    X0 = jnp.tile(jnp.asarray(x0), (N + 1, 1))
    U0 = jnp.tile(jnp.asarray(us), (N, 1))
    r1 = mono(par_p, X0, U0)
    r2 = adap(par_p, X0, U0)
    assert int(r1.status) == 0 and int(r2.status) == 0
    assert np.abs(np.asarray(r1.U) - np.asarray(r2.U)).max() < 1e-5
    # comparable iteration count (exact ordering flips by +-1 with the
    # round-4 adaptive step controller)
    assert int(r2.iters) <= int(r1.iters) + 2


def test_parallel_scan_matches_sequential():
    # associative-scan Riccati vs sequential recursion: same KKT point at
    # moderate tolerance (the parallel path carries a permanent 1e-6
    # Hessian regularization for intermediate-window well-posedness)
    N = 12
    cfg, model, f_obj, vfin = _setup(N)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    opts = SolverOptions(max_iter=60, tol=1e-4)
    seq = jax.jit(make_structured_solver(socp, opts, parallel=False))
    par = jax.jit(make_structured_solver(socp, opts, parallel=True))
    x0 = np.array([0.6, 330.0, 0.60])
    par_p, us = _par(cfg, N, x0)
    X0 = jnp.tile(jnp.asarray(x0), (N + 1, 1))
    U0 = jnp.tile(jnp.asarray(us), (N, 1))
    r1 = seq(par_p, X0, U0)
    r2 = par(par_p, X0, U0)
    assert int(r1.status) != 2 and int(r2.status) != 2
    assert np.abs(np.asarray(r1.U) - np.asarray(r2.U)).max() < 2e-2
    assert abs(float(r1.f) - float(r2.f)) < 1e-3


def test_structured_termcons_matches_dense():
    # terminal equality x_N = xs (Control_Calc.py:197-198) through the
    # constrained-Riccati terminal-multiplier path vs the dense oracle
    N = 12
    cfg, model, f_obj, vfin = _setup(N)
    cfg = cfg.replace(TermCons=True)
    spec = build_ocp(cfg, model, f_obj, vfin)
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=150)))
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    assert socp.n_tc == cfg.nx
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=150)))

    nx, nu = cfg.nx, cfg.nu
    nxu = nx + nu
    x0 = np.array([0.7, 328.0, 0.62])
    par, us = _par(cfg, N, x0)
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    for k in range(N):
        w0[k * nxu + nx : (k + 1) * nxu] = us
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(x0), (N + 1, 1)),
                jnp.tile(jnp.asarray(us), (N, 1)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    # terminal equality holds exactly (QForm: x_N = xs)
    xs = np.array([0.874317, 325.0, 0.6528])
    assert np.abs(np.asarray(rs.X)[N, :nx] - xs).max() < 1e-7
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)).max() < 5e-4
    assert abs(float(rd.f) - float(rs.f)) < 1e-5 * max(1.0, abs(float(rd.f)))


def test_structured_termcons_vmap():
    N = 8
    cfg, model, f_obj, vfin = _setup(N)
    cfg = cfg.replace(TermCons=True)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    struct = make_structured_solver(socp, SolverOptions(max_iter=150))
    us = np.array([300.157, 0.1])

    def lane(x0):
        par, _ = _par(cfg, N, x0)
        par["x0"] = x0
        return struct(par, jnp.tile(x0, (N + 1, 1)), jnp.tile(jnp.asarray(us), (N, 1)))

    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform([0.5, 322, 0.58], [0.9, 333, 0.67], size=(6, 3)))
    res = jax.jit(jax.vmap(lane))(x0s)
    assert (np.asarray(res.status) == 0).all()
    xs = np.array([0.874317, 325.0, 0.6528])
    assert np.abs(np.asarray(res.X)[:, N, :3] - xs).max() < 1e-7


def test_structured_collocation_matches_dense():
    # 2-point GL collocation through exact within-stage condensation vs the
    # dense simultaneous transcription (opt_dyn_CM, Control_Calc.py:264-567)
    from mpc_code_tpu.config import StageCost
    from mpc_code_tpu.examples import enmpc as ex
    from mpc_code_tpu.models.costs import xQx
    from mpc_code_tpu.ocp.collocation import build_ocp_collocation

    Q = np.eye(2)
    R = np.eye(1)

    def cost(x, u, y, xs, us, ys, s_coll):
        return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

    N = 8
    cfg = ex.make_config(Nsim=4).replace(
        N=N, stage_cost=StageCost(f_coll=cost), ContForm=False,
        Collocation=True)
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)

    spec = build_ocp_collocation(cfg, model, f_obj, vfin)
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=150)))
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=150)))

    nx, nu = cfg.nx, cfg.nu
    nxuk = 3 * nx + nu
    x0 = np.array([0.6, 0.4])
    xs = np.array([0.5528, 0.6219])
    us = np.array([1.043])
    p = dict(x0=jnp.asarray(x0), xs=jnp.asarray(xs), us=jnp.asarray(us),
             d=jnp.zeros(cfg.nd), um1=jnp.asarray(us), t=jnp.asarray(0.0),
             lam=jnp.zeros((cfg.ny, nu)), px=jnp.zeros((N, cfg.npx)),
             py=jnp.zeros((N, cfg.npy)))
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N):
        w0[k * nxuk : k * nxuk + nx] = x0
        w0[k * nxuk + nx : k * nxuk + 3 * nx] = np.tile(x0, 2)
        w0[k * nxuk + 3 * nx : (k + 1) * nxuk] = us
    w0[N * nxuk : N * nxuk + nx] = x0
    rd = dense(jnp.asarray(w0), p, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(p, jnp.tile(jnp.asarray(x0), (N + 1, 1)),
                jnp.tile(jnp.asarray(us), (N, 1)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxuk + 3 * nx : (k + 1) * nxuk] for k in range(N)])
    assert np.abs(Ud - np.asarray(rs.U)).max() < 1e-6
    assert abs(float(rd.f) - float(rs.f)) < 1e-8 * max(1.0, abs(float(rd.f)))
    # condensed states match the dense trajectory
    Xd = np.array([wd[k * nxuk : k * nxuk + nx] for k in range(N)]
                  + [wd[N * nxuk : N * nxuk + nx]])
    assert np.abs(Xd - np.asarray(rs.X)).max() < 1e-6


def test_mehrotra_matches_monotone():
    # Mehrotra predictor-corrector reaches the same KKT point in fewer
    # iterations (15 -> 10 on the bench CSTR at tol=1e-8)
    N = 30
    cfg, model, f_obj, vfin = _setup(N)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    x0 = np.array([0.6, 330.0, 0.60])
    us = np.array([300.157, 0.1])
    par, _ = _par(cfg, N, x0)
    X0 = jnp.tile(jnp.asarray(x0), (N + 1, 1))
    U0 = jnp.tile(jnp.asarray(us), (N, 1))

    r_mono = jax.jit(make_structured_solver(
        socp, SolverOptions(max_iter=100, tol=1e-8)))(par, X0, U0)
    r_meh = jax.jit(make_structured_solver(
        socp, SolverOptions(max_iter=100, tol=1e-8,
                            mu_strategy="mehrotra")))(par, X0, U0)
    assert int(r_mono.status) == 0 and int(r_meh.status) == 0
    assert int(r_meh.iters) <= int(r_mono.iters)
    assert np.abs(np.asarray(r_meh.U) - np.asarray(r_mono.U)).max() < 1e-5
    assert abs(float(r_meh.f) - float(r_mono.f)) < 1e-8 * max(
        1.0, abs(float(r_mono.f)))


def test_structured_heq_termcons_matches_dense():
    # user stage equalities COMBINED with the terminal equality — the merged
    # bordered-stage + terminal-multiplier recursion (_riccati_eqstage_tc)
    # vs the dense oracle.  One equality row per stage (u2 pinned to a
    # state-coupled line consistent with the steady state) leaves one
    # control DOF per stage for the 3-row terminal constraint.
    N = 12
    cfg, model, f_obj, vfin = _setup(N)

    def H_eq(x, u, y, d, t, px, py):
        # control-allocation line, state-coupled, consistent with the
        # steady pair (us, xs): both controls stay free to move, so the
        # 3-row terminal equality remains reachable
        return jnp.atleast_1d(u[0] + 50.0 * u[1] - 305.157
                              - 0.1 * (x[1] - 325.0))

    cfg = cfg.replace(TermCons=True, H_eq=H_eq)
    from mpc_code_tpu.solver.riccati import structured_supported

    assert structured_supported(cfg)
    spec = build_ocp(cfg, model, f_obj, vfin)
    dense = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=200)))
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    assert socp.n_tc == cfg.nx and socp.n_eq == 1
    struct = jax.jit(make_structured_solver(socp, SolverOptions(max_iter=200)))

    nx, nu = cfg.nx, cfg.nu
    nxu = nx + nu
    x0 = np.array([0.8, 327.0, 0.64])
    par, us = _par(cfg, N, x0)
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)
    for k in range(N + 1):
        w0[k * nxu : k * nxu + nx] = x0
    for k in range(N):
        w0[k * nxu + nx : (k + 1) * nxu] = us
    rd = dense(jnp.asarray(w0), par, lbw, ubw, spec.lbg, spec.ubg)
    rs = struct(par, jnp.tile(jnp.asarray(x0), (N + 1, 1)),
                jnp.tile(jnp.asarray(us), (N, 1)))
    assert int(rd.status) == 0 and int(rs.status) == 0
    X_s = np.asarray(rs.X)
    U_s = np.asarray(rs.U)
    # terminal equality x_N = xs and the stage equalities hold
    xs = np.array([0.874317, 325.0, 0.6528])
    assert np.abs(X_s[N, :nx] - xs).max() < 1e-7
    assert np.abs(U_s[:, 0] + 50.0 * U_s[:, 1] - 305.157
                  - 0.1 * (X_s[:N, 1] - 325.0)).max() < 1e-7
    wd = np.asarray(rd.w)
    Ud = np.array([wd[k * nxu + nx : (k + 1) * nxu] for k in range(N)])
    assert np.abs(Ud - U_s).max() < 5e-4
    assert abs(float(rd.f) - float(rs.f)) < 1e-5 * max(1.0, abs(float(rd.f)))


def test_fast_dyn_sweep_matches_generic():
    # the lane-packed rk4_stage_jac dynamics sweep (ops/integrators.py)
    # vs the generic vmapped-jacfwd path, across the augmentation forms
    # (plain, Delta-u carry, shared slacks) on the continuous CSTR
    import dataclasses as dc
    import os

    from mpc_code_tpu.examples.nmpc import make_config

    N = 10
    base = make_config().replace(N=N, R_wn=None)
    xs = np.array([0.874317, 325.0, 0.6528])
    us = np.array([300.157, 0.1])
    variants = {
        "plain": base,
        "du": base.replace(bounds=dc.replace(
            base.bounds, Dumin=np.array([-0.5, -0.01]),
            Dumax=np.array([0.5, 0.01]))),
        "slacks": base.replace(
            bounds=dc.replace(base.bounds,
                              ymin=np.array([0.0, 280.0]),
                              ymax=np.array([1.0, 340.0])),
            slacks=True, Ws=10.0 * np.eye(4)),
    }
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform([0.4, 320, 0.56], [0.9, 334, 0.67],
                                  size=(5, 3)))
    for name, cfg in variants.items():
        _check_fast_vs_generic(cfg, name, x0s, xs, us, N,
                               d=np.array([0.0, 0.1]))

    # discrete map (map_stage_jac): the quadruple tank with its hand-rolled
    # internal RK4 (Ex_NMPC_dis.py:94-128)
    from mpc_code_tpu.examples.nmpc_dis import make_config as mk_dis

    cfg_d = mk_dis().replace(N=8)
    cfg_d = cfg_d.replace(bounds=dc.replace(cfg_d.bounds, Dumin=None,
                                            Dumax=None))
    xs_d = np.array([39.5185, 38.1743, 11.9996, 12.1883, 2.0, 2.0])
    us_d = np.array([39.5185, 38.1743])
    rng_d = np.random.default_rng(7)
    x0s_d = jnp.asarray(
        xs_d + rng_d.uniform(-0.5, 0.5, size=(4, 6)) * np.array(
            [2.0, 2.0, 1.0, 1.0, 0.2, 0.2]))
    _check_fast_vs_generic(cfg_d, "discrete", x0s_d, xs_d, us_d, 8,
                           d=np.zeros(2))

    # ContForm joint sweep (rk4_quad_stage_hess): dynamics Jacobians AND
    # the economic quadrature cost's gradient/Hessian from one rollout
    from mpc_code_tpu.examples.enmpc import make_config as mk_en

    cfg_e = mk_en().replace(N=8)
    x0_e = np.asarray(cfg_e.x0_m, float)
    rng_e = np.random.default_rng(3)
    x0s_e = jnp.asarray(x0_e + rng_e.uniform(-0.2, 0.2, size=(4, 2)))
    _check_fast_vs_generic(cfg_e, "contform", x0s_e, x0_e,
                           np.asarray(cfg_e.u0, float), 8, d=np.zeros(2))


def _check_fast_vs_generic(cfg, name, x0s, xs, us, N, d):
    import os

    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    nx, nu = cfg.nx, cfg.nu
    res = {}
    try:
        for fast in (True, False):
            os.environ["MPC_TPU_FAST_SWEEP"] = "1" if fast else "0"
            socp = build_structured_ocp(cfg, model, f_obj, vfin)
            assert ((socp.stage_dyn_jac is not None)
                    or (socp.stage_cf is not None)) == fast, name
            solve = make_structured_solver(
                socp, SolverOptions(max_iter=80, tol=1e-8,
                                    hessian="gauss_newton"))
            nxa = socp.nxa

            def lane(x0):
                par = dict(x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
                           d=jnp.asarray(d), um1=jnp.asarray(us),
                           t=jnp.asarray(0.0),
                           lam=jnp.zeros((cfg.ny, cfg.nu)),
                           px=jnp.zeros((N, cfg.npx)),
                           py=jnp.zeros((N, cfg.npy)))
                xa0 = jnp.zeros(nxa).at[:nx].set(x0)
                X0 = jnp.tile(xa0[None], (N + 1, 1))
                U0 = jnp.zeros((N, socp.nu)).at[:, :nu].set(jnp.asarray(us))
                return solve(par, X0, U0)

            res[fast] = jax.jit(jax.vmap(lane))(x0s)
    finally:
        os.environ.pop("MPC_TPU_FAST_SWEEP", None)
    # some variants floor at STATUS_ACCEPTABLE on some lanes at tol=1e-8;
    # the point here is fast == generic, lane for lane
    assert (np.asarray(res[True].status) != 2).all(), name
    assert (np.asarray(res[True].status)
            == np.asarray(res[False].status)).all(), name
    assert (np.asarray(res[True].iters)
            == np.asarray(res[False].iters)).all(), name
    assert np.abs(np.asarray(res[True].U)
                  - np.asarray(res[False].U)).max() < 1e-10, name


def test_costate_dual_init_same_optimum():
    # dual_init='costate' (adjoint-recursion multiplier seed) must reach
    # the same KKT point as the zero init; measured NEUTRAL on iteration
    # counts at the bench workload (see SolverOptions.dual_init), kept
    # for exact-Hessian/tight-tolerance regimes
    import dataclasses as dc

    from mpc_code_tpu.examples.nmpc import make_config

    N = 10
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=dc.replace(
        cfg.model, Mx=4,
        clip_lo=np.array([0.0, 280.0, 0.4]),
        clip_hi=np.array([2.0, 420.0, 1.0])))
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    xs = np.array([0.874317, 325.0, 0.6528])
    us = np.array([300.157, 0.1])
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(rng.uniform([0.4, 320, 0.56], [0.9, 334, 0.67],
                                  size=(4, 3)))
    res = {}
    for di in ("zero", "costate"):
        solve = make_structured_solver(
            socp, SolverOptions(max_iter=60, tol=1e-8,
                                hessian="gauss_newton", dual_init=di))

        def lane(x0):
            par = dict(x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
                       d=jnp.asarray([0.0, 0.1]), um1=jnp.asarray(us),
                       t=jnp.asarray(0.0), lam=jnp.zeros((cfg.ny, cfg.nu)),
                       px=jnp.zeros((N, cfg.npx)),
                       py=jnp.zeros((N, cfg.npy)))
            X0 = jnp.tile(x0[None], (N + 1, 1))
            U0 = jnp.tile(jnp.asarray(us), (N, 1))
            return solve(par, X0, U0)

        res[di] = jax.jit(jax.vmap(lane))(x0s)
    assert (np.asarray(res["costate"].status) != 2).all()
    assert np.abs(np.asarray(res["costate"].U)
                  - np.asarray(res["zero"].U)).max() < 1e-6


def test_parallel_line_search_bit_identical():
    """SolverOptions.ls_parallel evaluates all backtracking trials in one
    vectorized pass; the selected step (first acceptable alpha) and hence
    the whole solve must be BIT-identical to the sequential loop (f64)."""
    import dataclasses as dc

    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )

    N = 12
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4]),
        clip_hi=np.array([2.0, 420.0, 1.0])))
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    xs = jnp.asarray([0.874317, 325.0, 0.6528])
    us = jnp.asarray([300.157, 0.1])
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(rng.uniform([0.35, 318.0, 0.56],
                                  [0.92, 339.0, 0.69], (12, 3)))

    res = {}
    for par_ls in (False, True):
        solve = make_structured_solver(
            socp, SolverOptions(max_iter=40, tol=1e-8,
                                hessian="gauss_newton", ls_parallel=par_ls))

        def lane(x0):
            p = dict(x0=x0, xs=xs, us=us, d=jnp.asarray([0.0, 0.1]), um1=us,
                     t=jnp.asarray(0.0), lam=jnp.zeros((cfg.ny, cfg.nu)),
                     px=jnp.zeros((N, cfg.npx)), py=jnp.zeros((N, cfg.npy)))
            return solve(p, jnp.tile(x0, (N + 1, 1)), jnp.tile(us, (N, 1)))

        res[par_ls] = jax.jit(jax.vmap(lane))(x0s)
    for f in ("U", "X", "status", "iters", "kkt_err", "feas_err"):
        a = np.asarray(getattr(res[False], f)).astype(np.float64)
        b = np.asarray(getattr(res[True], f)).astype(np.float64)
        assert np.array_equal(a, b), f
