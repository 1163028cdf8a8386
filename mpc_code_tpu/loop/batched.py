"""Fully-traced batched MPC step for throughput and SPMD execution.

The interactive simulator (`loop/simulator.py`) mirrors the reference
driver host-side for fidelity; this module provides the TPU-first
counterpart: one pure-JAX sampling-instant step (measure -> estimate ->
target NLP -> OCP NLP -> plant -> adaptation) that jits once, `lax.scan`s
over time, `vmap`s over scenarios, and shards the scenario batch over a
device mesh — the parallelism the reference lacks entirely (SURVEY.md
§2.4: independent solves across scenarios are the natural batch axis).

Full closed-loop fidelity (reference MPC_code.py:485-875): time-varying
parameters over the horizon, time-varying setpoints, white process and
measurement noise, real (non-nominal) plant parameters, and the modifier-
adaptation solves all run inside the traced step.  The exogenous data of
each instant enters through a :class:`~mpc_code_tpu.loop.schedules.StepInput`
precomputed host-side once per simulation (``make_step_inputs``) and fed
to ``lax.scan`` — semantics identical to the host loop, zero host
round-trips inside the scan.

Feasibility fallbacks are expressed with `jnp.where` masks so one diverged
scenario cannot stall the batch (reference semantics MPC_code.py:714-718,
786-805, per-lane).

Estimators supported in traced mode: kalss/lue (static gain), kal, ekf,
and MHE (filter and smooth updates) — including the growing-horizon
warmup, which runs traced from step 0 through a masked fixed-shape window
(``init_carry(cfg)`` builds the cold padded carry; reference semantics
MPC_code.py:591-598).  A host-driven warmup handoff
(``init_carry(cfg, mhe=carry_from_runtime(loop.mhe_rt, P),
state=loop.final_state)``) remains supported and its continuation is
bit-identical to the host loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.estimators.ekf import ekf
from mpc_code_tpu.estimators.linear import build_augmented, kalman, kalss, kalss_gain
from mpc_code_tpu.loop.schedules import StepInput, default_step_input, make_step_inputs
from mpc_code_tpu.models import (
    build_model,
    build_plant,
    build_ss_cost,
    build_stage_cost,
    build_terminal_cost,
)
from mpc_code_tpu.ocp.shooting import build_ocp
from mpc_code_tpu.ocp.target import build_ssp, build_ssp2, build_target, make_lambda_update
from mpc_code_tpu.ops.linalg import sqrtm_psd
from mpc_code_tpu.solver.ipm import make_solver
from mpc_code_tpu.solver.nlp import STATUS_INFEASIBLE


class MPCCarry(NamedTuple):
    x: jnp.ndarray       # plant state
    xhat: jnp.ndarray    # model state estimate
    dhat: jnp.ndarray    # disturbance estimate
    P: jnp.ndarray       # estimator covariance
    u: jnp.ndarray       # last applied input
    xs: jnp.ndarray      # current state target
    us: jnp.ndarray      # current input target
    w_prev: jnp.ndarray  # previous OCP solution (warm start)
    ocp_ok: jnp.ndarray  # last OCP feasibility flag
    t: jnp.ndarray       # time
    mhe: Any = None      # MHECarry window state (kind='mhe' only)
    lam: Any = None      # modifier-adaptation lambda (Adaptation only)
    # dual/barrier warm-start state for the structured OCP solver (dict
    # with zl/zu/lam/nus/mu/sf/ok, shifted one stage per step like the
    # primal warm start; None = dual warm start disabled)
    duals: Any = None


class MPCStepOut(NamedTuple):
    x: jnp.ndarray        # plant state at measurement time (history Xp)
    y: jnp.ndarray        # measured output (history Yp)
    yhat: jnp.ndarray     # pre-correction model output (history Y_HAT)
    u: jnp.ndarray
    xs: jnp.ndarray
    us: jnp.ndarray
    ys: jnp.ndarray
    xhat: jnp.ndarray     # post-correction estimate
    dhat: jnp.ndarray
    status_ss: jnp.ndarray
    status_dyn: jnp.ndarray
    ocp_iters: jnp.ndarray
    lam: Any = None       # updated lambda (Adaptation only)
    cor: Any = None       # lam_prev @ (us - us_prev) (Adaptation only)
    upopt: Any = None     # plant-optimum input (Adaptation only)
    ypopt: Any = None     # plant-optimum output (Adaptation only)


def make_mpc_step(cfg: MPCConfig, ysp=None, usp=None, xsp=None,
                  use_structured: Optional[bool] = None,
                  batch_hint: Optional[int] = None) -> Callable:
    """Build ``step(carry, inp=None) -> (MPCCarry, MPCStepOut)`` (pure JAX).

    ``batch_hint``: expected vmap batch size over carries — selects the
    chip-measured-faster derivative-sweep layout for that regime (see
    riccati._fast_sweep_on).

    ``inp`` is a :class:`StepInput` with this instant's schedules/noise;
    when omitted a fixed default (setpoints from ``ysp/usp/xsp``, zero
    parameters, no noise) is used, so ``step(carry)`` stays valid for
    steady workloads.  For full-fidelity runs precompute
    ``make_step_inputs(cfg, Nsim)`` and ``lax.scan(step, c0, inputs)``
    (see :func:`run_traced`).  `vmap` over carries (shared inputs) for
    scenario batches.
    """
    nx, nu, ny, nd, N = cfg.nx, cfg.nu, cfg.ny, cfg.nd, cfg.N
    nxu = nx + nu
    model = build_model(cfg)
    plant = build_plant(cfg, model)
    aug = build_augmented(cfg, model)

    estimating = bool(cfg.estimating)
    if not estimating:
        fss_obj = build_ss_cost(cfg.ss_cost)
        f_obj = build_stage_cost(cfg.stage_cost)
        vfin = build_terminal_cost(cfg)
        tspec = build_target(cfg, model, fss_obj)
        ospec = build_ocp(cfg, model, f_obj, vfin)
        target_solve = make_solver(tspec.nlp, cfg.sol_opts_ss,
                                   batch_hint=batch_hint)

    # structured Riccati fast path for the OCP when the feature set allows
    # it (incl. soft output constraints via constant-slack augmentation and
    # user stage inequalities); dense IPM fallback otherwise
    from mpc_code_tpu.solver.riccati import structured_supported

    if use_structured is None:
        use_structured = (not estimating) and structured_supported(cfg)
    elif use_structured and (estimating or not structured_supported(cfg)):
        raise ValueError("use_structured=True but the config is not "
                         "structured-solver eligible")
    if use_structured:
        from mpc_code_tpu.solver.riccati import (
            build_structured_ocp, make_structured_solver,
        )

        socp = build_structured_ocp(cfg, model, f_obj, vfin,
                                    batch_hint=batch_hint)
        struct_solve = make_structured_solver(socp, cfg.sol_opts_dyn)
        ns_s = socp.ns
        nup = socp.nxa - nx - ns_s
        du_aug = nup > 0
    elif not estimating:
        ocp_solve = make_solver(ospec.nlp, cfg.sol_opts_dyn,
                                batch_hint=batch_hint)

    adaptation = (not estimating) and cfg.Adaptation
    if adaptation:
        ssp_spec = build_ssp(cfg, plant)
        ssp_solve = make_solver(ssp_spec.nlp, cfg.sol_opts_ss,
                                batch_hint=batch_hint)
        fss2 = cfg.ss_cost.f_obj if nx != cfg.nxp else fss_obj
        ssp2_spec = build_ssp2(cfg, plant, fss2)
        ssp2_solve = make_solver(ssp2_spec.nlp, cfg.sol_opts_ss,
                                 batch_hint=batch_hint)
        lambda_update = make_lambda_update(cfg, model, plant)

    est = cfg.estimator
    kind = est.kind
    if kind not in ("kalss", "lue", "kal", "ekf", "mhe"):
        raise ValueError(f"estimator kind {kind!r} unsupported in the traced "
                         "batched step (supported: kalss, lue, kal, ekf, mhe)")
    if kind == "kal":
        from mpc_code_tpu.config import LinearModel

        if not isinstance(cfg.model, LinearModel):
            # reference hard-exits (MPC_code.py:643-646)
            raise ValueError(
                "estimator kind 'kal' requires a LinearModel (reference "
                "MPC_code.py:643-646); use 'ekf' for nonlinear models")
    if kind == "mhe":
        # traced MHE incl. growing-horizon warmup (init_carry builds the
        # cold masked window; a host-warmed handoff also still works)
        from mpc_code_tpu.estimators.mhe import make_mhe_traced

        mhe_step, _ = make_mhe_traced(cfg, model)
    if kind in ("kalss", "lue"):
        if cfg.StateFeedback and cfg.dist.offree == "no":
            K_gain = jnp.eye(aug.n)
        elif est.K is not None:
            K_gain = jnp.asarray(est.K, dtype=float)
        else:
            K_gain = kalss_gain(cfg, model)
    Qkf = None if est.Q_kf is None else jnp.asarray(est.Q_kf, dtype=float)
    Rkf = None if est.R_kf is None else jnp.asarray(est.R_kf, dtype=float)

    default_inp = default_step_input(cfg, ysp=ysp, usp=usp, xsp=xsp)

    npx, npy, npxp, npyp = cfg.npx, cfg.npy, cfg.npxp, cfg.npyp
    zero_lam = jnp.zeros((ny, nu))
    dmin = None if cfg.bounds.dmin is None else jnp.asarray(cfg.bounds.dmin, float).reshape(-1)
    dmax = None if cfg.bounds.dmax is None else jnp.asarray(cfg.bounds.dmax, float).reshape(-1)

    # noise shaping (MPC_code.py:537-541, 823-827)
    Rv = (None if cfg.R_wn is None
          else jnp.asarray(np.asarray(sqrtm_psd(np.asarray(cfg.R_wn, float)))))
    GQw = None
    if cfg.Q_wn is not None and cfg.G_wn is not None:
        Qw = np.asarray(sqrtm_psd(np.asarray(cfg.Q_wn, float)))
        GQw = jnp.asarray(np.asarray(cfg.G_wn, float) @ Qw)

    x0_m = jnp.asarray(np.asarray(cfg.x0_m, float).reshape(-1))
    u0 = jnp.asarray(np.asarray(cfg.u0, float).reshape(-1))
    if adaptation or (not estimating and not plant.nominal):
        x0_p = jnp.asarray(np.asarray(cfg.x0_p, float).reshape(-1))

    if not estimating:
        t_lbw = jnp.asarray(tspec.lbw)
        t_ubw = jnp.asarray(tspec.ubw)
        t_lbg = jnp.asarray(tspec.lbg)
        t_ubg = jnp.asarray(tspec.ubg)
        o_lbw = jnp.asarray(ospec.lbw)
        o_ubw = jnp.asarray(ospec.ubw)
        o_lbg = jnp.asarray(ospec.lbg)
        o_ubg = jnp.asarray(ospec.ubg)
        nw, ns = ospec.nw, ospec.ns

    def step(c: MPCCarry, inp: Optional[StepInput] = None):
        if inp is None:
            inp = default_inp
        t_k = c.t
        px0 = inp.px_h[0]
        py0 = inp.py_h[0]
        lam_k = c.lam if adaptation else zero_lam

        # pre-correction model output (MPC_code.py:524)
        yhat_k = model.fy(c.xhat, c.u, c.dhat, t_k, py0)

        # measurement (MPC_code.py:531-541)
        if plant.nominal:
            y_k = plant.fy(c.x, c.u, c.dhat, t_k, py0)
        else:
            y_k = plant.fy(c.x, c.u, inp.pyp, t_k, inp.pymp)
        if Rv is not None:
            y_k = y_k + Rv @ inp.v_wn

        # estimator (MPC_code.py:546-668)
        x_es = jnp.concatenate([c.xhat, c.dhat]) if cfg.dist.offree != "no" else c.xhat
        P = c.P
        mhe_c = c.mhe
        if kind in ("kalss", "lue"):
            x_es = kalss(aug, y_k, c.u, K_gain, x_es, t_k, py0)
        elif kind == "kal":
            P, _, x_es = kalman(aug, cfg.h, y_k, c.u, Qkf, Rkf, P, x_es, t_k, px0, py0)
        elif kind == "ekf":
            P, _, x_es = ekf(aug, cfg.h, y_k, c.u, Qkf, Rkf, P, x_es, t_k, px0, py0)
        elif kind == "mhe":
            mhe_c, x_es = mhe_step(c.mhe, y_k, c.u, x_es, t_k, px0, py0)
        if cfg.dist.offree != "no":
            xhat = x_es[:nx]
            dhat = x_es[nx : nx + nd]
            if dmin is not None:
                dhat = jnp.clip(dhat, dmin, dmax)      # MPC_code.py:660-665
        else:
            xhat, dhat = x_es, c.dhat

        def plant_step(x, u):
            # plant update incl. process noise (MPC_code.py:813-827)
            if plant.nominal:
                xn = plant.fx(x, u, cfg.h, dhat, t_k, inp.pxmp)
            else:
                xn = plant.fx(x, u, inp.pxp, t_k, cfg.h, inp.pxmp)
            if GQw is not None:
                xn = xn + GQw @ inp.w_wn
            return xn

        if estimating:
            # estimation-only mode (MPC_code.py:200, 675): no target/OCP,
            # the input is never recomputed.  The CORRECTION is carried —
            # the filters do their own time update internally, exactly as
            # the host loop's estimating flow (simulator.py)
            x_next = plant_step(c.x, c.u)
            zero_i = jnp.asarray(0, jnp.int32)
            carry = MPCCarry(x=x_next, xhat=xhat, dhat=dhat, P=P, u=c.u,
                             xs=c.xs, us=c.us, w_prev=c.w_prev,
                             ocp_ok=c.ocp_ok, t=t_k + cfg.h, mhe=mhe_c,
                             lam=c.lam, duals=c.duals)
            out = MPCStepOut(x=c.x, y=y_k, yhat=yhat_k, u=c.u, xs=c.xs,
                             us=c.us, ys=yhat_k, xhat=xhat, dhat=dhat,
                             status_ss=zero_i, status_dyn=zero_i,
                             ocp_iters=zero_i)
            return carry, out

        # target problem (MPC_code.py:693-718); guess mirrors the host
        # loop's fixed x0_m/u0-based guess
        par_ss = dict(usp=inp.usp, ysp=inp.ysp, xsp=inp.xsp, d=dhat,
                      us_prev=c.us, lam=lam_k, t=t_k, px=px0, py=py0)
        wss0 = jnp.concatenate([x0_m, u0, model.fy(x0_m, u0, dhat, t_k, py0)])
        rss = target_solve(wss0, par_ss, t_lbw, t_ubw, t_lbg, t_ubg)
        ss_ok = rss.status != STATUS_INFEASIBLE
        xs = jnp.where(ss_ok, rss.w[:nx], c.xs)           # MPC_code.py:714-718
        us = jnp.where(ss_ok, rss.w[nx:nxu], c.us)
        cor = lam_k @ (us - c.us) if adaptation else None  # MPC_code.py:721-724
        ys = model.fy(xs, us, dhat, t_k, py0)              # MPC_code.py:730-731

        # OCP with pinned x0 and shifted warm start (flat layout carried;
        # MPC_code.py:757-764)
        shifted = jnp.concatenate([c.w_prev[nxu : nw - ns], c.us, c.xs,
                                   c.w_prev[nw - ns : nw]])
        w0 = jnp.where(c.ocp_ok, shifted, c.w_prev)
        par = dict(x0=xhat, xs=xs, us=us, d=dhat, um1=c.u, t=t_k,
                   lam=lam_k, px=inp.px_h, py=inp.py_h)
        if use_structured:
            body0 = w0[: N * nxu].reshape(N, nxu)
            Xg = jnp.concatenate([body0[:, :nx], w0[N * nxu : N * nxu + nx][None]],
                                 axis=0)
            Ug = body0[:, nx:]
            if du_aug:
                Uprev = jnp.concatenate([c.u[None], Ug[:-1]], axis=0)
                Xg = jnp.concatenate(
                    [Xg, jnp.concatenate([Uprev, Ug[-1:]], axis=0)], axis=1)
            if ns_s:
                Sl_prev = w0[nw - ns : nw][:ns_s]
                Xg = jnp.concatenate([Xg, jnp.tile(Sl_prev, (N + 1, 1))], axis=1)
                Ug = jnp.concatenate([Ug, jnp.tile(Sl_prev, (N, 1))], axis=1)
            # dual/barrier warm start: previous step's multipliers shifted
            # one stage (same shift as the primal, MPC_code.py:740-764
            # extended to the dual variables); gated off after an
            # infeasible step exactly like the primal freeze
            duals_c = c.duals
            rs = struct_solve(par, Xg, Ug, ws=duals_c)
            ok = rs.status != STATUS_INFEASIBLE
            if duals_c is not None:
                def _shift(a):
                    return jnp.concatenate([a[1:], a[-1:]], axis=0)

                duals_n = dict(zl=_shift(rs.zl), zu=_shift(rs.zu),
                               lam=_shift(rs.lam), nus=_shift(rs.nus),
                               mu=rs.mu, sf=rs.sf, ok=ok)
            else:
                duals_n = None
            u_k = jnp.where(ok, rs.U[0, :nu], c.u)        # MPC_code.py:786-805
            xhat_next = jnp.where(ok, rs.X[1, :nx],
                                  model.fx(xhat, c.u, cfg.h, dhat, t_k, px0))
            body_n = jnp.concatenate([rs.X[:N, :nx], rs.U[:, :nu]],
                                     axis=1).reshape(-1)
            # flat-layout Sl tail: the solved slack (carried state at stage
            # 1), zero-padded if the dense layout reserves more slots (e.g.
            # slacks=True with no y bounds)
            tail = ([rs.X[1, nx + nup : nx + nup + ns_s]] if ns_s else [])
            if ns > ns_s:
                tail.append(jnp.zeros(ns - ns_s, dtype=w0.dtype))
            w_new = jnp.concatenate([body_n, rs.X[N, :nx]] + tail)
            w_prev = jnp.where(ok, w_new, c.w_prev)
        else:
            lbw = o_lbw.at[:nx].set(xhat)
            ubw = o_ubw.at[:nx].set(xhat)
            r = ocp_solve(w0, par, lbw, ubw, o_lbg, o_ubg)
            ok = r.status != STATUS_INFEASIBLE
            u_k = jnp.where(ok, r.w[nxu - nu : nxu], c.u)  # MPC_code.py:786-805
            xhat_next = jnp.where(ok, r.w[nxu : nxu + nx],
                                  model.fx(xhat, c.u, cfg.h, dhat, t_k, px0))
            w_prev = jnp.where(ok, r.w, c.w_prev)
            duals_n = c.duals

        # plant update (MPC_code.py:813-827)
        x_next = plant_step(c.x, u_k)

        # modifier adaptation (MPC_code.py:829-874): plant steady state,
        # lambda filter update, plant economic optimum
        lam_new, upopt, ypopt = c.lam, None, None
        if adaptation:
            par_ssp = dict(t=t_k, us=us, pxp=inp.pxp, pxmp=inp.pxmp, d=dhat)
            res_p = ssp_solve(x0_p, par_ssp,
                              jnp.asarray(ssp_spec.lbw), jnp.asarray(ssp_spec.ubw),
                              jnp.asarray(ssp_spec.lbg), jnp.asarray(ssp_spec.ubg))
            xs_kp = res_p.w
            lam_new = lambda_update(lam_k, xs_kp, xs, us, dhat, t_k,
                                    inp.pxp, inp.pyp, px0, py0,
                                    inp.pxmp, inp.pymp)
            par_ssp2 = dict(usp=inp.usp, ysp=inp.ysp,
                            xsp=jnp.zeros(cfg.nxp), pyp=inp.pyp, t=t_k,
                            pxp=inp.pxp, pxmp=inp.pxmp, pymp=inp.pymp)
            if plant.nominal:
                y0_p = plant.fy(x0_p, u0, dhat, t_k, py0)
            else:
                y0_p = plant.fy(x0_p, u0, inp.pyp, t_k, inp.pymp)
            wss2_0 = jnp.concatenate([x0_p, u0, y0_p])
            res_p2 = ssp2_solve(wss2_0, par_ssp2,
                                jnp.asarray(ssp2_spec.lbw), jnp.asarray(ssp2_spec.ubw),
                                jnp.asarray(ssp2_spec.lbg), jnp.asarray(ssp2_spec.ubg))
            upopt = res_p2.w[cfg.nxp : cfg.nxp + nu]
            ypopt = res_p2.w[cfg.nxp + nu :]

        carry = MPCCarry(x=x_next, xhat=xhat_next, dhat=dhat, P=P, u=u_k,
                         xs=xs, us=us, w_prev=w_prev, ocp_ok=ok,
                         t=t_k + cfg.h, mhe=mhe_c, lam=lam_new,
                         duals=duals_n)
        status_dyn = rs.status if use_structured else r.status
        iters_dyn = rs.iters if use_structured else r.iters
        out = MPCStepOut(x=c.x, y=y_k, yhat=yhat_k, u=u_k, xs=xs, us=us,
                         ys=ys, xhat=xhat, dhat=dhat,
                         status_ss=rss.status, status_dyn=status_dyn,
                         ocp_iters=iters_dyn, lam=lam_new, cor=cor,
                         upopt=upopt, ypopt=ypopt)
        return carry, out

    return step


def init_carry(cfg: MPCConfig, x0=None, mhe=None, state=None,
               dual_ws: Optional[bool] = None) -> MPCCarry:
    """Initial carry mirroring the reference's loop-state init
    (MPC_code.py:442-484).

    ``state``: a ``ClosedLoop.final_state`` dict — continue a host-driven
    simulation in traced mode.
    ``mhe``: optional ``MHECarry`` (e.g. from ``make_mhe_traced``'s
    ``carry_from_runtime`` after a host warmup); when omitted for estimator
    kind 'mhe', a cold padded carry is built and the growing-horizon
    warmup runs traced from step 0.
    ``dual_ws``: carry dual/barrier warm-start state for the structured
    OCP solver (default: on whenever the config is structured-eligible —
    chip-measured faster in the warm-started closed-loop regime).  Pass
    ``False`` when stepping with ``use_structured=False``.
    """
    nx, nu, nd = cfg.nx, cfg.nu, cfg.nd
    naug = nx + nd if cfg.dist.offree != "no" else nx
    if state is not None:
        x0 = state["x"] if x0 is None else x0
    x0 = jnp.asarray(np.asarray(cfg.x0_p, float).reshape(-1) if x0 is None else x0)
    x0_m = jnp.asarray(np.asarray(cfg.x0_m, float).reshape(-1))
    u0 = jnp.asarray(np.asarray(cfg.u0, float).reshape(-1))
    dhat0 = (jnp.zeros(nd) if cfg.dhat0 is None
             else jnp.asarray(np.asarray(cfg.dhat0, float).reshape(-1)))
    P0 = (jnp.asarray(np.asarray(cfg.estimator.P0, float))
          if cfg.estimator.P0 is not None else jnp.zeros((naug, naug)))
    if cfg.estimator.kind == "mhe" and mhe is None:
        # fully-traced growing-horizon warmup (round 4): a cold padded
        # window whose masked NLP reproduces the reference's per-horizon
        # rebuilds (MPC_code.py:591-598) — no host ClosedLoop pre-phase.
        # A warmed handoff (init_carry(..., mhe=carry_from_runtime(...)))
        # remains supported and bitwise-matches the pre-round-4 graphs.
        from mpc_code_tpu.estimators.mhe import make_mhe_cold_carry

        inp0 = default_step_input(cfg)
        mhe = make_mhe_cold_carry(cfg, px0=inp0.px_h[0], py0=inp0.py_h[0])
    N, nxu = cfg.N, nx + nu
    if cfg.slacks:
        from mpc_code_tpu.ocp.shooting import _user_constraint_dim

        ns = (2 * cfg.ny + _user_constraint_dim(cfg.G_ineq, cfg)
              + _user_constraint_dim(cfg.H_eq, cfg))
    else:
        ns = 0
    nw = nxu * N + nx + ns
    w0 = jnp.zeros(nw)
    body = w0[: N * nxu].reshape(N, nxu)
    body = body.at[:, :nx].set(x0_m).at[:, nx:].set(u0)
    w0 = (w0.at[: N * nxu].set(body.reshape(-1))
          .at[N * nxu : N * nxu + nx].set(x0_m))   # Sl tail (if any) stays 0
    lam0 = jnp.zeros((cfg.ny, nu)) if cfg.Adaptation and not cfg.estimating else None
    from mpc_code_tpu.solver.riccati import structured_supported

    if dual_ws is None:
        dual_ws = (not cfg.estimating) and structured_supported(cfg)
    duals0 = None
    if dual_ws:
        # zero template with ok=False: step 0 runs the cold dual init and
        # every later step warm-starts from the shifted multipliers
        from mpc_code_tpu.models import (
            build_model, build_stage_cost, build_terminal_cost,
        )
        from mpc_code_tpu.solver.riccati import build_structured_ocp

        socp0 = build_structured_ocp(cfg, build_model(cfg),
                                     build_stage_cost(cfg.stage_cost),
                                     build_terminal_cost(cfg))
        nzs0 = socp0.nxa + socp0.nu + socp0.ni
        duals0 = dict(zl=jnp.zeros((N, nzs0)), zu=jnp.zeros((N, nzs0)),
                      lam=jnp.zeros((N, socp0.nxa)),
                      nus=jnp.zeros((N, socp0.ni)),
                      mu=jnp.asarray(0.0), sf=jnp.asarray(1.0),
                      ok=jnp.asarray(False))
    carry = MPCCarry(x=x0, xhat=x0_m, dhat=dhat0, P=P0, u=u0, xs=x0_m, us=u0,
                     w_prev=w0, ocp_ok=jnp.asarray(True), t=jnp.asarray(0.0),
                     mhe=mhe, lam=lam0, duals=duals0)
    if state is not None:
        def _a(v):
            return jnp.asarray(np.asarray(v, float))

        carry = carry._replace(
            x=_a(state["x"]), xhat=_a(state["xhat"]), dhat=_a(state["dhat"]),
            u=_a(state["u"]), P=_a(state["P"]), t=jnp.asarray(float(state["t"])))
        if state.get("xs") is not None:
            carry = carry._replace(xs=_a(state["xs"]), us=_a(state["us"]))
        if state.get("w_opt") is not None and np.asarray(state["w_opt"]).shape == (nw,):
            carry = carry._replace(w_prev=_a(state["w_opt"]),
                                   ocp_ok=jnp.asarray(bool(state["ocp_feasible"])))
        if state.get("lam") is not None and lam0 is not None:
            carry = carry._replace(lam=_a(state["lam"]))
    return carry


def run_traced(cfg: MPCConfig, carry0: Optional[MPCCarry] = None,
               Nsim: Optional[int] = None, inputs: Optional[StepInput] = None,
               t0: float = 0.0, k0: int = 0, jit: bool = True,
               use_structured: Optional[bool] = None):
    """Run the full-fidelity closed loop as one ``lax.scan`` over time.

    Single-scenario TPU-first equivalent of ``ClosedLoop.run()``:
    precomputes the schedule/noise stack, scans the traced step, and
    returns ``(final_carry, history)`` with simulator-compatible history
    keys.  ``vmap`` the step yourself (or use
    ``parallel.mesh.batched_closed_loop``) for scenario batches.
    """
    Nsim = cfg.Nsim if Nsim is None else Nsim
    if inputs is None:
        inputs = make_step_inputs(cfg, Nsim, t0=t0, k0=k0)
    if carry0 is None:
        carry0 = init_carry(cfg)
    step = make_mpc_step(cfg, use_structured=use_structured)

    def scan_fn(c, i):
        return step(c, i)

    runner = jax.jit(lambda c, i: jax.lax.scan(scan_fn, c, i)) if jit else (
        lambda c, i: jax.lax.scan(scan_fn, c, i))
    carry, outs = runner(carry0, inputs)
    return carry, history_from_outputs(outs)


def run_traced_checkpointed(cfg: MPCConfig, path: str, segment: int = 100,
                            carry0: Optional[MPCCarry] = None,
                            Nsim: Optional[int] = None, t0: float = 0.0,
                            use_structured: Optional[bool] = None,
                            resume: bool = True):
    """``run_traced`` split into fixed-size scan segments with an NPZ
    checkpoint written after each (SURVEY.md §5 checkpoint/resume for long
    batched sweeps).

    ``path`` is rewritten atomically after every ``segment`` steps with the
    flattened carry, the accumulated history, and the resume index; if the
    file already exists (and ``resume``), the run continues from it — a
    killed sweep loses at most one segment.  The jitted segment executable
    is compiled once (fixed ``segment`` length) and reused.
    """
    import os
    import tempfile

    Nsim = cfg.Nsim if Nsim is None else Nsim
    if carry0 is None:
        carry0 = init_carry(cfg)
    template = carry0
    leaves0, treedef = jax.tree_util.tree_flatten(template)

    k_done = 0
    hist_acc: Dict[str, list] = {}
    carry = carry0
    if resume and os.path.exists(path):
        with np.load(path, allow_pickle=False) as z:
            k_done = int(z["__k_done__"])
            t0 = float(z["__t_next__"])
            n_leaves = int(z["__n_leaves__"])
            leaves = [jnp.asarray(z[f"__carry_{i}__"]) for i in range(n_leaves)]
            carry = jax.tree_util.tree_unflatten(treedef, leaves)
            for key in z.files:
                if not key.startswith("__"):
                    hist_acc[key] = [z[key]]

    step = make_mpc_step(cfg, use_structured=use_structured)
    seg_runner = jax.jit(lambda c, i: jax.lax.scan(step, c, i))

    def save(carry, k_next, t_next):
        leaves, _ = jax.tree_util.tree_flatten(carry)
        payload = {f"__carry_{i}__": np.asarray(v) for i, v in enumerate(leaves)}
        payload["__n_leaves__"] = np.asarray(len(leaves))
        payload["__k_done__"] = np.asarray(k_next)
        payload["__t_next__"] = np.asarray(t_next)
        for key, parts in hist_acc.items():
            payload[key] = np.concatenate(parts, axis=0)
        # suffix must be ".npz" — np.savez appends it to any other name
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path))
                                   or ".", suffix=".npz")
        os.close(fd)
        np.savez(tmp, **payload)
        os.replace(tmp, path)

    while k_done < Nsim:
        # scan exactly n steps; at most two executables compile (the full
        # segment length and one tail remainder)
        n = min(segment, Nsim - k_done)
        inputs = make_step_inputs(cfg, n, t0=t0, k0=k_done)
        carry, outs = seg_runner(carry, inputs)
        H_seg = history_from_outputs(outs)
        for key, v in H_seg.items():
            hist_acc.setdefault(key, []).append(v)
        k_done += n
        t0 += n * cfg.h
        save(carry, k_done, t0)

    hist = {k: np.concatenate(v, axis=0) for k, v in hist_acc.items()}
    return carry, hist


def history_from_outputs(outs: MPCStepOut) -> Dict[str, np.ndarray]:
    """Map stacked MPCStepOut arrays to the simulator's history keys."""
    H = {
        "Xp": outs.x, "Yp": outs.y, "Y_HAT": outs.yhat, "U": outs.u,
        "XS": outs.xs, "US": outs.us, "YS": outs.ys, "X_HAT_CORR": outs.xhat,
        "D_HAT": outs.dhat, "STATUS_SS": outs.status_ss,
        "STATUS_DYN": outs.status_dyn, "OCP_ITERS": outs.ocp_iters,
    }
    if outs.lam is not None:
        H.update({"LAMBDA": outs.lam, "COR": outs.cor,
                  "Upopt": outs.upopt, "Ypopt": outs.ypopt})
    return {k: np.asarray(v) for k, v in H.items() if v is not None}
