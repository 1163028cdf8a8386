"""Closed-loop MPC simulator.

TPU-native replacement for the reference driver script `MPC_code.py`: the
measure -> estimate -> target -> OCP -> plant sampling-instant sequence
(MPC_code.py:485-875) with all of its observable semantics:

- per-step time-varying parameters over the horizon (MPC_code.py:489-515)
- pre-correction output prediction stored to history (MPC_code.py:524,544)
- estimator family dispatch (kalss/lue, kal, ekf, mhe) with d-hat
  saturation (MPC_code.py:660-665) and NaN guards (MPC_code.py:671,819)
- infeasibility fallbacks: keep previous targets (MPC_code.py:714-718);
  freeze the input and propagate the model on OCP failure
  (MPC_code.py:804-805)
- warm starts: shifted previous OCP solution appended with previous targets
  (MPC_code.py:740-764)
- white process/measurement noise injection (MPC_code.py:537-541, 823-827)
- estimation-only mode (`estimating=True`) skipping target/OCP
  (MPC_code.py:200,675,829)
- modifier adaptation: plant steady state, lambda update, plant optimum
  (MPC_code.py:829-874)

The per-step solves are jitted once and reused every instant (trace-once /
execute-many — the reference builds its NLPs once too, MPC_code.py:290-336).
History is returned as a dict of stacked numpy arrays.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import MPCConfig, SolverOptions
from mpc_code_tpu.models import (
    build_model,
    build_mhe_model,
    build_plant,
    build_ss_cost,
    build_stage_cost,
    build_terminal_cost,
)
from mpc_code_tpu.models.costs import build_mhe_cost
from mpc_code_tpu.estimators.linear import build_augmented, kalman, kalss, kalss_gain
from mpc_code_tpu.estimators.ekf import ekf
from mpc_code_tpu.ocp.shooting import build_ocp
from mpc_code_tpu.ocp.target import build_ssp, build_ssp2, build_target, make_lambda_update
from mpc_code_tpu.loop.schedules import eval_setpoints, eval_step_params
from mpc_code_tpu.ops.linalg import sqrtm_psd
from mpc_code_tpu.solver.ipm import make_solver
from mpc_code_tpu.solver.nlp import STATUS_INFEASIBLE


class ClosedLoop:
    """Build all solvers once from a config, then `run()` the loop."""

    def __init__(self, cfg: MPCConfig):
        if cfg.ssjacid:
            # auto-linearize the model at its identified steady state
            # (MPC_code.py:84-91 -> SS_JAC_ID.ss_p_jac_id)
            from mpc_code_tpu.ident import apply_ss_jac_id

            cfg = apply_ss_jac_id(cfg)
        self.cfg = cfg
        # first-step NLP inputs captured during run() for parity tests
        self.first_nlps: dict = {}
        self.check_numerics = bool(
            cfg.check_numerics
            or os.environ.get("MPC_TPU_CHECK_NUMERICS") == "1")
        if self.check_numerics:
            # raise at the first NaN inside jitted computations (re-runs the
            # offending op un-jitted for a precise traceback)
            jax.config.update("jax_debug_nans", True)
        self.model = build_model(cfg)
        self.plant = build_plant(cfg, self.model)
        self.aug = build_augmented(cfg, self.model)

        nx, nu, ny, nd = cfg.nx, cfg.nu, cfg.ny, cfg.nd
        self.nxu = nx + nu

        if not cfg.estimating:
            fss_obj = build_ss_cost(cfg.ss_cost)
            f_obj = build_stage_cost(cfg.stage_cost)
            vfin = build_terminal_cost(cfg)
            self.target_spec = build_target(cfg, self.model, fss_obj)
            # ContForm wins over Collocation (reference: opt_dyn_CM's
            # ContForm branch never emits the collocation equations,
            # Control_Calc.py:428-436)
            self.colloc = bool(cfg.Collocation) and not cfg.ContForm
            if self.colloc:
                from mpc_code_tpu.ocp.collocation import build_ocp_collocation

                self.ocp_spec = build_ocp_collocation(cfg, self.model, f_obj, vfin)
                self.stride = 3 * nx + nu   # nxuk (MPC_code.py:51)
            else:
                self.ocp_spec = build_ocp(cfg, self.model, f_obj, vfin)
                self.stride = nx + nu
            self.target_solve = jax.jit(make_solver(self.target_spec.nlp, cfg.sol_opts_ss))
            self.ocp_solve = jax.jit(make_solver(self.ocp_spec.nlp, cfg.sol_opts_dyn))
            if cfg.Adaptation:
                self.ssp_spec = build_ssp(cfg, self.plant)
                self.ssp_solve = jax.jit(make_solver(self.ssp_spec.nlp, cfg.sol_opts_ss))
                if nx != cfg.nxp:
                    fss2 = cfg.ss_cost.f_obj  # economic cost on plant state dims
                else:
                    fss2 = fss_obj
                self.ssp2_spec = build_ssp2(cfg, self.plant, fss2)
                self.ssp2_solve = jax.jit(make_solver(self.ssp2_spec.nlp, cfg.sol_opts_ss))
                self._lambda_fns = jax.jit(make_lambda_update(cfg, self.model, self.plant))

        est = cfg.estimator
        self.est_kind = est.kind
        if est.kind in ("kalss", "lue"):
            if cfg.StateFeedback and cfg.dist.offree == "no":
                self.K_gain = jnp.eye(self.aug.n)          # MPC_code.py:579-580
            elif est.K is not None:
                self.K_gain = jnp.asarray(est.K, dtype=float)
            else:
                self.K_gain = kalss_gain(cfg, self.model)
            self._kalss_step = jax.jit(
                lambda y, u, x, t, py: kalss(self.aug, y, u, self.K_gain, x, t, py)
            )
        elif est.kind == "kal":
            from mpc_code_tpu.config import LinearModel

            if not isinstance(cfg.model, LinearModel):
                # reference hard-exits: the time-varying KF's gain comes from
                # jacobians that are only exact for linear models
                # (MPC_code.py:643-646)
                raise ValueError(
                    "estimator kind 'kal' requires a LinearModel (reference "
                    "MPC_code.py:643-646); use 'ekf' for nonlinear models")
            Q = jnp.asarray(est.Q_kf, dtype=float)
            R = jnp.asarray(est.R_kf, dtype=float)
            self._kal_step = jax.jit(
                lambda y, u, P, x, t, px, py: kalman(self.aug, cfg.h, y, u, Q, R, P, x, t, px, py)
            )
        elif est.kind == "ekf":
            Q = jnp.asarray(est.Q_kf, dtype=float)
            R = jnp.asarray(est.R_kf, dtype=float)
            self._ekf_step = jax.jit(
                lambda y, u, P, x, t, px, py: ekf(self.aug, cfg.h, y, u, Q, R, P, x, t, px, py)
            )
        elif est.kind == "mhe":
            from mpc_code_tpu.estimators.mhe import MHERuntime

            self.mhe_rt = MHERuntime(cfg, self.model)

        # jitted model/plant one-step maps used by the loop itself
        self._fy_model = jax.jit(self.model.fy)
        self._fx_model = jax.jit(lambda x, u, d, t, px: self.model.fx(x, u, cfg.h, d, t, px))
        if self.plant.nominal:
            self._fx_plant = jax.jit(lambda x, u, d, t, pxmp: self.plant.fx(x, u, cfg.h, d, t, pxmp))
            self._fy_plant = jax.jit(self.plant.fy)
        else:
            self._fx_plant = jax.jit(lambda x, u, pxp, t, pxmp: self.plant.fx(x, u, pxp, t, cfg.h, pxmp))
            self._fy_plant = jax.jit(self.plant.fy)

        self._Rv = None if cfg.R_wn is None else np.asarray(sqrtm_psd(np.asarray(cfg.R_wn, float)))
        self._Qw = None if cfg.Q_wn is None else np.asarray(sqrtm_psd(np.asarray(cfg.Q_wn, float)))

    # ------------------------------------------------------------------
    def run(self, Nsim: Optional[int] = None, verbose: bool = False) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        Nsim = Nsim if Nsim is not None else cfg.Nsim
        nx, nu, ny, nd, N = cfg.nx, cfg.nu, cfg.ny, cfg.nd, cfg.N
        nxu, nxuy = self.nxu, nx + nu + ny
        npx, npy, npxp, npyp = cfg.npx, cfg.npy, cfg.npxp, cfg.npyp
        rng = np.random.default_rng(cfg.noise_seed)

        x_k = np.asarray(cfg.x0_p, float).reshape(-1)
        u_k = np.asarray(cfg.u0, float).reshape(-1)
        xhat_k = np.asarray(cfg.x0_m, float).reshape(-1)
        dhat_k = (np.zeros(nd) if cfg.dhat0 is None
                  else np.asarray(cfg.dhat0, float).reshape(-1))
        lam_k = np.zeros((ny, nu))
        est = cfg.estimator
        if est.P0 is not None:
            P_k = np.asarray(est.P0, float)
        else:
            P_k = np.zeros((self.aug.n, self.aug.n))
        y_k = None
        us_k = xs_k = None
        ocp_feasible = True
        w_opt = None

        H: Dict[str, list] = {k: [] for k in
                              ["Xp", "Yp", "U", "XS", "YS", "US", "X_HAT", "Y_HAT", "D_HAT",
                               "COR", "LAMBDA", "TIME_SS", "TIME_DYN", "Ysp", "Usp", "Sl",
                               "X_KF", "Upopt", "Ypopt", "STATUS_SS", "STATUS_DYN"]}

        for ksim in range(Nsim):
            if verbose:
                print(f"Time Iteration {ksim + 1} of {Nsim}")
            t_k = ksim * cfg.h

            # -- time-varying parameters over the horizon (MPC_code.py:489-515)
            px_h, py_h, p_xp, p_yp, p_xmp, p_ymp = eval_step_params(cfg, t_k)
            p_x_k, p_y_k = px_h[0], py_h[0]

            H["Xp"].append(x_k.copy())
            H["X_HAT"].append(xhat_k.copy())

            # -- model output prediction (pre-correction) (MPC_code.py:524)
            yhat_k = np.asarray(self._fy_model(xhat_k, u_k, dhat_k, t_k, p_y_k))

            if ksim == 0:
                y_k = yhat_k

            # -- plant output (MPC_code.py:531-541)
            if self.plant.nominal:
                y_k = np.asarray(self._fy_plant(x_k, u_k, dhat_k, t_k, p_y_k))
            else:
                y_k = np.asarray(self._fy_plant(x_k, u_k, p_yp, t_k, p_ymp))
            if self._Rv is not None:
                y_k = y_k + self._Rv @ rng.standard_normal(ny)

            H["Yp"].append(y_k.copy())
            H["Y_HAT"].append(yhat_k.copy())

            # -- estimator (MPC_code.py:546-668)
            x_es = np.concatenate([xhat_k, dhat_k]) if cfg.dist.offree != "no" else xhat_k
            if self.est_kind in ("kalss", "lue"):
                x_es = np.asarray(self._kalss_step(y_k, u_k, x_es, t_k, p_y_k))
            elif self.est_kind == "kal":
                P_plus, _, x_corr = self._kal_step(y_k, u_k, P_k, x_es, t_k, p_x_k, p_y_k)
                P_k, x_es = np.asarray(P_plus), np.asarray(x_corr)
            elif self.est_kind == "ekf":
                P_plus, _, x_corr = self._ekf_step(y_k, u_k, P_k, x_es, t_k, p_x_k, p_y_k)
                P_k, x_es = np.asarray(P_plus), np.asarray(x_corr)
            elif self.est_kind == "mhe":
                H["X_KF"].append(self.mhe_rt.xm_kal.copy())
                x_es, P_k = self.mhe_rt.step(ksim, y_k, u_k, x_es, t_k, p_x_k, p_y_k, P_k)

            if cfg.dist.offree != "no":
                xhat_k = x_es[:nx]
                dhat_k = x_es[nx : nx + nd]
                if cfg.bounds.dmin is not None:           # MPC_code.py:660-665
                    dhat_k = np.clip(dhat_k,
                                     np.asarray(cfg.bounds.dmin, float).reshape(-1),
                                     np.asarray(cfg.bounds.dmax, float).reshape(-1))
            else:
                xhat_k = x_es
            H["D_HAT"].append(dhat_k.copy())

            if np.any(np.isnan(xhat_k)):                   # MPC_code.py:671-673
                raise FloatingPointError(
                    "xhat_k has NaN components — check noise/disturbance magnitudes")

            if not cfg.estimating:
                # -- setpoints (MPC_code.py:677-680)
                ysp_k, usp_k, xsp_k = eval_setpoints(cfg, t_k)
                if cfg.defSP is not None:
                    H["Ysp"].append(ysp_k.copy())
                    H["Usp"].append(usp_k.copy())

                if ksim == 0:
                    us_k = u_k.copy()
                    xs_k = np.asarray(cfg.x0_m, float).reshape(-1)
                us_prev = us_k.copy()                      # MPC_code.py:687-688
                xs_prev = xs_k.copy()

                # -- target problem (MPC_code.py:693-718)
                par_ss = dict(usp=jnp.asarray(usp_k), ysp=jnp.asarray(ysp_k),
                              xsp=jnp.asarray(xsp_k), d=jnp.asarray(dhat_k),
                              us_prev=jnp.asarray(us_prev), lam=jnp.asarray(lam_k),
                              t=jnp.asarray(t_k, dtype=float), px=jnp.asarray(p_x_k),
                              py=jnp.asarray(p_y_k))
                wss_guess = np.zeros(nxuy)
                wss_guess[:nx] = np.asarray(cfg.x0_m, float).reshape(-1)
                wss_guess[nx:nxu] = np.asarray(cfg.u0, float).reshape(-1)
                wss_guess[nxu:] = np.asarray(self._fy_model(
                    np.asarray(cfg.x0_m, float).reshape(-1),
                    np.asarray(cfg.u0, float).reshape(-1), dhat_k, t_k, p_y_k))
                if "target" not in self.first_nlps:
                    # first successfully-solved NLP inputs, kept for
                    # independent solver-parity tests (SURVEY.md §4 item 3);
                    # dropped below if this step's solve fails
                    self.first_nlps["target"] = dict(
                        ksim=ksim, w0=wss_guess.copy(),
                        par={k: np.asarray(v) for k, v in par_ss.items()})
                t0 = time.time()
                res_ss = self.target_solve(jnp.asarray(wss_guess), par_ss,
                                           self.target_spec.lbw, self.target_spec.ubw,
                                           self.target_spec.lbg, self.target_spec.ubg)
                status_ss = int(res_ss.status)
                H["TIME_SS"].append(time.time() - t0)
                H["STATUS_SS"].append(status_ss)
                if (status_ss == STATUS_INFEASIBLE
                        and self.first_nlps.get("target", {}).get("ksim") == ksim):
                    del self.first_nlps["target"]
                if status_ss != STATUS_INFEASIBLE:         # MPC_code.py:714-718
                    wss_opt = np.asarray(res_ss.w)
                    xs_k = wss_opt[:nx]
                    us_k = wss_opt[nx:nxu]

                if cfg.Adaptation:
                    cor_k = lam_k @ (us_k - us_prev)       # MPC_code.py:721-724
                    H["COR"].append(cor_k.copy())

                H["XS"].append(xs_k.copy())
                H["US"].append(us_k.copy())
                ys_k = np.asarray(self._fy_model(xs_k, us_k, dhat_k, t_k, p_y_k))
                H["YS"].append(ys_k.copy())               # MPC_code.py:730-731

                # -- OCP (MPC_code.py:733-810)
                lbw = self.ocp_spec.lbw.copy()
                ubw = self.ocp_spec.ubw.copy()
                lbw[:nx] = ubw[:nx] = xhat_k               # MPC_code.py:734
                nw, ns = self.ocp_spec.nw, self.ocp_spec.ns
                st = self.stride
                if ksim == 0 or w_opt is None:
                    w_guess = np.zeros(nw)                 # MPC_code.py:740-756
                    x0m = np.asarray(cfg.x0_m, float).reshape(-1)
                    for key in range(1, N + 1):
                        if self.colloc:                    # MPC_code.py:748-751
                            w_guess[key * st - nu - 2 * nx : key * st - nu] = np.tile(x0m, 2)
                        w_guess[key * st - nu : key * st] = u_k
                        w_guess[key * st : key * st + nx] = x0m
                    w_guess[:nx] = x0m
                elif ocp_feasible:
                    if self.colloc:                        # MPC_code.py:759-761
                        w_guess = np.concatenate([w_opt[st : nw - ns], xs_prev, xs_prev,
                                                  us_prev, xs_prev, w_opt[nw - ns : nw]])
                    else:
                        w_guess = np.concatenate([w_opt[st : nw - ns], us_prev, xs_prev,
                                                  w_opt[nw - ns : nw]])  # MPC_code.py:762-764
                par = dict(x0=jnp.asarray(xhat_k), xs=jnp.asarray(xs_k),
                           us=jnp.asarray(us_k), d=jnp.asarray(dhat_k),
                           um1=jnp.asarray(u_k), t=jnp.asarray(t_k, dtype=float),
                           lam=jnp.asarray(lam_k), px=jnp.asarray(px_h),
                           py=jnp.asarray(py_h))
                if "ocp" not in self.first_nlps:
                    self.first_nlps["ocp"] = dict(
                        ksim=ksim, w0=np.asarray(w_guess).copy(),
                        lbw=lbw.copy(), ubw=ubw.copy(),
                        par={k: np.asarray(v) for k, v in par.items()})
                t0 = time.time()
                res = self.ocp_solve(jnp.asarray(w_guess), par, lbw, ubw,
                                     self.ocp_spec.lbg, self.ocp_spec.ubg)
                status_dyn = int(res.status)
                H["TIME_DYN"].append(time.time() - t0)
                H["STATUS_DYN"].append(status_dyn)
                ocp_feasible = status_dyn != STATUS_INFEASIBLE
                if (not ocp_feasible
                        and self.first_nlps.get("ocp", {}).get("ksim") == ksim):
                    del self.first_nlps["ocp"]
                if ocp_feasible:                           # MPC_code.py:786-800
                    w_opt = np.asarray(res.w)
                    u_k = w_opt[st - nu : st]
                    xhat_k = w_opt[st : st + nx]
                    if cfg.slacks:
                        H["Sl"].append(w_opt[nw - ns : nw].copy())
                else:                                      # MPC_code.py:804-805
                    xhat_k = np.asarray(self._fx_model(xhat_k, u_k, dhat_k, t_k, p_x_k))
                H["U"].append(u_k.copy())

            # -- plant update (MPC_code.py:813-827)
            if self.plant.nominal:
                x_k = np.asarray(self._fx_plant(x_k, u_k, dhat_k, t_k, p_xmp))
            else:
                x_k = np.asarray(self._fx_plant(x_k, u_k, p_xp, t_k, p_xmp))
            if np.any(np.isnan(x_k)):                      # MPC_code.py:819-821
                raise FloatingPointError(
                    "x_k has NaN components — check noise/disturbance magnitudes")
            if self._Qw is not None and cfg.G_wn is not None:
                w_wn = self._Qw @ rng.standard_normal(cfg.nxp)
                x_k = x_k + np.asarray(cfg.G_wn, float) @ w_wn

            # -- modifier adaptation (MPC_code.py:829-874)
            if (not cfg.estimating) and cfg.Adaptation:
                par_ssp = dict(t=jnp.asarray(t_k, dtype=float), us=jnp.asarray(us_k),
                               pxp=jnp.asarray(p_xp), pxmp=jnp.asarray(p_xmp),
                               d=jnp.asarray(dhat_k))
                res_p = self.ssp_solve(jnp.asarray(np.asarray(cfg.x0_p, float).reshape(-1)),
                                       par_ssp, self.ssp_spec.lbw, self.ssp_spec.ubw,
                                       self.ssp_spec.lbg, self.ssp_spec.ubg)
                xs_kp = np.asarray(res_p.w)
                lam_k = np.asarray(self._lambda_fns(
                    jnp.asarray(lam_k), jnp.asarray(xs_kp), jnp.asarray(xs_k),
                    jnp.asarray(us_k), jnp.asarray(dhat_k), jnp.asarray(t_k, dtype=float),
                    jnp.asarray(p_xp), jnp.asarray(p_yp), jnp.asarray(p_x_k),
                    jnp.asarray(p_y_k), jnp.asarray(p_xmp), jnp.asarray(p_ymp)))
                H["LAMBDA"].append(lam_k.copy())

                par_ssp2 = dict(usp=jnp.asarray(usp_k), ysp=jnp.asarray(ysp_k),
                                xsp=jnp.asarray(np.zeros(cfg.nxp)), pyp=jnp.asarray(p_yp),
                                t=jnp.asarray(t_k, dtype=float), pxp=jnp.asarray(p_xp),
                                pxmp=jnp.asarray(p_xmp), pymp=jnp.asarray(p_ymp))
                wss2_guess = np.zeros(cfg.nxp + nu + ny)
                wss2_guess[: cfg.nxp] = np.asarray(cfg.x0_p, float).reshape(-1)
                wss2_guess[cfg.nxp : cfg.nxp + nu] = np.asarray(cfg.u0, float).reshape(-1)
                y0_p = np.asarray(self._fy_plant(np.asarray(cfg.x0_p, float).reshape(-1),
                                                 np.asarray(cfg.u0, float).reshape(-1),
                                                 p_yp, t_k, p_ymp))
                wss2_guess[cfg.nxp + nu :] = y0_p
                res_p2 = self.ssp2_solve(jnp.asarray(wss2_guess), par_ssp2,
                                         self.ssp2_spec.lbw, self.ssp2_spec.ubw,
                                         self.ssp2_spec.lbg, self.ssp2_spec.ubg)
                w2 = np.asarray(res_p2.w)
                H["Upopt"].append(w2[cfg.nxp : cfg.nxp + nu].copy())
                H["Ypopt"].append(w2[cfg.nxp + nu :].copy())

            if self.check_numerics:
                # verify every history array written this step (check-
                # numerics mode — SURVEY.md §5); the reference only spot-
                # checks xhat/x (MPC_code.py:671, 819)
                for key, vals in H.items():
                    if vals and not np.all(np.isfinite(np.asarray(vals[-1]))):
                        raise FloatingPointError(
                            f"check_numerics: non-finite {key} at step {ksim}")

        # end-of-run loop state, for handing the simulation off to the
        # traced batched step (e.g. MHE warmup host-side, steady state on
        # the chip via loop/batched.py + estimators.mhe.make_mhe_traced)
        self.final_state = dict(
            x=x_k.copy(), xhat=xhat_k.copy(), dhat=dhat_k.copy(),
            u=u_k.copy(), P=P_k.copy(),
            xs=None if xs_k is None else np.asarray(xs_k).copy(),
            us=None if us_k is None else np.asarray(us_k).copy(),
            w_opt=None if w_opt is None else np.asarray(w_opt).copy(),
            ocp_feasible=bool(ocp_feasible), t=Nsim * cfg.h,
            lam=np.asarray(lam_k).copy(),
        )
        return {k: np.stack(v) if v else np.zeros((0,)) for k, v in H.items()}
