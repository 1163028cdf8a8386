"""Moving-horizon estimator runtime.

TPU-native replacement for the reference's `mhe` (Estimator.py:388-768) and
its driver wiring (MPC_code.py:367-440, 583-641): sliding-window data
stacking with the fictitious-input doubling, forward-simulated initial
guess, per-horizon NLP solves during the growing-horizon warmup, the
bookkeeping Kalman filter with the Feng-et-al cross-covariance term, and
the 'filter' / 'smooth' arrival-cost (prior weight) updates — 'smooth'
running the backward Riccati smoother and assembling the stacked
Abig/Cbig/Qbig/Hbig/Obig/Pycondx matrices.

The window linear algebra is small (n <= ~8, N_mhe <= ~10) and runs on the
host in numpy between NLP solves, mirroring the reference's numpy/scipy
path; the NLP solve itself is the jitted interior-point solver.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as scla

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.estimators.linear import build_augmented
from mpc_code_tpu.models.costs import build_mhe_cost
from mpc_code_tpu.models.model import ModelFns, build_mhe_model
from mpc_code_tpu.ocp.mhe import build_mhe_nlp
from mpc_code_tpu.solver.ipm import make_solver


class MHERuntime:
    def __init__(self, cfg: MPCConfig, model: ModelFns):
        est = cfg.estimator
        self.cfg = cfg
        self.N_mhe = est.N_mhe
        self.up = est.mhe_up
        self.h = cfg.h

        aug = build_augmented(cfg, model)
        self.fy_es = aug.fy
        self.fx_mhe = build_mhe_model(cfg, model)     # (csi, u, k, t, w, px)
        self.f_obj_mhe = build_mhe_cost(est.mhe_cost)

        nx, nd = cfg.nx, cfg.nd
        self.n = nx + nd if cfg.dist.offree != "no" else nx
        n = self.n
        self.n_w = n
        self.m = cfg.nu
        self.p = cfg.ny
        self.npx, self.npy = cfg.npx, cfg.npy
        self.nxvw = n + self.p + self.n_w
        self.idx = self.N_mhe if self.N_mhe == 1 else self.N_mhe - 1

        # jitted derivative functions (reference: CasADi jacobians,
        # Estimator.py:446-472)
        self._A = jax.jit(jax.jacfwd(self.fx_mhe, argnums=0))
        self._B = jax.jit(jax.jacfwd(self.fx_mhe, argnums=1))
        self._G = jax.jit(jax.jacfwd(self.fx_mhe, argnums=4))
        self._C = jax.jit(jax.jacfwd(self.fy_es, argnums=0))
        n_w, p = self.n_w, self.p
        self._hess = jax.jit(jax.hessian(
            lambda wv, t: self.f_obj_mhe(wv[:n_w], wv[n_w:], t)))
        self._fx_sim = jax.jit(self.fx_mhe)
        self._fy_sim = jax.jit(self.fy_es)

        # persistent buffers (flat, reference layout)
        self.U = np.zeros(0)
        self.Y = np.zeros(0)
        self.T = np.zeros(0)
        self.Xmin = np.zeros(0)
        self.X = np.zeros(0)
        self.V = np.zeros(0)
        self.W = np.zeros(0)
        self.PX = np.zeros(0)
        self.PY = np.zeros(0)
        self.w_k = np.zeros(self.n_w)
        self.v_k = np.zeros(self.p)

        x_bar0 = est.x_bar0
        if x_bar0 is None:
            dh = np.zeros(nd) if cfg.dhat0 is None else np.asarray(cfg.dhat0, float).reshape(-1)
            x_bar0 = np.concatenate([np.asarray(cfg.x0_m, float).reshape(-1), dh])[:n]
        self.x_bar = np.asarray(x_bar0, float).reshape(n)

        P0 = np.asarray(est.P0, float) if est.P0 is not None else np.eye(n)
        self.P_k_kal = P0.copy()
        self.P_corr_kal = P0.copy()
        self.xm_kal = self.x_bar.copy()
        self._xm_init = False

        # smoothing big-matrix state (MPC_code.py:417-438)
        self.bigC, self.bigG, self.bigA, self.bigB = [], [], [], []
        self.bigf, self.bigh, self.bigQk, self.bigRk, self.bigSk = [], [], [], [], []
        self.bigQ, self.bigU, self.bigP, self.bigPc = [], [], [], []
        pidx = self.p * self.idx
        self.Hbig = np.zeros(pidx)
        self.Obig = np.zeros((pidx, n))
        self.Pycondx_inv = np.zeros((pidx, pidx))

        self._solvers: Dict[int, tuple] = {}

    # ------------------------------------------------------------------
    def _solver(self, N: int):
        if N not in self._solvers:
            spec = build_mhe_nlp(self.cfg, self.fx_mhe, self.fy_es, self.f_obj_mhe,
                                 N, self.N_mhe)
            solve = jax.jit(make_solver(spec.nlp, self.cfg.sol_opts_mhe))
            self._solvers[N] = (spec, solve)
        return self._solvers[N]

    # ------------------------------------------------------------------
    def step(self, ksim: int, y_k, u_k, xhat_min, t_k, p_x, p_y, P_k):
        """One MHE estimation step; returns (x_corr, P_plus)."""
        n, n_w, m, p = self.n, self.n_w, self.m, self.p
        npx, npy = self.npx, self.npy
        N_mhe, nxvw = self.N_mhe, self.nxvw
        ts = self.h
        y_k = np.asarray(y_k, float).reshape(p)
        u_k = np.asarray(u_k, float).reshape(m)
        xhat_min = np.asarray(xhat_min, float).reshape(n)
        p_x = np.asarray(p_x, float).reshape(npx)
        p_y = np.asarray(p_y, float).reshape(npy)
        P_k = np.asarray(P_k, float).reshape(n, n)
        if not self._xm_init:
            self.xm_kal = xhat_min.copy()            # MPC_code.py:586-587
            self._xm_init = True

        N = min(ksim + 1, N_mhe)

        # -- data stacking (Estimator.py:475-501)
        if ksim < N_mhe:
            if ksim == 0:
                self.U = np.concatenate([self.U, u_k])
            else:
                self.U = np.concatenate([self.U, u_k, u_k])  # fictitious double
            self.Y = np.concatenate([self.Y, y_k])
            self.T = np.concatenate([self.T, [t_k]])
            self.Xmin = np.concatenate([self.Xmin, xhat_min])
            self.PX = np.concatenate([self.PX, p_x])
            self.PY = np.concatenate([self.PY, p_y])
        else:
            if N_mhe == 1:
                self.U, self.Y, self.T = u_k.copy(), y_k.copy(), np.array([t_k])
                self.Xmin, self.PX, self.PY = xhat_min.copy(), p_x.copy(), p_y.copy()
            else:
                self.U = np.concatenate([self.U[m:], u_k, u_k])
                self.Y = np.concatenate([self.Y[p:], y_k])
                self.T = np.concatenate([self.T[1:], [t_k]])
                self.Xmin = np.concatenate([self.Xmin[n:], xhat_min])
                self.PX = np.concatenate([self.PX[npx:], p_x])
                self.PY = np.concatenate([self.PY[npy:], p_y])

        # -- forward-simulated initial guess (Estimator.py:503-512)
        n_opt = N * nxvw + n
        w_guess = np.zeros(n_opt)
        xg = self.x_bar.copy()
        for key in range(N):
            if key > 0:
                xg = np.asarray(self._fx_sim(
                    jnp.asarray(xg), jnp.asarray(self.U[(key - 1) * m : key * m]),
                    ts, self.T[key - 1], jnp.zeros(n_w),
                    jnp.asarray(self.PX[(key - 1) * npx : key * npx])))
            w_guess[key * nxvw : key * nxvw + n] = xg
        w_guess[N * nxvw :] = np.asarray(self._fx_sim(
            jnp.asarray(xg), jnp.asarray(self.U[(N - 1) * m : N * m]),
            ts, self.T[N - 1], jnp.zeros(n_w),
            jnp.asarray(self.PX[(N - 1) * npx : N * npx])))

        # -- solve (Estimator.py:516-530)
        P_k_inv = scla.inv(P_k)
        spec, solve = self._solver(N)
        par = dict(
            U=jnp.asarray(self.U[: N * m].reshape(N, m)),
            Y=jnp.asarray(self.Y.reshape(N, p)),
            x_bar=jnp.asarray(self.x_bar),
            P_inv=jnp.asarray(P_k_inv),
            T=jnp.asarray(self.T),
            PX=jnp.asarray(self.PX.reshape(N, npx)),
            PY=jnp.asarray(self.PY.reshape(N, npy)),
            Pycondx_inv=jnp.asarray(self.Pycondx_inv),
            Hbig=jnp.asarray(self.Hbig),
            Obig=jnp.asarray(self.Obig),
        )
        res = solve(jnp.asarray(w_guess), par, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
        w_opt = np.asarray(res.w)

        xkp1k = w_opt[-n:]
        xhat_corr = w_opt[-n - nxvw : -nxvw]                  # Estimator.py:532-534
        self.v_k = w_opt[-nxvw : -n - n_w]
        if ksim != 0 and N_mhe != 1:
            self.w_k = w_opt[-n - n_w : -n]                   # Estimator.py:537-538

        # -- stack solution data (Estimator.py:541-555)
        if ksim < N_mhe:
            self.X = np.concatenate([self.X, xkp1k])
            self.V = np.concatenate([self.V, self.v_k])
            self.W = np.concatenate([self.W, self.w_k])
        else:
            if N_mhe == 1:
                self.X, self.V, self.W = xkp1k.copy(), self.v_k.copy(), self.w_k.copy()
            else:
                self.X = np.concatenate([self.X[n:], xkp1k])
                self.V = np.concatenate([self.V[p:], self.v_k])
                self.W = np.concatenate([self.W[n_w:], self.w_k])

        # -- per-step KF bookkeeping with cross-covariance (Estimator.py:558-622)
        wv = jnp.concatenate([jnp.asarray(self.w_k), jnp.asarray(self.v_k)])
        Hd = np.asarray(self._hess(wv, t_k))
        H_k = scla.inv(Hd)
        Q_k = H_k[:n_w, :n_w]
        R_k = H_k[-p:, -p:]
        S_k = H_k[:n_w, -p:]
        R_kk = scla.inv(Hd[-p:, -p:])                        # Estimator.py:565-566

        C_k = np.asarray(self._C(jnp.asarray(xhat_corr), jnp.asarray(u_k), t_k,
                                 jnp.asarray(p_y)))
        h_k = self.Y[-p:] - C_k @ xhat_corr - self.v_k
        args = (jnp.asarray(xhat_corr), jnp.asarray(u_k), ts, t_k,
                jnp.asarray(self.w_k), jnp.asarray(p_x))
        A_k = np.asarray(self._A(*args))
        B_k = np.asarray(self._B(*args))
        G_k = np.asarray(self._G(*args))
        f_k = xkp1k - A_k @ xhat_corr - B_k @ u_k - G_k @ self.w_k

        inbr = scla.inv(C_k @ self.P_k_kal @ C_k.T + R_k)
        K_k = self.P_k_kal @ C_k.T @ inbr
        self.P_corr_kal = self.P_k_kal - K_k @ C_k @ self.P_k_kal
        Pi = self.P_k_kal.copy()
        yhat = np.asarray(self._fy_sim(jnp.asarray(self.xm_kal), jnp.asarray(u_k),
                                       t_k, jnp.asarray(p_y)))
        xc_kal = self.xm_kal + K_k @ (y_k - yhat)
        self.xm_kal = np.asarray(self._fx_sim(
            jnp.asarray(xc_kal), jnp.asarray(u_k), ts, t_k,
            jnp.asarray(self.w_k), jnp.asarray(p_x)))
        M_k = -K_k @ S_k.T
        self.P_k_kal = (A_k @ self.P_corr_kal @ A_k.T + G_k @ Q_k @ G_k.T
                        + A_k @ M_k @ G_k.T + G_k @ M_k @ A_k.T)  # Estimator.py:604-607

        self.bigC.append(C_k); self.bigG.append(G_k); self.bigA.append(A_k)
        self.bigB.append(B_k); self.bigf.append(f_k); self.bigh.append(h_k)
        self.bigQk.append(Q_k); self.bigRk.append(R_k); self.bigSk.append(S_k)
        self.bigQ.append(H_k); self.bigU.append(u_k)
        self.bigP.append(Pi); self.bigPc.append(self.P_corr_kal.copy())

        # -- prior weight update (Estimator.py:626-735)
        if ksim >= N_mhe - 1:
            if self.up == "filter":
                Hd0 = np.asarray(self._hess(
                    jnp.concatenate([jnp.asarray(self.W[:n_w]), jnp.asarray(self.V[:p])]),
                    self.T[0]))
                H0 = scla.inv(Hd0)
                Q0, R0, S0 = H0[:n_w, :n_w], H0[-p:, -p:], H0[:n_w, -p:]
                C0 = np.asarray(self._C(jnp.asarray(self.Xmin[:n]), jnp.asarray(self.U[:m]),
                                        self.T[0], jnp.asarray(self.PY[:npy])))
                inbr0 = scla.inv(C0 @ P_k @ C0.T + R0)
                K0 = P_k @ C0.T @ inbr0
                P_corr = P_k - K0 @ C0 @ P_k
                args0 = (jnp.asarray(self.X[:n]), jnp.asarray(self.U[:m]), ts, self.T[0],
                         jnp.asarray(self.W[:n_w]), jnp.asarray(self.PX[:npx]))
                A0 = np.asarray(self._A(*args0))
                G0 = np.asarray(self._G(*args0))
                M0 = -K0 @ S0.T
                P_k = (A0 @ P_corr @ A0.T + G0 @ Q0 @ G0.T
                       + A0 @ M0 @ G0.T + G0 @ M0 @ A0.T)     # Estimator.py:647-650
            else:  # smooth
                # backward Riccati smoother (Estimator.py:654-664); the
                # native host-core path is used when the C++ library built
                from mpc_code_tpu import native as hostcore

                if hostcore.available() and N_mhe > 1:
                    Pis = list(hostcore.riccati_smoother(
                        self.bigP[:N_mhe], self.bigPc[:N_mhe], self.bigA[:N_mhe]))
                else:
                    Pis = [None] * N_mhe
                    Pis[N_mhe - 1] = self.bigPc[N_mhe - 1]
                    for i in range(N_mhe - 2, -1, -1):
                        Pim = scla.inv(self.bigP[i + 1])
                        Pis[i] = self.bigPc[i] + self.bigPc[i] @ self.bigA[i].T @ Pim @ (
                            Pis[i + 1] - self.bigP[i + 1]) @ Pim @ self.bigA[i] @ self.bigPc[i]
                P_k = Pis[1] if N_mhe > 1 else Pis[0]

                # shift one step forward (Estimator.py:671-684)
                for name in ("bigC", "bigG", "bigA", "bigB", "bigf", "bigh",
                             "bigQk", "bigRk", "bigSk", "bigQ", "bigU", "bigP", "bigPc"):
                    setattr(self, name, getattr(self, name)[1:])

                if N_mhe > 1:
                    # stacked matrices for the (parametric) smoothing
                    # correction (Estimator.py:686-735)
                    idx = N_mhe - 1
                    nvars = n + (N_mhe - 2) * n_w + (N_mhe - 1) * p
                    Qbig = P_k
                    Hbig = np.zeros((p * idx, 1))
                    Abig = np.zeros((n * idx, nvars))
                    Arow = np.eye(n)
                    Abig[0:n, 0:n] = Arow
                    Cbig = np.zeros((p * idx, nvars))
                    Cbig[0:p, 0 : n + n_w + p] = np.column_stack(
                        [self.bigC[0], np.zeros((p, n_w)), np.eye(p)])
                    Hbig[:p, 0] = self.bigh[0]
                    Hrow = None
                    for i in range(N_mhe - 2):
                        Apad = np.zeros((n, 0)) if i == 0 else np.zeros((n, p))
                        Arow = np.column_stack([self.bigA[i] @ Arow, Apad, self.bigG[i]])
                        Abig[(i + 1) * n : (i + 2) * n, : Arow.shape[1]] = Arow
                        Cpad = (np.zeros((p, p)) if i == N_mhe - 3
                                else np.zeros((p, n_w + p)))
                        Crow = np.column_stack([self.bigC[i + 1] @ Arow, Cpad, np.eye(p)])
                        Cbig[(i + 1) * p : (i + 2) * p, : Crow.shape[1]] = Crow
                        Qbig = scla.block_diag(Qbig, self.bigQ[i])
                        if i == 0:
                            Hrow = self.bigB[i] @ self.bigU[i] + self.bigf[i]
                        else:
                            Hrow = self.bigA[i] @ Hrow + self.bigB[i] @ self.bigU[i] + self.bigf[i]
                        Hbig[(i + 1) * p : (i + 2) * p, 0] = self.bigC[i + 1] @ Hrow + self.bigh[i + 1]
                    Qbig = scla.block_diag(Qbig, R_kk)
                    Obig = Cbig[:, :n]
                    Gbig = Cbig[:, n:]
                    QRbig = Qbig[n:, n:]
                    Pycondx = Gbig @ QRbig @ Gbig.T
                    self.Obig = Obig
                    self.Hbig = Hbig[:, 0]
                    self.Pycondx_inv = scla.inv(Pycondx)

            # -- x_bar update (Estimator.py:738-757)
            if self.up == "filter":
                self.x_bar = self.X[:n].copy()
            else:
                if N_mhe == 1:
                    self.x_bar = w_opt[:n].copy()
                else:
                    self.x_bar = w_opt[nxvw : nxvw + n].copy()

        # -- strip the fictitious input component (Estimator.py:760-764)
        if ksim == 0:
            self.U = np.zeros(0)
        else:
            self.U = self.U[:-m]

        return xhat_corr, P_k
