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

from typing import Dict, NamedTuple

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
from mpc_code_tpu.ops.smalllin import inv as _sinv


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
        # dual/barrier warm start across steady-state structured solves
        # (None until the first full-window solve completes)
        self._duals = None

    # ------------------------------------------------------------------
    def _solver(self, N: int):
        if N not in self._solvers:
            spec = build_mhe_nlp(self.cfg, self.fx_mhe, self.fy_es, self.f_obj_mhe,
                                 N, self.N_mhe)
            if self.cfg.estimator.structured_mhe:
                from mpc_code_tpu.ocp.mhe import make_structured_mhe_solver

                solve = jax.jit(make_structured_mhe_solver(
                    self.cfg, self.fx_mhe, self.fy_es, self.f_obj_mhe,
                    N, self.N_mhe, return_duals=N == self.N_mhe))
            else:
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
        # keep the latest NLP inputs for independent solver-parity tests
        self.last_nlp = dict(w0=w_guess.copy(), N=N,
                             par={k: np.asarray(v) for k, v in par.items()})
        if self.cfg.estimator.structured_mhe and N == N_mhe:
            # full-window structured solve: dual/barrier warm start carried
            # across steps (shifted one window stage), cold while any
            # previous solve was a warmup horizon — the traced step's gate
            # (steps >= N_mhe) mirrors this exactly
            res, duals = solve(jnp.asarray(w_guess), par, spec.lbw, spec.ubw,
                               spec.lbg, spec.ubg, ws=self._duals)
            from mpc_code_tpu.ocp.mhe import shift_mhe_duals

            self._duals = jax.tree_util.tree_map(jnp.asarray,
                                                 shift_mhe_duals(duals))
        else:
            res = solve(jnp.asarray(w_guess), par, spec.lbw, spec.ubw,
                        spec.lbg, spec.ubg)
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


# ---------------------------------------------------------------------------
# Traced steady-state MHE step (TPU path)
# ---------------------------------------------------------------------------


def _block_diag(A, B):
    za = jnp.zeros((A.shape[0], B.shape[1]), dtype=A.dtype)
    zb = jnp.zeros((B.shape[0], A.shape[1]), dtype=A.dtype)
    return jnp.concatenate([jnp.concatenate([A, za], axis=1),
                            jnp.concatenate([zb, B], axis=1)], axis=0)


class MHESmoothState(NamedTuple):
    """Rolling per-stage linearization buffers of the 'smooth' arrival-cost
    update, in MHERuntime's post-shift layout (length N_mhe-1 stacks;
    reference Estimator.py:654-735 + driver buffers MPC_code.py:417-438)."""

    P_kal: jnp.ndarray   # (n,n)       bookkeeping-KF prior covariance
    bigA: jnp.ndarray    # (N-1,n,n)
    bigP: jnp.ndarray    # (N-1,n,n)   KF priors Pi
    bigPc: jnp.ndarray   # (N-1,n,n)   KF posteriors
    bigC: jnp.ndarray    # (N-1,p,n)
    bigG: jnp.ndarray    # (N-1,n,n_w)
    bigB: jnp.ndarray    # (N-1,n,m)
    bigf: jnp.ndarray    # (N-1,n)
    bigh: jnp.ndarray    # (N-1,p)
    bigQ: jnp.ndarray    # (N-1,n_w+p,n_w+p)  inverse stage Hessians
    bigU: jnp.ndarray    # (N-1,m)
    Hbig: jnp.ndarray    # (p*(N-1),)
    Obig: jnp.ndarray    # (p*(N-1),n)
    Pycondx_inv: jnp.ndarray  # (p*(N-1), p*(N-1))


class MHECarry(NamedTuple):
    """Sliding-window state of the steady-state MHE, all static shapes.

    Buffer layouts match MHERuntime's flat buffers at the point where a
    step has just COMPLETED with a full window (ksim >= N_mhe): U holds
    N_mhe*m entries (post-strip), every other buffer N_mhe blocks.
    """

    U: jnp.ndarray      # ((N-1)*m,) — post-strip input window
    Y: jnp.ndarray      # (N*p,)
    T: jnp.ndarray      # (N,)
    Xmin: jnp.ndarray   # (N*n,)
    PX: jnp.ndarray     # (N*npx,)
    PY: jnp.ndarray     # (N*npy,)
    X: jnp.ndarray      # (N*n,)  one-step-ahead predictions x(k+1|k)
    V: jnp.ndarray      # (N*p,)  measurement-noise estimates
    W: jnp.ndarray      # (N*n_w,) process-noise estimates
    x_bar: jnp.ndarray  # (n,)    arrival-cost center
    P: jnp.ndarray      # (n,n)   arrival-cost covariance
    sm: Any = None      # MHESmoothState (mhe_up='smooth' only)
    # number of completed MHE steps (== the reference's ksim).  Buffers are
    # back-aligned: during the growing-horizon warmup (steps < N_mhe-1) the
    # first N_mhe-1-steps window slots hold benign pad values that the
    # NLP's per-stage validity mask deactivates.  carry_from_runtime hands
    # off a full window, so it sets steps = N_mhe (always-full behavior).
    steps: Any = None
    # structured-engine dual/barrier warm start (shifted one window stage
    # each step; engaged only once the PREVIOUS solve had a full window,
    # mirroring MHERuntime's steady-state-only warm start).  None = cold
    # solve every step (dense engine, or warm start disabled).
    duals: Any = None


def make_mhe_traced(cfg: MPCConfig, model: ModelFns):
    """Pure-JAX MHE step (both ``mhe_up`` modes), warmup included.

    The reference's growing-horizon warmup (ksim < N_mhe) rebuilds a
    per-horizon NLP each step (MPC_code.py:591-598); here ONE fixed-shape
    NLP with a per-stage validity mask expresses every horizon (pad stages:
    identity dynamics, v pinned to 0, cost-decoupled w — the padded optimum
    coincides with the reduced-horizon optimum), so the same traced step
    jits/vmaps/scans from step 0.  Start cold with
    :func:`make_mhe_cold_carry`; a carry with ``steps=None`` (e.g. from
    ``carry_from_runtime``) folds the mask to all-true and reproduces the
    steady-state-only graph bitwise.  Returns ``(step, carry_from_runtime)``:

    - ``step(carry, y_k, u_k, xhat_min, t_k, p_x, p_y) ->
      (carry', x_corr)`` — one full MHE step: window shift with the
      fictitious-input doubling (Estimator.py:475-501), forward-simulated
      guess (503-512), fixed-size NLP solve (516-530), solution stacking
      (541-555) and the arrival-cost update — 'filter': one EKF-with-
      cross-term step on the oldest window entries (Estimator.py:626-650);
      'smooth': bookkeeping KF with the Feng cross-covariance term
      (558-622), backward Riccati smoother P <- Pis[1] (654-664), and the
      stacked Abig/Cbig/Qbig/Hbig/Obig/Pycondx assembly (686-735), all as
      fixed-shape dense algebra inside the trace.
    - ``carry_from_runtime(rt, P_k) -> MHECarry`` — hand off from a warmed
      `MHERuntime` (requires rt to have completed a step with a full
      window, i.e. len(rt.U) == (N_mhe-1)*m post-strip).
    """
    est = cfg.estimator
    if est.mhe_up not in ("filter", "smooth"):
        raise ValueError(f"unknown mhe_up {est.mhe_up!r}")
    smooth = est.mhe_up == "smooth"
    N = est.N_mhe
    if N < 2:
        raise ValueError("make_mhe_traced requires N_mhe >= 2")

    aug = build_augmented(cfg, model)
    fy_es = aug.fy
    fx_mhe = build_mhe_model(cfg, model)
    f_obj_mhe = build_mhe_cost(est.mhe_cost)

    nx, nd = cfg.nx, cfg.nd
    n = nx + nd if cfg.dist.offree != "no" else nx
    n_w, m, p = n, cfg.nu, cfg.ny
    npx, npy = cfg.npx, cfg.npy
    nxvw = n + p + n_w
    ts = cfg.h
    pidx = p * (N - 1)

    spec = build_mhe_nlp(cfg, fx_mhe, fy_es, f_obj_mhe, N, N, maskable=True)
    if est.structured_mhe:
        # stagewise Riccati engine (build_structured_mhe): same converged
        # point to solver tolerance, no dense-KKT LU custom-calls on chip
        from mpc_code_tpu.ocp.mhe import (
            make_structured_mhe_solver, shift_mhe_duals,
        )

        solve = make_structured_mhe_solver(cfg, fx_mhe, fy_es, f_obj_mhe,
                                           N, N, maskable=True,
                                           return_duals=True)
    else:
        solve = make_solver(spec.nlp, cfg.sol_opts_mhe)
    lbw = jnp.asarray(spec.lbw)
    ubw = jnp.asarray(spec.ubw)
    lbg = jnp.asarray(spec.lbg)
    ubg = jnp.asarray(spec.ubg)

    hess_wv = jax.hessian(lambda wv, t: f_obj_mhe(wv[:n_w], wv[n_w:], t))
    jac_C = jax.jacfwd(fy_es, argnums=0)
    jac_A = jax.jacfwd(fx_mhe, argnums=0)
    jac_B = jax.jacfwd(fx_mhe, argnums=1)
    jac_G = jax.jacfwd(fx_mhe, argnums=4)
    if smooth and N < 3:
        # the reference's stacked-assembly shapes only close for N_mhe >= 3
        # (Estimator.py:697-701 writes an n+n_w+p-wide first row into an
        # n+(N-2)n_w+(N-1)p matrix — same latent limit there)
        raise ValueError("mhe_up='smooth' requires N_mhe >= 3")

    def step(c: MHECarry, y_k, u_k, xhat_min, t_k, p_x, p_y):
        y_k = jnp.asarray(y_k).reshape(p)
        u_k = jnp.asarray(u_k).reshape(m)
        xhat_min = jnp.asarray(xhat_min).reshape(n)
        p_x = jnp.asarray(p_x).reshape(npx)
        p_y = jnp.asarray(p_y).reshape(npy)

        # growing-horizon warmup support (reference MPC_code.py:591-598):
        # with a step counter in the carry, the first N-1 steps run the
        # SAME traced solve with the leading (pad) stages masked off; with
        # steps=None (post-handoff carries) the mask folds to all-true and
        # the graph is the pre-round-4 steady-state one, bitwise.
        warm = c.steps is not None
        if warm:
            valid = jnp.minimum(c.steps + 1, N)          # window entries after this shift
            mask = jnp.arange(N) >= (N - valid)          # back-aligned validity
            full = c.steps >= N - 1                      # prior update engages (ksim >= N_mhe-1)
            sel = lambda cond, a, b: jnp.where(cond, a, b)
        else:
            mask = jnp.ones(N, dtype=bool)
            full = True
            sel = lambda cond, a, b: a

        # window shift; the solver's input window ends with the fictitious
        # doubled current input [..., u_k, u_k] (Estimator.py:475-501) and
        # the end-of-step strip removes the second copy
        U_s = jnp.concatenate([c.U[m:], u_k, u_k])       # (N*m,)
        Y_n = jnp.concatenate([c.Y[p:], y_k])
        T_n = jnp.concatenate([c.T[1:], jnp.reshape(t_k, (1,))])
        Xmin_n = jnp.concatenate([c.Xmin[n:], xhat_min])
        PX_n = jnp.concatenate([c.PX[npx:], p_x])
        PY_n = jnp.concatenate([c.PY[npy:], p_y])

        # forward-simulated guess from the arrival-cost center
        Um = U_s.reshape(N, m)
        PXm = PX_n.reshape(N, npx)

        def sim(xg, inp):
            u_i, t_i, px_i, mk_i = inp
            xn = fx_mhe(xg, u_i, ts, t_i, jnp.zeros(n_w, dtype=xg.dtype), px_i)
            # pad stages hold x_bar (identity dynamics in the masked NLP)
            return jnp.where(mk_i, xn, xg), jnp.where(mk_i, xn, xg)

        xN, Xtail = jax.lax.scan(sim, c.x_bar, (Um, T_n, PXm, mask))
        Xg = jnp.concatenate([c.x_bar[None], Xtail[:-1]], axis=0)  # stages 0..N-1
        body = jnp.zeros((N, nxvw), dtype=c.x_bar.dtype).at[:, :n].set(Xg)
        w_guess = jnp.concatenate([body.reshape(-1), xN])

        zdt = c.x_bar.dtype
        par = dict(
            U=Um, Y=Y_n.reshape(N, p), x_bar=c.x_bar,
            P_inv=_sinv(c.P), T=T_n, mask=mask,
            PX=PXm, PY=PY_n.reshape(N, npy),
            Pycondx_inv=(c.sm.Pycondx_inv if smooth
                         else jnp.zeros((pidx, pidx), dtype=zdt)),
            Hbig=c.sm.Hbig if smooth else jnp.zeros(pidx, dtype=zdt),
            Obig=c.sm.Obig if smooth else jnp.zeros((pidx, n), dtype=zdt),
        )
        if est.structured_mhe:
            if c.duals is not None:
                # engage the dual warm start only once the PREVIOUS solve
                # had a full window (runtime solves cold through its
                # per-horizon warmup — this gate keeps the two engines'
                # iterates identical step by step)
                full_prev = (c.steps >= N) if warm else jnp.asarray(True)
                ws_in = {**c.duals, "ok": c.duals["ok"] & full_prev}
            else:
                ws_in = None
            res, duals_raw = solve(w_guess, par, lbw, ubw, lbg, ubg,
                                   ws=ws_in)
            duals_out = (shift_mhe_duals(duals_raw)
                         if c.duals is not None else None)
        else:
            res = solve(w_guess, par, lbw, ubw, lbg, ubg)
            duals_out = None
        w_opt = res.w

        xkp1k = w_opt[-n:]
        xhat_corr = w_opt[-n - nxvw : -nxvw]
        v_k = w_opt[-nxvw : -n - n_w]
        w_k = w_opt[-n - n_w : -n]

        X_n = jnp.concatenate([c.X[n:], xkp1k])
        V_n = jnp.concatenate([c.V[p:], v_k])
        W_n = jnp.concatenate([c.W[n_w:], w_k])

        if smooth:
            P_new, x_bar_n, sm_n = _smooth_update(
                c, full, sel, w_opt, xhat_corr, xkp1k, v_k, w_k, y_k, u_k,
                t_k, p_x, p_y)
        else:
            # 'filter' arrival-cost update from the OLDEST window entries
            # (Estimator.py:626-650), exactly as MHERuntime does it; during
            # the warmup (window not yet full) the prior passes through
            # unchanged, same as the reference's ksim >= N_mhe-1 guard
            Hd0 = hess_wv(jnp.concatenate([W_n[:n_w], V_n[:p]]), T_n[0])
            H0 = _sinv(Hd0)
            Q0 = H0[:n_w, :n_w]
            R0 = H0[-p:, -p:]
            S0 = H0[:n_w, -p:]
            C0 = jac_C(Xmin_n[:n], U_s[:m], T_n[0], PY_n[:npy])
            inbr0 = _sinv(C0 @ c.P @ C0.T + R0)
            K0 = c.P @ C0.T @ inbr0
            P_corr = c.P - K0 @ C0 @ c.P
            A0 = jac_A(X_n[:n], U_s[:m], ts, T_n[0], W_n[:n_w], PX_n[:npx])
            G0 = jac_G(X_n[:n], U_s[:m], ts, T_n[0], W_n[:n_w], PX_n[:npx])
            M0 = -K0 @ S0.T
            P_new = sel(full,
                        A0 @ P_corr @ A0.T + G0 @ Q0 @ G0.T
                        + A0 @ M0 @ G0.T + G0 @ M0 @ A0.T, c.P)
            x_bar_n = sel(full, X_n[:n], c.x_bar)
            sm_n = None

        c_out = MHECarry(U=U_s[:-m], Y=Y_n, T=T_n, Xmin=Xmin_n, PX=PX_n, PY=PY_n,
                         X=X_n, V=V_n, W=W_n, x_bar=x_bar_n, P=P_new, sm=sm_n,
                         steps=(c.steps + 1 if warm else None),
                         duals=duals_out)
        return c_out, xhat_corr

    def _smooth_update(c, full, sel, w_opt, xhat_corr, xkp1k, v_k, w_k, y_k,
                       u_k, t_k, p_x, p_y):
        """The 'smooth' arrival-cost update, traced: bookkeeping KF with the
        Feng cross-covariance term (Estimator.py:558-622), backward Riccati
        smoother (654-664), and the stacked correction-matrix assembly
        (686-735) — all static shapes, Python loops unrolled at trace.

        Warmup gating (``full``): the bookkeeping KF and the rolling
        linearization buffers update every step (the reference appends them
        from ksim=0, Estimator.py:558-622); the smoother, the stacked
        assembly, and the P/x_bar prior updates engage only once the window
        is full (the reference's ksim >= N_mhe-1 guard)."""
        sm = c.sm
        # current-stage linearization
        Hd = hess_wv(jnp.concatenate([w_k, v_k]), t_k)
        H_k = _sinv(Hd)
        Q_k = H_k[:n_w, :n_w]
        R_k = H_k[-p:, -p:]
        S_k = H_k[:n_w, -p:]
        R_kk = _sinv(Hd[-p:, -p:])              # Estimator.py:565-566
        C_k = jac_C(xhat_corr, u_k, t_k, p_y)
        h_k = y_k - C_k @ xhat_corr - v_k
        args = (xhat_corr, u_k, ts, t_k, w_k, p_x)
        A_k = jac_A(*args)
        B_k = jac_B(*args)
        G_k = jac_G(*args)
        f_k = xkp1k - A_k @ xhat_corr - B_k @ u_k - G_k @ w_k

        # bookkeeping KF step (Estimator.py:590-607; xm_kal itself is
        # history-only and not carried)
        inbr = _sinv(C_k @ sm.P_kal @ C_k.T + R_k)
        K_k = sm.P_kal @ C_k.T @ inbr
        P_corr_kal = sm.P_kal - K_k @ C_k @ sm.P_kal
        Pi = sm.P_kal
        M_k = -K_k @ S_k.T
        P_kal_n = (A_k @ P_corr_kal @ A_k.T + G_k @ Q_k @ G_k.T
                   + A_k @ M_k @ G_k.T + G_k @ M_k @ A_k.T)

        # append current stage, full-window views (N stages)
        bigA_f = jnp.concatenate([sm.bigA, A_k[None]])
        bigP_f = jnp.concatenate([sm.bigP, Pi[None]])
        bigPc_f = jnp.concatenate([sm.bigPc, P_corr_kal[None]])

        # backward Riccati smoother (Estimator.py:654-664)
        Pis = [None] * N
        Pis[N - 1] = bigPc_f[N - 1]
        for i in range(N - 2, -1, -1):
            Pim = _sinv(bigP_f[i + 1])
            Pis[i] = bigPc_f[i] + bigPc_f[i] @ bigA_f[i].T @ Pim @ (
                Pis[i + 1] - bigP_f[i + 1]) @ Pim @ bigA_f[i] @ bigPc_f[i]
        P_new = sel(full, Pis[1], c.P)

        # shift-one-forward rolling buffers (Estimator.py:671-684):
        # append-then-drop-oldest == drop-oldest-then-append
        bigA_n = bigA_f[1:]
        bigP_n = bigP_f[1:]
        bigPc_n = bigPc_f[1:]
        bigC_n = jnp.concatenate([sm.bigC[1:], C_k[None]])
        bigG_n = jnp.concatenate([sm.bigG[1:], G_k[None]])
        bigB_n = jnp.concatenate([sm.bigB[1:], B_k[None]])
        bigf_n = jnp.concatenate([sm.bigf[1:], f_k[None]])
        bigh_n = jnp.concatenate([sm.bigh[1:], h_k[None]])
        bigQ_n = jnp.concatenate([sm.bigQ[1:], H_k[None]])
        bigU_n = jnp.concatenate([sm.bigU[1:], u_k[None]])

        # stacked matrices for the (parametric) smoothing correction
        # (Estimator.py:686-735), over the SHIFTED window
        idx = N - 1
        nvars = n + (N - 2) * n_w + (N - 1) * p
        zdt = w_opt.dtype
        Hbig = jnp.zeros((p * idx,), dtype=zdt)
        Cbig = jnp.zeros((p * idx, nvars), dtype=zdt)
        Arow = jnp.eye(n, dtype=zdt)
        row0 = jnp.concatenate(
            [bigC_n[0], jnp.zeros((p, n_w), dtype=zdt), jnp.eye(p, dtype=zdt)],
            axis=1)
        Cbig = Cbig.at[0:p, 0 : n + n_w + p].set(row0)
        Hbig = Hbig.at[:p].set(bigh_n[0])
        Qbig = P_new
        Hrow = None
        for i in range(N - 2):
            Apad = (jnp.zeros((n, 0), dtype=zdt) if i == 0
                    else jnp.zeros((n, p), dtype=zdt))
            Arow = jnp.concatenate([bigA_n[i] @ Arow, Apad, bigG_n[i]], axis=1)
            Cpad = (jnp.zeros((p, p), dtype=zdt) if i == N - 3
                    else jnp.zeros((p, n_w + p), dtype=zdt))
            Crow = jnp.concatenate([bigC_n[i + 1] @ Arow, Cpad,
                                    jnp.eye(p, dtype=zdt)], axis=1)
            Cbig = Cbig.at[(i + 1) * p : (i + 2) * p, : Crow.shape[1]].set(Crow)
            Qbig = _block_diag(Qbig, bigQ_n[i])
            if i == 0:
                Hrow = bigB_n[i] @ bigU_n[i] + bigf_n[i]
            else:
                Hrow = bigA_n[i] @ Hrow + bigB_n[i] @ bigU_n[i] + bigf_n[i]
            Hbig = Hbig.at[(i + 1) * p : (i + 2) * p].set(
                bigC_n[i + 1] @ Hrow + bigh_n[i + 1])
        Qbig = _block_diag(Qbig, R_kk)
        Obig = Cbig[:, :n]
        Gbig = Cbig[:, n:]
        QRbig = Qbig[n:, n:]
        Pycondx_inv = _sinv(Gbig @ QRbig @ Gbig.T)

        x_bar_n = sel(full, w_opt[nxvw : nxvw + n], c.x_bar)  # Estimator.py:749-752
        sm_n = MHESmoothState(
            P_kal=P_kal_n, bigA=bigA_n, bigP=bigP_n, bigPc=bigPc_n,
            bigC=bigC_n, bigG=bigG_n, bigB=bigB_n, bigf=bigf_n, bigh=bigh_n,
            bigQ=bigQ_n, bigU=bigU_n,
            Hbig=sel(full, Hbig, sm.Hbig),
            Obig=sel(full, Obig, sm.Obig),
            Pycondx_inv=sel(full, Pycondx_inv, sm.Pycondx_inv))
        return P_new, x_bar_n, sm_n

    def carry_from_runtime(rt: "MHERuntime", P_k) -> MHECarry:
        if rt.N_mhe != N:
            raise ValueError("runtime/config N_mhe mismatch")
        if rt.up != est.mhe_up:
            raise ValueError("runtime/config mhe_up mismatch")
        if rt.U.shape[0] != (N - 1) * m:
            raise ValueError(
                "runtime window not full yet: hand off after the step with "
                f"ksim >= N_mhe - 1 completed (len(U)={rt.U.shape[0]}, "
                f"need {(N - 1) * m})")
        sm = None
        if smooth:
            if len(rt.bigA) != N - 1:
                raise ValueError("smooth buffers not in post-shift steady "
                                 f"state (len={len(rt.bigA)}, need {N - 1})")
            st = lambda lst: jnp.stack([jnp.asarray(a, dtype=float) for a in lst])
            sm = MHESmoothState(
                P_kal=jnp.asarray(rt.P_k_kal, dtype=float),
                bigA=st(rt.bigA), bigP=st(rt.bigP), bigPc=st(rt.bigPc),
                bigC=st(rt.bigC), bigG=st(rt.bigG), bigB=st(rt.bigB),
                bigf=st(rt.bigf), bigh=st(rt.bigh), bigQ=st(rt.bigQ),
                bigU=st(rt.bigU), Hbig=jnp.asarray(rt.Hbig, dtype=float),
                Obig=jnp.asarray(rt.Obig, dtype=float),
                Pycondx_inv=jnp.asarray(rt.Pycondx_inv, dtype=float))
        duals = None
        if est.structured_mhe:
            # hand the runtime's carried duals to the traced continuation
            # so its first solve warm-starts exactly as the host loop's
            # next solve would (zeros/ok=False if none carried yet)
            from mpc_code_tpu.ocp.mhe import mhe_dual_zeros

            duals = (jax.tree_util.tree_map(jnp.asarray, rt._duals)
                     if rt._duals is not None else mhe_dual_zeros(cfg, N))
        return MHECarry(
            U=jnp.asarray(rt.U), Y=jnp.asarray(rt.Y), T=jnp.asarray(rt.T),
            Xmin=jnp.asarray(rt.Xmin), PX=jnp.asarray(rt.PX),
            PY=jnp.asarray(rt.PY), X=jnp.asarray(rt.X), V=jnp.asarray(rt.V),
            W=jnp.asarray(rt.W), x_bar=jnp.asarray(rt.x_bar),
            P=jnp.asarray(P_k, dtype=float), sm=sm, duals=duals)

    return step, carry_from_runtime


def make_mhe_cold_carry(cfg: MPCConfig, px0=None, py0=None, t0=0.0,
                        u_pad=None) -> MHECarry:
    """Cold (step-0) :class:`MHECarry` for the fully-traced growing-horizon
    warmup — no host ``ClosedLoop``/``MHERuntime`` pre-phase needed.

    Window buffers are back-aligned with benign pad values (x_bar in the
    state slots, identity covariance stacks, the config's u0 in the input
    slots); ``steps=0`` makes the traced step's per-stage validity mask
    deactivate the pad stages, reproducing the reference's growing-horizon
    warmup (MPC_code.py:591-598, Estimator.py:475-512) inside one
    fixed-shape graph.  Prior/arrival values mirror ``MHERuntime.__init__``
    (x_bar0 / P0 handling).
    """
    est = cfg.estimator
    N = est.N_mhe
    nx, nd = cfg.nx, cfg.nd
    n = nx + nd if cfg.dist.offree != "no" else nx
    n_w, m, p = n, cfg.nu, cfg.ny
    npx, npy = cfg.npx, cfg.npy
    pidx = p * (N if N == 1 else N - 1)

    x_bar0 = est.x_bar0
    if x_bar0 is None:
        dh = (np.zeros(nd) if cfg.dhat0 is None
              else np.asarray(cfg.dhat0, float).reshape(-1))
        x_bar0 = np.concatenate([np.asarray(cfg.x0_m, float).reshape(-1), dh])[:n]
    x_bar = jnp.asarray(np.asarray(x_bar0, float).reshape(n))
    P0 = jnp.asarray(np.asarray(est.P0, float) if est.P0 is not None
                     else np.eye(n))
    u_pad = jnp.asarray(np.asarray(cfg.u0 if u_pad is None else u_pad,
                                   float).reshape(m))
    px0 = jnp.zeros(npx) if px0 is None else jnp.asarray(px0, dtype=float).reshape(npx)
    py0 = jnp.zeros(npy) if py0 is None else jnp.asarray(py0, dtype=float).reshape(npy)

    sm = None
    if est.mhe_up == "smooth":
        eye_n = jnp.tile(jnp.eye(n)[None], (N - 1, 1, 1))
        sm = MHESmoothState(
            P_kal=P0,
            bigA=eye_n, bigP=eye_n, bigPc=eye_n,
            bigC=jnp.zeros((N - 1, p, n)), bigG=jnp.zeros((N - 1, n, n_w)),
            bigB=jnp.zeros((N - 1, n, m)), bigf=jnp.zeros((N - 1, n)),
            bigh=jnp.zeros((N - 1, p)),
            # identity inverse-Hessian pads keep the (discarded) warmup
            # assembly's matrix inversions well-posed — no NaNs under
            # jax_debug_nans / check_numerics
            bigQ=jnp.tile(jnp.eye(n_w + p)[None], (N - 1, 1, 1)),
            bigU=jnp.tile(u_pad[None], (N - 1, 1)),
            Hbig=jnp.zeros(pidx), Obig=jnp.zeros((pidx, n)),
            Pycondx_inv=jnp.zeros((pidx, pidx)))

    duals = None
    if est.structured_mhe:
        from mpc_code_tpu.ocp.mhe import mhe_dual_zeros

        duals = mhe_dual_zeros(cfg, N)

    return MHECarry(
        U=jnp.tile(u_pad, N - 1),
        Y=jnp.zeros(N * p),
        T=jnp.full((N,), float(t0)),
        Xmin=jnp.tile(x_bar, N),
        PX=jnp.tile(px0, N), PY=jnp.tile(py0, N),
        X=jnp.tile(x_bar, N), V=jnp.zeros(N * p), W=jnp.zeros(N * n_w),
        x_bar=x_bar, P=P0, sm=sm, steps=jnp.asarray(0, jnp.int32),
        duals=duals)
