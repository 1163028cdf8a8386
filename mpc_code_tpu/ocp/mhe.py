"""MHE NLP builder.

TPU-native replacement for the reference's `mhe_opt` (Utilities.py:825-990):
decision sequence w = [x_0, v_0, w_0, ..., x_{N-1}, v_{N-1}, w_{N-1}, x_N]
over the augmented state x = [state; disturbance] (n = nx+nd), measurement
residuals Fy(x_k) + v_k = y_k interleaved with dynamics defects, arrival
cost 0.5 (x_0 - x_bar)' P^{-1} (x_0 - x_bar).

Parameters are a pytree {U (N,m), Y (N,p), x_bar (n), P_inv (n,n), T (N,),
PX (N,npx), PY (N,npy), Pycondx_inv, Hbig, Obig}.

Note on the smoothing-update correction term (Utilities.py:948-952): in the
reference the term is gated on ``ksim >= N_mhe`` at *solver build* time, but
solvers are only (re)built while ``ksim < N_mhe`` (MPC_code.py:591-598) —
the subtraction never enters any solver actually used.  We reproduce that
observable behavior by default and expose ``smooth_correction=True`` for the
formulation the reference intended (documented divergence option).

The user-constraint path of the reference `mhe_opt` references undefined
symbols (Utilities.py:895-900, 969 — documented reference bugs), i.e. MHE
with user g/h constraints never worked there; here the path is implemented
correctly via cfg.G_ineq/H_eq when enabled.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.solver.nlp import NLP


@dataclass(frozen=True)
class MHESpec:
    nlp: NLP
    N: int
    n: int
    n_w: int
    p: int
    nxvw: int
    lbw: np.ndarray
    ubw: np.ndarray
    lbg: np.ndarray
    ubg: np.ndarray


def build_mhe_nlp(cfg: MPCConfig, fx_mhe: Callable, fy_es: Callable,
                  f_obj_mhe: Callable, N: int, N_mhe: int,
                  smooth_correction: bool = False,
                  maskable: bool = False) -> MHESpec:
    """``maskable=True`` adds a per-stage validity mask ``par["mask"]``
    ((N,) bool, back-aligned) so ONE fixed-shape NLP also expresses the
    reference's growing-horizon warmup problems (Estimator.py:475-512 /
    MPC_code.py:591-598 rebuild per-horizon solvers; here pad stages get
    identity dynamics, v pinned to 0, and cost-decoupled w, which makes the
    padded optimum coincide with the reduced-horizon optimum).  With the
    mask all-true the residual arithmetic selects the exact same values as
    the unmasked build (``jnp.where`` on a true predicate), so steady-state
    solves are unchanged bitwise."""
    nx, nd, p = cfg.nx, cfg.nd, cfg.ny
    n = nx + nd if cfg.dist.offree != "no" else nx
    n_w = n  # noise dimension equals augmented state size (w = SX.sym("w", nx+nd))
    nxv = n + p
    nxvw = nxv + n_w
    n_opt = N * nxvw + n
    npx, npy = cfg.npx, cfg.npy
    idx = N_mhe if N_mhe == 1 else N_mhe - 1

    b = cfg.bounds
    xmi = np.full(nx, -np.inf) if b.xmin is None else np.asarray(b.xmin, float).reshape(-1)
    xma = np.full(nx, np.inf) if b.xmax is None else np.asarray(b.xmax, float).reshape(-1)
    if cfg.dist.offree != "no":
        dmi = np.full(nd, -np.inf) if b.dmin is None else np.asarray(b.dmin, float).reshape(-1)
        dma = np.full(nd, np.inf) if b.dmax is None else np.asarray(b.dmax, float).reshape(-1)
        xmin_mhe = np.concatenate([xmi, dmi])       # MPC_code.py:399-404
        xmax_mhe = np.concatenate([xma, dma])
    else:
        xmin_mhe, xmax_mhe = xmi, xma
    wmin = np.full(n_w, -np.inf) if b.wmin is None else np.asarray(b.wmin, float).reshape(-1)
    wmax = np.full(n_w, np.inf) if b.wmax is None else np.asarray(b.wmax, float).reshape(-1)
    vmin = np.full(p, -np.inf) if b.vmin is None else np.asarray(b.vmin, float).reshape(-1)
    vmax = np.full(p, np.inf) if b.vmax is None else np.asarray(b.vmax, float).reshape(-1)
    y_free = b.ymin is None and b.ymax is None
    ymin = np.full(p, -np.inf) if b.ymin is None else np.asarray(b.ymin, float).reshape(-1)
    ymax = np.full(p, np.inf) if b.ymax is None else np.asarray(b.ymax, float).reshape(-1)

    def unpack(w):
        body = w[: N * nxvw].reshape(N, nxvw)
        X = jnp.concatenate([body[:, :n], w[N * nxvw :][None]], axis=0)  # (N+1, n)
        V = body[:, n : n + p]
        W = body[:, n + p :]
        return X, V, W

    if not y_free:
        # a strictly feasible constant for masked-off y-bound rows: any
        # finite point inside the (1.5x loosened) output box
        y_pad = np.clip(np.zeros(p), ymin + 0.5 * ymin + 1e-6,
                        ymax + 0.5 * ymax - 1e-6)

    def g_fn(w, par):
        X, V, W = unpack(w)
        Yk = jax.vmap(lambda x, u, t, py: fy_es(x, u, t, py))(X[:N], par["U"], par["T"], par["PY"]) + V
        yres = Yk - par["Y"]                                   # Utilities.py:911-928
        xnext = jax.vmap(lambda x, u, t, wk, px: fx_mhe(x, u, cfg.h, t, wk, px))(
            X[:N], par["U"], par["T"], W, par["PX"])
        if maskable:
            mk = par["mask"][:, None]
            # pad stages: v_i = 0 replaces the measurement residual, and
            # x_{i+1} = x_i (identity chain carrying x_bar to the first
            # valid stage) replaces the dynamics defect
            yres = jnp.where(mk, yres, V)
            xnext = jnp.where(mk, xnext, X[:N])
        defect = xnext - X[1:]                                 # Utilities.py:930-932
        inter = jnp.concatenate([yres, defect], axis=1).reshape(-1)  # per-stage [yres; dyn]
        rows = [inter]
        if not y_free:
            Ybnd = Yk if not maskable else jnp.where(
                par["mask"][:, None], Yk, jnp.asarray(y_pad, dtype=w.dtype))
            rows.append(Ybnd.reshape(-1))                      # Utilities.py:925-926
        return jnp.concatenate(rows)

    def f_fn(w, par):
        X, V, W = unpack(w)
        stage = jax.vmap(f_obj_mhe)(W, V, par["T"])            # Utilities.py:934-936
        total = jnp.sum(stage)
        dx0 = X[0] - par["x_bar"]
        total = total + 0.5 * dx0 @ (par["P_inv"] @ dx0)       # Utilities.py:944-945
        if smooth_correction and N == N_mhe and idx > 0:
            # Utilities.py:948-952 (never active in the reference driver)
            yes = par["Y"][: idx].reshape(-1) - par["Obig"] @ X[0] - par["Hbig"]
            total = total - 0.5 * yes @ (par["Pycondx_inv"] @ yes)
        return total

    ng_eq = N * (p + n)
    ng1 = 0 if y_free else N * p
    lbg = np.zeros(ng_eq + ng1)
    ubg = np.zeros(ng_eq + ng1)
    if ng1:
        # the reference's 1.5x loosened output bounds (Utilities.py:981-982)
        lbg[ng_eq:] = np.tile(ymin + 0.5 * ymin, N)
        ubg[ng_eq:] = np.tile(ymax + 0.5 * ymax, N)

    lbw = np.full(n_opt, -np.inf)
    ubw = np.full(n_opt, np.inf)
    for k in range(N + 1):
        lbw[k * nxvw : k * nxvw + n] = xmin_mhe
        ubw[k * nxvw : k * nxvw + n] = xmax_mhe
    for k in range(N):
        lbw[k * nxvw + n : k * nxvw + nxv] = vmin
        ubw[k * nxvw + n : k * nxvw + nxv] = vmax
        lbw[k * nxvw + nxv : (k + 1) * nxvw] = wmin
        ubw[k * nxvw + nxv : (k + 1) * nxvw] = wmax

    return MHESpec(
        nlp=NLP(f=f_fn, g=g_fn, nw=n_opt, ng=ng_eq + ng1),
        N=N, n=n, n_w=n_w, p=p, nxvw=nxvw,
        lbw=lbw, ubw=ubw, lbg=lbg, ubg=ubg,
    )
