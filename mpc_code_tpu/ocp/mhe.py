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


# ----------------------------------------------------------------------
# Structured (Riccati) MHE: the same NLP mapped onto the stagewise form
# the fast OCP solver consumes, with the measurement noise v eliminated
# through its defining equality.
# ----------------------------------------------------------------------

def build_structured_mhe(cfg: MPCConfig, fx_mhe: Callable, fy_es: Callable,
                         f_obj_mhe: Callable, N: int, N_mhe: int,
                         smooth_correction: bool = False,
                         maskable: bool = False):
    """Map the MHE NLP onto the stagewise :class:`StructuredOCP` form so it
    rides the batched Riccati interior-point solver instead of the dense
    IPM (whose per-iteration KKT factorization is a batched LU custom-call
    — the dominant cost of the traced ENMPC step on TPU).

    The mapping (reference problem: Utilities.py:825-990):

    - structured horizon ``N_s = N + 1``; state ``z_k``, control ``u_k``.
    - ``z_0`` is pinned to ``x_bar`` (the solver's given initial state).
    - stage 0 decides the FREE initial window state: its control is
      ``x_0`` itself, dynamics ``z_1 = u_0``, cost = the arrival penalty
      ``0.5 (u_0 - x_bar)' P^{-1} (u_0 - x_bar)`` (+ the optional
      smoothing correction term, a quadratic in ``x_0`` only,
      Utilities.py:948-952).
    - stage ``k = i+1`` (window stage ``i``): control ``w_i`` (process
      noise, ``n_w == n``), dynamics ``z_{k+1} = fx_mhe(z_k, U_i, h, T_i,
      w, PX_i)``, cost ``f_obj_mhe(w, v_i, T_i)`` with the measurement
      noise ELIMINATED through its defining equality:
      ``v_i = Y_i - fy_es(z_k, U_i, T_i, PY_i)`` (Utilities.py:911-928).
      Eliminating a variable via the equality that defines it (and its
      multiplier) leaves the reduced problem's KKT conditions identical,
      so the structured and dense paths converge to the same point.
    - window state boxes ride the solver's stage state box (z_1..z_{N_s}
      = x_0..x_N all carry xmin_mhe/xmax_mhe — including x_0, whose box
      binds through z_1); finite v/w boxes and the reference's loosened
      output-bound rows (Utilities.py:981-982) become stage inequality
      rows.  NOTE the reference quirk carried over faithfully: its y rows
      bound ``fy + v`` which the measurement equality pins to the DATA
      ``Y_i``, so those rows only reject out-of-range data — here they
      appear as the same data-constant rows.
    - ``maskable=True`` threads the same per-stage validity mask as
      :func:`build_mhe_nlp` (pad stages: identity dynamics, ``v = 0``,
      feasible-constant inequality rows), expressing every growing-
      horizon warmup problem in the one fixed shape.

    Returns ``(socp, meta)`` where ``meta`` carries the layout constants
    the solve adapter needs.
    """
    from mpc_code_tpu.solver.riccati import StructuredOCP

    nx, nd, p = cfg.nx, cfg.nd, cfg.ny
    n = nx + nd if cfg.dist.offree != "no" else nx
    n_w = n
    idx = N_mhe if N_mhe == 1 else N_mhe - 1
    N_s = N + 1

    b = cfg.bounds
    xmi = np.full(nx, -np.inf) if b.xmin is None else np.asarray(b.xmin, float).reshape(-1)
    xma = np.full(nx, np.inf) if b.xmax is None else np.asarray(b.xmax, float).reshape(-1)
    if cfg.dist.offree != "no":
        dmi = np.full(nd, -np.inf) if b.dmin is None else np.asarray(b.dmin, float).reshape(-1)
        dma = np.full(nd, np.inf) if b.dmax is None else np.asarray(b.dmax, float).reshape(-1)
        xmin_mhe = np.concatenate([xmi, dmi])
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
    w_box = np.isfinite(wmin).any() or np.isfinite(wmax).any()
    v_box = np.isfinite(vmin).any() or np.isfinite(vmax).any()

    ts = cfg.h

    def _i(k):
        # window index for structured stage k (k >= 1); clipped so the
        # k == 0 branch of the jnp.where selects finite values
        return jnp.clip(k - 1, 0, N - 1)

    def _mk(k, par):
        if not maskable:
            return k >= 0  # constant True of k's dtype-compatible kind
        return jnp.where(k == 0, True, par["mask"][_i(k)])

    def _v_of(z, k, par):
        i = _i(k)
        ystage = fy_es(z, par["U"][i], par["T"][i], par["PY"][i])
        v = par["Y"][i] - ystage
        if maskable:
            v = jnp.where(par["mask"][i], v, jnp.zeros_like(v))
        return v

    def dyn(z, u, k, par):
        i = _i(k)
        xn = fx_mhe(z, par["U"][i], ts, par["T"][i], u, par["PX"][i])
        if maskable:
            xn = jnp.where(par["mask"][i], xn, z)
        return jnp.where(k == 0, u, xn)

    def cost(z, u, k, par):
        du0 = u - par["x_bar"]
        arrival = 0.5 * du0 @ (par["P_inv"] @ du0)
        if smooth_correction and N == N_mhe and idx > 0:
            yes = par["Y"][:idx].reshape(-1) - par["Obig"] @ u - par["Hbig"]
            arrival = arrival - 0.5 * yes @ (par["Pycondx_inv"] @ yes)
        stage_c = f_obj_mhe(u, _v_of(z, k, par), par["T"][_i(k)])
        return jnp.where(k == 0, arrival, stage_c)

    def cost_N(z, par):
        return jnp.zeros((), dtype=z.dtype)

    # --- stage inequality rows (k-indexed; pad/k==0 slots get feasible
    # constants so their barrier terms are inert)
    rows_lo, rows_hi, row_fns = [], [], []

    def _feas_const(lo, hi):
        mid = np.where(np.isfinite(lo) & np.isfinite(hi), 0.5 * (lo + hi),
                       np.where(np.isfinite(lo), lo + 1.0,
                                np.where(np.isfinite(hi), hi - 1.0, 0.0)))
        return mid

    if not y_free:
        ylo = ymin + 0.5 * ymin
        yhi = ymax + 0.5 * ymax
        y_pad = _feas_const(ylo, yhi)

        def y_rows(z, u, k, par):
            # the reference bounds fy + v, which the measurement equality
            # pins to the data Y_i (see docstring) — a data-constant row
            i = _i(k)
            yk = par["Y"][i]
            live = _mk(k, par) & (k > 0)
            return jnp.where(live, yk, jnp.asarray(y_pad, dtype=z.dtype))

        rows_lo.append(ylo)
        rows_hi.append(yhi)
        row_fns.append(y_rows)

    if v_box:
        v_pad = _feas_const(vmin, vmax)

        def v_rows(z, u, k, par):
            i = _i(k)
            ystage = fy_es(z, par["U"][i], par["T"][i], par["PY"][i])
            live = _mk(k, par) & (k > 0)
            return jnp.where(live, par["Y"][i] - ystage,
                             jnp.asarray(v_pad, dtype=z.dtype))

        rows_lo.append(vmin)
        rows_hi.append(vmax)
        row_fns.append(v_rows)

    if w_box:
        w_pad = _feas_const(wmin, wmax)

        def w_rows(z, u, k, par):
            return jnp.where(k > 0, u, jnp.asarray(w_pad, dtype=z.dtype))

        rows_lo.append(wmin)
        rows_hi.append(wmax)
        row_fns.append(w_rows)

    if row_fns:
        def ineq(z, u, k, par):
            return jnp.concatenate([f(z, u, k, par) for f in row_fns])

        lbi = np.concatenate(rows_lo)
        ubi = np.concatenate(rows_hi)
    else:
        ineq = None
        lbi = np.zeros(0)
        ubi = np.zeros(0)

    ni = int(lbi.shape[0])

    def x0_of_p(par):
        return par["x_bar"]

    # per-variable scales from the state box (same scheme as
    # build_structured_ocp); the noise control shares the state scale
    def _scales(lo, hi):
        mag = np.maximum(np.abs(np.where(np.isfinite(lo), lo, 0.0)),
                         np.abs(np.where(np.isfinite(hi), hi, 0.0)))
        return np.where(mag > 1.0, mag, 1.0)

    sxa = _scales(xmin_mhe, xmax_mhe)
    su = sxa.copy()
    si = _scales(lbi, ubi)
    sxa_j = jnp.asarray(sxa)
    su_j = jnp.asarray(su)
    si_j = jnp.asarray(si)

    raw_dyn, raw_cost, raw_ineq = dyn, cost, ineq

    def dyn_s(z, u, k, par):
        return raw_dyn(sxa_j * z, su_j * u, k, par) / sxa_j

    def cost_s(z, u, k, par):
        return raw_cost(sxa_j * z, su_j * u, k, par)

    if ineq is not None:
        def ineq_s(z, u, k, par):
            return raw_ineq(sxa_j * z, su_j * u, k, par) / si_j
    else:
        ineq_s = None

    def x0_s(par):
        return x0_of_p(par) / sxa_j

    socp = StructuredOCP(
        N=N_s, nxa=n, nu=n_w, ni=ni,
        dyn=dyn_s, cost=cost_s, cost_N=lambda z, par: cost_N(sxa_j * z, par),
        ineq=ineq_s, lbi=lbi / si, ubi=ubi / si,
        lbx=xmin_mhe / sxa, ubx=xmax_mhe / sxa,
        lbu=np.full(n_w, -np.inf), ubu=np.full(n_w, np.inf),
        x0_of_p=x0_s, sxa=sxa, su=su, si=si,
        nu_ctrl=n_w)
    meta = dict(N=N, n=n, n_w=n_w, p=p, nxv=n + p, nxvw=n + p + n_w,
                maskable=maskable, v_of=_v_of)
    return socp, meta


def make_structured_mhe_solver(cfg: MPCConfig, fx_mhe: Callable,
                               fy_es: Callable, f_obj_mhe: Callable,
                               N: int, N_mhe: int,
                               smooth_correction: bool = False,
                               maskable: bool = False, opts=None,
                               return_duals: bool = False):
    """Structured-MHE solve with the DENSE solver's call signature:
    ``solve(w_guess, par, lbw, ubw, lbg, ubg) -> IPMResult`` (bounds args
    accepted for interface parity and ignored — they are baked into the
    structured problem).  Drop-in engine swap for `MHERuntime` and
    `make_mhe_traced`; the returned ``w`` uses the dense flat layout
    ``[x_0, v_0, w_0, ..., x_{N-1}, v_{N-1}, w_{N-1}, x_N]`` with the
    eliminated ``v`` reconstructed from the measurement equality.

    ``ws``: optional dual/barrier warm start (the structured solver's
    ``solve(..., ws=)`` dict).  ``return_duals=True`` makes the call
    return ``(IPMResult, duals)`` where ``duals`` is that dict for the
    NEXT solve (shift it one window stage first — see
    `shift_mhe_duals`).
    """
    from mpc_code_tpu.solver.nlp import IPMResult, STATUS_INFEASIBLE
    from mpc_code_tpu.solver.riccati import make_structured_solver

    socp, meta = build_structured_mhe(
        cfg, fx_mhe, fy_es, f_obj_mhe, N, N_mhe,
        smooth_correction=smooth_correction, maskable=maskable)
    struct_solve = make_structured_solver(
        socp, opts if opts is not None else cfg.sol_opts_mhe)
    n, n_w, p = meta["n"], meta["n_w"], meta["p"]
    nxv, nxvw = meta["nxv"], meta["nxvw"]
    v_of = meta["v_of"]

    def solve(w_guess, par, lbw=None, ubw=None, lbg=None, ubg=None,
              ws=None):
        body = w_guess[: N * nxvw].reshape(N, nxvw)
        Xg_w = jnp.concatenate([body[:, :n], w_guess[N * nxvw :][None]],
                               axis=0)                      # (N+1, n) window states
        Wg = body[:, nxv:]                                  # (N, n_w) noise guess
        # structured stages: z = [x_bar, x_0..x_N]; u = [x_0_guess, w_0..w_{N-1}]
        Xg = jnp.concatenate([par["x_bar"][None], Xg_w], axis=0)
        Ug = jnp.concatenate([Xg_w[:1], Wg], axis=0)
        rs = struct_solve(par, Xg, Ug, ws=ws)

        Xw = rs.X[1:]                                       # (N+1, n) = x_0..x_N
        Ww = rs.U[1:]                                       # (N, n_w)
        ks = jnp.arange(1, N + 1)
        Vw = jax.vmap(lambda z, k: v_of(z, k, par))(Xw[:N], ks)
        body_o = jnp.concatenate([Xw[:N], Vw, Ww], axis=1).reshape(-1)
        w_opt = jnp.concatenate([body_o, Xw[N]])
        res = IPMResult(w=w_opt, f=rs.f, lam_g=jnp.zeros(0, dtype=w_opt.dtype),
                        status=rs.status, iters=rs.iters,
                        kkt_err=rs.kkt_err, feas_err=rs.feas_err)
        if not return_duals:
            return res
        duals = dict(zl=rs.zl, zu=rs.zu, lam=rs.lam, nus=rs.nus,
                     mu=rs.mu, sf=rs.sf,
                     ok=rs.status != STATUS_INFEASIBLE)
        return res, duals

    return solve


def mhe_dual_zeros(cfg: MPCConfig, N: int, dtype=None):
    """Zero (cold) dual warm-start dict for the structured MHE solve —
    matches the shapes `make_structured_mhe_solver(return_duals=True)`
    emits, with ``ok=False`` so the solver's per-lane gate falls back to
    its cold initialization."""
    nx, nd, p = cfg.nx, cfg.nd, cfg.ny
    n = nx + nd if cfg.dist.offree != "no" else nx
    b = cfg.bounds
    y_free = b.ymin is None and b.ymax is None
    # row-count logic mirrors build_structured_mhe's y_free/v_box/w_box
    wmin = np.full(n, -np.inf) if b.wmin is None else np.asarray(b.wmin, float).reshape(-1)
    wmax = np.full(n, np.inf) if b.wmax is None else np.asarray(b.wmax, float).reshape(-1)
    vmin = np.full(p, -np.inf) if b.vmin is None else np.asarray(b.vmin, float).reshape(-1)
    vmax = np.full(p, np.inf) if b.vmax is None else np.asarray(b.vmax, float).reshape(-1)
    ni = ((0 if y_free else p)
          + (p if (np.isfinite(vmin).any() or np.isfinite(vmax).any()) else 0)
          + (n if (np.isfinite(wmin).any() or np.isfinite(wmax).any()) else 0))
    N_s = N + 1
    nzs = n + n + ni
    if dtype is None:
        # canonical float: f64 under x64, f32 otherwise (matches what the
        # structured solve emits, keeping the scan carry dtype-stable)
        dtype = jnp.asarray(0.0).dtype
    z = jnp.zeros((N_s, nzs), dtype=dtype)
    return dict(zl=z, zu=z, lam=jnp.zeros((N_s, n), dtype=dtype),
                nus=jnp.zeros((N_s, ni), dtype=dtype),
                mu=jnp.zeros((), dtype=dtype),
                sf=jnp.ones((), dtype=dtype),
                ok=jnp.zeros((), dtype=bool))


def shift_mhe_duals(d):
    """Shift structured-MHE duals one window stage (the window advanced by
    one measurement): structured stage k took over old stage k+1's
    subproblem for k >= 1, the newest stage repeats the last, and the
    virtual arrival stage keeps its own duals."""
    def sh(a):
        return jnp.concatenate([a[:1], a[2:], a[-1:]], axis=0)

    return dict(zl=sh(d["zl"]), zu=sh(d["zu"]), lam=sh(d["lam"]),
                nus=sh(d["nus"]), mu=d["mu"], sf=d["sf"], ok=d["ok"])
