"""Structure-exploiting interior-point solver for shooting OCPs.

The dense IPM (`solver/ipm.py`) factors a (nw+ng)^2 KKT matrix — correct
but O((nw+ng)^3) per iteration.  This module is the TPU fast path for the
dominant workload (the dynamic OCP): the same primal-dual interior-point
iteration, but with

- **stagewise derivatives**: per-stage cost Hessians, dynamics Jacobians
  (A_k, B_k) and inequality Jacobians via `vmap(jax.hessian/jacfwd)` over
  the horizon — O(N * nz * stage) work instead of O(nw * rollout),
- **Riccati-recursion KKT solves**: the barrier-condensed Newton system is
  a discrete-time LQR whose block-tridiagonal factorization runs as a
  `lax.scan` of (nz x nz) matrix ops — O(N * nz^3) instead of LU of the
  full KKT (~300x fewer flops at N=50),
- batched (N, nz, nz) tensor shapes that map onto the MXU when `vmap`ped
  over scenario lanes.

Scope: every reference OCP form (see `structured_supported`): ContForm
quadrature stages, Gauss-Legendre collocation via exact stage
condensation, terminal equality (TermCons), user stage g/h rows, shared
soft-constraint slacks via a constant-slack augmentation (decided at
stage 0, carried as extra states), and Delta-u bounds via state
augmentation with u_{k-1}.  The generic dense solver handles the target
and MHE NLPs and is the correctness oracle in tests.

Reference context: replaces IPOPT+MUMPS sparse LU on the OCP NLP
(Control_Calc.py:258) with dense block factorizations — better than sparse
LU for small-stage OCPs and TPU-friendly (SURVEY.md §2.2 native table).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mpc_code_tpu.config import (
    ContinuousModel, DiscreteModel, MPCConfig, SolverOptions,
)
from mpc_code_tpu.models.model import ModelFns
from mpc_code_tpu.ops.smalllin import (
    chol as _schol, cho_solve as _scho_solve, solve_lu as _ssolve,
    solve_lu_ad as _ssolve_ad,
)
from mpc_code_tpu.solver.nlp import (
    STATUS_ACCEPTABLE,
    STATUS_INFEASIBLE,
    STATUS_SOLVED,
)

_TAU_MIN = 0.99
_ETA_LS = 1e-4
# Backtracking ladder: alpha_j = alpha_max * 0.5^e(j) with a two-phase
# exponent e(j) = j + max(j - 4, 0) — halving for the first 4 trials
# (identical to a plain 0.5^j ladder, so well-behaved lanes are
# bit-unchanged), then quartering.  Reaches the same floor exponent
# _MAX_BACKTRACK=20 in 12 trips instead of 20: the batched LS while-loop
# runs until the SLOWEST lane accepts, and chip traces (round 4) show the
# deep-backtracking tail lane costing ~17 ms/iteration at B=16384 — as
# much as the whole derivative sweep.  Deep-trial lanes accept at most one
# quarter-notch below their old alpha.
_MAX_BACKTRACK = 20   # floor exponent: unaccepted fallback 0.5^20
_LS_FINE = 4          # halving trials before the ladder coarsens
_LS_TRIPS = 12        # e(_LS_TRIPS) == _MAX_BACKTRACK


def _ls_exp(j):
    """Two-phase ladder exponent e(j) (works on python ints and arrays)."""
    return j + jnp.maximum(j - _LS_FINE, 0)
_KAPPA_EPS = 10.0
_KAPPA_MU = 0.2
_THETA_MU = 1.5



def _fast_sweep_on(batch_hint, pallas_ok: bool = True) -> bool:
    """Build-time choice of the derivative-sweep layout.

    The split sweep (dynamics handled by ``stage_dyn_jac``) must be chosen
    when the OCP is BUILT — wrapping the sweep in a batch-size-aware
    custom_vmap rule was chip-measured to cripple the big-batch path even
    when the rule falls back to the plain sweep (610 vs 441 ms/batch at
    B=16384, round 4 — same cliff as sweep_opt_in's documented 14x).

    With ``pallas_ok`` (sweeps that have a fused Pallas kernel:
    `ops/sweep_pallas.py`, round 5) the split path engages on TPU for ALL
    batch regimes — the kernel runs the whole Mx-substep value+tangent
    sweep lanes-dense in VMEM (chip xprof: ~2 ms vs ~18.5 ms batch-major
    at B=16384) — and `ops.integrators._sweep_impl` picks the kernel at
    trace time.  ``MPC_TPU_SWEEP_IMPL=lanes`` restores the round-4
    behavior: lanes-minor XLA iff batch_hint <= MPC_TPU_FAST_SWEEP_MAX_B
    (default 2048; chip-measured crossover — lanes-minor wins warm
    small-batch closed loops, loses the cold big-batch bench).
    MPC_TPU_FAST_SWEEP=1/0 force the split sweep on/off regardless."""
    env = os.environ.get("MPC_TPU_FAST_SWEEP")
    if env == "1":
        return True
    if env == "0":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    from mpc_code_tpu.ops.integrators import _sweep_impl

    interp = os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1"
    if pallas_ok and _sweep_impl() in ("auto", "pallas") and (on_tpu
                                                             or interp):
        return True
    if batch_hint is None:
        return False
    max_b = int(os.environ.get("MPC_TPU_FAST_SWEEP_MAX_B", "2048"))
    return on_tpu and int(batch_hint) <= max_b


def structured_supported(cfg: MPCConfig) -> bool:
    """True when the OCP fits the stagewise Riccati structure.

    Every reference OCP form is supported: ContForm (continuous-
    quadrature economic stage cost), user stage inequalities G_ineq
    (slack-softened or not — slacksG extends the shared slack vector),
    shared output slacks, terminal equality (TermCons — constrained
    Riccati with a terminal multiplier), user stage equalities H_eq
    (bordered-stage Riccati; combined with TermCons via the merged
    recursion `_riccati_eqstage_tc`), and Gauss-Legendre collocation
    (exact within-stage condensation of the implicit RK step).  Only the
    opt-in parallel-scan variant still excludes TermCons/H_eq (see
    make_structured_solver).  ContForm x Collocation follows the reference
    semantics:
    opt_dyn_CM's ContForm branch never emits the collocation equations —
    the dynamics are the integrator/shooting quadrature and the S1/S2
    stage variables dangle unconstrained (Control_Calc.py:428-436 vs the
    skipped rg1/rg2 at 473-481) — so the combination IS ContForm
    shooting, which the structured path handles directly (minus the
    reference's inert dangling variables).
    """
    return True


@dataclass(frozen=True)
class StructuredOCP:
    """Stagewise OCP over augmented state xa (= x, or [x; u_prev])."""

    N: int
    nxa: int
    nu: int
    ni: int                     # general inequality rows per stage
    dyn: Callable               # dyn(xa, u, k, p) -> xa_next
    cost: Callable              # cost(xa, u, k, p) -> scalar
    cost_N: Callable            # cost_N(xa, p) -> scalar
    ineq: Optional[Callable]    # ineq(xa, u, k, p) -> (ni,)
    lbi: np.ndarray             # (ni,)
    ubi: np.ndarray
    lbx: np.ndarray             # (nxa,) box for stages 1..N
    ubx: np.ndarray
    lbu: np.ndarray             # (nu,)
    ubu: np.ndarray
    x0_of_p: Callable           # p -> initial augmented state
    sxa: np.ndarray             # per-variable scales (augmented state)
    su: np.ndarray
    si: np.ndarray
    ns: int = 0                 # shared slack count folded into xa/u tails
    nu_ctrl: int = 0            # true control count (nu minus slack slots)
    n_tc: int = 0               # terminal-equality rows (TermCons: nx)
    tc_target: Optional[Callable] = None  # p -> scaled target for x_N[:n_tc]
    n_eq: int = 0               # user stage-equality rows (H_eq)
    eq: Optional[Callable] = None  # (xa, u, k, p) -> (n_eq,) scaled h rows
    # fast batched dynamics sweep (continuous-shooting configs):
    # (X (N,nxa), U (N,nu), p) -> (dval, A, B) in scaled units, lane-packed
    # under vmap (see ops/integrators.rk4_stage_jac)
    stage_dyn_jac: Optional[Callable] = None
    # ContForm joint sweep: (X, U, p) -> (dval, A, B, qv, gq, Hq) — the
    # quadrature cost's gradient/Hessian share the rollout with the
    # dynamics Jacobians (see ops/integrators.rk4_quad_stage_hess)
    stage_cf: Optional[Callable] = None


class StructResult(NamedTuple):
    X: jnp.ndarray      # (N+1, nxa)
    U: jnp.ndarray      # (N, nu)
    f: jnp.ndarray
    status: jnp.ndarray
    iters: jnp.ndarray
    kkt_err: jnp.ndarray
    feas_err: jnp.ndarray
    # final dual/barrier state for cross-solve warm starts (closed-loop
    # regime: shift and feed back via solve(..., ws=...)); zeros-shaped
    # placeholders when the solver ran without duals requested
    zl: jnp.ndarray = ()      # (N, nxa+nu+ni) lower-bound duals
    zu: jnp.ndarray = ()      # (N, nxa+nu+ni) upper-bound duals
    lam: jnp.ndarray = ()     # (N, nxa) defect multipliers
    nus: jnp.ndarray = ()     # (N, ni) inequality multipliers
    mu: jnp.ndarray = ()      # final barrier parameter
    sf: jnp.ndarray = ()      # objective scaling the duals/mu are in


def build_structured_ocp(cfg: MPCConfig, model: ModelFns, f_obj, vfin,
                         stagewise_px: bool = False,
                         n_colloc_newton: int = 8,
                         batch_hint: Optional[int] = None) -> StructuredOCP:
    """Map the reference OCP (opt_dyn / opt_dyn_CM form) onto the stagewise
    structure.

    ``batch_hint``: the expected vmap batch size of the solver built from
    this OCP; picks the chip-measured-faster derivative-sweep layout for
    that regime (see `_fast_sweep_on`).  None (default) = the cold
    big-batch layout.

    Uses the same parameter pytree as `build_ocp`:
    {x0, xs, us, d, um1, t, lam, px (N,npx), py (N,npy)}.

    Collocation (opt_dyn_CM, Control_Calc.py:264-567) is handled by EXACT
    within-stage condensation: the 2-point Gauss-Legendre stage states
    s1, s2 are defined by the collocation equations
    1/h * D (S - x) = f(S, u), a smooth implicit system solved by Newton
    inside the stage map, with implicit-function-theorem derivatives (one
    differentiable Newton step around the stop-gradded root).  Eliminating
    variables via their defining equalities (with their multipliers) leaves
    the KKT conditions of the reduced problem identical to the dense
    simultaneous transcription's, so the two paths converge to the same
    point; the stage block stays (nxa + nu) instead of (3nx + nu).  The
    reference's stage-0 px freeze quirk (par_xmk[:,0], Control_Calc.py:
    473-474) is reproduced; pass `stagewise_px=True` for the corrected
    behavior.  State box bounds on s1/s2 (Control_Calc.py:552-556) become
    stage inequality rows on the condensed S(x, u).
    """
    from mpc_code_tpu.ocp.shooting import _user_constraint_dim

    ng_user = _user_constraint_dim(cfg.G_ineq, cfg)
    nh_user = _user_constraint_dim(cfg.H_eq, cfg)

    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
    b = cfg.bounds
    cont_form = cfg.ContForm
    du_bounds = not (b.Dumin is None and b.Dumax is None)
    # state augmentation with u_{k-1} is needed whenever Delta-u appears in
    # bounds OR in the cost (DUForm / DUFormEcon)
    du_coupled = du_bounds or cfg.DUForm or cfg.DUFormEcon
    if cont_form:
        # ContForm ignores Delta-u rows and discrete cost forms, exactly as
        # the dense transcription does (shooting.py: du rows skipped when
        # cont_form; cost is the continuous quadrature)
        du_bounds = False
        du_coupled = False
    ymin = b.resolved("dyn", "ymin")
    ymax = b.resolved("dyn", "ymax")
    y_free = ymin is None and ymax is None
    xmin = b.resolved("dyn", "xmin")
    xmax = b.resolved("dyn", "xmax")
    umin = b.resolved("dyn", "umin")
    umax = b.resolved("dyn", "umax")

    # --- shared soft-constraint slacks (reference Control_Calc.py:187,
    # 217, 232-239): ONE slack pair Sl = [s_ub (ny); s_lb (ny)] >= 0
    # relaxes the output bounds at every stage, with a quadratic penalty
    # N * Sl'Ws Sl added once.  A horizon-shared variable breaks stagewise
    # decoupling, so it is folded into the Riccati structure as a
    # constant-state augmentation: the slack is DECIDED by extra input
    # slots at stage 0 and CARRIED by extra state slots thereafter
    #   s_{k+1} = (k == 0) ? s_in : s_k.
    # Stage-0 inequality rows read the input copy; stages >= 1 read the
    # carried state.  The dummy input slots at stages >= 1 get a decoupled
    # 0.5|s|^2 penalty so Quu stays positive definite.  (The reference's
    # big-M replacement of infinite y bounds, Control_Calc.py:64-73, is
    # unnecessary here: an infinite row bound simply contributes no
    # barrier term.)
    slacks = bool(cfg.slacks) and not y_free
    # slacksG extends the SAME shared slack vector with ng_user entries
    # softening the user inequalities (Control_Calc.py:133-136:
    # G_k - Sl[2p : 2p+ng_v])
    slacks_g = slacks and bool(cfg.slacksG) and ng_user > 0
    # slacksH likewise appends nh_user entries softening the user stage
    # equalities (Control_Calc.py:140-143: H_k - Sl[2p+ng_v : ...])
    slacks_h = slacks and bool(cfg.slacksH) and nh_user > 0
    ns = ((2 * ny + (ng_user if slacks_g else 0)
           + (nh_user if slacks_h else 0)) if slacks else 0)
    if slacks:
        if cfg.Ws is None:
            raise ValueError("slacks=True requires Ws")
        Ws_j = jnp.asarray(np.asarray(cfg.Ws, float)[:ns, :ns])

    # ContForm wins over Collocation, as in the reference: opt_dyn_CM's
    # ContForm branch integrates with the IDAS quadrature and never emits
    # the collocation equations (Control_Calc.py:428-436)
    colloc = bool(cfg.Collocation) and not cont_form
    x_box = xmin is not None or xmax is not None
    ni_coll = 2 * nx if (colloc and x_box) else 0  # s1,s2 box rows

    nup = nu if du_coupled else 0
    nxa = nx + nup + ns
    nu_eff = nu + ns
    ni = ((0 if y_free else ((2 * ny) if slacks else ny))
          + (nu if du_bounds else 0) + ng_user + ni_coll)

    def split(xa):
        """xa = [x; (u_prev); (s_carried)] -> (x, u_prev|None, s|None)."""
        x = xa[:nx]
        uprev = xa[nx : nx + nup] if du_coupled else None
        s_st = xa[nx + nup :] if slacks else None
        return x, uprev, s_st

    def split_u(ua):
        """ua = [u; (s_in)] -> (u, s_in|None)."""
        return (ua[:nu], ua[nu:]) if slacks else (ua, None)

    if cont_form:
        # ContForm: integrate xdot = fx(x,u,d,t,px) + px and the continuous
        # economic stage cost as a quadrature over each interval, the same
        # transcription as the dense path (shooting.py ode/quad;
        # Control_Calc.py:102-111,153-158)
        from mpc_code_tpu.ops.integrators import rk4_quad

        user_fx_c = cfg.model.fx
        Mx_c = getattr(cfg.model, "Mx", 10)

        def _ode(x, t, u, d, px, xs, us, py):
            return user_fx_c(x, u, d, t, px) + px

        def _quad(x, t, u, d, px, xs, us, py):
            y = model.fy(x, u, d, t, py)
            ystat = model.fy(xs, us, d, t, py)
            return f_obj(x, u, y, xs, us, ystat)

        integ_cont = rk4_quad(_ode, _quad, Mx_c)

        def _cont_step(x, u, k, p):
            return integ_cont(x, p["t"], cfg.h, u, p["d"], p["px"][k],
                              p["xs"], p["us"], p["py"][k])

    if colloc:
        # exact condensation of the 2-point Gauss-Legendre stage system
        # (see docstring); tableau matches ocp/collocation.py
        from mpc_code_tpu.ocp.collocation import _AD, _BT

        user_fx_coll = cfg.model.fx
        h_c = cfg.h

        def _coll_res(S, x, u, d, t, px):
            s1, s2 = S[:nx], S[nx:]
            r1 = ((_AD[0, 0] * (s1 - x) + _AD[0, 1] * (s2 - x)) / h_c
                  - user_fx_coll(s1, u, d, t, px))
            r2 = ((_AD[1, 0] * (s1 - x) + _AD[1, 1] * (s2 - x)) / h_c
                  - user_fx_coll(s2, u, d, t, px))
            return jnp.concatenate([r1, r2])

        def _coll_S(x, u, k, p):
            # px frozen at stage 0 per the reference quirk
            px_k = p["px"][k] if stagewise_px else p["px"][0]
            d_, t_ = p["d"], p["t"]

            def newton(S, _):
                J = jax.jacfwd(_coll_res)(S, x, u, d_, t_, px_k)
                S = S - _ssolve_ad(J, _coll_res(S, x, u, d_, t_, px_k))
                return S, None

            S0 = jnp.concatenate([x, x])
            S_star, _ = lax.scan(newton, S0, None, length=n_colloc_newton)
            # IFT: one differentiable Newton step around the stop-gradded
            # root gives exact first-order derivatives (residual ~ 0)
            S_star = lax.stop_gradient(S_star)
            J = jax.jacfwd(_coll_res)(S_star, x, u, d_, t_, px_k)
            return S_star - _ssolve_ad(
                J, _coll_res(S_star, x, u, d_, t_, px_k))

        def _coll_next(x, u, k, p):
            S = _coll_S(x, u, k, p)
            s1, s2 = S[:nx], S[nx:]
            xn = x + _BT[0] * (s1 - x) + _BT[1] * (s2 - x)   # Control_Calc.py:437
            return xn, S

    def dyn(xa, ua, k, p):
        x, _, s_st = split(xa)
        u, s_in = split_u(ua)
        if cont_form:
            xn = _cont_step(x, u, k, p)[0]
        elif colloc:
            xn = _coll_next(x, u, k, p)[0]
        else:
            xn = model.fx(x, u, cfg.h, p["d"], p["t"], p["px"][k])
        parts = [xn]
        if du_coupled:
            parts.append(u)
        if slacks:
            parts.append(jnp.where(k == 0, s_in, s_st))
        return jnp.concatenate(parts) if len(parts) > 1 else xn

    def y_of(xa, ua, k, p):
        x, _, _ = split(xa)
        u, _ = split_u(ua)
        return model.fy(x, u, p["d"], p["t"], p["py"][k]) + p["lam"] @ (u - p["us"])

    def cost(xa, ua, k, p):
        x, uprev, _ = split(xa)
        u, s_in = split_u(ua)
        if cont_form:
            val = _cont_step(x, u, k, p)[1]
        else:
            yk = y_of(xa, ua, k, p)
            ys = model.fy(p["xs"], p["us"], p["d"], p["t"], p["py"][0])
            um1 = jnp.where(k == 0, p["um1"], uprev if du_coupled else p["um1"])
            du_k = u - um1
            dx, du, dy = x, u, yk
            if cfg.QForm:
                dx = dx - p["xs"]
                du = du - p["us"]
                dy = dy - ys
            if cfg.DUForm:
                du = du_k
            us_obj = du_k if cfg.DUFormEcon else p["us"]
            if colloc:
                # collocation-aware objective F_obj(..., ds)
                # (Control_Calc.py:458-464, 483)
                dS = _coll_S(x, u, k, p)
                if cfg.QForm:
                    dS = dS - jnp.concatenate([p["xs"], p["xs"]])
                val = f_obj(dx, du, dy, p["xs"], us_obj, ys, dS)
            else:
                val = f_obj(dx, du, dy, p["xs"], us_obj, ys)
        if slacks:
            # real penalty once (stage 0); PD dummy penalty elsewhere
            val = val + jnp.where(k == 0, N_h * (s_in @ (Ws_j @ s_in)),
                                  0.5 * (s_in @ s_in))
        return val

    def cost_N(xa, p):
        x, _, _ = split(xa)
        dxN = x - p["xs"] if cfg.QForm else x
        return vfin(dxN, p["xs"])

    N_h = cfg.N

    if ni:
        def ineq(xa, ua, k, p):
            _, uprev, s_st = split(xa)
            u, s_in = split_u(ua)
            rows = []
            if not y_free:
                yk = y_of(xa, ua, k, p)
                if slacks:
                    s_k = jnp.where(k == 0, s_in, s_st)
                    # layout matches the reference: Sl[:ny] relaxes the
                    # upper bound, Sl[ny:2ny] the lower (Control_Calc.py:
                    # 232-239; Sl[2ny:] belongs to slacksG rows)
                    rows.append(yk + s_k[ny : 2 * ny])   # >= ymin
                    rows.append(yk - s_k[:ny])           # <= ymax
                else:
                    rows.append(yk)
            if du_bounds:
                um1 = jnp.where(k == 0, p["um1"], uprev)
                rows.append(u - um1)
            if ng_user:
                # stagewise user inequality over the corrected output
                # (Control_Calc.py / MPC_code.py:306-314; shooting.py g4 rows)
                x = split(xa)[0]
                yk = y_of(xa, ua, k, p)
                gk = cfg.G_ineq(x, u, yk, p["d"], p["t"],
                                p["px"][k], p["py"][k]).reshape(-1)
                if slacks_g:
                    s_k = jnp.where(k == 0, s_in, s_st)
                    gk = gk - s_k[2 * ny : 2 * ny + ng_user]
                rows.append(gk)
            if ni_coll:
                # state box applied to the condensed collocation stage
                # states s1, s2 (Control_Calc.py:552-556)
                x = split(xa)[0]
                rows.append(_coll_S(x, u, k, p))
            return jnp.concatenate(rows)
    else:
        ineq = None

    if nh_user:
        # stagewise user equality h(x,u,y,...) = 0 over the corrected
        # output (shooting.py g5 rows; Control_Calc.py:140-145), optionally
        # softened by shared slack entries (slacksH)
        sl_h_off = 2 * ny + (ng_user if slacks_g else 0)

        def eq(xa, ua, k, p):
            x, _, s_st = split(xa)
            u, s_in = split_u(ua)
            yk = y_of(xa, ua, k, p)
            hk = cfg.H_eq(x, u, yk, p["d"], p["t"],
                          p["px"][k], p["py"][k]).reshape(-1)
            if slacks_h:
                s_k = jnp.where(k == 0, s_in, s_st)
                hk = hk - s_k[sl_h_off : sl_h_off + nh_user]
            return hk
    else:
        eq = None

    y_lo = (np.asarray(ymin, float).reshape(-1) if ymin is not None
            else np.full(ny, -np.inf))
    y_hi = (np.asarray(ymax, float).reshape(-1) if ymax is not None
            else np.full(ny, np.inf))
    if slacks:
        y_rows_lo = [y_lo, np.full(ny, -np.inf)]
        y_rows_hi = [np.full(ny, np.inf), y_hi]
    else:
        y_rows_lo, y_rows_hi = [y_lo], [y_hi]
    s_lo = np.tile(np.asarray(xmin, float) if xmin is not None
                   else np.full(nx, -np.inf), 2)
    s_hi = np.tile(np.asarray(xmax, float) if xmax is not None
                   else np.full(nx, np.inf), 2)
    lbi = np.concatenate(
        ([] if y_free else y_rows_lo)
        + ([np.asarray(b.Dumin if b.Dumin is not None else np.full(nu, -np.inf), float).reshape(-1)]
           if du_bounds else [])
        + ([np.full(ng_user, -np.inf)] if ng_user else [])
        + ([s_lo] if ni_coll else [])) if ni else np.zeros(0)
    ubi = np.concatenate(
        ([] if y_free else y_rows_hi)
        + ([np.asarray(b.Dumax if b.Dumax is not None else np.full(nu, np.inf), float).reshape(-1)]
           if du_bounds else [])
        + ([np.zeros(ng_user)] if ng_user else [])
        + ([s_hi] if ni_coll else [])) if ni else np.zeros(0)

    lbx = np.concatenate([xmin if xmin is not None else np.full(nx, -np.inf),
                          np.full(nup, -np.inf),
                          np.zeros(ns)])                      # carried Sl >= 0
    ubx = np.concatenate([xmax if xmax is not None else np.full(nx, np.inf),
                          np.full(nup + ns, np.inf)])
    lbu = np.concatenate(
        [np.asarray(umin, float).reshape(-1) if umin is not None else np.full(nu, -np.inf),
         np.zeros(ns)])                                       # Sl >= 0
    ubu = np.concatenate(
        [np.asarray(umax, float).reshape(-1) if umax is not None else np.full(nu, np.inf),
         np.full(ns, np.inf)])

    def x0_of_p(p):
        parts = [p["x0"]]
        if du_coupled:
            parts.append(p["um1"])
        if slacks:
            parts.append(jnp.zeros(ns, dtype=p["x0"].dtype))  # inert slot
        return jnp.concatenate(parts) if len(parts) > 1 else p["x0"]

    # --- per-variable scaling from the box bounds (f32-critical: the
    # reference problems mix states ~1e2 with states ~1e-1).  Internally the
    # solver works in scaled variables x~ = x / sxa; results are unscaled.
    def _scales(lo, hi):
        mag = np.maximum(np.abs(np.where(np.isfinite(lo), lo, 0.0)),
                         np.abs(np.where(np.isfinite(hi), hi, 0.0)))
        return np.where(mag > 1.0, mag, 1.0)

    sxa = _scales(lbx, ubx)
    su = _scales(lbu, ubu)
    si = _scales(lbi, ubi)

    sxa_j = jnp.asarray(sxa)
    su_j = jnp.asarray(su)
    si_j = jnp.asarray(si)

    raw_dyn, raw_cost, raw_cost_N, raw_ineq, raw_x0 = dyn, cost, cost_N, ineq, x0_of_p

    def dyn_s(xa, u, k, p):
        return raw_dyn(sxa_j * xa, su_j * u, k, p) / sxa_j

    def cost_s(xa, u, k, p):
        return raw_cost(sxa_j * xa, su_j * u, k, p)

    def cost_N_s(xa, p):
        return raw_cost_N(sxa_j * xa, p)

    if ineq is not None:
        def ineq_s(xa, u, k, p):
            return raw_ineq(sxa_j * xa, su_j * u, k, p) / si_j
    else:
        ineq_s = None

    raw_eq = eq
    if eq is not None:
        def eq_s(xa, u, k, p):
            return raw_eq(sxa_j * xa, su_j * u, k, p)
    else:
        eq_s = None

    def x0_s(p):
        return raw_x0(p) / sxa_j

    # terminal equality x_N = xs (QForm) / x_N = 0 (no QForm — the
    # reference's literal semantics, Control_Calc.py:196-198: the shift by
    # xs happens only under QForm); applies to the TRUE state slots of the
    # augmented terminal state, in scaled units
    n_tc = nx if cfg.TermCons else 0
    if n_tc:
        sx_x = jnp.asarray(sxa[:nx])

        def tc_target(p):
            if cfg.QForm:
                return p["xs"] / sx_x
            return jnp.zeros(nx, dtype=jnp.result_type(p["xs"]))
    else:
        tc_target = None

    # --- fast batched dynamics sweep (value + Jacobians for all N stages
    # in one lane-packed pass) for plain-shooting continuous models — the
    # configuration of every throughput-critical workload.  The augmented
    # rows (u_prev carry, shared-slack carry) have constant Jacobian
    # structure assembled here; only the RK4 rollout itself needs AD.
    stage_dyn_jac = None
    if ((not colloc) and (not cont_form)
            and isinstance(cfg.model, (ContinuousModel, DiscreteModel))
            and _fast_sweep_on(batch_hint)):
        from mpc_code_tpu.ops.integrators import map_stage_jac, rk4_stage_jac

        m = cfg.model
        if isinstance(m, ContinuousModel):
            _ufx = m.fx

            def _ode(xx, tt, uu, dd, pp):
                return _ufx(xx, uu, dd, tt, pp)

            # MPC_TPU_SWEEP_AUTOTUNE=1: probe pallas/lanes/jacfwd on the
            # actual model at the hinted batch shapes and pin the winner
            # (cached; round-4 VERDICT item 7 — no frozen crossover)
            _impl = None
            if (os.environ.get("MPC_TPU_SWEEP_AUTOTUNE", "0") == "1"
                    and batch_hint is not None):
                from mpc_code_tpu.ops.sweep_autotune import (
                    autotune_sweep_impl,
                )

                _impl = autotune_sweep_impl(
                    _ode, getattr(m, "Mx", 10), m.clip_lo, m.clip_hi,
                    int(batch_hint), cfg.N, nx, nu, cfg.npx, cfg.nd,
                    verbose=True)
            # the saturation guard rides as scalar bounds so the fused
            # Pallas sweep can apply it from literals; the XLA paths
            # compose it (integrators._compose_clip)
            _sj_cont = rk4_stage_jac(_ode, getattr(m, "Mx", 10),
                                     clip_lo=m.clip_lo, clip_hi=m.clip_hi,
                                     impl=_impl)
            _sj_disc = None
        else:
            _sj_cont = None
            _sj_disc = map_stage_jac(m.Fx)
        _Bd_j = (jnp.asarray(np.asarray(cfg.dist.Bd, float))
                 if (cfg.dist.offree == "lin" and cfg.dist.Bd is not None)
                 else None)
        _lin_par = cfg.LinPar
        _h = cfg.h
        _Nh = cfg.N

        def stage_dyn_jac(Xs, Us, p):
            dtype = Xs.dtype
            xa = Xs * sxa_j
            uu = Us * su_j
            x = xa[:, :nx]
            u_real = uu[:, :nu]
            t = jnp.asarray(p["t"], dtype=dtype)
            if _sj_cont is not None:
                h_ = jnp.asarray(_h, dtype=dtype)
                xf, Jx, Ju = _sj_cont(x, u_real, p["px"], t, h_, p["d"])
            else:
                xf, Jx, Ju = _sj_disc(x, u_real, p["px"], t, p["d"])
            if _Bd_j is not None:
                xf = xf + _Bd_j.astype(dtype) @ p["d"]
            if _lin_par:
                xf = xf + p["px"]
            parts = [xf]
            if du_coupled:
                parts.append(u_real)
            if slacks:
                k_is0 = (jnp.arange(_Nh) == 0)[:, None]
                parts.append(jnp.where(k_is0, uu[:, nu:], xa[:, nx + nup:]))
            dval_u = jnp.concatenate(parts, axis=1) if len(parts) > 1 else xf
            A = jnp.zeros((_Nh, nxa, nxa), dtype).at[:, :nx, :nx].set(Jx)
            Bm = jnp.zeros((_Nh, nxa, nu_eff), dtype).at[:, :nx, :nu].set(Ju)
            if du_coupled:
                Bm = Bm.at[:, nx:nx + nu, :nu].set(jnp.eye(nu, dtype=dtype))
            if slacks:
                r0 = nx + nup
                eye_s = jnp.eye(ns, dtype=dtype)
                k_is0 = (jnp.arange(_Nh) == 0)[:, None, None]
                A = A.at[:, r0:, r0:].set(jnp.where(k_is0, 0.0, eye_s))
                Bm = Bm.at[:, r0:, nu:].set(jnp.where(k_is0, eye_s, 0.0))
            dval_s = dval_u / sxa_j
            A_s = A * (sxa_j[None, None, :] / sxa_j[None, :, None])
            B_s = Bm * (su_j[None, None, :] / sxa_j[None, :, None])
            return dval_s, A_s, B_s

    # ContForm: joint rollout sweep — dynamics Jacobians and the quadrature
    # cost's gradient/exact Hessian from the same lane-packed pass (the
    # ENMPC/economic transcription's whole derivative cost lives in this
    # rollout).  No augmentation here: ContForm forces du_coupled off, and
    # the shared-slack augmentation keeps the generic path.
    stage_cf = None
    # the ContForm joint sweep has a fused Pallas kernel since round 5
    # (rk4_quad_stage_hess_pallas) — pallas_ok governs the all-regimes
    # engagement exactly like the plain dynamics sweep
    if cont_form and not slacks and _fast_sweep_on(batch_hint):
        from mpc_code_tpu.ops.integrators import rk4_quad_stage_hess

        _sw_cf = rk4_quad_stage_hess(_ode, _quad, Mx_c)
        _h_cf = cfg.h

        def stage_cf(Xs, Us, p):
            dtype = Xs.dtype
            x = (Xs * sxa_j)[:, :nx]
            u = (Us * su_j)[:, :nu]
            t = jnp.asarray(p["t"], dtype=dtype)
            h_ = jnp.asarray(_h_cf, dtype=dtype)
            xf, Jx, Ju, qv, gq, Hq = _sw_cf(
                x, u, p["px"], p["py"], t, h_, p["d"], p["xs"], p["us"])
            dval = xf / sxa_j
            A = Jx * (sxa_j[None, None, :] / sxa_j[None, :, None])
            Bm = Ju * (su_j[None, None, :] / sxa_j[None, :, None])
            sc = jnp.concatenate([sxa_j, su_j]).astype(dtype)
            gq_s = gq * sc
            Hq_s = Hq * (sc[None, :, None] * sc[None, None, :])
            return dval, A, Bm, qv, gq_s, Hq_s

    return StructuredOCP(N=cfg.N, nxa=nxa, nu=nu_eff, ni=ni, dyn=dyn_s, cost=cost_s,
                         cost_N=cost_N_s, ineq=ineq_s,
                         lbi=lbi / si, ubi=ubi / si,
                         lbx=lbx / sxa, ubx=ubx / sxa,
                         lbu=lbu / su, ubu=ubu / su,
                         x0_of_p=x0_s, sxa=sxa, su=su, si=si,
                         ns=ns, nu_ctrl=nu, n_tc=n_tc, tc_target=tc_target,
                         n_eq=nh_user, eq=eq_s, stage_dyn_jac=stage_dyn_jac,
                         stage_cf=stage_cf)


def _riccati_eqstage(Hs, q, A, B, rd, PN, pN, Cz, hv, *, nxa, nu, n_eq):
    """Riccati backward/forward pass with per-stage equality rows.

    Each stage carries the user equality linearization
        Cx dx + Cu du + hv = 0,   Cz = [Cx  Cu]  (n_eq, nxa+nu)
    and the stage subproblem is the bordered KKT system

        [Quu  Cu'] [du]   [-(qu + Qux dx)]
        [Cu    0 ] [mu] = [-(hv + Cx dx)]

    eliminated via the Schur complement S = Cu Quu^{-1} Cu' (PD when Cu has
    full row rank; a failed Cholesky flips `ok` for the caller's delta
    bump).  The constrained value function stays quadratic:
        K  = -Quu^{-1} (Qux + Cu' S^{-1} Cx~)
        kf = -Quu^{-1} (qu  + Cu' S^{-1} h~)
        Cx~ = Cx - Cu Quu^{-1} Qux,   h~ = hv - Cu Quu^{-1} qu
        P  = Qxx + Qxu K + K'Qux + K'Quu K
        p  = qx + Qxu kf + K'(qu + Quu kf)
    Forward rollout recovers du and the stage multipliers
    mu_k = S^{-1}(Cx~ dx_k + h~).  Replaces the dense transcription's H_eq
    rows (Control_Calc.py:140-145) without a dense KKT factorization.
    """
    N = Hs.shape[0]
    dtype = Hs.dtype
    eps_s = 100.0 * jnp.finfo(dtype).eps

    def bk(carry, inp):
        P, pv, ok = carry
        Hk, qk, Ak, Bk, rdk, Czk, hvk = inp
        Cx, Cu = Czk[:, :nxa], Czk[:, nxa:]
        Qxx = Hk[:nxa, :nxa] + Ak.T @ P @ Ak
        Quu = Hk[nxa:, nxa:] + Bk.T @ P @ Bk
        Qxu = Hk[:nxa, nxa:] + Ak.T @ P @ Bk
        Pr = pv + P @ rdk
        qx = qk[:nxa] + Ak.T @ Pr
        qu = qk[nxa:] + Bk.T @ Pr
        L = _schol(Quu)
        ok = ok & jnp.all(jnp.isfinite(L))
        cho = lambda rhs: _scho_solve(L, rhs)
        Qi_ux = cho(Qxu.T)                      # Quu^-1 Qux
        Qi_qu = cho(qu)
        Qi_Cut = cho(Cu.T)                      # Quu^-1 Cu'
        S = Cu @ Qi_Cut
        S = 0.5 * (S + S.T) + eps_s * jnp.eye(n_eq, dtype=dtype)
        Ls = _schol(S)
        ok = ok & jnp.all(jnp.isfinite(Ls))
        chos = lambda rhs: _scho_solve(Ls, rhs)
        Cxt = Cx - Cu @ Qi_ux                   # Cx~
        ht = hvk - Cu @ Qi_qu                   # h~
        Si_Cxt = chos(Cxt)
        Si_ht = chos(ht)
        Kk = -(Qi_ux + Qi_Cut @ Si_Cxt)
        kk = -(Qi_qu + Qi_Cut @ Si_ht)
        P_new = Qxx + Qxu @ Kk + Kk.T @ Qxu.T + Kk.T @ Quu @ Kk
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + Qxu @ kk + Kk.T @ (qu + Quu @ kk)
        return (P_new, p_new, ok), (Kk, kk, Si_Cxt, Si_ht, P, pv)

    (_, _, ok), (Ks, kf, Si_Cxt, Si_ht, P_seq, p_seq) = lax.scan(
        bk, (PN, pN, jnp.asarray(True)), (Hs, q, A, B, rd, Cz, hv),
        reverse=True)

    def fwd(dx, inp):
        Kk, kk, SiC, Sih, Ak, Bk, rdk = inp
        du = kk + Kk @ dx
        mu_k = SiC @ dx + Sih
        dx_next = Ak @ dx + Bk @ du + rdk
        return dx_next, (dx, du, mu_k)

    dxN, (dX_head, dU, mu_seq) = lax.scan(
        fwd, jnp.zeros(nxa, dtype=dtype), (Ks, kf, Si_Cxt, Si_ht, A, B, rd))
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return ok, Ks, kf, P_seq, p_seq, mu_seq, dX, dU


def _riccati_tc(Hs, q, A, B, rd, PN, pN, rT, *, nxa, nu, n_tc):
    """Equality-constrained Riccati backward/forward pass (one lane).

    Handles the terminal equality dx_N[:n_tc] + rT = 0 exactly by carrying
    the value function's affine dependence on the terminal multiplier xi:

        V_k(dx, xi) = 1/2 dx'P dx + p'dx + xi'(F dx + f) + 1/2 xi'Hm xi

    with terminal element (PN, pN, F=[I 0], f=rT, Hm=0).  Eliminating u
    stagewise yields the standard Riccati update for (P, p) plus

        F_k  = F A + (F B) K          f_k  = f + F r + (F B) kf
        Hm_k = Hm - (F B) Quu^{-1} (F B)'

    At the root (dx_0 = 0) stationarity over xi gives Hm_0 xi = -f_0; the
    forward rollout then uses du = kf + K dx + Kxi xi with
    Kxi = -Quu^{-1} (F B)'.  Multiplier recovery:
    lam_k = P_{k+1} dx_{k+1} + p_{k+1} + F_{k+1}' xi.

    Replaces the terminal equality rows of the reference OCP
    (Control_Calc.py:197-198) without a dense KKT factorization.
    Hm_0 is negative definite when the constrained system is reachable;
    an indefinite/singular Hm_0 flips `ok` (triggering the caller's
    regularization bump), exactly like a failed Quu Cholesky.
    """
    N = Hs.shape[0]
    dtype = Hs.dtype
    F_N = jnp.zeros((n_tc, nxa), dtype).at[:, :n_tc].set(jnp.eye(n_tc, dtype=dtype))

    def bk(carry, inp):
        P, pv, F, fv, Hm, ok = carry
        Hk, qk, Ak, Bk, rdk = inp
        Qxx = Hk[:nxa, :nxa] + Ak.T @ P @ Ak
        Quu = Hk[nxa:, nxa:] + Bk.T @ P @ Bk
        Qxu = Hk[:nxa, nxa:] + Ak.T @ P @ Bk
        Pr = pv + P @ rdk
        qx = qk[:nxa] + Ak.T @ Pr
        qu = qk[nxa:] + Bk.T @ Pr
        L = _schol(Quu)
        ok = ok & jnp.all(jnp.isfinite(L))
        cho = lambda rhs: _scho_solve(L, rhs)
        Kk = -cho(Qxu.T)
        kk = -cho(qu)
        FB = F @ Bk
        Kxi = -cho(FB.T)
        P_new = Qxx + Qxu @ Kk
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + Qxu @ kk
        F_new = F @ Ak + FB @ Kk
        f_new = fv + F @ rdk + FB @ kk
        Hm_new = Hm + FB @ Kxi
        Hm_new = 0.5 * (Hm_new + Hm_new.T)
        return (P_new, p_new, F_new, f_new, Hm_new, ok), (Kk, kk, Kxi, P, pv, F)

    carry0 = (PN, pN, F_N, rT, jnp.zeros((n_tc, n_tc), dtype), jnp.asarray(True))
    (_, _, _, f0, Hm0, ok), (Ks, kf, Kxis, P_seq, p_seq, F_seq) = lax.scan(
        bk, carry0, (Hs, q, A, B, rd), reverse=True)

    # xi from Hm_0 xi = -f_0 with -Hm_0 PD (tiny jitter for exact-arithmetic
    # singular cases flows into the ok flag via the Cholesky)
    M = -Hm0
    eps_x = 10.0 * jnp.finfo(dtype).eps * (1.0 + jnp.max(jnp.abs(jnp.diag(M))))
    Lx = _schol(M + eps_x * jnp.eye(n_tc, dtype=dtype))
    ok = ok & jnp.all(jnp.isfinite(Lx))
    xi = _scho_solve(Lx, f0)
    xi = jnp.nan_to_num(xi, nan=0.0, posinf=0.0, neginf=0.0)

    def fwd(dx, inp):
        Kk, kk, Kxi, Ak, Bk, rdk = inp
        du = kk + Kk @ dx + Kxi @ xi
        dx_next = Ak @ dx + Bk @ du + rdk
        return dx_next, (dx, du)

    dxN, (dX_head, dU) = lax.scan(fwd, jnp.zeros(nxa, dtype=dtype),
                                  (Ks, kf, Kxis, A, B, rd))
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return ok, Ks, kf, P_seq, p_seq, F_seq, xi, dX, dU


def _riccati_eqstage_tc(Hs, q, A, B, rd, PN, pN, Cz, hv, rT, *,
                        nxa, nu, n_eq, n_tc):
    """Bordered-stage Riccati WITH the terminal-multiplier recursion — the
    H_eq x TermCons combination.

    Stage gains come from the bordered KKT solve of `_riccati_eqstage`
    (user equality rows eliminated via the Schur complement S = Cu Quu^-1
    Cu'), evaluated for three right-hand sides: the dx coupling (K), the
    constant (kf), and the terminal-multiplier coupling (Kxi, rhs (F B)').
    The value function carries the same affine xi-dependence as
    `_riccati_tc`; by the parametric-QP envelope the composition rules are
    unchanged (mu* sensitivity does not enter because d2L/dxi dmu = 0):

        F_k  = F A + (F B) K      f_k = f + F r + (F B) kf
        Hm_k = Hm + (F B) Kxi

    Stage multipliers gain an xi response: mu_k = S^-1(Cx~ dx + h~) -
    S^-1 Cu Quu^-1 (F B)' xi.  Root solve and recovery as in _riccati_tc.
    """
    N = Hs.shape[0]
    dtype = Hs.dtype
    eps_s = 100.0 * jnp.finfo(dtype).eps
    F_N = jnp.zeros((n_tc, nxa), dtype).at[:, :n_tc].set(jnp.eye(n_tc, dtype=dtype))

    def bk(carry, inp):
        P, pv, F, fv, Hm, ok = carry
        Hk, qk, Ak, Bk, rdk, Czk, hvk = inp
        Cx, Cu = Czk[:, :nxa], Czk[:, nxa:]
        Qxx = Hk[:nxa, :nxa] + Ak.T @ P @ Ak
        Quu = Hk[nxa:, nxa:] + Bk.T @ P @ Bk
        Qxu = Hk[:nxa, nxa:] + Ak.T @ P @ Bk
        Pr = pv + P @ rdk
        qx = qk[:nxa] + Ak.T @ Pr
        qu = qk[nxa:] + Bk.T @ Pr
        L = _schol(Quu)
        ok = ok & jnp.all(jnp.isfinite(L))
        cho = lambda rhs: _scho_solve(L, rhs)
        Qi_Cut = cho(Cu.T)
        S = Cu @ Qi_Cut
        S = 0.5 * (S + S.T) + eps_s * jnp.eye(n_eq, dtype=dtype)
        Ls = _schol(S)
        ok = ok & jnp.all(jnp.isfinite(Ls))
        chos = lambda rhs: _scho_solve(Ls, rhs)

        def bordered(g, e):
            # du = -(Quu^-1 g + Quu^-1 Cu' S^-1 (e - Cu Quu^-1 g)),
            # mu-response = S^-1 (e - Cu Quu^-1 g)
            w = cho(g)
            s_r = chos(e - Cu @ w)
            return -(w + Qi_Cut @ s_r), s_r

        FB = F @ Bk
        Kk, Si_Cxt = bordered(Qxu.T, Cx)
        kk, Si_ht = bordered(qu, hvk)
        Kxi, Si_Cxi = bordered(FB.T, jnp.zeros((n_eq, n_tc), dtype=dtype))
        P_new = Qxx + Qxu @ Kk + Kk.T @ Qxu.T + Kk.T @ Quu @ Kk
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + Qxu @ kk + Kk.T @ (qu + Quu @ kk)
        F_new = F @ Ak + FB @ Kk
        f_new = fv + F @ rdk + FB @ kk
        Hm_new = Hm + FB @ Kxi
        Hm_new = 0.5 * (Hm_new + Hm_new.T)
        return ((P_new, p_new, F_new, f_new, Hm_new, ok),
                (Kk, kk, Kxi, Si_Cxt, Si_ht, Si_Cxi, P, pv, F))

    carry0 = (PN, pN, F_N, rT, jnp.zeros((n_tc, n_tc), dtype), jnp.asarray(True))
    ((_, _, _, f0, Hm0, ok),
     (Ks, kf, Kxis, Si_Cxt, Si_ht, Si_Cxi, P_seq, p_seq, F_seq)) = lax.scan(
        bk, carry0, (Hs, q, A, B, rd, Cz, hv), reverse=True)

    M = -Hm0
    eps_x = 10.0 * jnp.finfo(dtype).eps * (1.0 + jnp.max(jnp.abs(jnp.diag(M))))
    Lx = _schol(M + eps_x * jnp.eye(n_tc, dtype=dtype))
    ok = ok & jnp.all(jnp.isfinite(Lx))
    xi = _scho_solve(Lx, f0)
    xi = jnp.nan_to_num(xi, nan=0.0, posinf=0.0, neginf=0.0)

    def fwd(dx, inp):
        Kk, kk, Kxi, SiC, Sih, SiXi, Ak, Bk, rdk = inp
        du = kk + Kk @ dx + Kxi @ xi
        mu_k = SiC @ dx + Sih + SiXi @ xi
        dx_next = Ak @ dx + Bk @ du + rdk
        return dx_next, (dx, du, mu_k)

    dxN, (dX_head, dU, mu_seq) = lax.scan(
        fwd, jnp.zeros(nxa, dtype=dtype),
        (Ks, kf, Kxis, Si_Cxt, Si_ht, Si_Cxi, A, B, rd))
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return ok, Ks, kf, P_seq, p_seq, F_seq, xi, mu_seq, dX, dU


def make_stage_derivs(s: StructuredOCP, hessian: str = "exact",
                      skip_dyn: bool = False,
                      skip_cost: bool = False) -> Callable:
    """Per-stage derivative sweep `(xa, u, k, p, lam_k, nu_k) -> (H, gc, A,
    B, E, ival, Cz, hval, dval)` — the IPM's phase-1 work (cost Hessian/
    gradient, dynamics and inequality Jacobians, plus the primal dynamics/
    constraint values jacfwd evaluates anyway, returned so the solver body
    assembles residuals without a second rollout).  With ``skip_dyn=True``
    (requires ``hessian='gauss_newton'``) the dynamics value/Jacobian are
    omitted — the caller gets them from ``s.stage_dyn_jac`` — and the
    return is the 6-tuple `(H, gc, E, ival, Cz, hval)`.  Exposed at module
    level so the per-phase profiler (`tools/profile_phases.py`) times
    exactly what the solver runs.  `p["_sf"]` is the objective scaling
    factor (1.0 if unscaled).
    """
    if (skip_dyn or skip_cost) and hessian != "gauss_newton":
        raise ValueError("skip_dyn/skip_cost require hessian='gauss_newton' "
                         "(the exact Lagrangian Hessian traverses the "
                         "dynamics)")
    if skip_cost and not skip_dyn:
        raise ValueError("skip_cost implies skip_dyn (the ContForm joint "
                         "sweep provides both)")
    nxa, nu, ni = s.nxa, s.nu, s.ni
    n_eq = s.n_eq
    nz = nxa + nu
    gauss_newton = hessian == "gauss_newton"

    def _cost(xa, u, k, p):
        return p["_sf"] * s.cost(xa, u, k, p)

    def stage_lagrangian(xa, u, k, p, lam_k, nu_k, mu_k):
        val = _cost(xa, u, k, p) + lam_k @ s.dyn(xa, u, k, p)
        if ni:
            val = val + nu_k @ s.ineq(xa, u, k, p)
        if n_eq:
            val = val + mu_k @ s.eq(xa, u, k, p)
        return val

    def stage_derivs(xa, u, k, p, lam_k, nu_k, mu_k=None):
        z = jnp.concatenate([xa, u])

        def c_of_z(zz):
            return _cost(zz[:nxa], zz[nxa:], k, p)

        if skip_cost:
            H = gc = None
        elif gauss_newton:
            # cost curvature only — no Hessian traversal of the dynamics
            # rollout (reference analog: ipopt hessian_constant for QP costs)
            H = jax.hessian(c_of_z)(z)
        else:
            def L_of_z(zz):
                return stage_lagrangian(zz[:nxa], zz[nxa:], k, p,
                                        lam_k, nu_k, mu_k)

            H = jax.hessian(L_of_z)(z)

        if not skip_cost:
            gc = jax.grad(c_of_z)(z)

        if not skip_dyn:
            # one jacfwd over the stacked z=[x;u] with the primal value
            # returned as aux: the dynamics value feeds the defect residual
            # r_d directly, so the solver body never re-rolls the dynamics
            # at the iterate
            def dyn_aux(zz):
                v = s.dyn(zz[:nxa], zz[nxa:], k, p)
                return v, v

            Jd, dval = jax.jacfwd(dyn_aux, has_aux=True)(z)
            Ad, Bd = Jd[:, :nxa], Jd[:, nxa:]
        if ni:
            def ineq_aux(zz):
                v = s.ineq(zz[:nxa], zz[nxa:], k, p)
                return v, v

            E, ival = jax.jacfwd(ineq_aux, has_aux=True)(z)
        else:
            E = jnp.zeros((0, nz))
            ival = jnp.zeros(0)
        if n_eq:
            def eq_aux(zz):
                v = s.eq(zz[:nxa], zz[nxa:], k, p)
                return v, v

            Cz, hval = jax.jacfwd(eq_aux, has_aux=True)(z)
        else:
            Cz = jnp.zeros((0, nz))
            hval = jnp.zeros(0)
        if skip_cost:
            return E, ival, Cz, hval
        if skip_dyn:
            return H, gc, E, ival, Cz, hval
        return H, gc, Ad, Bd, E, ival, Cz, hval, dval

    return stage_derivs


class _SState(NamedTuple):
    X: jnp.ndarray      # (N+1, nxa) — X[0] pinned
    U: jnp.ndarray      # (N, nu)
    S: jnp.ndarray      # (N, ni) slacks
    lam: jnp.ndarray    # (N, nxa) defect multipliers
    nus: jnp.ndarray    # (N, ni) inequality multipliers
    # bound duals for the merged primal Z = [x_{k+1} | u_k | s_k] (row k);
    # x_0 is pinned and carries no duals by construction
    zl: jnp.ndarray     # (N, nxa + nu + ni)
    zu: jnp.ndarray
    mu: jnp.ndarray
    nu_pen: jnp.ndarray
    delta: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    kkt0: jnp.ndarray
    feas: jnp.ndarray
    xi: jnp.ndarray     # (n_tc,) terminal-equality multiplier
    mu_h: jnp.ndarray   # (N, n_eq) user stage-equality multipliers
    # ls_mode='adaptive' carried step controller: last merit + step cap
    psi_prev: jnp.ndarray
    acap: jnp.ndarray
    # best-KKT iterate seen so far (returned if the final iterate is worse —
    # insurance against a late garbage step, e.g. a bound gap collapsing onto
    # the central path's complementarity-consistent non-stationary branch)
    bX: jnp.ndarray
    bU: jnp.ndarray
    bS: jnp.ndarray
    bkkt: jnp.ndarray
    bfeas: jnp.ndarray


def make_structured_solver(s: StructuredOCP, opts: SolverOptions = SolverOptions(),
                           parallel: bool = False) -> Callable:
    """Build ``solve(p, X0, U0) -> StructResult`` (jit/vmap friendly).

    ``parallel=True`` uses the associative-scan Riccati (log-depth value-
    function composition).  Measured on TPU v5e at the reference problem
    sizes (nz<=8, N=50) the sequential recursion is ~4x FASTER end-to-end:
    the parallel merges need batched tiny-LU solves (slow on TPU) and the
    intermediate value-function windows require permanent Hessian
    regularization (more IPM iterations).  Sequential is therefore the
    default; the parallel path remains available for very long horizons.

    X0 (N+1, nxa), U0 (N, nu) warm starts; X0[0] is overwritten by the
    pinned initial state from p.
    """
    if opts.mu_strategy not in ("monotone", "adaptive", "mehrotra"):
        raise ValueError(f"unknown mu_strategy {opts.mu_strategy!r}: "
                         "use 'monotone', 'adaptive' or 'mehrotra'")
    if opts.ls_mode not in ("backtrack", "adaptive"):
        raise ValueError(f"unknown ls_mode {opts.ls_mode!r}: "
                         "use 'backtrack' or 'adaptive'")
    ls_adaptive = opts.ls_mode == "adaptive"
    if opts.hessian not in ("exact", "gauss_newton"):
        raise ValueError(f"unknown hessian {opts.hessian!r}: "
                         "use 'exact' or 'gauss_newton'")
    mehrotra = opts.mu_strategy == "mehrotra"
    N, nxa, nu, ni = s.N, s.nxa, s.nu, s.ni
    nz = nxa + nu
    n_tc = s.n_tc
    termcons = n_tc > 0  # terminal equality: constrained-Riccati KKT path
    n_eq = s.n_eq
    eqcons = n_eq > 0    # user stage equalities: bordered-stage Riccati
    if (termcons or eqcons) and parallel:
        raise ValueError("TermCons / stage equalities (H_eq) are not "
                         "supported with the parallel-scan Riccati variant; "
                         "use the sequential default")

    def _cost(xa, u, k, p):
        return p["_sf"] * s.cost(xa, u, k, p)

    def _cost_N(xa, p):
        return p["_sf"] * s.cost_N(xa, p)

    # fast dynamics sweep: the RK4 value+Jacobian rollout for all stages in
    # one lane-packed pass (continuous-shooting configs, Gauss-Newton
    # Hessian — the throughput path); everything else keeps the generic
    # vmapped jacfwd
    fast_cf = (s.stage_cf is not None and opts.hessian == "gauss_newton")
    fast_sweep = (s.stage_dyn_jac is not None
                  and opts.hessian == "gauss_newton") or fast_cf
    stage_derivs = make_stage_derivs(s, opts.hessian, skip_dyn=fast_sweep,
                                     skip_cost=fast_cf)
    v_stage = jax.vmap(stage_derivs, in_axes=(0, 0, 0, None, 0, 0, 0))
    ks = jnp.arange(N)

    # full-output sweep as one fused Pallas kernel per batch tile under
    # vmap on TPU/f32 (identical per-lane semantics to v_stage; see
    # sweep_kernel.py).  Strictly OPT-IN: the wrapper changes XLA's fusion
    # even when its rule falls back to the plain sweep (chip-measured 14x
    # cliff at B=16384 — sweep_kernel.sweep_opt_in docstring).
    from mpc_code_tpu.solver.sweep_kernel import make_stage_sweep, sweep_opt_in

    sweep_full = (make_stage_sweep(stage_derivs, N)
                  if (not fast_sweep and sweep_opt_in()) else None)

    from mpc_code_tpu.solver.riccati_kernel import make_riccati_kkt

    # fused backward+forward Riccati: per-lane sequential scan when
    # unbatched; a single Pallas kernel per 128-lane tile under vmap on
    # TPU/f32 (see riccati_kernel.py)
    kkt_fused = make_riccati_kkt(N, nxa, nu)

    def _mdiv(num, den, mask):
        return jnp.where(mask, num / jnp.where(mask, den, 1.0), 0.0)

    def solve(p, X0, U0, ws=None, max_iter=None) -> StructResult:
        dtype = jnp.result_type(jnp.asarray(U0).dtype, jnp.float32)
        f32 = jnp.finfo(dtype).eps > 1e-10
        tiny = 1e-30 if f32 else 1e-300

        lbx = jnp.asarray(s.lbx, dtype=dtype)
        ubx = jnp.asarray(s.ubx, dtype=dtype)
        lbu = jnp.asarray(s.lbu, dtype=dtype)
        ubu = jnp.asarray(s.ubu, dtype=dtype)
        lbi = jnp.asarray(s.lbi, dtype=dtype)
        ubi = jnp.asarray(s.ubi, dtype=dtype)
        INF = 1e18
        hlx = lbx > -INF
        hux = ubx < INF
        hlu = lbu > -INF
        huu = ubu < INF
        hli = lbi > -INF
        hui = ubi < INF

        # --- merged bound family: all box-bounded primal variables ride ONE
        # (N, nzs) array Z = [x_{k+1} | u_k | s_k] (row k), so every piece of
        # bound/dual algebra (complementarity, sigma, barrier gradient, dual
        # steps, fraction-to-boundary, dual clipping) is a single fused op
        # family instead of six — the IPM body's op count, not its FLOPs, is
        # what bounds wall time at bench batch sizes (BASELINE.md round-3
        # per-phase table).  x_0 is pinned (never has duals) and drops out
        # naturally because Z carries X[1:].
        nzs = nxa + nu + ni
        lbz = jnp.concatenate([lbx, lbu, lbi])
        ubz = jnp.concatenate([ubx, ubu, ubi])
        hlz = lbz > -INF
        huz = ubz < INF

        def mkZ(X_, U_, S_):
            return jnp.concatenate([X_[1:], U_, S_], axis=1)

        x0a = s.x0_of_p(p).astype(dtype)
        tc_tgt = s.tc_target(p).astype(dtype) if termcons else None
        mu0 = jnp.asarray(opts.mu_init, dtype=dtype)
        sxa_j = jnp.asarray(s.sxa, dtype=dtype)
        su_j = jnp.asarray(s.su, dtype=dtype)

        def push(z, lb, ub, hl, hu):
            pl = jnp.minimum(1e-2 * jnp.maximum(1.0, jnp.abs(lb)),
                             1e-2 * jnp.where(hu, ub - lb, jnp.inf))
            pu = jnp.minimum(1e-2 * jnp.maximum(1.0, jnp.abs(ub)),
                             1e-2 * jnp.where(hl, ub - lb, jnp.inf))
            zlo = jnp.where(hl, lb + pl, -jnp.inf)
            zhi = jnp.where(hu, ub - pu, jnp.inf)
            return jnp.clip(z, zlo, zhi)

        # warm starts arrive in user units; work internally in scaled units
        X0 = jnp.nan_to_num(jnp.asarray(X0, dtype=dtype), nan=0.0, posinf=0.0, neginf=0.0)
        U0 = jnp.nan_to_num(jnp.asarray(U0, dtype=dtype), nan=0.0, posinf=0.0, neginf=0.0)
        X_init = X0 / sxa_j
        X_init = X_init.at[1:].set(push(X_init[1:], lbx, ubx, hlx, hux))
        X_init = X_init.at[0].set(x0a)
        U_init = push(jnp.asarray(U0, dtype=dtype) / su_j, lbu, ubu, hlu, huu)
        # gradient-based objective scaling (IPOPT gmax=100 analog)
        p_unit = {**p, "_sf": jnp.asarray(1.0, dtype=dtype)}

        def _c0(zz, k):
            return s.cost(zz[:nxa], zz[nxa:], k, p)

        g0 = jax.vmap(jax.grad(_c0), in_axes=(0, 0))(
            jnp.concatenate([X_init[:N], U_init], axis=1), ks)
        gN0 = jax.grad(lambda xx: s.cost_N(xx, p))(X_init[N])
        gmax0 = jnp.maximum(jnp.max(jnp.abs(g0), initial=0.0),
                            jnp.max(jnp.abs(gN0), initial=0.0))
        sf = jnp.minimum(1.0, 100.0 / jnp.maximum(gmax0, 1e-8)).astype(dtype)
        p = {**p, "_sf": sf}

        if ni:
            i0 = jax.vmap(s.ineq, in_axes=(0, 0, 0, None))(X_init[:N], U_init, ks, p)
            S_init = push(i0, lbi, ubi, hli, hui)
        else:
            S_init = jnp.zeros((N, 0), dtype=dtype)

        def dual_init(z, lb, ub, hl, hu):
            zl = jnp.where(hl, jnp.clip(mu0 / jnp.where(hl, z - lb, 1.0), 1e-8, 1e8), 0.0)
            zu = jnp.where(hu, jnp.clip(mu0 / jnp.where(hu, ub - z, 1.0), 1e-8, 1e8), 0.0)
            return zl, zu

        zl0, zu0 = dual_init(mkZ(X_init, U_init, S_init), lbz, ubz, hlz, huz)
        lam0 = jnp.zeros((N, nxa), dtype=dtype)
        nus0 = jnp.zeros((N, ni), dtype=dtype)
        if opts.dual_init == "costate":
            # adjoint recursion at the warm-start rollout: the stagewise
            # least-squares stationarity solution for the defect
            # multipliers (lam_k = qx_{k+1} + A_{k+1}' lam_{k+1},
            # lam_{N-1} = grad Vfin); reuses g0/gN0 from the objective
            # scaling probe, costs one dynamics-Jacobian sweep
            if s.stage_dyn_jac is not None:
                _, A_i, _ = s.stage_dyn_jac(X_init[:N], U_init, p)
            else:
                def _dj(xa, u, k):
                    J = jax.jacfwd(
                        lambda z: s.dyn(z[:nxa], z[nxa:], k, p))(
                            jnp.concatenate([xa, u]))
                    return J[:, :nxa]

                A_i = jax.vmap(_dj)(X_init[:N], U_init, ks)
            qx = (sf * g0[:, :nxa]).astype(dtype)
            lamN = (sf * gN0[:nxa]).astype(dtype)

            def _bwd(lam_next, inp):
                qx_k1, A_k1 = inp
                lam_k = qx_k1 + A_k1.T @ lam_next
                return lam_k, lam_k

            _, lam_head = lax.scan(_bwd, lamN, (qx[1:], A_i[1:]),
                                   reverse=True)
            lam_ls = jnp.concatenate([lam_head, lamN[None]], axis=0)
            lam_ls = jnp.nan_to_num(lam_ls, nan=0.0, posinf=0.0,
                                    neginf=0.0)
            # IPOPT-style safeguard: an exploding LS solution (ignited
            # rollout) is worse than the zero init — drop it wholesale
            lam0 = jnp.where(jnp.max(jnp.abs(lam_ls)) < 1e4, lam_ls, lam0)
        if ws is not None:
            # cross-solve dual/barrier warm start (closed-loop regime).
            # Carried duals are in the PREVIOUS solve's objective scaling;
            # rescale by sf_new/sf_old (stationarity and complementarity
            # both scale linearly with sf).  ws["ok"] gates per lane under
            # vmap (False -> cold init), mirroring IPOPT's
            # warm_start_init_point with bound-multiplier safeguards.
            ws_ok = ws["ok"]
            rs = sf / jnp.maximum(jnp.asarray(ws["sf"], dtype=dtype), 1e-12)

            def _sg(zw, hold):
                zw = jnp.nan_to_num(jnp.asarray(zw, dtype=dtype) * rs,
                                    nan=0.0, posinf=0.0, neginf=0.0)
                return jnp.where(hold, jnp.clip(zw, 1e-8, 1e8), 0.0)

            zl0 = jnp.where(ws_ok, _sg(ws["zl"], hlz), zl0)
            zu0 = jnp.where(ws_ok, _sg(ws["zu"], huz), zu0)
            lam_w = jnp.nan_to_num(jnp.asarray(ws["lam"], dtype=dtype) * rs,
                                   nan=0.0, posinf=0.0, neginf=0.0)
            lam0 = jnp.where(ws_ok, lam_w, lam0)
            if ni:
                nus_w = jnp.nan_to_num(jnp.asarray(ws["nus"], dtype=dtype) * rs,
                                       nan=0.0, posinf=0.0, neginf=0.0)
                nus0 = jnp.where(ws_ok, nus_w, nus0)
            # floor the carried barrier at 1e-6: a converged tight-tol
            # solve leaves mu ~ tol/10 (1e-9 at f64 defaults), and the
            # monotone strategy can only DECREASE mu — starting the next,
            # shifted problem that low strands the iterate off the central
            # path (observed: closed-loop step flagged infeasible on
            # lmpc_nlplant).  IPOPT's warm-start practice likewise re-opens
            # mu moderately.  At the f32 bench tolerances tol/10 >= 1e-4,
            # so this floor changes nothing there.
            mu_w = jnp.clip(jnp.asarray(ws["mu"], dtype=dtype) * rs,
                            jnp.maximum(opts.tol / 10.0, 1e-6), opts.mu_init)
            mu0 = jnp.where(ws_ok, mu_w, mu0)

        st0 = _SState(
            X=X_init, U=U_init, S=S_init,
            lam=lam0,
            nus=nus0,
            zl=zl0, zu=zu0,
            mu=mu0, nu_pen=jnp.asarray(1.0, dtype=dtype),
            delta=jnp.asarray(1e-6 if parallel else 0.0, dtype=dtype),
            it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
            kkt0=jnp.asarray(jnp.inf, dtype=dtype),
            feas=jnp.asarray(jnp.inf, dtype=dtype),
            xi=jnp.zeros(n_tc, dtype=dtype),
            mu_h=jnp.zeros((N, n_eq), dtype=dtype),
            psi_prev=jnp.asarray(jnp.inf, dtype=dtype),
            acap=jnp.asarray(1.0, dtype=dtype),
            bX=X_init, bU=U_init, bS=S_init,
            bkkt=jnp.asarray(jnp.inf, dtype=dtype),
            bfeas=jnp.asarray(jnp.inf, dtype=dtype),
        )

        def residuals(X, U, S):
            Xn = jax.vmap(s.dyn, in_axes=(0, 0, 0, None))(X[:N], U, ks, p)
            r_d = Xn - X[1:]
            if ni:
                r_i = jax.vmap(s.ineq, in_axes=(0, 0, 0, None))(X[:N], U, ks, p) - S
            else:
                r_i = jnp.zeros((N, 0), dtype=dtype)
            r_T = (X[N][:n_tc] - tc_tgt) if termcons else jnp.zeros(0, dtype=dtype)
            if eqcons:
                r_h = jax.vmap(s.eq, in_axes=(0, 0, 0, None))(X[:N], U, ks, p)
            else:
                r_h = jnp.zeros((N, 0), dtype=dtype)
            return r_d, r_i, r_T, r_h

        def total_cost(X, U):
            cs = jax.vmap(_cost, in_axes=(0, 0, 0, None))(X[:N], U, ks, p)
            return jnp.sum(cs) + _cost_N(X[N], p)

        def bar_of(Z):
            # merged log-barrier over every held bound of Z (one op family)
            tl = jnp.where(hlz, jnp.log(jnp.maximum(jnp.where(hlz, Z - lbz, 1.0), tiny)), 0.0)
            tu = jnp.where(huz, jnp.log(jnp.maximum(jnp.where(huz, ubz - Z, 1.0), tiny)), 0.0)
            return jnp.sum(tl) + jnp.sum(tu)

        def barrier_phi(Z, mu, cost_val):
            return cost_val - mu * bar_of(Z)

        def _sweep(st: _SState):
            """Full derivative sweep at the iterate — the IPM's dominant
            phase (round-4 trace: ~76% of the 32 ms iteration wall at
            B=16384)."""
            X, U = st.X, st.U
            qv = None
            if fast_cf:
                E, ival, Cz, hval = v_stage(
                    X[:N], U, ks, p, st.lam, st.nus, st.mu_h)
                dval, A, B, qv, gq_u, Hq_u = s.stage_cf(X[:N], U, p)
                H = p["_sf"] * Hq_u
                gc = p["_sf"] * gq_u
            elif fast_sweep:
                H, gc, E, ival, Cz, hval = v_stage(
                    X[:N], U, ks, p, st.lam, st.nus, st.mu_h)
                dval, A, B = s.stage_dyn_jac(X[:N], U, p)
            elif sweep_full is not None:
                H, gc, A, B, E, ival, Cz, hval, dval = sweep_full(
                    X[:N], U, p, st.lam, st.nus, st.mu_h)
            else:
                H, gc, A, B, E, ival, Cz, hval, dval = v_stage(
                    X[:N], U, ks, p, st.lam, st.nus, st.mu_h)
            return H, gc, A, B, E, ival, Cz, hval, dval, qv

        def _vals(st: _SState):
            """Primal values + cost gradients ONLY (no Jacobian/Hessian
            tangents) — the cheap re-evaluation for stale-derivative
            iterations (opts.sweep_every > 1): one dynamics pass plus one
            reverse cost pass instead of the nxa+nu-tangent jacfwd."""
            def one(xa, u, k):
                z = jnp.concatenate([xa, u])
                gc_k = jax.grad(
                    lambda zz: p["_sf"] * s.cost(zz[:nxa], zz[nxa:], k, p))(z)
                dval_k = s.dyn(xa, u, k, p)
                ival_k = (s.ineq(xa, u, k, p) if ni
                          else jnp.zeros(0, dtype=z.dtype))
                hval_k = (s.eq(xa, u, k, p) if eqcons
                          else jnp.zeros(0, dtype=z.dtype))
                return gc_k, ival_k, hval_k, dval_k

            return jax.vmap(one)(st.X[:N], st.U, ks)

        def ipm_step(st: _SState, H, gc, A, B, E, ival, Cz, hval,
                     dval, qv=None) -> _SState:
            X, U, S = st.X, st.U, st.S
            Z = mkZ(X, U, S)
            # residuals at the iterate, assembled from the sweep's primal
            # values (dval/ival/hval are the dynamics/inequality/equality
            # evaluations jacfwd already produced — no second rollout)
            r_d = dval - X[1:]
            r_i = (ival - S) if ni else jnp.zeros((N, 0), dtype=dtype)
            r_T = (X[N][:n_tc] - tc_tgt) if termcons else jnp.zeros(0, dtype=dtype)
            r_h = hval if eqcons else jnp.zeros((N, 0), dtype=dtype)

            # --- KKT errors at the CURRENT point, assembled algebraically
            # from the stage data already computed (no second derivative
            # sweep; the Lagrangian stationarity is
            # dcost + A'lam + E'nu - lam_{k-1} - bound duals)
            AtL = jnp.einsum("kab,ka->kb", A, st.lam)
            BtL = jnp.einsum("kab,ka->kb", B, st.lam)
            if ni:
                EtZ = jnp.einsum("kia,ki->ka", E, st.nus)
            else:
                EtZ = jnp.zeros((N, nz), dtype=dtype)
            if eqcons:
                CtM = jnp.einsum("kia,ki->ka", Cz, st.mu_h)
                EtZ = EtZ + CtM
            gx_full = gc[:, :nxa] + AtL + EtZ[:, :nxa]
            gu_full = gc[:, nxa:] + BtL + EtZ[:, nxa:]
            gradN = jax.grad(lambda xx: _cost_N(xx, p))(X[N])
            rx = jnp.concatenate(
                [gx_full[1:] - st.lam[: N - 1],
                 (gradN - st.lam[N - 1])[None]], axis=0)
            if termcons:
                # terminal-equality multiplier enters x_N stationarity
                rx = rx.at[N - 1, :n_tc].add(st.xi)
            rs = -st.nus if ni else jnp.zeros((N, 0), dtype=dtype)
            # merged stationarity residual on the Z layout (rows pair
            # x_{k+1} with u_k/s_k — columns never mix, so the row pairing
            # is immaterial for the inf-norm and the dual subtraction)
            stat_z = (jnp.concatenate([rx, gu_full, rs], axis=1)
                      - (st.zl - st.zu))

            # complementarity products' global min/max over all held bound
            # pairs: e_comp(mu) = max|c - mu| = max(cmax - mu, mu - cmin, 0),
            # so evaluating the KKT error at mu AND at 0 costs the array
            # reductions only once
            _inf = jnp.asarray(jnp.inf, dtype=dtype)

            cl_c = (Z - lbz) * st.zl
            cu_c = (ubz - Z) * st.zu
            cmax_all = jnp.maximum(
                jnp.max(jnp.where(hlz, cl_c, -_inf), initial=-jnp.inf),
                jnp.max(jnp.where(huz, cu_c, -_inf), initial=-jnp.inf))
            cmin_all = jnp.minimum(
                jnp.min(jnp.where(hlz, cl_c, _inf), initial=jnp.inf),
                jnp.min(jnp.where(huz, cu_c, _inf), initial=jnp.inf))

            e_stat = jnp.max(jnp.abs(stat_z), initial=0.0)
            # a NaN stationarity residual (f32 overflow in a transient
            # iterate's gradients — observed on chip under Mehrotra) must
            # read as "not converged", not poison kkt_err/best-iterate
            # bookkeeping: NaN compares false everywhere, which would leave
            # kkt0 NaN in the result
            e_stat = jnp.where(jnp.isnan(e_stat), jnp.inf, e_stat)
            e_feas = jnp.maximum(jnp.max(jnp.abs(r_d), initial=0.0),
                                 jnp.max(jnp.abs(r_i), initial=0.0))
            if termcons:
                e_feas = jnp.maximum(e_feas, jnp.max(jnp.abs(r_T), initial=0.0))
            if eqcons:
                e_feas = jnp.maximum(e_feas, jnp.max(jnp.abs(r_h), initial=0.0))
            e_feas = jnp.where(jnp.isnan(e_feas), jnp.inf, e_feas)
            scale = jnp.maximum(100.0, (jnp.sum(jnp.abs(st.lam)) + jnp.sum(jnp.abs(st.nus))
                                        + jnp.sum(st.zl + st.zu))
                                / (N * (nz + ni) + nxa + 1.0)) / 100.0

            def kkt_at(mu_v):
                e_comp = jnp.maximum(
                    jnp.maximum(cmax_all - mu_v, mu_v - cmin_all), 0.0)
                e = jnp.maximum(e_stat / scale,
                                jnp.maximum(e_feas, e_comp / scale))
                # scale/comp can be NaN through transient NaN duals (seen
                # under the Mehrotra corrector on f32): read as "not
                # converged", never as a NaN kkt_err on an accepted lane
                return jnp.where(jnp.isnan(e), jnp.inf, e), e_feas

            e_mu, _ = kkt_at(st.mu)
            e_0, feas = kkt_at(jnp.zeros_like(st.mu))
            done_now = e_0 <= opts.tol
            # best-iterate bookkeeping (see _SState.bX docstring);
            # track_best=False freezes the carries (loop-invariant)
            if opts.track_best:
                better = e_0 < st.bkkt
                bX_n = jnp.where(better, X, st.bX)
                bU_n = jnp.where(better, U, st.bU)
                bS_n = jnp.where(better, S, st.bS)
                bkkt_n = jnp.where(better, e_0, st.bkkt)
                bfeas_n = jnp.where(better, feas, st.bfeas)
            else:
                bX_n, bU_n, bS_n = st.bX, st.bU, st.bS
                bkkt_n, bfeas_n = st.bkkt, st.bfeas
            mu = jnp.where(e_mu <= _KAPPA_EPS * st.mu,
                           jnp.maximum(opts.tol / 10.0,
                                       jnp.minimum(_KAPPA_MU * st.mu, st.mu ** _THETA_MU)),
                           st.mu)
            if opts.mu_strategy == "adaptive":
                # LOQO centrality rule (IPOPT mu_strategy=adaptive analog,
                # quality_function=loqo): mu = sigma * avg-complementarity,
                # sigma = 0.1 min(0.05 (1-xi)/xi, 2)^3 with centrality
                # xi = min_i(c_i)/avg(c_i) over all bound products c_i.
                cv = jnp.concatenate(
                    [jnp.where(hlz, cl_c, jnp.nan).ravel(),
                     jnp.where(huz, cu_c, jnp.nan).ravel()])
                cm = jnp.isfinite(cv)
                m_cnt = jnp.sum(cm)
                avg_c = jnp.sum(jnp.where(cm, cv, 0.0)) / jnp.maximum(m_cnt, 1)
                xi = (jnp.min(jnp.where(cm, cv, jnp.inf), initial=jnp.inf)
                      / jnp.maximum(avg_c, tiny))
                sigma = 0.1 * jnp.minimum(
                    0.05 * (1.0 - xi) / jnp.maximum(xi, 1e-6), 2.0) ** 3
                mu_ad = jnp.clip(sigma * avg_c, opts.tol / 10.0, 1e4)
                mu = jnp.where(m_cnt > 0, mu_ad, mu)

            # barrier sigma (mu-independent) for X (stages 1..N), U, S; the
            # barrier gradient bg is built per-direction from COMPONENTWISE
            # complementarity targets (numerators), so the Mehrotra corrector
            # can inject its mu - dprim*dz second-order terms
            def bg_of(Zc, tl, tu):
                one = jnp.ones_like(Zc)
                return (_mdiv(tl * one, Zc - lbz, hlz)
                        - _mdiv(tu * one, ubz - Zc, huz))

            # merged bound sigma; per-role views below
            sigZ = (_mdiv(st.zl, Z - lbz, hlz) + _mdiv(st.zu, ubz - Z, huz))
            # stage-k x-sigma uses x_k: row 0 is the pinned x_0 (no duals)
            sigX_stage = jnp.concatenate(
                [jnp.zeros((1, nxa), dtype=dtype), sigZ[: N - 1, :nxa]], axis=0)
            sigX_term = sigZ[N - 1, :nxa]
            sigU = sigZ[:, nxa:nxa + nu]
            if ni:
                sigS = jnp.maximum(sigZ[:, nxa + nu:], 1e-12)
            else:
                sigS = jnp.zeros((N, 0), dtype=dtype)

            # slack/inequality elimination (mu-independent Hessian part):
            #   ds = E dz + r_i ;  dnu = sigS*(E dz + r_i) - (bgS + nus)
            # stationarity of S: -nu - zls + zus = 0 -> rhs_s = nus + bgS
            if ni:
                Hs = H + jnp.einsum("kia,ki,kib->kab", E, sigS, E)
            else:
                Hs = H
            # stage Hessian with bound sigmas
            # one merged diag-embed: the (nz,) stage sigma [sig_x_k | sig_u_k]
            Hs = Hs + jnp.eye(nz, dtype=dtype) * jnp.concatenate(
                [sigX_stage, sigU], axis=1)[:, None, :]

            # terminal block (cost part; the barrier gradient joins per
            # direction)
            PN_h = (jax.hessian(lambda xx: _cost_N(xx, p))(X[N])
                    + jnp.diag(sigX_term))
            pN_cost = jax.grad(lambda xx: _cost_N(xx, p))(X[N])

            # --- Riccati backward pass at the carried regularization; a
            # failed factorization skips this iteration and bumps delta
            # (cheaper than a multi-delta ladder every iteration — the Quu
            # blocks are PD almost always on these problems).  The carried
            # delta regularizes the FULL stage Hessian: the parallel
            # composition needs intermediate value-function windows to stay
            # well-posed, which indefinite Lagrangian curvature (lam' d2f)
            # violates unless the x-block is shifted too.
            Hs = Hs + st.delta * jnp.eye(nz, dtype=dtype)
            PN_h = PN_h + st.delta * jnp.eye(nxa, dtype=dtype)

            def backward_par(delta, q, pN_g):
                """Associative-scan Riccati: O(log N) depth of (N, nxa, nxa)
                batched ops instead of an N-step sequential chain — the
                TPU-native formulation (parallel LQT value-function elements
                composing associatively, cf. Sarkka & Garcia-Fernandez,
                'Temporal Parallelization of Dynamic Programming').

                Per-stage element after eliminating u from the stage:
                  Ae = A - B Huu^{-1} Hux      be = r - B Huu^{-1} qu
                  Ce = B Huu^{-1} B'           Je = Hxx - Hxu Huu^{-1} Hux
                  eta = -(qx - Hxu Huu^{-1} qu)
                terminal element (0, 0, 0, -pN, PN).  Reverse inclusive scan
                gives (P_k, p_k) = (J_{k..N}, -eta_{k..N}) for every k.
                """
                eyeA = jnp.eye(nxa, dtype=dtype)
                Huu = Hs[:, nxa:, nxa:]
                Hxu = Hs[:, :nxa, nxa:]
                Hxx = Hs[:, :nxa, :nxa]
                qx_s = q[:, :nxa]
                qu_s = q[:, nxa:]
                L = _schol(Huu)
                ok = jnp.all(jnp.isfinite(L))
                cho = jax.vmap(_scho_solve)
                Hi_ux = cho(L, jnp.swapaxes(Hxu, 1, 2))          # Huu^-1 Hux
                Hi_qu = cho(L, qu_s[..., None])[..., 0]
                Hi_Bt = cho(L, jnp.swapaxes(B, 1, 2))            # Huu^-1 B'
                Ae = A - B @ Hi_ux
                be = r_d - jnp.einsum("kab,kb->ka", B, Hi_qu)
                Ce = B @ Hi_Bt
                Ce = 0.5 * (Ce + jnp.swapaxes(Ce, 1, 2))
                Je = Hxx - Hxu @ Hi_ux
                Je = 0.5 * (Je + jnp.swapaxes(Je, 1, 2))
                eta = -(qx_s - jnp.einsum("kab,kb->ka", Hxu, Hi_qu))

                elems = (
                    jnp.concatenate([Ae, jnp.zeros((1, nxa, nxa), dtype=dtype)]),
                    jnp.concatenate([be, jnp.zeros((1, nxa), dtype=dtype)]),
                    jnp.concatenate([Ce, jnp.zeros((1, nxa, nxa), dtype=dtype)]),
                    jnp.concatenate([eta, -pN_g[None]]),
                    jnp.concatenate([Je, PN_h[None]]),
                )

                def comp(e1, e2):
                    # e1 earlier (i->j), e2 later (j->l)
                    A1, b1, C1, n1, J1 = e1
                    A2, b2, C2, n2, J2 = e2
                    M = eyeA + C1 @ J2                            # (.., nxa, nxa)
                    rhs = jnp.concatenate(
                        [A1, (b1 + jnp.einsum("...ab,...b->...a", C1, n2))[..., None],
                         C1], axis=-1)
                    sol = _ssolve(M, rhs)
                    MA1 = sol[..., :nxa]
                    Mb = sol[..., nxa]
                    MC1 = sol[..., nxa + 1:]
                    A12 = A2 @ MA1
                    b12 = jnp.einsum("...ab,...b->...a", A2, Mb) + b2
                    C12 = A2 @ MC1 @ jnp.swapaxes(A2, -1, -2) + C2
                    C12 = 0.5 * (C12 + jnp.swapaxes(C12, -1, -2))
                    Mt = eyeA + J2 @ C1
                    rhs2 = jnp.concatenate(
                        [(n2 - jnp.einsum("...ab,...b->...a", J2, b1))[..., None],
                         J2 @ A1], axis=-1)
                    sol2 = _ssolve(Mt, rhs2)
                    n12 = jnp.einsum("...ba,...b->...a", A1, sol2[..., 0]) + n1
                    J12 = jnp.swapaxes(A1, -1, -2) @ sol2[..., 1:] + J1
                    J12 = 0.5 * (J12 + jnp.swapaxes(J12, -1, -2))
                    return (A12, b12, C12, n12, J12)

                # associative_scan(reverse=True) feeds fn(higher_index,
                # lower_index); comp expects (earlier, later) — swap.
                suf = lax.associative_scan(lambda a, b: comp(b, a), elems,
                                           reverse=True)
                P_all = suf[4]            # (N+1, nxa, nxa): P_k for k=0..N
                p_all = -suf[3]
                P_nxt = P_all[1:]         # P_{k+1} per stage
                p_nxt = p_all[1:]

                # stage gains from the value-function sequence (vmapped)
                Quu_f = Huu + jnp.swapaxes(B, 1, 2) @ P_nxt @ B
                qu_f = qu_s + jnp.einsum("kba,kb->ka", B,
                                         jnp.einsum("kab,kb->ka", P_nxt, r_d) + p_nxt)
                Qux_f = jnp.swapaxes(Hxu, 1, 2) + jnp.swapaxes(B, 1, 2) @ P_nxt @ A
                Lf = _schol(Quu_f)
                ok = ok & jnp.all(jnp.isfinite(Lf))
                Ks = -cho(Lf, Qux_f)
                kf = -cho(Lf, qu_f[..., None])[..., 0]
                return ok, Ks, kf, P_nxt, p_nxt

            def compute_direction(bgZ_):
                """One KKT solve for a given merged barrier-gradient RHS
                (bgZ_ laid out like Z: [bg_x_{k+1} | bg_u_k | bg_s_k]).

                Reuses the mu-independent Hs/PN_h/sigma factors above; only
                the gradient q/pN_g changes between the Mehrotra predictor
                and corrector, or across mu strategies.
                """
                if ni:
                    # E' (Sigma_s r_i - bg_s): inequality elimination gradient
                    g_extra = jnp.einsum("kia,ki->ka", E, sigS * r_i
                                         - bgZ_[:, nxa + nu:])
                else:
                    g_extra = jnp.zeros((N, nz), dtype=dtype)
                # stage-k gradient rows pair bg at x_k (shifted: row 0 is the
                # pinned x_0, bg=0) with bg at u_k
                bg_q = jnp.concatenate(
                    [jnp.concatenate([jnp.zeros((1, nxa), dtype=dtype),
                                      bgZ_[: N - 1, :nxa]], axis=0),
                     bgZ_[:, nxa:nxa + nu]], axis=1)
                q = gc + g_extra - bg_q
                pN_g = pN_cost - bgZ_[N - 1, :nxa]

                mu_h_new = st.mu_h
                if termcons and eqcons:
                    # bordered stages + terminal multiplier combined
                    (solvable, Ks, kf, P_seq, p_seq, F_seq, xi_new, mu_seq,
                     dX, dU) = _riccati_eqstage_tc(
                        Hs, q, A, B, r_d, PN_h, pN_g, Cz, r_h, r_T,
                        nxa=nxa, nu=nu, n_eq=n_eq, n_tc=n_tc)
                    xi_new = jnp.where(solvable, xi_new, st.xi)
                    mu_h_new = jnp.nan_to_num(mu_seq, nan=0.0,
                                              posinf=0.0, neginf=0.0)
                    mu_h_new = jnp.where(solvable, mu_h_new, st.mu_h)
                elif termcons:
                    # constrained Riccati with terminal multiplier (no Pallas
                    # kernel for this rare configuration — plain vmapped scan)
                    solvable, Ks, kf, P_seq, p_seq, F_seq, xi_new, dX, dU = \
                        _riccati_tc(Hs, q, A, B, r_d, PN_h, pN_g, r_T,
                                    nxa=nxa, nu=nu, n_tc=n_tc)
                    xi_new = jnp.where(solvable, xi_new, st.xi)
                elif eqcons:
                    # bordered-stage Riccati for user stage equalities
                    solvable, Ks, kf, P_seq, p_seq, mu_seq, dX, dU = \
                        _riccati_eqstage(Hs, q, A, B, r_d, PN_h, pN_g,
                                         Cz, r_h, nxa=nxa, nu=nu, n_eq=n_eq)
                    mu_h_new = jnp.nan_to_num(mu_seq, nan=0.0,
                                              posinf=0.0, neginf=0.0)
                    mu_h_new = jnp.where(solvable, mu_h_new, st.mu_h)
                elif parallel:
                    solvable, Ks, kf, P_seq, p_seq = backward_par(st.delta, q, pN_g)
                else:
                    # delta already applied to Hs/PN above; the fused kernel's
                    # own Quu shift stays zero
                    solvable, Ks, kf, P_seq, p_seq, dX, dU = kkt_fused(
                        Hs, q, A, B, r_d, PN_h, pN_g, jnp.zeros((), dtype=dtype))

                if parallel:
                    # forward rollout as an associative scan of affine maps
                    M_aff = A + B @ Ks
                    v_aff = r_d + jnp.einsum("kab,kb->ka", B, kf)

                    def acomp(a, bl):
                        Ma, va = a
                        Mb, vb = bl
                        return (Mb @ Ma, jnp.einsum("...ab,...b->...a", Mb, va) + vb)

                    Mc, vc = lax.associative_scan(acomp, (M_aff, v_aff))
                    dX = jnp.concatenate([jnp.zeros((1, nxa), dtype=dtype), vc],
                                         axis=0)
                    dU = kf + jnp.einsum("kab,kb->ka", Ks, dX[:N])
                if not termcons:
                    xi_new = st.xi
                dX = jnp.nan_to_num(dX, nan=0.0, posinf=0.0, neginf=0.0)
                dU = jnp.nan_to_num(dU, nan=0.0, posinf=0.0, neginf=0.0)

                if ni:
                    dS = jnp.einsum("kia,ka->ki", E,
                                    jnp.concatenate([dX[:N], dU], axis=1)) + r_i
                    # eliminated inequality multipliers (primal-dual):
                    dnu = sigS * dS - (st.nus + bgZ_[:, nxa + nu:])
                    dnu = jnp.nan_to_num(dnu, nan=0.0, posinf=0.0, neginf=0.0)
                else:
                    dS = jnp.zeros((N, 0), dtype=dtype)
                    dnu = dS

                # defect multipliers from the value-function sequence:
                # lam_k = P_{k+1} dx_{k+1} + p_{k+1} (+ F_{k+1}' xi)
                lam_new = jnp.einsum("kab,kb->ka", P_seq, dX[1:]) + p_seq
                if termcons:
                    lam_new = lam_new + jnp.einsum("kia,i->ka", F_seq, xi_new)
                lam_new = jnp.nan_to_num(lam_new, nan=0.0, posinf=0.0, neginf=0.0)
                lam_new = jnp.where(solvable, lam_new, st.lam)
                return (solvable, dX, dU, dS, dnu, lam_new, xi_new, mu_h_new,
                        q, g_extra, pN_g)

            # per-component dual steps for complementarity targets tl/tu
            # (merged Z layout)
            def dz_of(Zc, dZc, tl, tu):
                one = jnp.ones_like(Zc)
                dzl = jnp.where(hlz, -st.zl + _mdiv(tl * one - st.zl * dZc,
                                                    Zc - lbz, hlz), 0.0)
                dzu = jnp.where(huz, -st.zu + _mdiv(tu * one + st.zu * dZc,
                                                    ubz - Zc, huz), 0.0)
                return dzl, dzu

            if mehrotra:
                # --- Mehrotra predictor-corrector ---
                # affine predictor: pure primal-dual Newton (zero
                # complementarity target)
                zero = jnp.zeros((), dtype=dtype)
                (slv_a, dXa, dUa, dSa, _, _, _, _, _, _, _) = compute_direction(
                    jnp.zeros((N, nzs), dtype=dtype))
                dZa = jnp.concatenate([dXa[1:], dUa, dSa], axis=1)
                dzl_a, dzu_a = dz_of(Z, dZa, zero, zero)

                # probe step lengths to the boundary (tau=1)
                al1 = jnp.where(hlz & (dZa < 0),
                                -(Z - lbz) / jnp.where(dZa < 0, dZa, -1.0),
                                jnp.inf)
                au1 = jnp.where(huz & (dZa > 0),
                                (ubz - Z) / jnp.where(dZa > 0, dZa, 1.0),
                                jnp.inf)
                a_p = jnp.minimum(1.0,
                                  jnp.minimum(jnp.min(al1, initial=jnp.inf),
                                              jnp.min(au1, initial=jnp.inf)))
                a_d = jnp.minimum(1.0, jnp.minimum(
                    jnp.min(jnp.where(dzl_a < 0,
                                      -st.zl / jnp.where(dzl_a < 0, dzl_a, -1.0),
                                      jnp.inf), initial=jnp.inf),
                    jnp.min(jnp.where(dzu_a < 0,
                                      -st.zu / jnp.where(dzu_a < 0, dzu_a, -1.0),
                                      jnp.inf), initial=jnp.inf)))

                # average complementarity now and at the affine probe point
                c_cnt = N * (jnp.sum(hlz) + jnp.sum(huz))

                def comp_sum(ap, ad):
                    gl = jnp.where(hlz, (Z + ap * dZa) - lbz, 0.0)
                    gu = jnp.where(huz, ubz - (Z + ap * dZa), 0.0)
                    return (jnp.sum(gl * (st.zl + ad * dzl_a))
                            + jnp.sum(gu * (st.zu + ad * dzu_a)))

                mu_avg = comp_sum(0.0, 0.0) / jnp.maximum(c_cnt, 1)
                mu_aff = comp_sum(a_p, a_d) / jnp.maximum(c_cnt, 1)
                sigma_m = jnp.clip(
                    (mu_aff / jnp.maximum(mu_avg, tiny)) ** 3, 0.0, 1.0)
                mu = jnp.clip(sigma_m * mu_avg, opts.tol / 10.0, 1e4)

                # corrector: componentwise targets mu - dprim*dz_aff
                # (lower) / mu + dprim*dz_aff (upper), clipped to a band
                # around mu — unbounded second-order terms destabilize f32
                # lanes far from the central path (targets <= 0 flip the
                # barrier gradient's sign; huge ones blow up the step)
                def tgt(so):
                    return jnp.clip(mu + so, 0.01 * mu, 100.0 * mu)

                tlz = tgt(-dZa * dzl_a)
                tuz = tgt(dZa * dzu_a)
                bgZ_c = bg_of(Z, tlz, tuz)
            else:
                tlz = tuz = mu
                bgZ_c = bg_of(Z, mu, mu)

            (solvable, dX, dU, dS, dnu, lam_new, xi_new, mu_h_new,
             q, g_extra, pN_g) = compute_direction(bgZ_c)
            bgS = bgZ_c[:, nxa + nu:]  # LS directional derivative uses bgS

            dlam = lam_new - st.lam
            dxi = (xi_new - st.xi) if termcons else st.xi
            dmu_h = mu_h_new - st.mu_h

            # --- fraction to boundary + merit line search ---
            tau = jnp.maximum(_TAU_MIN, 1.0 - mu)

            def ftb(z, dz, lb, ub, hl, hu):
                al = jnp.where(hl & (dz < 0), -tau * (z - lb) / jnp.where(dz < 0, dz, -1.0), jnp.inf)
                au = jnp.where(hu & (dz > 0), tau * (ub - z) / jnp.where(dz > 0, dz, 1.0), jnp.inf)
                return jnp.minimum(jnp.min(al, initial=jnp.inf), jnp.min(au, initial=jnp.inf))

            dZ = jnp.concatenate([dX[1:], dU, dS], axis=1)
            alpha_max = jnp.minimum(1.0, ftb(Z, dZ, lbz, ubz, hlz, huz))

            # dual steps toward the (componentwise) complementarity targets
            dzl, dzu = dz_of(Z, dZ, tlz, tuz)

            def ftb_dual(zl, dzl_):
                return jnp.where(dzl_ < 0, -tau * zl / jnp.where(dzl_ < 0, dzl_, -1.0), jnp.inf)

            ad = jnp.minimum(1.0, jnp.minimum(
                jnp.min(ftb_dual(st.zl, dzl), initial=jnp.inf),
                jnp.min(ftb_dual(st.zu, dzu), initial=jnp.inf)))

            c_norm = (jnp.sum(jnp.abs(r_d)) + jnp.sum(jnp.abs(r_i))
                      + jnp.sum(jnp.abs(r_T)) + jnp.sum(jnp.abs(r_h)))
            lam_inf = jnp.maximum(jnp.max(jnp.abs(lam_new), initial=0.0),
                                  jnp.max(jnp.abs(st.nus + dnu), initial=0.0))
            if termcons:
                lam_inf = jnp.maximum(lam_inf,
                                      jnp.max(jnp.abs(xi_new), initial=0.0))
            if eqcons:
                lam_inf = jnp.maximum(lam_inf,
                                      jnp.max(jnp.abs(mu_h_new), initial=0.0))
            nu_pen = jnp.maximum(1.5 * lam_inf + 1e-4, 0.5 * st.nu_pen)
            if fast_cf and qv is not None:
                # the ContForm sweep already integrated the stage quadrature
                # at the current point — no second cost rollout for psi0
                # (stale-sweep sub-steps pass qv=None and re-roll the cost)
                cost0 = p["_sf"] * jnp.sum(qv) + _cost_N(X[N], p)
            else:
                cost0 = total_cost(X, U)
            phi0 = barrier_phi(Z, mu, cost0)
            psi0 = phi0 + nu_pen * c_norm
            # directional derivative (gradient of phi along step)
            dphi = (jnp.sum((q - g_extra) * jnp.concatenate([dX[:N], dU], axis=1))
                    + pN_g @ dX[N] - (jnp.sum(bgS * dS) if ni else 0.0))
            dpsi = dphi - nu_pen * c_norm
            eps_mach = jnp.finfo(dtype).eps
            slack_tol = 10.0 * eps_mach * (jnp.abs(psi0) + 1.0)
            near_opt = st.kkt0 < 1e-5

            if ls_adaptive:
                # rollout-free nonmonotone step controller (ls_mode=
                # 'adaptive'): no trial-point residual rollouts — the step
                # cap quarters when the merit increased over the previous
                # iteration (evaluated from THIS iteration's sweep, which
                # already produced the residuals) and resets to the full
                # fraction-to-boundary step on decrease.  Bad steps are
                # taken once and damped; the best-KKT iterate bookkeeping
                # returns the best point regardless.
                psi0_c = jnp.where(jnp.isnan(psi0), jnp.inf, psi0)
                increased = ((~jnp.isfinite(psi0_c))
                             | (psi0_c > st.psi_prev + slack_tol))
                acap_n = jnp.where(
                    increased,
                    jnp.maximum(st.acap * 0.25,
                                jnp.asarray(0.5 ** _MAX_BACKTRACK, dtype)),
                    jnp.asarray(1.0, dtype))
                alpha = alpha_max * acap_n
                accepted = jnp.asarray(True)
                psi_keep = psi0_c
                alpha = jnp.where(solvable, alpha, 0.0)
            else:
                acap_n = st.acap
                psi_keep = st.psi_prev

            def ls_cond(c):
                j, acc, _ = c
                return (~acc) & (j < _LS_TRIPS)

            # when the merit overflows (runaway dynamics), fall back to a
            # pure feasibility-reduction test instead of accepting anything
            psi0_finite = jnp.isfinite(psi0)

            def capped(*rs):
                return sum(jnp.sum(jnp.abs(jnp.nan_to_num(
                    r, posinf=1e30, neginf=-1e30))) for r in rs)

            # the a=0 point's residuals are already in r_d/r_i/r_T/r_h — no
            # extra rollout
            c_norm_capped = (None if ls_adaptive
                             else capped(r_d, r_i, r_T, r_h))

            def ls_body(c, alpha_override=None):
                # ONE residual rollout per trial point feeds both the merit
                # test and the feasibility-restoration fallback
                j, _, _ = c
                a = (alpha_max * (0.5 ** _ls_exp(j).astype(dtype))
                     if alpha_override is None else alpha_override)
                Xt = X.at[1:].add(a * dX[1:])
                Ut = U + a * dU
                St = S + a * dS
                rd_t, ri_t, rT_t, rh_t = residuals(Xt, Ut, St)
                mer = barrier_phi(Z + a * dZ, mu, total_cost(Xt, Ut)) + nu_pen * (
                    jnp.sum(jnp.abs(rd_t)) + jnp.sum(jnp.abs(ri_t))
                    + jnp.sum(jnp.abs(rT_t)) + jnp.sum(jnp.abs(rh_t)))
                ok_merit = mer <= psi0 + _ETA_LS * a * dpsi + slack_tol
                ok_resto = capped(rd_t, ri_t, rT_t, rh_t) <= 0.99 * c_norm_capped
                ok = jnp.where(psi0_finite, ok_merit, ok_resto)
                return (j + 1, ok, a)

            if ls_adaptive:
                pass   # alpha/accepted already set by the step controller
            elif opts.ls_parallel:
                # all trial points in ONE vectorized pass; the accepted
                # step is the FIRST ok alpha — identical to the sequential
                # loop's result (which stops at the first acceptance).  The
                # trial set matches the sequential loop exactly: j=0.._LS_TRIPS-1
                # on the two-phase ladder, with the shared unaccepted
                # fallback alpha_max * 0.5**_MAX_BACKTRACK below.
                js = jnp.arange(_LS_TRIPS)
                alphas = alpha_max * (jnp.asarray(0.5, dtype)
                                      ** _ls_exp(js).astype(dtype))

                def ls_trial(a):
                    return ls_body((jnp.asarray(0, jnp.int32), False, a),
                                   alpha_override=a)[1]

                oks = jax.vmap(ls_trial)(alphas)
                any_ok = jnp.any(oks)
                jstar = jnp.argmax(oks)
                accepted = any_ok | near_opt
                alpha = jnp.where(
                    near_opt, alpha_max,
                    jnp.where(any_ok, alphas[jstar],
                              alpha_max * (0.5 ** _MAX_BACKTRACK)))
            else:
                _, accepted, alpha = lax.while_loop(
                    ls_cond, ls_body,
                    (jnp.asarray(0, jnp.int32), near_opt, alpha_max))
                accepted = accepted | near_opt
                alpha = jnp.where(accepted, alpha,
                                  alpha_max * (0.5 ** _MAX_BACKTRACK))
            if not ls_adaptive:
                alpha = jnp.where(solvable, alpha, 0.0)
            delta_floor = 1e-6 if parallel else 0.0
            delta_n = jnp.where(solvable,
                                jnp.maximum(st.delta / 2.0, delta_floor)
                                * (st.delta > 1e-9 if not parallel else True),
                                jnp.maximum(st.delta * 10.0, 1e-5))

            X_n = X.at[1:].add(alpha * dX[1:])
            U_n = U + alpha * dU
            S_n = S + alpha * dS
            lam_n = st.lam + alpha * dlam
            nus_n = st.nus + alpha * dnu
            xi_n = (st.xi + alpha * dxi) if termcons else st.xi
            mu_h_n = st.mu_h + alpha * dmu_h

            # merged dual update + IPOPT kappa_Sigma safeguard clip
            Z_n = Z + alpha * dZ
            ks_sig = 1e6 if f32 else 1e10
            gl_n = jnp.maximum(jnp.where(hlz, Z_n - lbz, 1.0), tiny)
            gu_n = jnp.maximum(jnp.where(huz, ubz - Z_n, 1.0), tiny)
            zl_n = jnp.where(hlz, jnp.clip(st.zl + ad * dzl,
                                           mu / (ks_sig * gl_n),
                                           ks_sig * mu / gl_n), 0.0)
            zu_n = jnp.where(huz, jnp.clip(st.zu + ad * dzu,
                                           mu / (ks_sig * gu_n),
                                           ks_sig * mu / gu_n), 0.0)

            if opts.debug:
                jax.debug.print(
                    "it={it} mu={mu:.2e} a={a:.2e} amax={am:.2e} acc={acc} slv={slv} "
                    "|dX|={ndx:.2e} |dU|={ndu:.2e} nupen={np:.2e} psi0={p0:.3e} "
                    "kkt={k:.3e} feas={f:.2e} done={d}",
                    it=st.it, mu=mu, a=alpha, am=alpha_max, acc=accepted, slv=solvable,
                    ndx=jnp.max(jnp.abs(dX)), ndu=jnp.max(jnp.abs(dU)),
                    np=nu_pen, p0=psi0, k=e_0, f=feas, d=done_now)

            new = _SState(X=X_n, U=U_n, S=S_n, lam=lam_n, nus=nus_n,
                          zl=zl_n, zu=zu_n, mu=mu, nu_pen=nu_pen,
                          delta=delta_n, it=st.it + 1, done=jnp.asarray(False),
                          kkt0=e_0, feas=feas, xi=xi_n, mu_h=mu_h_n,
                          psi_prev=psi_keep, acap=acap_n,
                          bX=bX_n, bU=bU_n, bS=bS_n, bkkt=bkkt_n, bfeas=bfeas_n)
            stay = st._replace(done=jnp.asarray(True), kkt0=e_0, feas=feas,
                               bX=bX_n, bU=bU_n, bS=bS_n, bkkt=bkkt_n,
                               bfeas=bfeas_n)
            cand = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done_now, a, b), stay, new)
            return jax.tree_util.tree_map(
                lambda o, nn: jnp.where(st.done, o, nn), st, cand)

        def body(st: _SState) -> _SState:
            sw = _sweep(st)
            st1 = ipm_step(st, *sw)
            # stale-derivative iterations (opts.sweep_every = K > 1):
            # after each freshly-linearized step, take K-1 modified-Newton
            # steps reusing the SAME H/A/B/E/Cz with re-evaluated primal
            # values and cost gradients.  A plain `lax.cond` on the
            # iteration parity cannot express this under vmap (a batched
            # predicate executes both branches), so the loop body itself
            # runs K steps per `while` trip; converged lanes no-op through
            # the extras via the same done-gating as always, and the
            # iteration cap is re-applied between sub-steps.
            H, _, A, B, E, _, Cz, _, _, _ = sw
            for _ in range(max(int(opts.sweep_every), 1) - 1):
                gc2, ival2, hval2, dval2 = _vals(st1)
                st2 = ipm_step(st1, H, gc2, A, B, E, ival2, Cz, hval2, dval2)
                st1 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(st1.it >= it_cap, a, b), st1, st2)
            return st1

        # max_iter may be overridden per CALL (traced or python scalar):
        # callers that jit `solve` with the override as a non-static
        # argument share ONE compiled executable across iteration budgets
        # (e.g. bench.py's tight pass-1 cap and its 40-iteration rescue) —
        # compile time is a first-class cost on the remote toolchain
        it_cap = opts.max_iter if max_iter is None else max_iter

        def cond(st):
            return (~st.done) & (st.it < it_cap)

        fin = lax.while_loop(cond, body, st0)
        # fall back to the best-KKT iterate only when the final one is
        # MATERIALLY worse (a late garbage step, e.g. a bound gap collapsing
        # onto the central path's complementarity-consistent non-stationary
        # branch can leave kkt0 orders of magnitude above the best seen).
        # A 10x margin keeps normal convergence — where successive iterates
        # jitter around the floating-point KKT floor while still polishing
        # the primal point — on the final iterate.
        use_best = (fin.bkkt < 0.1 * fin.kkt0) if opts.track_best else jnp.asarray(False)
        X_fin = jnp.where(use_best, fin.bX, fin.X)
        U_fin = jnp.where(use_best, fin.bU, fin.U)
        kkt_fin = jnp.where(use_best, fin.bkkt, fin.kkt0)
        feas_fin = jnp.where(use_best, fin.bfeas, fin.feas)
        status = jnp.where(kkt_fin <= opts.tol, STATUS_SOLVED,
                           jnp.where(feas_fin <= opts.constr_viol_tol,
                                     STATUS_ACCEPTABLE, STATUS_INFEASIBLE)).astype(jnp.int32)
        p1 = {**p, "_sf": jnp.asarray(1.0, dtype=dtype)}
        cs = jax.vmap(s.cost, in_axes=(0, 0, 0, None))(X_fin[:N], U_fin, ks, p1)
        f_val = jnp.sum(cs) + s.cost_N(X_fin[N], p1)
        return StructResult(X=X_fin * sxa_j, U=U_fin * su_j, f=f_val,
                            status=status, iters=fin.it, kkt_err=kkt_fin,
                            feas_err=feas_fin,
                            zl=fin.zl, zu=fin.zu, lam=fin.lam, nus=fin.nus,
                            mu=fin.mu, sf=sf)

    return solve
