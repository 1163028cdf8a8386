"""Solver-level parity on real example first-step NLPs (SURVEY.md §4 item 3).

IPOPT is unavailable in this environment; scipy SLSQP serves as the
independent NLP oracle on the (small-horizon) first-step problems of actual
example configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize as sopt

from mpc_code_tpu.config import SolverOptions
from mpc_code_tpu.models import (
    build_model, build_ss_cost, build_stage_cost, build_terminal_cost,
)
from mpc_code_tpu.ocp.shooting import build_ocp
from mpc_code_tpu.ocp.target import build_target
from mpc_code_tpu.solver.ipm import make_solver


def _slsqp(nlp, w0, p, lbw, ubw, lbg, ubg):
    # eliminate pinned variables (lbw == ubw) — SLSQP's LSQ subproblem goes
    # singular on degenerate bounds
    fixed = lbw == ubw
    free = ~fixed
    w_fix = np.where(fixed, lbw, 0.0)

    def full(wf):
        w = w_fix.copy()
        w[free] = wf
        return w

    f = lambda wf: float(nlp.f(jnp.asarray(full(wf)), p))
    gf = jax.jit(jax.grad(nlp.f))
    jac = lambda wf: np.asarray(gf(jnp.asarray(full(wf)), p))[free]
    g_all = lambda wf: np.asarray(nlp.g(jnp.asarray(full(wf)), p))
    # drop constraint rows that became constants (e.g. x0 - X[0] with X[0]
    # pinned): their zero gradients make SLSQP's LSQ subproblem singular
    Jg = jax.jit(jax.jacfwd(nlp.g))
    J0 = np.asarray(Jg(jnp.asarray(full(np.asarray(w0)[free])), p))[:, free]
    keep = np.abs(J0).max(axis=1) > 0
    assert (np.abs(g_all(np.asarray(w0)[free])[~keep] - lbg[~keep]) < 1e-12).all()
    g = lambda wf: g_all(wf)[keep]
    lbg, ubg = lbg[keep], ubg[keep]
    w0 = np.asarray(w0)[free]
    lbw, ubw = lbw[free], ubw[free]
    cons = []
    eq = lbg == ubg
    if eq.any():
        idx = np.where(eq)[0]
        cons.append({"type": "eq", "fun": lambda w: g(w)[idx] - lbg[idx]})
    ineq = ~eq
    if ineq.any():
        idx2 = np.where(ineq & np.isfinite(ubg))[0]
        if len(idx2):
            cons.append({"type": "ineq", "fun": lambda w: ubg[idx2] - g(w)[idx2]})
        idx3 = np.where(ineq & np.isfinite(lbg))[0]
        if len(idx3):
            cons.append({"type": "ineq", "fun": lambda w: g(w)[idx3] - lbg[idx3]})
    bounds = [(None if not np.isfinite(l) else l, None if not np.isfinite(u) else u)
              for l, u in zip(lbw, ubw)]
    return sopt.minimize(f, w0, jac=jac, method="SLSQP", constraints=cons,
                         bounds=bounds, options={"maxiter": 500, "ftol": 1e-12})


def test_wb_first_step_ocp_vs_slsqp():
    # Wood-Berry first-step OCP at N=8 (QP: SLSQP is reliable here)
    from mpc_code_tpu.examples.lmpc_wb import make_config

    N = 8
    cfg = make_config().replace(N=N)
    model = build_model(cfg)
    spec = build_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                     build_terminal_cost(cfg))
    nx, nu = cfg.nx, cfg.nu
    nxu = nx + nu
    x0 = np.zeros(nx)
    xs = np.array([0.233, -0.166, 0.1, -0.08])   # representative targets
    us = np.array([0.03, -0.02])
    p = dict(x0=jnp.asarray(x0), xs=jnp.asarray(xs), us=jnp.asarray(us),
             d=jnp.asarray([0.2, -0.1]), um1=jnp.zeros(nu), t=jnp.asarray(0.0),
             lam=jnp.zeros((cfg.ny, nu)), px=jnp.zeros((N, cfg.npx)),
             py=jnp.zeros((N, cfg.npy)))
    lbw = spec.lbw.copy()
    ubw = spec.ubw.copy()
    lbw[:nx] = ubw[:nx] = x0
    w0 = np.zeros(spec.nw)

    ours = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=100)))(
        jnp.asarray(w0), p, lbw, ubw, spec.lbg, spec.ubg)
    ref = _slsqp(spec.nlp, w0, p, lbw, ubw, spec.lbg, spec.ubg)

    assert int(ours.status) == 0 and ref.success
    w_ours = np.asarray(ours.w)
    u0_ours = w_ours[nx:nxu]
    # ref.x lives in the free-variable space; the first nx (pinned) entries
    # were eliminated, so u0 is at offset 0
    u0_ref = ref.x[:nu]
    # BASELINE tolerance: <= 1e-4 first-input deviation
    assert np.abs(u0_ours - u0_ref).max() < 1e-4
    assert abs(float(ours.f) - ref.fun) < 1e-7 * max(1.0, abs(ref.fun))


def test_enmpc_target_vs_slsqp():
    # economic (nonconvex) steady-state target of Ex_ENMPC
    from mpc_code_tpu.examples.enmpc import make_config

    cfg = make_config()
    model = build_model(cfg)
    spec = build_target(cfg, model, build_ss_cost(cfg.ss_cost))
    p = dict(usp=jnp.zeros(1), ysp=jnp.zeros(2), xsp=jnp.zeros(2),
             d=jnp.zeros(2), us_prev=jnp.zeros(1), lam=jnp.zeros((2, 1)),
             t=jnp.asarray(0.0), px=jnp.zeros(2), py=jnp.zeros(2))
    w0 = np.array([0.5, 0.4, 0.8, 0.5, 0.4])
    ours = jax.jit(make_solver(spec.nlp, SolverOptions(max_iter=100)))(
        jnp.asarray(w0), p, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    ref = _slsqp(spec.nlp, w0, p, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    assert int(ours.status) == 0 and ref.success
    # same economic optimum u* ~ 1.043
    assert abs(float(ours.w[2]) - ref.x[2]) < 1e-5
    assert float(ours.f) <= ref.fun + 1e-8
