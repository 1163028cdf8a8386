"""Solver-level parity on real example first-step NLPs (SURVEY.md §4 item 3).

IPOPT is unavailable in this environment; scipy SLSQP serves as the
independent NLP oracle.  For EVERY example configuration the closed loop's
actual first-step target NLP and OCP NLP inputs are captured (via
`ClosedLoop.first_nlps`) and re-solved by both our IPM and SLSQP; the
ENMPC MHE NLP (Estimator.py:525) is checked the same way at a full window.
Horizons are shortened (the transcription is horizon-uniform) to keep
SLSQP tractable; everything else is the example's own configuration.

A final test pins the f32/Gauss-Newton BENCH operating point against the
f64 exact-Hessian oracle on the bench CSTR problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

from mpc_code_tpu.config import SolverOptions
from mpc_code_tpu.loop import ClosedLoop
from mpc_code_tpu.models import (
    build_model, build_ss_cost, build_stage_cost, build_terminal_cost,
)
from mpc_code_tpu.ocp.shooting import build_ocp
from mpc_code_tpu.ocp.target import build_target
from mpc_code_tpu.solver.ipm import make_solver


_ORACLE_DIR = __import__("pathlib").Path(__file__).parent.parent / "fixtures" / "slsqp_oracle"


def _oracle_digest(nlp, w0, p, lbw, ubw, lbg, ubg, maxiter):
    """Content digest of the NLP *instance*: all numeric data plus the
    NLP functions' behavior at w0 (f, g, grad f) — any change to the
    transcription code or the problem data changes the digest, so cached
    oracle solutions can never go stale silently."""
    import hashlib

    h = hashlib.sha256()
    # jitted: the eager path dispatches thousands of tiny ops (the grad
    # backward pass in particular) and intermittently aborts the process
    # under xdist concurrency
    probe = jax.jit(lambda w, pp: (nlp.f(w, pp), nlp.g(w, pp),
                                   jax.grad(nlp.f)(w, pp)))
    f0_, g0_, gf0_ = probe(jnp.asarray(w0), p)
    f0 = np.asarray(f0_, np.float64)
    g0 = np.asarray(g0_, np.float64)
    gf0 = np.asarray(gf0_, np.float64)
    for a in ([np.asarray(w0, np.float64), np.asarray(lbw, np.float64),
               np.asarray(ubw, np.float64), np.asarray(lbg, np.float64),
               np.asarray(ubg, np.float64),
               np.asarray([maxiter], np.float64), f0, g0, gf0]
              + [np.asarray(v, np.float64) for _, v in sorted(p.items())]):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:24]


def _slsqp(nlp, w0, p, lbw, ubw, lbg, ubg, maxiter=500):
    """scipy SLSQP oracle with a committed on-disk cache.

    The SLSQP solves dominate the suite's wall time (~450 s); their
    results are deterministic functions of the NLP instance, so they are
    memoized under fixtures/slsqp_oracle/ keyed by `_oracle_digest` (data
    AND function behavior).  Set MPC_TPU_SLOW=1 to force re-solving (the
    fresh result overwrites the cache entry).
    """
    import os
    import types

    key = _oracle_digest(nlp, w0, p, lbw, ubw, lbg, ubg, maxiter)
    cache = _ORACLE_DIR / f"{key}.npz"
    if cache.exists() and os.environ.get("MPC_TPU_SLOW", "0") != "1":
        try:
            z = np.load(cache)
            return types.SimpleNamespace(
                x=z["x"], fun=float(z["fun"]), success=bool(z["success"]),
                message=str(z["message"]), free=z["free"])
        except Exception:
            pass  # truncated/corrupt entry (e.g. xdist race) — recompute
    res = _slsqp_solve(nlp, w0, p, lbw, ubw, lbg, ubg, maxiter)
    _ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    # atomic publish: concurrent xdist workers must never observe a
    # half-written npz
    tmp = _ORACLE_DIR / f"{key}.{os.getpid()}.tmp.npz"
    np.savez(tmp, x=res.x, fun=res.fun, success=res.success,
             message=str(res.message), free=res.free)
    os.replace(tmp, cache)
    return res


def _slsqp_solve(nlp, w0, p, lbw, ubw, lbg, ubg, maxiter=500):
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
    Jg = jax.jit(jax.jacfwd(nlp.g))
    Jg_all = lambda wf: np.asarray(Jg(jnp.asarray(full(wf)), p))[:, free]
    # drop constraint rows that became constants (e.g. x0 - X[0] with X[0]
    # pinned): their zero gradients make SLSQP's LSQ subproblem singular
    J0 = Jg_all(np.asarray(w0)[free])
    keep = np.abs(J0).max(axis=1) > 0
    # dropped rows must already sit inside their bounds (equality rows pinned,
    # inequality rows — e.g. stage-0 output bounds on the pinned x0 — satisfied)
    g_const = g_all(np.asarray(w0)[free])[~keep]
    assert (g_const >= lbg[~keep] - 1e-8).all(), "dropped row violates lbg"
    assert (g_const <= ubg[~keep] + 1e-8).all(), "dropped row violates ubg"
    g = lambda wf: g_all(wf)[keep]
    Jk = lambda wf: Jg_all(wf)[keep]
    lbg, ubg = lbg[keep], ubg[keep]
    w0 = np.asarray(w0)[free]
    lbw, ubw = lbw[free], ubw[free]
    cons = []
    eq = lbg == ubg
    if eq.any():
        idx = np.where(eq)[0]
        cons.append({"type": "eq", "fun": lambda w: g(w)[idx] - lbg[idx],
                     "jac": lambda w: Jk(w)[idx]})
    ineq = ~eq
    if ineq.any():
        idx2 = np.where(ineq & np.isfinite(ubg))[0]
        if len(idx2):
            cons.append({"type": "ineq", "fun": lambda w: ubg[idx2] - g(w)[idx2],
                         "jac": lambda w: -Jk(w)[idx2]})
        idx3 = np.where(ineq & np.isfinite(lbg))[0]
        if len(idx3):
            cons.append({"type": "ineq", "fun": lambda w: g(w)[idx3] - lbg[idx3],
                         "jac": lambda w: Jk(w)[idx3]})
    bounds = [(None if not np.isfinite(l) else l, None if not np.isfinite(u) else u)
              for l, u in zip(lbw, ubw)]
    res = sopt.minimize(f, w0, jac=jac, method="SLSQP", constraints=cons,
                        bounds=bounds, options={"maxiter": maxiter, "ftol": 1e-12})
    res.free = free
    return res


def _run_and_check(cfg, u_tol=1e-4):
    """Run the closed loop one step; SLSQP-check its first target + OCP."""
    loop = ClosedLoop(cfg)
    loop.run()
    nx, nu = cfg.nx, cfg.nu

    # --- target NLP (Target_Calc.py:159) ---
    tgt = loop.first_nlps["target"]
    spec = loop.target_spec
    p = {k: jnp.asarray(v) for k, v in tgt["par"].items()}
    ours = jax.jit(make_solver(spec.nlp, cfg.sol_opts_ss))(
        jnp.asarray(tgt["w0"]), p, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    ref = _slsqp(spec.nlp, tgt["w0"], p, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    assert int(ours.status) != 2 and ref.success, (
        f"target: ours={int(ours.status)} slsqp={ref.message}")
    w_ref = np.where(spec.lbw == spec.ubw, spec.lbw, 0.0)
    w_ref[ref.free] = ref.x
    us_scale = max(1.0, np.abs(w_ref[nx:nx + nu]).max())
    if np.abs(np.asarray(ours.w)[nx:nx + nu] - w_ref[nx:nx + nu]).max() \
            >= u_tol * us_scale:
        # nonconvex target (e.g. the ENMPC economic cost): SLSQP from the
        # loop's guess may land in a different local basin.  Verify ours
        # independently instead: polishing OUR solution with SLSQP must not
        # move it (it is a KKT point for the oracle too), and our objective
        # must be at least as good as the oracle's local solution.
        pol = _slsqp(spec.nlp, np.asarray(ours.w), p, spec.lbw, spec.ubw,
                     spec.lbg, spec.ubg)
        assert pol.success, f"target polish: {pol.message}"
        assert np.abs(pol.x - np.asarray(ours.w)[pol.free]).max() < u_tol, (
            "our target solution is not a KKT point for SLSQP")
        assert float(ours.f) <= ref.fun + 1e-8 * max(1.0, abs(ref.fun))

    # --- OCP NLP (Control_Calc.py:258) ---
    ocp = loop.first_nlps["ocp"]
    spec = loop.ocp_spec
    p = {k: jnp.asarray(v) for k, v in ocp["par"].items()}
    ours = jax.jit(make_solver(spec.nlp, cfg.sol_opts_dyn))(
        jnp.asarray(ocp["w0"]), p, ocp["lbw"], ocp["ubw"], spec.lbg, spec.ubg)
    ref = _slsqp(spec.nlp, ocp["w0"], p, ocp["lbw"], ocp["ubw"],
                 spec.lbg, spec.ubg)
    assert int(ours.status) != 2 and ref.success, (
        f"ocp: ours={int(ours.status)} slsqp={ref.message}")
    w_ref = np.where(ocp["lbw"] == ocp["ubw"], ocp["lbw"], 0.0)
    w_ref[ref.free] = ref.x
    st = loop.stride
    u0_ours = np.asarray(ours.w)[st - nu : st]
    u0_ref = w_ref[st - nu : st]
    u_scale = max(1.0, np.abs(u0_ref).max())
    # BASELINE tolerance: <= 1e-4 first-input deviation (scaled)
    assert np.abs(u0_ours - u0_ref).max() < u_tol * u_scale, (
        f"u0 ours={u0_ours} ref={u0_ref}")


def test_parity_lmpc_wb():
    from mpc_code_tpu.examples.lmpc_wb import make_config

    _run_and_check(make_config(Nsim=1).replace(N=8))


def test_parity_lmpc_cstr():
    # early OCPs are genuinely infeasible (x0 pinned outside the output
    # bounds; the reference freezes inputs, MPC_code.py:804-805), so the
    # capture lands on the first *feasible* step (ksim=3 at N=8)
    from mpc_code_tpu.examples.lmpc_cstr import make_config

    _run_and_check(make_config(Nsim=6).replace(N=8))


def test_parity_lmpc_nlplant():
    from mpc_code_tpu.examples.lmpc_nlplant import make_config

    _run_and_check(make_config(Nsim=1).replace(N=8))


def test_parity_lmpcxp_nlplant():
    from mpc_code_tpu.examples.lmpcxp_nlplant import make_config

    _run_and_check(make_config(Nsim=1).replace(N=8))


def test_parity_nmpc():
    from mpc_code_tpu.examples.nmpc import make_config

    _run_and_check(make_config(Nsim=1).replace(N=8))


def test_parity_nmpc_dis():
    from mpc_code_tpu.examples.nmpc_dis import make_config

    _run_and_check(make_config(Nsim=1).replace(N=6))


def test_parity_enmpc():
    from mpc_code_tpu.examples.enmpc import make_config

    _run_and_check(make_config(Nsim=1).replace(N=8))


def test_parity_enmpc_mhe_nlp():
    # the ENMPC MHE NLP at a full window vs SLSQP (Estimator.py:525)
    from mpc_code_tpu.examples.enmpc import make_config

    cfg = make_config(Nsim=6)
    cfg.estimator.N_mhe = 4
    loop = ClosedLoop(cfg)
    loop.run()
    nlp_in = loop.mhe_rt.last_nlp
    N = nlp_in["N"]
    assert N == 4  # full window reached
    spec, _ = loop.mhe_rt._solver(N)
    p = {k: jnp.asarray(v) for k, v in nlp_in["par"].items()}
    ours = jax.jit(make_solver(spec.nlp, cfg.sol_opts_mhe))(
        jnp.asarray(nlp_in["w0"]), p, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    ref = _slsqp(spec.nlp, nlp_in["w0"], p, spec.lbw, spec.ubw,
                 spec.lbg, spec.ubg)
    assert int(ours.status) != 2 and ref.success
    w_ref = np.where(spec.lbw == spec.ubw, spec.lbw, 0.0)
    w_ref[ref.free] = ref.x
    n = loop.mhe_rt.n
    # corrected estimate x(k|k) and predicted x(k+1|k) agree
    assert np.abs(np.asarray(ours.w)[-n:] - w_ref[-n:]).max() < 1e-4
    assert abs(float(ours.f) - ref.fun) < 1e-6 * max(1.0, abs(ref.fun))


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


def test_bench_point_f32_gn_vs_f64_oracle():
    """Pin the bench operating point: f32 Gauss-Newton tol=1e-3 (the chip
    configuration, bench.py) against the f64 exact-Hessian tol=1e-8 oracle
    on the bench CSTR OCP."""
    import dataclasses as dc

    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    N = 50
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4]),
        clip_hi=np.array([2.0, 420.0, 1.0])))
    xs = np.array([0.874317, 325.0, 0.6528])
    us = np.array([300.157, 0.1])
    d = np.array([0.0, 0.1])

    def solve_at(dtype, opts):
        # build inside the dtype regime so every baked constant matches
        # (the chip runs with x64 globally off; emulate that here)
        model = build_model(cfg)
        socp = build_structured_ocp(cfg, model,
                                    build_stage_cost(cfg.stage_cost),
                                    build_terminal_cost(cfg))
        solver = jax.jit(make_structured_solver(socp, opts))
        x0 = np.array([0.6, 330.0, 0.60], dtype)
        par = dict(x0=jnp.asarray(x0), xs=jnp.asarray(xs.astype(dtype)),
                   us=jnp.asarray(us.astype(dtype)),
                   d=jnp.asarray(d.astype(dtype)),
                   um1=jnp.asarray(us.astype(dtype)),
                   t=jnp.asarray(dtype(0.0)),
                   lam=jnp.zeros((cfg.ny, cfg.nu), dtype),
                   px=jnp.zeros((N, cfg.npx), dtype),
                   py=jnp.zeros((N, cfg.npy), dtype))
        X0 = jnp.tile(jnp.asarray(x0), (N + 1, 1))
        U0 = jnp.tile(jnp.asarray(us.astype(dtype)), (N, 1))
        r = solver(par, X0, U0)
        return jax.tree.map(np.asarray, r)

    r64 = solve_at(np.float64, SolverOptions(max_iter=200, tol=1e-8,
                                             hessian="exact"))
    assert int(r64.status) == 0
    U64 = np.asarray(r64.U)
    scale = np.maximum(1.0, np.abs(U64).max(axis=0))

    def rel0_of(r32):
        return (np.abs(np.asarray(r32.U)[0].astype(np.float64) - U64[0])
                / scale).max()

    # (a) the bench operating point (tol=1e-3, 9 warm iters): first-input
    # scaled deviation measured at 8.8e-4 — pin it below 2e-3
    with jax.enable_x64(False):
        r32 = solve_at(np.float32, SolverOptions(max_iter=40, tol=1e-3,
                                                 constr_viol_tol=1e-3,
                                                 hessian="gauss_newton"))
    assert int(r32.status) != 2
    assert rel0_of(r32) < 2e-3, f"bench point dev {rel0_of(r32):.2e}"

    # (b) pushed to tol=1e-4 (KKT floors at the f32 limit ~2e-4 but keeps
    # polishing), f32/GN meets the BASELINE 1e-4 first-input tolerance
    # against the f64 exact oracle
    with jax.enable_x64(False):
        r32t = solve_at(np.float32, SolverOptions(max_iter=60, tol=1e-4,
                                                  constr_viol_tol=1e-4,
                                                  hessian="gauss_newton"))
    assert int(r32t.status) != 2
    assert rel0_of(r32t) < 1e-4, f"tight point dev {rel0_of(r32t):.2e}"
