"""Per-phase solver profiling at the bench operating point (SURVEY.md §5).

The structured IPM's iteration splits into (1) the stage-derivative sweep
(cost Hessian/gradient + dynamics/inequality Jacobians), (2) the fused
Riccati backward/forward KKT solve, (3) residual assembly, and (4) merit-
function evaluations in the line search.  This tool times each phase in
isolation on representative data — jitted exactly as the solver runs it —
and the full solve for reference, so the per-iteration budget is visible.
(The reference has no analog; its per-phase time disappears inside
CasADi/IPOPT.  SURVEY §5 calls for rollout/derivative/factorize/line-search
timers.)

Usage:
    python tools/profile_phases.py [--batch 2048] [--n 50] [--reps 5]
        [--k 16] [--cpu] [--trace DIR]     # DIR: jax.profiler trace output

Phases are timed on the same batch the bench uses (CSTR NMPC, f32,
Gauss-Newton).  Each phase is repeated K times INSIDE one jitted
dispatch (a lax.scan whose carry perturbs the input, so iterations
cannot be collapsed) and the per-phase cost is the K-vs-1 difference
quotient — on the remote-TPU backend every isolated dispatch pays a
~30 ms tunnel floor that would otherwise swamp phases of a few ms.
`--trace` additionally captures a jax.profiler trace of one full
batched solve for TensorBoard/xprof.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=16,
                    help="in-graph repetitions per phase dispatch (>= 2)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of one solve to DIR")
    args = ap.parse_args()
    if args.k < 2:
        ap.error("--k must be >= 2 (K-vs-1 difference quotient)")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import dataclasses as dc

    import jax.numpy as jnp
    from jax import lax

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_stage_derivs, make_structured_solver,
    )
    from mpc_code_tpu.solver.riccati_kernel import make_riccati_kkt

    N, B = args.n, args.batch
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], np.float32),
        clip_hi=np.array([2.0, 420.0, 1.0], np.float32)))
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    opts = SolverOptions(max_iter=40, tol=1e-3, constr_viol_tol=1e-3,
                         hessian="gauss_newton")
    nxa, nu, ni = socp.nxa, socp.nu, socp.ni
    nz = nxa + nu

    xs = np.array([0.874317, 325.0, 0.6528], np.float32)
    us = np.array([300.157, 0.1], np.float32)

    def make_par(x0):
        return dict(
            x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
            d=jnp.asarray(np.array([0.0, 0.1], np.float32)),
            um1=jnp.asarray(us), t=jnp.asarray(0.0, jnp.float32),
            lam=jnp.zeros((cfg.ny, cfg.nu), jnp.float32),
            px=jnp.zeros((N, cfg.npx), jnp.float32),
            py=jnp.zeros((N, cfg.npy), jnp.float32),
            _sf=jnp.asarray(1.0, jnp.float32),
        )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform([0.3, 318.0, 0.55], [0.95, 340.0, 0.70],
                                  size=(B, 3)).astype(np.float32))

    # representative iterate: scaled warm start (mirror of the solver's own
    # initialization — X/U over horizon in scaled units)
    sxa = jnp.asarray(socp.sxa.astype(np.float32))
    su = jnp.asarray(socp.su.astype(np.float32))
    ks = jnp.arange(N)

    def rep_state(x0):
        Xs_ = jnp.tile((jnp.concatenate([x0, jnp.zeros(nxa - 3)]) / sxa)[None],
                       (N + 1, 1))
        Us_ = jnp.tile((jnp.concatenate([jnp.asarray(us),
                                         jnp.zeros(nu - 2)]) / su)[None],
                       (N, 1))
        return Xs_, Us_

    stage_derivs = make_stage_derivs(socp, opts.hessian)
    v_stage = jax.vmap(stage_derivs, in_axes=(0, 0, 0, None, 0, 0, 0))

    def sweep_one(x0):
        # the GENERIC batch-major jacfwd sweep (kept for comparison)
        p = make_par(x0)
        X, U = rep_state(x0)
        lam = jnp.zeros((N, nxa), jnp.float32)
        nus = jnp.zeros((N, ni), jnp.float32)
        mu_h = jnp.zeros((N, socp.n_eq), jnp.float32)
        return v_stage(X[:N], U, ks, p, lam, nus, mu_h)

    # the lane-packed sweep (opt-in via MPC_TPU_FAST_SWEEP=1) — profiled
    # alongside the default batch-major sweep for A/B comparison
    fast = socp.stage_dyn_jac is not None
    if fast:
        sd_skip = make_stage_derivs(socp, opts.hessian, skip_dyn=True)
        v_skip = jax.vmap(sd_skip, in_axes=(0, 0, 0, None, 0, 0, 0))

        def sweep_fast_one(x0):
            p = make_par(x0)
            X, U = rep_state(x0)
            lam = jnp.zeros((N, nxa), jnp.float32)
            nus = jnp.zeros((N, ni), jnp.float32)
            mu_h = jnp.zeros((N, socp.n_eq), jnp.float32)
            rest = v_skip(X[:N], U, ks, p, lam, nus, mu_h)
            return rest + socp.stage_dyn_jac(X[:N], U, p)

    def residuals_one(x0):
        p = make_par(x0)
        X, U = rep_state(x0)
        Xn = jax.vmap(socp.dyn, in_axes=(0, 0, 0, None))(X[:N], U, ks, p)
        out = [Xn - X[1:]]
        if ni:
            out.append(jax.vmap(socp.ineq, in_axes=(0, 0, 0, None))(X[:N], U, ks, p))
        return out

    def merit_one(x0):
        # cost + residual L1 — one line-search trial evaluation
        p = make_par(x0)
        X, U = rep_state(x0)
        cs = jax.vmap(socp.cost, in_axes=(0, 0, 0, None))(X[:N], U, ks, p)
        val = jnp.sum(cs) + socp.cost_N(X[N], p)
        return val + sum(jnp.sum(jnp.abs(r)) for r in residuals_one(x0))

    kkt = make_riccati_kkt(N, nxa, nu)

    def riccati_one(x0):
        H, gc, A_, B_, E, ival = sweep_one(x0)[:6]
        rd = jnp.zeros((N, nxa), jnp.float32)
        PN = jnp.eye(nxa, dtype=jnp.float32)
        pN = jnp.zeros(nxa, jnp.float32)
        return kkt(H, gc, A_, B_, rd, PN, pN, jnp.zeros((), jnp.float32))

    solve = make_structured_solver(socp, opts)

    def lane(x0):
        p = {k: v for k, v in make_par(x0).items() if k != "_sf"}
        X0 = jnp.tile(x0[None], (N + 1, 1))
        U0 = jnp.tile(jnp.asarray(us)[None], (N, 1))
        return solve(p, X0, U0)

    def timeit(name, fn):
        f = jax.jit(jax.vmap(fn))
        out = f(x0s)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(f(x0s))
            times.append(time.time() - t0)
        best = min(times)
        return name, best

    def timeit_ingraph(name, fn):
        """Per-phase cost free of the per-dispatch floor: run the phase K
        times inside one jit (serialized through a tiny input perturbation)
        and difference against a single-rep dispatch."""

        def leafsum(out):
            return sum(jnp.sum(jnp.asarray(o, jnp.float32))
                       for o in jax.tree_util.tree_leaves(out))

        def rep(k_reps):
            def one(xb):
                def step(c, _):
                    # the perturbation is numerically an exact no-op
                    # (|1e-30*c| <= 1e-24 << eps*|xb|) but data-dependent,
                    # so XLA cannot hoist the body out of the scan
                    out = jax.vmap(fn)(xb + 1e-30 * c)
                    s = leafsum(out)
                    return jnp.clip(jnp.nan_to_num(s, nan=0.0, posinf=0.0,
                                                   neginf=0.0), -1e6, 1e6), None

                c, _ = lax.scan(step, jnp.zeros((), jnp.float32),
                                None, length=k_reps)
                return c

            return jax.jit(one)

        fK, f1 = rep(args.k), rep(1)
        jax.block_until_ready(fK(x0s))
        jax.block_until_ready(f1(x0s))
        tK = min(_clock(fK, x0s) for _ in range(args.reps))
        t1 = min(_clock(f1, x0s) for _ in range(args.reps))
        return name, max(tK - t1, 0.0) / (args.k - 1)

    def _clock(f, xb):
        t0 = time.time()
        jax.block_until_ready(f(xb))
        return time.time() - t0

    rows = []
    full_name, full_t = timeit("full_solve", lane)
    res = jax.jit(jax.vmap(lane))(x0s)
    med_iters = float(np.median(np.asarray(res.iters)))
    phases = [
        ("deriv_sweep_generic", sweep_one),
        ("riccati_kkt(sweep+bw+fw)", riccati_one),
        ("residuals", residuals_one),
        ("merit_eval", merit_one),
    ]
    if fast:
        phases.insert(0, ("deriv_sweep_fast(solver path)", sweep_fast_one))
    for name, fn in phases:
        rows.append(timeit_ingraph(name, fn))
    rows.append((full_name, full_t))

    per_iter = full_t / max(med_iters, 1.0)
    print(f"# B={B} N={N} platform={jax.devices()[0].platform} "
          f"med_iters={med_iters:.0f} per_iter={per_iter*1e3:.2f}ms",
          file=sys.stderr)
    for name, t in rows:
        print(json.dumps({
            "phase": name, "ms_per_batch": round(t * 1e3, 3),
            "ms_per_iter_budget": round(per_iter * 1e3, 3),
            "fraction_of_iter": round(t / per_iter, 3) if name != "full_solve"
            else None,
        }))

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(jax.jit(jax.vmap(lane))(x0s))
        print(f"# jax.profiler trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
