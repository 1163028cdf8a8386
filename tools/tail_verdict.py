"""Definitive classification of the bench convergence tail (VERDICT r3
item 5): are the handful of lanes that survive both rescue passes
physically infeasible draws, or solver failures?

Two phases, two processes:

1. (default; any platform — chip if available) Reproduce the bench's exact
   sampling (rng(0), B lanes over the documented operating box) and its
   full pass-1 + two-stage-rescue pipeline, collect the still-failing
   initial states, and save them to ``fixtures/tail_bad_x0.npz``; then
   re-exec phase 2.

2. (``--cpu-verdict``; forced CPU/f64) For each failing x0:
     a. exact-Hessian f64 re-solve at a 200-iteration budget with both
        warm starts — if this converges, the lane is a SOLVER failure
        (a restoration pass is owed);
     b. an independent single-shooting feasibility probe: scipy L-BFGS-B
        over the input sequence U (box-constrained), minimizing the
        squared hinge violation of the state box along the f64 rollout,
        from three starts (steady, coolhold, max-cooling).  If the best
        attainable violation stays large, NO admissible input sequence
        keeps the trajectory inside the state box — the OCP is
        infeasible for any solver (IPOPT would return
        'Infeasible_Problem_Detected' for these draws).

Writes ``fixtures/tail_verdict.json`` with the per-lane classification;
bench.py's JSON cites it.  Reference behavior being classified: the same
CSTR ignition the reference guards against in its own tank example
(Ex_NMPC_dis.py:75-77).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BAD_NPZ = os.path.join(REPO, "fixtures", "tail_bad_x0.npz")
OUT_JSON = os.path.join(REPO, "fixtures", "tail_verdict.json")


def _make_problem(dtype):
    import dataclasses as _dc

    import jax.numpy as jnp

    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )

    N = int(os.environ.get("BENCH_N", "50"))
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=_dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], dtype),
        clip_hi=np.array([2.0, 420.0, 1.0], dtype)))
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    xs = np.array([0.874317, 325.0, 0.6528], dtype)
    us = np.array([300.157, 0.1], dtype)
    return cfg, model, f_obj, vfin, xs, us


def phase1_find_bad():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    cfg, model, f_obj, vfin, xs, us = _make_problem(np.float32)
    N = cfg.N
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny

    def mk(maxit):
        return make_structured_solver(socp, SolverOptions(
            max_iter=maxit, tol=1e-3, constr_viol_tol=1e-3,
            mu_init=1e-1, hessian="gauss_newton"))

    solve1, solve2 = mk(12), mk(40)
    xmin_c = jnp.asarray(np.asarray(cfg.bounds.xmin, np.float32))
    xmax_c = jnp.asarray(np.asarray(cfg.bounds.xmax, np.float32))

    def make_lane(solve):
        def lane(x0, u_ws):
            par = dict(x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
                       d=jnp.asarray(np.array([0.0, 0.1], np.float32)),
                       um1=jnp.asarray(us), t=jnp.asarray(0.0, jnp.float32),
                       lam=jnp.zeros((ny, nu), jnp.float32),
                       px=jnp.zeros((N, cfg.npx), jnp.float32),
                       py=jnp.zeros((N, cfg.npy), jnp.float32))

            def sim(x, _):
                xn = jnp.clip(model.fx(x, u_ws, cfg.h, par["d"], 0.0,
                                       par["px"][0]), xmin_c, xmax_c)
                return jnp.where(jnp.isfinite(xn), xn, x), None

            def roll(x0):
                def s2(x, _):
                    xn = jnp.clip(model.fx(x, u_ws, cfg.h, par["d"], 0.0,
                                           par["px"][0]), xmin_c, xmax_c)
                    xn = jnp.where(jnp.isfinite(xn), xn, x)
                    return xn, xn
                _, Xt = jax.lax.scan(s2, x0, None, length=N)
                return jnp.concatenate([x0[None], Xt], axis=0)

            X0 = roll(x0)
            U0 = jnp.tile(u_ws, (N, 1))
            return solve(par, X0, U0)

        return jax.jit(jax.vmap(lane, in_axes=(0, None)))

    b1, b2 = make_lane(solve1), make_lane(solve2)
    us_j = jnp.asarray(us)
    cool_j = jnp.asarray(np.array([295.0, 0.1], np.float32))

    B = int(os.environ.get("BENCH_BATCH", "16384"))
    rng = np.random.default_rng(0)
    xlo = np.array([0.3, 318.0, 0.55])
    xhi = np.array([0.95, 340.0, 0.70])
    x0s = rng.uniform(xlo, xhi, size=(B, cfg.nx)).astype(np.float32)

    t0 = time.time()
    res = b1(jnp.asarray(x0s), us_j)
    status = np.array(res.status)  # np.array: writable copy (asarray view is read-only)
    bad = np.where(status == 2)[0]
    print(f"pass1: bad={len(bad)}/{B} ({time.time()-t0:.0f}s)", flush=True)
    for ws, name in ((us_j, "steady"), (cool_j, "coolhold")):
        if not len(bad):
            break
        cap = 64
        while cap < len(bad):
            cap *= 2
        xr = np.tile(x0s[bad[0]][None], (cap, 1)).astype(np.float32)
        xr[: len(bad)] = x0s[bad]
        r2 = b2(jnp.asarray(xr), ws)
        status[bad] = np.asarray(r2.status)[: len(bad)]
        bad = np.where(status == 2)[0]
        print(f"rescue[{name}]: bad={len(bad)}/{B}", flush=True)

    np.savez(BAD_NPZ, x0=x0s[bad], idx=bad, B=B)
    print(f"saved {len(bad)} failing x0s -> {BAD_NPZ}")
    if len(bad):
        xb = x0s[bad]
        print("bad x0s:")
        for r in xb:
            print(f"  cA={r[0]:.4f} T={r[1]:.2f} cB={r[2]:.4f}")


def phase2_cpu_verdict():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    with np.load(BAD_NPZ) as z:
        x0_bad = z["x0"].astype(float)
        idx = z["idx"]
        B = int(z["B"])
    if not len(x0_bad):
        json.dump({"B": B, "n_bad": 0, "lanes": []}, open(OUT_JSON, "w"),
                  indent=1)
        print("no failing lanes — tail closed")
        return

    cfg, model, f_obj, vfin, xs, us = _make_problem(np.float64)
    N = cfg.N
    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    solve = make_structured_solver(socp, SolverOptions(
        max_iter=200, tol=1e-6, constr_viol_tol=1e-6, hessian="exact"))

    xmin = np.asarray(cfg.bounds.xmin, float)
    xmax = np.asarray(cfg.bounds.xmax, float)
    umin = np.asarray(cfg.bounds.umin, float)
    umax = np.asarray(cfg.bounds.umax, float)
    d = jnp.asarray(np.array([0.0, 0.1]))
    px0 = jnp.zeros(cfg.npx)

    def solve_from(x0, u_ws):
        par = dict(x0=jnp.asarray(x0), xs=jnp.asarray(xs), us=jnp.asarray(us),
                   d=d, um1=jnp.asarray(us), t=jnp.asarray(0.0),
                   lam=jnp.zeros((ny, nu)),
                   px=jnp.zeros((N, cfg.npx)), py=jnp.zeros((N, cfg.npy)))

        def sim(x, _):
            xn = jnp.clip(model.fx(x, jnp.asarray(u_ws), cfg.h, d, 0.0, px0),
                          jnp.asarray(xmin), jnp.asarray(xmax))
            xn = jnp.where(jnp.isfinite(xn), xn, x)
            return xn, xn

        _, Xt = jax.lax.scan(sim, jnp.asarray(x0), None, length=N)
        X0 = jnp.concatenate([jnp.asarray(x0)[None], Xt], axis=0)
        return solve(par, X0, jnp.tile(jnp.asarray(u_ws), (N, 1)))

    # independent feasibility probe: squared hinge violation of the state
    # box along the rollout, minimized over the box-bounded input sequence
    # (single shooting — dynamics always exactly satisfied)
    # scale: concentrations O(1), T O(100) -> normalize by box width
    wid = xmax - xmin

    def viol(Uflat, x0_j):
        U = Uflat.reshape(N, nu)

        def step(x, u):
            xn = model.fx(x, u, cfg.h, d, 0.0, px0)
            xn = jnp.clip(xn, jnp.asarray([0.0, 280.0, 0.4]),
                          jnp.asarray([2.0, 420.0, 1.0]))  # model clip guard
            v = (jnp.maximum(0.0, (xn - xmax) / wid) ** 2
                 + jnp.maximum(0.0, (xmin - xn) / wid) ** 2).sum()
            return xn, v

        _, vs = jax.lax.scan(step, x0_j, jnp.asarray(U))
        return vs.sum()

    vg = jax.jit(jax.value_and_grad(viol))

    lanes = []
    for li, x0 in enumerate(x0_bad):
        rec = {"idx": int(idx[li]),
               "x0": [round(float(v), 5) for v in x0]}
        # (a) exact-Hessian f64, 200-iteration budget, both warm starts
        st = []
        for ws in (us, np.array([295.0, 0.1])):
            r = solve_from(x0, ws)
            st.append((int(r.status), float(r.feas_err)))
        rec["f64_exact_200it"] = [
            {"status": s, "feas": round(f, 6)} for s, f in st]
        solver_solved = any(s != 2 and f <= 1e-6 for s, f in st)

        # (b) scipy single-shooting feasibility probe, 3 starts
        x0_j = jnp.asarray(x0)
        best = np.inf
        for ustart in (np.tile(us, (N, 1)),
                       np.tile([295.0, 0.1], (N, 1)),
                       np.tile([295.0, 0.25], (N, 1))):   # max cooling+flow
            fun = lambda z: tuple(np.asarray(v, float)
                                  for v in vg(jnp.asarray(z), x0_j))
            r = minimize(fun, ustart.reshape(-1), jac=True, method="L-BFGS-B",
                         bounds=[(umin[j % nu], umax[j % nu])
                                 for j in range(N * nu)],
                         options=dict(maxiter=500))
            best = min(best, float(r.fun))
        rec["min_box_violation"] = float(best)
        # best is a SUM of squared normalized hinge violations; > 1e-4
        # means some state exceeds its box by >1% of the box width at some
        # stage no matter the input — infeasible for any solver
        rec["verdict"] = ("solver_failure" if solver_solved else
                         ("physically_infeasible" if best > 1e-4
                          else "undetermined"))
        print(f"lane {rec['idx']}: x0={rec['x0']} f64={rec['f64_exact_200it']} "
              f"minviol={best:.3e} -> {rec['verdict']}", flush=True)
        lanes.append(rec)

    out = {"B": B, "n_bad": len(lanes),
           "n_physically_infeasible": sum(
               1 for l in lanes if l["verdict"] == "physically_infeasible"),
           "n_solver_failure": sum(
               1 for l in lanes if l["verdict"] == "solver_failure"),
           "lanes": lanes}
    json.dump(out, open(OUT_JSON, "w"), indent=1)
    print(f"wrote {OUT_JSON}")


def main():
    if "--cpu-verdict" in sys.argv:
        phase2_cpu_verdict()
        return
    phase1_find_bad()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # drop the remote-TPU plugin
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--cpu-verdict"], env=env, check=True)


if __name__ == "__main__":
    main()
