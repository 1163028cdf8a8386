"""Chip A/B of solver variants on the exact bench lane (pass-1 only).

Interleaves reps across ALL requested variants in ONE process
(A,B,A,B,...) so the tunnel node's minute-scale speed drift — observed
flipping a 20% ordering between back-to-back processes — hits every
variant equally.  Variants are comma-separated ls_mode values by default;
other knobs via env: BENCH_MAXIT, BENCH_MU, BENCH_LS, BENCH_HESS,
BENCH_TOL, BENCH_N, AB_BATCH, AB_REPS.

Usage: python tools/ab_bench.py [variant[,variant...]]
  variant: <ls_mode>[@<fastsweep>][!<mu_strategy>[!<maxit>]]
  ls_mode: backtrack|adaptive; fastsweep: 0 (split sweep off / round-3
  generic path), 1 (forced lanes-minor), auto (per-batch-size
  self-selection); mu_strategy: monotone|mehrotra|adaptive with optional
  per-variant iteration cap
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variants = (sys.argv[1] if len(sys.argv) > 1 else "backtrack").split(",")
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses as _dc

    import jax.numpy as jnp
    import numpy as np

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    B = int(os.environ.get("AB_BATCH", "16384"))
    REPS = int(os.environ.get("AB_REPS", "3"))
    N = int(os.environ.get("BENCH_N", "50"))
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=_dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], np.float32),
        clip_hi=np.array([2.0, 420.0, 1.0], np.float32)))
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    def mk_opts(ls_mode, mu=None, maxit=None):
        return SolverOptions(
            max_iter=int(maxit or os.environ.get("BENCH_MAXIT", "12")),
            tol=float(os.environ.get("BENCH_TOL", "1e-3")),
            constr_viol_tol=1e-3,
            mu_init=float(os.environ.get("BENCH_MU_INIT", "1e-1")),
            hessian=os.environ.get("BENCH_HESS", "gauss_newton"),
            mu_strategy=mu or os.environ.get("BENCH_MU", "monotone"),
            ls_parallel=os.environ.get("BENCH_LS", "seq") == "par",
            ls_mode=ls_mode,
            dual_init=os.environ.get("BENCH_DUAL_INIT", "zero"),
            track_best=os.environ.get("BENCH_TRACK_BEST", "1") == "1")

    def set_sweep_env(sweep):
        if sweep in (None, "auto"):
            os.environ.pop("MPC_TPU_FAST_SWEEP", None)
        else:
            os.environ["MPC_TPU_FAST_SWEEP"] = sweep

    def build(v):
        head, _, mu_part = v.partition("!")
        mode, _, sweep = head.partition("@")
        mu, _, maxit = mu_part.partition("!")
        set_sweep_env(sweep or "auto")
        # the sweep env is read at socp build time AND at trace time
        socp_v = build_structured_ocp(cfg, model,
                                      build_stage_cost(cfg.stage_cost),
                                      build_terminal_cost(cfg))
        return make_structured_solver(socp_v, mk_opts(mode, mu or None,
                                                      maxit or None))

    solvers = {v: build(v) for v in variants}

    ny, nu = cfg.ny, cfg.nu
    xs = np.array([0.874317, 325.0, 0.6528], dtype=np.float32)
    us = np.array([300.157, 0.1], dtype=np.float32)
    xmin_c = jnp.asarray(np.asarray(cfg.bounds.xmin, np.float32))
    xmax_c = jnp.asarray(np.asarray(cfg.bounds.xmax, np.float32))

    def make_fn(solve):
        def lane(x0):
            par = dict(
                x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
                d=jnp.asarray(np.array([0.0, 0.1], dtype=np.float32)),
                um1=jnp.asarray(us), t=jnp.asarray(0.0, dtype=jnp.float32),
                lam=jnp.zeros((ny, nu), dtype=jnp.float32),
                px=jnp.zeros((N, cfg.npx), dtype=jnp.float32),
                py=jnp.zeros((N, cfg.npy), dtype=jnp.float32),
            )

            def sim(x, _):
                xn = jnp.clip(model.fx(x, jnp.asarray(us), cfg.h,
                                       par["d"], 0.0, par["px"][0]),
                              xmin_c, xmax_c)
                xn = jnp.where(jnp.isfinite(xn), xn, x)
                return xn, xn

            _, Xtail = jax.lax.scan(sim, x0, None, length=N)
            X0 = jnp.concatenate([x0[None], Xtail], axis=0)
            U0 = jnp.tile(jnp.asarray(us), (N, 1))
            return solve(par, X0, U0)

        return jax.jit(jax.vmap(lane))

    fns = {v: make_fn(s) for v, s in solvers.items()}
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform([0.3, 318.0, 0.55], [0.95, 340.0, 0.70],
                                  size=(B, 3)).astype(np.float32))
    results = {}
    for v, fn in fns.items():
        set_sweep_env(v.partition("@")[2] or "auto")  # rules read at trace
        print(f"# [{v}] compiling B={B} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        results[v] = fn(x0s)
        jax.block_until_ready(results[v].U)
        print(f"# [{v}] compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
    times = {v: [] for v in fns}
    for r in range(REPS):
        xb = x0s + np.float32(1e-4 * (r + 1))
        for v, fn in fns.items():   # interleaved: node drift hits all
            t0 = time.time()
            jax.block_until_ready(fn(xb).U)
            times[v].append(time.time() - t0)
    for v in fns:
        res = results[v]
        st = np.asarray(res.status)
        ok = st != 2
        it = np.asarray(res.iters)
        feas = np.asarray(res.feas_err)
        kkt = np.asarray(res.kkt_err)
        best = min(times[v])
        print(f"[{v}] best={best*1e3:.1f}ms med={np.median(times[v])*1e3:.1f}ms "
              f"/batch B={B} ok={ok.sum()}/{B} med_iters={np.median(it):.0f} "
              f"max_feas(ok)={feas[ok].max():.2e} "
              f"kkt(ok) p50={np.percentile(kkt[ok], 50):.1e} "
              f"p90={np.percentile(kkt[ok], 90):.1e} "
              f"pass1_solves/s={ok.sum()/best:.0f}", flush=True)


if __name__ == "__main__":
    main()
