"""Probe the bench convergence tail: which lanes fail, and do they
converge with more iterations / different initialization?  (VERDICT r1
item 3 diagnostics — not part of the library.)"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_ss_cost, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import build_structured_ocp, make_structured_solver

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    N = int(os.environ.get("BENCH_N", "50"))
    MAXIT = int(os.environ.get("BENCH_MAXIT", "40"))

    cfg = make_config().replace(N=N, R_wn=None)
    import dataclasses as _dc

    cfg = cfg.replace(model=_dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], np.float32),
        clip_hi=np.array([2.0, 420.0, 1.0], np.float32)))
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)

    opts = SolverOptions(max_iter=MAXIT, tol=1e-3, constr_viol_tol=1e-3,
                         hessian="gauss_newton")
    solve = make_structured_solver(socp, opts)

    nx, nu, ny, nd = cfg.nx, cfg.nu, cfg.ny, cfg.nd
    rng = np.random.default_rng(0)
    xlo = np.array([0.3, 318.0, 0.55])
    xhi = np.array([0.95, 340.0, 0.70])
    x0s = rng.uniform(xlo, xhi, size=(B, nx)).astype(np.float32)

    xs = np.array([0.874317, 325.0, 0.6528], dtype=np.float32)
    us = np.array([300.157, 0.1], dtype=np.float32)
    xmin_c = jnp.asarray(np.asarray(cfg.bounds.xmin, np.float32))
    xmax_c = jnp.asarray(np.asarray(cfg.bounds.xmax, np.float32))

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
                                   par["d"], 0.0, par["px"][0]), xmin_c, xmax_c)
            xn = jnp.where(jnp.isfinite(xn), xn, x)
            return xn, xn

        _, Xtail = jax.lax.scan(sim, x0, None, length=N)
        X0 = jnp.concatenate([x0[None], Xtail], axis=0)
        U0 = jnp.tile(jnp.asarray(us), (N, 1))
        return solve(par, X0, U0)

    batched = jax.jit(jax.vmap(lane))
    t0 = time.time()
    res = batched(jnp.asarray(x0s))
    jax.block_until_ready(res.U)
    print(f"# first solve: {time.time()-t0:.1f}s", file=sys.stderr)

    status = np.asarray(res.status)
    iters = np.asarray(res.iters)
    feas = np.asarray(res.feas_err)
    kkt = np.asarray(res.kkt_err)
    bad = status == 2
    print(f"bad={bad.sum()}/{B} iters: med={np.median(iters)} max={iters.max()} "
          f"p99={np.percentile(iters,99)}")
    print(f"bad lanes kkt: {np.percentile(kkt[bad], [0,50,100]) if bad.any() else 'none'}")
    print(f"bad lanes feas: {np.percentile(feas[bad], [0,50,100]) if bad.any() else 'none'}")
    if bad.any():
        xb = x0s[bad]
        print("bad x0 ranges:", xb.min(0), xb.max(0))
        print("good x0 ranges:", x0s[~bad].min(0), x0s[~bad].max(0))
        # temperature histogram of bad lanes
        print("bad T quantiles:", np.percentile(xb[:, 1], [0, 25, 50, 75, 100]))
        print("bad cB quantiles:", np.percentile(xb[:, 2], [0, 25, 50, 75, 100]))
        # iters distribution of bad lanes
        print("bad iters:", np.percentile(iters[bad], [0, 50, 100]))

        # retry the bad lanes alone with 4x iterations
        opts2 = SolverOptions(max_iter=4 * MAXIT, tol=1e-3, constr_viol_tol=1e-3,
                              hessian="gauss_newton")
        solve2 = make_structured_solver(socp, opts2)

        def lane2(x0):
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
                                       par["d"], 0.0, par["px"][0]), xmin_c, xmax_c)
                xn = jnp.where(jnp.isfinite(xn), xn, x)
                return xn, xn

            _, Xtail = jax.lax.scan(sim, x0, None, length=N)
            X0 = jnp.concatenate([x0[None], Xtail], axis=0)
            U0 = jnp.tile(jnp.asarray(us), (N, 1))
            return solve2(par, X0, U0)

        nb = int(bad.sum())
        pad = np.tile(xb[:1], (max(0, 256 - nb % 256) % 256, 1))
        xb_p = np.concatenate([xb, pad])
        res2 = jax.jit(jax.vmap(lane2))(jnp.asarray(xb_p))
        st2 = np.asarray(res2.status)[:nb]
        it2 = np.asarray(res2.iters)[:nb]
        print(f"retry 4x iters: still bad {(st2==2).sum()}/{nb}; "
              f"iters med={np.median(it2)} max={it2.max()}")
        print("exact-hessian retry:")
        opts3 = SolverOptions(max_iter=4 * MAXIT, tol=1e-3, constr_viol_tol=1e-3,
                              hessian="exact")
        solve3 = make_structured_solver(socp, opts3)

        def lane3(x0):
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
                                       par["d"], 0.0, par["px"][0]), xmin_c, xmax_c)
                xn = jnp.where(jnp.isfinite(xn), xn, x)
                return xn, xn

            _, Xtail = jax.lax.scan(sim, x0, None, length=N)
            X0 = jnp.concatenate([x0[None], Xtail], axis=0)
            U0 = jnp.tile(jnp.asarray(us), (N, 1))
            return solve3(par, X0, U0)

        res3 = jax.jit(jax.vmap(lane3))(jnp.asarray(xb_p))
        st3 = np.asarray(res3.status)[:nb]
        print(f"exact hessian 4x iters: still bad {(st3==2).sum()}/{nb}")
        np.savez("/tmp/tail_probe.npz", x0s=x0s, status=status, iters=iters,
                 bad_x0=xb, st2=st2, st3=st3)


if __name__ == "__main__":
    main()
