"""Capture + summarize an xprof trace of the bench solve (one batch).

Round-4 perf work: names the per-iteration wall budget by HLO op, so the
op-overhead diagnosis (BASELINE.md round-3 section) is grounded in chip
self-times instead of op counts.

Usage:
    python tools/trace_solve.py [--batch 16384] [--dir /tmp/mpc_trace]
    python tools/trace_solve.py --parse /tmp/mpc_trace   # summarize only
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args):
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
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

    N = int(os.environ.get("BENCH_N", "50"))
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=_dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], np.float32),
        clip_hi=np.array([2.0, 420.0, 1.0], np.float32)))
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    opts = SolverOptions(max_iter=int(os.environ.get("BENCH_MAXIT", "12")),
                         tol=1e-3, constr_viol_tol=1e-3, mu_init=1e-1,
                         hessian="gauss_newton")
    solve = make_structured_solver(socp, opts)

    ny, nu = cfg.ny, cfg.nu
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

    fn = jax.jit(jax.vmap(lane))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform([0.3, 318.0, 0.55], [0.95, 340.0, 0.70],
                                  size=(args.batch, 3)).astype(np.float32))
    print(f"# compiling B={args.batch} ...", file=sys.stderr)
    t0 = time.time()
    res = fn(x0s)
    jax.block_until_ready(res.U)
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(x0s).U)
        times.append(time.time() - t0)
    med_it = float(np.median(np.asarray(res.iters)))
    print(f"# best={min(times)*1e3:.1f}ms/batch med_iters={med_it:.0f} "
          f"-> {min(times)/max(med_it,1)*1e3:.1f} ms/iter "
          f"ok={(np.asarray(res.status) != 2).sum()}/{args.batch}",
          file=sys.stderr)
    with jax.profiler.trace(args.dir):
        jax.block_until_ready(fn(x0s).U)
    print(f"# trace -> {args.dir}", file=sys.stderr)


def parse(trace_dir, top=40):
    """Sum device self-times by event name from the xplane proto."""
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:  # proto lives under tensorflow's tsl bundle here
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane.pb under {trace_dir}", file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        totals = {}
        counts = {}
        for line in plane.lines:
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
                counts[name] = counts.get(name, 0) + 1
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        tot = sum(totals.values())
        print(f"\n== plane: {plane.name} — total {tot:.1f} ms of events ==")
        for name, ms in rows[:top]:
            print(f"  {ms:9.2f} ms  x{counts[name]:5d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--dir", default="/tmp/mpc_trace")
    ap.add_argument("--parse", default=None)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.top)
        return
    capture(args)
    parse(args.dir, args.top)


if __name__ == "__main__":
    main()
