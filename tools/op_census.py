"""Op census of the compiled bench solve (VERDICT round-4 item 1a).

Compiles the exact bench lane (jit(vmap(solve))) for the current platform,
dumps the optimized HLO, and counts instructions per computation, broken
down by opcode.  The IPM `lax.while_loop` body is the per-iteration op
budget: every instruction in it executes once per IPM iteration (nested
while bodies — the line search — execute once per LS trial).

Usage:
    python tools/op_census.py [--batch 256] [--top 25]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump", type=str, default=None,
                    help="write full optimized HLO text here")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
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
    import dataclasses as _dc

    N = int(os.environ.get("BENCH_N", "50"))
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=_dc.replace(
        cfg.model,
        clip_lo=np.array([0.0, 280.0, 0.4], np.float32),
        clip_hi=np.array([2.0, 420.0, 1.0], np.float32)))
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    socp = build_structured_ocp(cfg, model, f_obj, vfin)
    opts = SolverOptions(max_iter=12, tol=1e-3, constr_viol_tol=1e-3,
                         mu_init=1e-1,
                         hessian=os.environ.get("BENCH_HESS", "gauss_newton"))
    solve = make_structured_solver(socp, opts)

    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
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
    x0b = jnp.asarray(np.tile(xs, (args.batch, 1)))
    print(f"# lowering+compiling batch={args.batch} on "
          f"{jax.devices()[0].platform} ...", file=sys.stderr)
    compiled = fn.lower(x0b).compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)

    # --- parse computations: boundaries are column-0 header lines ending
    # in '{' (tuple-typed parameter lists contain parens/commas, so only
    # the indentation is reliable) and a column-0 '}'
    comps = {}              # name -> Counter(opcode)
    wheres = collections.defaultdict(list)   # comp -> nested while bodies
    cur = None
    for line in txt.splitlines():
        if line and not line.startswith(" ") and "{" in line:
            m = re.match(r"^(?:ENTRY\s+)?%?([^\s(]+)", line)
            cur = m.group(1) if m else None
            if cur is not None:
                comps[cur] = collections.Counter()
            continue
        if cur is None:
            continue
        if line.startswith("}"):
            cur = None
            continue
        s = line.strip()
        m2 = re.search(r"=\s*(?:\([^=]*?\)\s*|\S+\s+)?([\w\-]+)\(", s)
        if not m2:
            continue
        op = m2.group(1)
        comps[cur][op] += 1
        if "body=" in s:
            mb = re.search(r"body=%?([^\s,)]+)", s)
            if mb:
                wheres[cur].append(mb.group(1))

    _SKIP = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast"}

    def real(c):
        return sum(v for k, v in comps.get(c, {}).items() if k not in _SKIP)

    sizes = sorted(((real(k), k) for k in comps), reverse=True)
    print("\n== largest computations (real-op count) ==")
    for n, k in sizes[:12]:
        print(f"  {n:6d}  {k}")
    print(f"\n== total real ops: {sum(n for n, _ in sizes)} ==")

    # while-nesting tree from the entry: each body's real-op count is the
    # per-trip dispatch budget (nested bodies multiply by their trips)
    entry = next((k for k in comps if k.startswith("main")), None)

    def show(c, depth):
        d = comps.get(c, {})
        top = ", ".join(f"{k}:{v}" for k, v in
                        sorted(d.items(), key=lambda kv: -kv[1])
                        if k not in _SKIP)[:120]
        print("  " * depth + f"{c}: {real(c)} real ops [{top}]")
        for b in wheres.get(c, []):
            show(b, depth + 1)

    if entry:
        print("\n== while-nesting tree (entry -> bodies) ==")
        show(entry, 0)


if __name__ == "__main__":
    main()
