"""Weak-scaling harness: batched CSTR NMPC solves sharded over a device mesh.

Runs the bench workload at a fixed per-device batch while growing the mesh
(1 chip -> n chips / hosts) and reports throughput + weak-scaling
efficiency vs the single-device run (BASELINE.json >=85%-at-2-hosts
metric).  Ready to execute on a pod the moment one is reachable:

    # single host, all local chips
    python tools/weak_scaling.py
    # multi-host (run on every host; scaling numbers print on proc 0)
    python tools/weak_scaling.py --distributed \
        --coordinator <host0>:8476 --num-processes 2 --process-id <i>

Without TPU hardware it exercises the identical sharding path on virtual
CPU devices (--cpu-devices N).  Efficiency on virtual CPU devices is NOT a
hardware measurement (they share host cores) — it validates mechanics.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=1024)
    ap.add_argument("--n", type=int, default=50, help="horizon")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device-counts", type=int, nargs="*", default=None,
                    help="mesh sizes to sweep (default: 1, 2, 4, ..., all)")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force CPU with N virtual devices (mechanics test)")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator", default="127.0.0.1:8476")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    if args.cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}")

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.distributed:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    import dataclasses as dc

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    N = args.n
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
    solve = make_structured_solver(socp, opts)

    xs = np.array([0.874317, 325.0, 0.6528], dtype=np.float32)
    us = np.array([300.157, 0.1], dtype=np.float32)
    xmin_c = jnp.asarray(np.asarray(cfg.bounds.xmin, np.float32))
    xmax_c = jnp.asarray(np.asarray(cfg.bounds.xmax, np.float32))

    def lane(x0):
        par = dict(
            x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
            d=jnp.asarray(np.array([0.0, 0.1], dtype=np.float32)),
            um1=jnp.asarray(us), t=jnp.asarray(0.0, dtype=jnp.float32),
            lam=jnp.zeros((cfg.ny, cfg.nu), dtype=jnp.float32),
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

    devices = jax.devices()
    counts = args.device_counts
    if not counts:
        counts, c = [], 1
        while c <= len(devices):
            counts.append(c)
            c *= 2
        if counts[-1] != len(devices):
            counts.append(len(devices))

    rng = np.random.default_rng(0)
    results = []
    base_tput = None
    for nd in counts:
        if nd > len(devices):
            continue
        mesh = Mesh(np.array(devices[:nd]), ("batch",))
        B = args.per_device * nd
        x0s = rng.uniform([0.3, 318.0, 0.55], [0.95, 340.0, 0.70],
                          size=(B, 3)).astype(np.float32)
        sharding = NamedSharding(mesh, P("batch"))
        fn = jax.jit(jax.vmap(lane), in_shardings=(sharding,),
                     out_shardings=sharding)
        xb = jax.device_put(jnp.asarray(x0s), sharding)
        t0 = time.time()
        jax.block_until_ready(fn(xb).U)
        compile_s = time.time() - t0
        times = []
        for r in range(args.reps):
            xb_r = jax.device_put(
                jnp.asarray(x0s + np.float32(1e-4 * (r + 1))), sharding)
            t0 = time.time()
            jax.block_until_ready(fn(xb_r).U)
            times.append(time.time() - t0)
        best = min(times)
        tput = B / best
        if base_tput is None:
            base_tput = tput / nd  # per-device reference at the first count
        eff = tput / (base_tput * nd)
        results.append(dict(devices=nd, batch=B, best_s=round(best, 4),
                            compile_s=round(compile_s, 1),
                            solves_per_s=round(tput, 1),
                            weak_scaling_eff=round(eff, 4)))
        print(f"# devices={nd} B={B} best={best*1000:.1f}ms "
              f"tput={tput:.0f}/s eff={eff:.3f}", file=sys.stderr)

    if jax.process_index() == 0:
        for r in results:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
