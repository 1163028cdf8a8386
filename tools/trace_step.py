"""Xprof trace of the closed-loop MPC step scan (the tools/profile_step.py
wall that is iteration-independent): names the per-step budget by HLO op.

Usage:
    python tools/trace_step.py [batch] [steps]
    python tools/trace_step.py --parse /tmp/mpc_step_trace
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.trace_solve import parse  # noqa: E402


def main():
    if "--parse" in sys.argv:
        parse(sys.argv[sys.argv.index("--parse") + 1], top=50)
        return
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.parallel import batched_closed_loop

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cfg = ge._small_cfg(N=20).replace(
        sol_opts_dyn=SolverOptions.for_f32(max_iter=10,
                                           hessian="gauss_newton"),
        sol_opts_ss=SolverOptions.for_f32(max_iter=10))
    rng = np.random.default_rng(0)
    x0s = (np.tile(np.asarray(cfg.x0_p, float), (B, 1))
           + rng.normal(scale=0.2, size=(B, cfg.nx))).astype(np.float32)
    ysp = np.array([0.2, 0.0, 0.0])

    t0 = time.time()
    carry, _ = batched_closed_loop(cfg, x0s, n_steps=steps, ysp=ysp)
    np.asarray(carry.x)
    print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    tdir = "/tmp/mpc_step_trace"
    with jax.profiler.trace(tdir):
        carry, _ = batched_closed_loop(cfg, x0s + np.float32(1e-4),
                                       n_steps=steps, ysp=ysp)
        np.asarray(carry.x)
    print(f"# trace -> {tdir}", file=sys.stderr)
    parse(tdir, top=50)


if __name__ == "__main__":
    main()
