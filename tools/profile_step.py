"""Decompose the closed-loop MPC step wall (tools/closed_loop_bench.py's
~1.3 s/step at B=1024 despite 1-iteration solves) into its phases.

Times four scan graphs at the same (B, steps):
  full        estimator + target NLP + OCP NLP + plant  (the bench step)
  no_ocp      estimator + target NLP + plant            (OCP replaced by
              carry passthrough via a 0-iteration cap)
  no_target   estimator + OCP NLP + plant               (target solve
              bypassed via a 0-iteration cap)
  est_only    estimator + plant (cfg.estimating=True)

Each phase's wall = difference vs est_only.  All graphs share shapes, so
compile-cache hits keep this quick after the first run.

Usage: python tools/profile_step.py [batch] [steps] [max_it]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
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
    max_it = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    def run_cfg(tag, cfg):
        rng = np.random.default_rng(0)
        x0s = (np.tile(np.asarray(cfg.x0_p, float), (B, 1))
               + rng.normal(scale=0.2, size=(B, cfg.nx))).astype(np.float32)
        t0 = time.time()
        carry, _ = batched_closed_loop(cfg, x0s, n_steps=steps,
                                       ysp=np.array([0.2, 0.0, 0.0]))
        np.asarray(carry.x)
        compile_s = time.time() - t0
        t0 = time.time()
        carry, _ = batched_closed_loop(cfg, x0s + np.float32(1e-4),
                                       n_steps=steps,
                                       ysp=np.array([0.2, 0.0, 0.0]))
        np.asarray(carry.x)
        run_s = time.time() - t0
        print(f"{tag:10s} compile={compile_s:6.1f}s run={run_s:7.3f}s "
              f"({1e3 * run_s / steps:7.1f} ms/step)", flush=True)
        return run_s

    base = ge._small_cfg(N=20)
    mk = lambda it_dyn, it_ss, **kw: base.replace(
        sol_opts_dyn=SolverOptions.for_f32(max_iter=it_dyn,
                                           hessian="gauss_newton"),
        sol_opts_ss=SolverOptions.for_f32(max_iter=it_ss), **kw)

    results = {}
    results["est_only"] = run_cfg("est_only", mk(max_it, max_it,
                                                 estimating=True))
    results["no_ocp"] = run_cfg("no_ocp", mk(0, max_it))
    results["no_target"] = run_cfg("no_target", mk(max_it, 0))
    results["full"] = run_cfg("full", mk(max_it, max_it))

    f, e = results["full"], results["est_only"]
    ocp = f - results["no_ocp"]
    tgt = f - results["no_target"]
    print(f"\nper-step budget at B={B} (ms): total {1e3 * f / steps:.1f} | "
          f"ocp ~{1e3 * ocp / steps:.1f} | target ~{1e3 * tgt / steps:.1f} | "
          f"est+plant {1e3 * e / steps:.1f} | "
          f"other ~{1e3 * (f - ocp - tgt - e) / steps:.1f}")


if __name__ == "__main__":
    main()
