"""Batched closed-loop throughput: full MPC steps (estimate + target NLP +
OCP NLP + plant) per second for a batch of scenarios on one chip.

Complements bench.py (cold-start OCP solves/s): here every step after the
first is warm-started by the shifted previous solution, which is the
deployed-use iteration regime.

Usage: python tools/closed_loop_bench.py [batch] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    # the library self-selects the sweep layout per batch size now
    # (ops/integrators._lanes_minor): lanes-minor at warm-started small
    # batches like this one, batch-major on the big cold bench batches —
    # no env knob needed here anymore
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    from mpc_code_tpu.parallel import make_closed_loop_runner

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    # the vmapped per-step while_loop runs to the SLOWEST lane; warm-started
    # steps converge in ~5 iterations, so a tight cap bounds the batch tail
    # (non-converged lanes fall back per-lane exactly like the host loop)
    max_it = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from mpc_code_tpu.config import SolverOptions

    cfg = ge._small_cfg(N=20).replace(
        sol_opts_dyn=SolverOptions.for_f32(max_iter=max_it,
                                           hessian="gauss_newton"),
        sol_opts_ss=SolverOptions.for_f32(max_iter=max_it))
    rng = np.random.default_rng(0)
    x0s = (np.tile(np.asarray(cfg.x0_p, float), (B, 1))
           + rng.normal(scale=0.2, size=(B, cfg.nx))).astype(np.float32)

    # the runner is built (and its scan graph traced + compiled) ONCE;
    # timed calls then measure device execution — rebuilding per call
    # hides ~25 s of Python re-tracing inside the "run" and understates
    # throughput ~25x (round-4 finding, see make_closed_loop_runner)
    t0 = time.time()
    runner = make_closed_loop_runner(cfg, steps, B,
                                     ysp=np.array([0.2, 0.0, 0.0]),
                                     aot_key=f"clb-small-cstr-N20-mi{max_it}")
    carry, out = runner(x0s)
    np.asarray(carry.x)
    compile_s = time.time() - t0

    reps = []
    for r in range(3):
        t0 = time.time()
        carry, out = runner(x0s + np.float32(1e-4 * (r + 1)))
        np.asarray(carry.x)
        reps.append(time.time() - t0)
    run_s = float(np.median(reps))

    st = np.asarray(out.status_dyn)
    iters = np.asarray(out.ocp_iters)
    lane_steps = B * steps
    # the batched while_loop's per-step wall is the MAX over lanes, not
    # the median — report both (per-step max, then median over steps)
    max_it_steps = iters.reshape(steps, -1).max(axis=1)
    print(f"# compile={compile_s:.1f}s run={run_s:.2f}s batch={B} steps={steps} "
          f"ok={(st != 2).sum()}/{st.size} warm med_iters={np.median(iters[1:]):.0f} "
          f"max_iters/step={np.median(max_it_steps[1:]):.0f} "
          f"(p90 {np.percentile(max_it_steps[1:], 90):.0f}) "
          f"platform={jax.devices()[0].platform}")
    print(f"closed-loop MPC steps/s/chip: {lane_steps / run_s:,.0f} "
          f"(each = KF estimate + target NLP + OCP NLP + plant step)")


if __name__ == "__main__":
    main()
