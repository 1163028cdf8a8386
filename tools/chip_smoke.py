"""Chip parity smoke: EVERY example family's traced closed loop on the
real TPU, checked against the recorded f64 golden fixtures.

The CPU f64 suite pins numerics and the bench tools pin throughput for
the flagship workloads — this tool closes the remaining gap: each of the
7 reference example configs runs its FIXTURE-sized closed loop ON CHIP
(f32, batched, production kernels: Pallas sweeps, smalllin, structured
solvers) and lane 0 is compared to `fixtures/<name>.npz`:

The comparison is calibrated for what f32 can honestly reproduce of an
f64 oracle through closed-loop feedback (probed on CPU f32: at the
default tol=1e-3 the noisy-EKF nmpc loop wanders ~18% of the input box
from per-step solver slack alone; at tol=1e-4 it drops ~16x), so the
smoke solves at tol=1e-4 and checks the input trajectory against the
fixture normalized by each input's BOX width: median deviation < 2% and
MEAN < 6% of the box.  The mean (not max) bounds the tail because a
single marginal step that flips feasibility or saturates differently at
f32 freezes/steers the input for a step or two (observed: isolated
25-40%-of-box single-step spikes on lmpc_nlplant/nmpc with medians
under 1.5%); the reference's transient-infeasibility fallback steps are
part of the oracle trajectory and must reproduce.

Usage: python tools/chip_smoke.py [batch]
Exits non-zero on the first failing family; one line per family.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    # record_fixtures.CASES duplicated here — importing that module pins
    # jax to CPU/x64 at import time (it is the f64 recording script)
    # (example, Nsim, N, mean_bound): record_fixtures.CASES sizes.
    # nmpc's bound is wider because its loop is NOISE-driven (R_wn
    # measurement noise -> EKF -> flow input chases the estimated
    # disturbance): a CPU probe at the same f32 precision reproduces the
    # same deviation magnitude from per-solve tolerance slack alone, so
    # the wider bound reflects f32-vs-f64 sensitivity of that config,
    # not chip behavior.
    CASES = [
        ("lmpc_wb", 25, 15, 0.06),
        ("lmpc_cstr", 20, 12, 0.06),
        ("lmpc_nlplant", 15, 12, 0.06),
        ("lmpcxp_nlplant", 15, 12, 0.06),
        ("nmpc", 10, 10, 0.12),
        ("nmpc_dis", 8, 10, 0.06),
        ("enmpc", 8, 8, 0.06),
    ]

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.loop.batched import (
        init_carry, make_mpc_step, make_step_inputs,
    )
    from mpc_code_tpu.utils.io import load_history

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    fx_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")

    platform = jax.devices()[0].platform
    print(f"# platform={platform} B={B}", file=sys.stderr)
    failures = 0
    for name, Nsim, N, mean_bound in CASES:
        mod = __import__(f"mpc_code_tpu.examples.{name}",
                         fromlist=["make_config"])
        cfg = mod.make_config(Nsim=Nsim).replace(N=N)
        if cfg.estimator.kind == "mhe":
            cfg.estimator.N_mhe = 5       # record_fixtures.run_case pin
        tight = dict(tol=1e-4, constr_viol_tol=1e-4)
        cfg = cfg.replace(
            sol_opts_ss=SolverOptions.for_f32(**tight),
            sol_opts_dyn=SolverOptions.for_f32(hessian="gauss_newton",
                                               **tight),
            sol_opts_mhe=SolverOptions.for_f32(**tight))

        ref, _ = load_history(os.path.join(fx_dir, f"{name}.npz"))

        t0 = time.time()
        try:
            step = make_mpc_step(cfg, batch_hint=B)
            vstep = jax.vmap(step, in_axes=(0, None))
            inputs = make_step_inputs(cfg, Nsim)
            x0 = np.asarray(cfg.x0_p, np.float32)
            # lane 0 is the UNPERTURBED fixture trajectory
            x0s = np.tile(x0, (B, 1)) * (
                1.0 + 0.002 * np.linspace(0, 1, B)[:, None]).astype(
                    np.float32)
            carry0 = jax.vmap(lambda x: init_carry(cfg, x))(
                jnp.asarray(x0s))
            run = jax.jit(lambda c, i: jax.lax.scan(
                lambda cc, ii: vstep(cc, ii), c, i))
            carry, out = run(carry0, inputs)
            u = np.asarray(out.u)[:, 0]               # (Nsim, nu), lane 0
            st = np.asarray(out.status_dyn)[:, 0]
            finite = bool(np.isfinite(np.asarray(out.u)).all())

            # normalize by the input BOX width — the honest yardstick
            # for f32-vs-f64 closed-loop drift (see module docstring);
            # tightly-regulated inputs have fixture EXCURSIONS near zero,
            # which would amplify solver-tolerance slack arbitrarily
            ref_u = np.asarray(ref["U"])
            umin = np.asarray(cfg.bounds.resolved("dyn", "umin"))
            umax = np.asarray(cfg.bounds.resolved("dyn", "umax"))
            box = np.maximum(umax - umin, 1e-6)
            dev = np.abs(u - ref_u) / box
            mx = float(dev.max())
            mean = float(dev.mean())
            med = float(np.median(dev))
            n_inf = int((st == 2).sum())
            good = finite and med < 0.02 and mean < mean_bound
            print(f"{name:16s} u_dev_med={med:.4f} mean={mean:.3f} max={mx:.3f} "
                  f"infeasible_steps={n_inf}/{len(st)} finite={finite} "
                  f"wall={time.time()-t0:.1f}s "
                  f"{'PASS' if good else 'FAIL'}")
            failures += 0 if good else 1
        except Exception as e:
            print(f"{name:16s} EXCEPTION {type(e).__name__}: {e}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
