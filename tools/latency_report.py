"""Per-step solve-latency report (BASELINE.md metric: p50/p99 solve latency
vs the plant sampling period h).

Runs a closed-loop example and reports percentiles of the per-step target
(TIME_SS) and OCP (TIME_DYN) solve wall times — the reference collects the
same quantities but never reports them (MPC_code.py:703-711, 775-783).

Usage: python tools/latency_report.py [example] [Nsim] [N]
"""

import os
import sys

import jax

if os.environ.get("LATENCY_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mpc_code_tpu.loop import ClosedLoop  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "lmpc_wb"
    Nsim = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    N = int(sys.argv[3]) if len(sys.argv) > 3 else None
    mod = __import__(f"mpc_code_tpu.examples.{name}", fromlist=["make_config"])
    cfg = mod.make_config(Nsim=Nsim)
    if N:
        cfg = cfg.replace(N=N)
    if jax.devices()[0].platform != "cpu":
        # on-chip (f32) configuration: tolerances reachable in single
        # precision — the example defaults (tol=1e-8) sit below the f32 KKT
        # floor and would spin every solve to max_iter
        from mpc_code_tpu.config import SolverOptions

        # LATENCY_HESS=gauss_newton drops constraint curvature in the OCP
        # (cheaper iterations; exact keeps constraint curvature)
        hess = os.environ.get("LATENCY_HESS", "exact")
        cfg = cfg.replace(sol_opts_ss=SolverOptions.for_f32(),
                          sol_opts_dyn=SolverOptions.for_f32(hessian=hess),
                          sol_opts_mhe=SolverOptions.for_f32())
        if name == "nmpc":
            # f32 saturation guard: the CSTR Arrhenius term overflows f32
            # for T beyond ~345 K inside intermediate RK stages; clip the
            # ODE input states to the physical region exactly as the
            # reference's own tank model does (Ex_NMPC_dis.py:75-77).
            # Same guard as bench.py.
            import dataclasses as dc

            import numpy as np_

            cfg = cfg.replace(
                model=dc.replace(
                    cfg.model,
                    clip_lo=np_.array([0.0, 280.0, 0.4]),
                    clip_hi=np_.array([2.0, 420.0, 1.0])),
                # the PLANT integrates the same Arrhenius ODE — without the
                # guard a marginally different f32 control sequence can
                # ignite the simulated plant inside one interval (exact
                # rounding depends on XLA fusion, e.g. RK4 scan vs unroll)
                plant=dc.replace(
                    cfg.plant,
                    clip_lo=np_.array([0.0, 280.0, 0.4]),
                    clip_hi=np_.array([2.0, 420.0, 1.0])))
    H = ClosedLoop(cfg).run()
    if getattr(cfg.plant, "clip_lo", None) is not None:
        # the saturation guard must only ever protect transient RK4 stage
        # evaluations — if the CLOSED-LOOP plant trajectory itself sits on
        # a clip bound, the run diverged (plant ignition) and the latency
        # numbers below would be describing a broken simulation.  Fail
        # loudly instead of reporting plausible-looking percentiles.
        Xp = np.asarray(H["Xp"]).reshape(Nsim, -1)
        lo = np.asarray(cfg.plant.clip_lo, float)
        hi = np.asarray(cfg.plant.clip_hi, float)
        margin = 1e-6 * np.maximum(1.0, np.abs(hi - lo))
        saturated = (Xp <= lo + margin) | (Xp >= hi - margin)
        if saturated.any():
            k_bad, i_bad = np.argwhere(saturated)[0]
            raise SystemExit(
                f"plant state hit its saturation bound (step {k_bad}, state "
                f"{i_bad}, value {Xp[k_bad, i_bad]:.6g}): the closed loop "
                "diverged — latency percentiles would be meaningless")
    for key, label in (("TIME_SS", "target"), ("TIME_DYN", "OCP")):
        t = np.asarray(H[key])[2:]  # drop compile-affected steps
        if not len(t):
            continue
        print(f"{name} {label}: p50={np.percentile(t,50)*1e3:.1f}ms "
              f"p90={np.percentile(t,90)*1e3:.1f}ms "
              f"p99={np.percentile(t,99)*1e3:.1f}ms "
              f"(sampling period h={cfg.h}s -> budget {cfg.h*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
