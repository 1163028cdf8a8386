"""Record golden closed-loop trajectories for the seven example configs.

SURVEY.md §4 calls for golden-trajectory parity fixtures.  CasADi/IPOPT is
not installed in this environment, so the recorded oracle is this
framework's own CPU/f64 closed loop (solver-level correctness is separately
established against scipy/LQR/KKT oracles in tests/).  The fixtures pin the
end-to-end behavior across refactors and rounds; regenerate deliberately
with:  python tools/record_fixtures.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mpc_code_tpu.loop import ClosedLoop  # noqa: E402
from mpc_code_tpu.utils.io import save_history  # noqa: E402

# (example, Nsim, N) — reduced sizes so recording+checking stays fast while
# exercising every config's full option set
CASES = [
    ("lmpc_wb", 25, 15),
    ("lmpc_cstr", 20, 12),
    ("lmpc_nlplant", 15, 12),
    ("lmpcxp_nlplant", 15, 12),
    ("nmpc", 10, 10),
    ("nmpc_dis", 8, 10),
    ("enmpc", 8, 8),
]

# full-size runs at the reference's own dimensions (each Ex_*.py's Nsim/N:
# WB/CSTR Nsim=100, nlplant 200, NMPC 201, NMPC_dis 1000, ENMPC 21) —
# regression-pinned behind MPC_TPU_SLOW=1 (tests/test_fixtures.py) because
# the runs take minutes on CPU f64
FULL_CASES = [
    ("lmpc_wb", 100, 50, "lmpc_wb_full"),
    ("lmpc_cstr", 100, 50, "lmpc_cstr_full"),
    ("lmpc_nlplant", 200, 50, "lmpc_nlplant_full"),
    ("lmpcxp_nlplant", 200, 50, "lmpcxp_nlplant_full"),
    ("nmpc", 201, 50, "nmpc_full"),
    ("nmpc_dis", 1000, 50, "nmpc_dis_full"),
    ("enmpc", 21, 25, "enmpc_full"),
]

KEYS = ["Xp", "Yp", "U", "XS", "US", "YS", "X_HAT", "D_HAT"]


def run_case(name, Nsim, N, full=False):
    mod = __import__(f"mpc_code_tpu.examples.{name}", fromlist=["make_config"])
    cfg = mod.make_config(Nsim=Nsim).replace(N=N)
    if cfg.estimator.kind == "mhe" and not full:
        # reduced-size fast pins shrink the MHE window too; full-size runs
        # keep the example's own N_mhe (reference dimensions)
        cfg.estimator.N_mhe = 5
    H = ClosedLoop(cfg).run()
    return {k: np.asarray(H[k]) for k in KEYS if len(H[k])}


def main():
    # usage: record_fixtures.py [--full-only [name ...]] [--small-only]
    args = sys.argv[1:]
    full_only = "--full-only" in args
    small_only = "--small-only" in args
    wanted = [a for a in args if not a.startswith("--")]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    if not full_only:
        for name, Nsim, N in CASES:
            if wanted and name not in wanted:
                continue
            print(f"recording {name} (Nsim={Nsim}, N={N})...", flush=True)
            H = run_case(name, Nsim, N)
            save_history(os.path.join(out_dir, f"{name}.npz"), H, Nsim=Nsim, N=N)
    if not small_only:
        for name, Nsim, N, out in FULL_CASES:
            if wanted and name not in wanted and out not in wanted:
                continue
            import time
            t0 = time.time()
            print(f"recording {out} ({name}, Nsim={Nsim}, N={N})...", flush=True)
            H = run_case(name, Nsim, N, full=True)
            save_history(os.path.join(out_dir, f"{out}.npz"), H, Nsim=Nsim, N=N)
            print(f"  {out}: {time.time()-t0:.1f}s", flush=True)
    print("done")


if __name__ == "__main__":
    main()
