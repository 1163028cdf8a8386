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

# full-size flagship run at the reference's own dimensions
# (Ex_NMPC.py: Nsim=201, N=50) — regression-pinned behind MPC_TPU_SLOW=1
# (tests/test_fixtures.py) because the run takes minutes on CPU f64
FULL_CASES = [
    ("nmpc", 201, 50, "nmpc_full"),
]

KEYS = ["Xp", "Yp", "U", "XS", "US", "YS", "X_HAT", "D_HAT"]


def run_case(name, Nsim, N):
    mod = __import__(f"mpc_code_tpu.examples.{name}", fromlist=["make_config"])
    cfg = mod.make_config(Nsim=Nsim).replace(N=N)
    if cfg.estimator.kind == "mhe":
        cfg.estimator.N_mhe = 5
    H = ClosedLoop(cfg).run()
    return {k: np.asarray(H[k]) for k in KEYS if len(H[k])}


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    for name, Nsim, N in CASES:
        print(f"recording {name} (Nsim={Nsim}, N={N})...")
        H = run_case(name, Nsim, N)
        save_history(os.path.join(out_dir, f"{name}.npz"), H, Nsim=Nsim, N=N)
    for name, Nsim, N, out in FULL_CASES:
        print(f"recording {out} ({name}, Nsim={Nsim}, N={N})...")
        H = run_case(name, Nsim, N)
        save_history(os.path.join(out_dir, f"{out}.npz"), H, Nsim=Nsim, N=N)
    print("done")


if __name__ == "__main__":
    main()
