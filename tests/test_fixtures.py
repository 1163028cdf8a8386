"""Golden-trajectory regression against recorded fixtures.

Runs each example config (reduced sizes, same as tools/record_fixtures.py)
and compares the full closed-loop input trajectory to the recorded fixture
within the BASELINE tolerance (<= 1e-4 input deviation).  These fixtures
pin end-to-end behavior across refactors/rounds; regenerate deliberately
with ``python tools/record_fixtures.py`` when behavior changes on purpose.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "tools"))
from record_fixtures import CASES, FULL_CASES, KEYS, run_case  # noqa: E402

from mpc_code_tpu.utils.io import load_history  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures")


@pytest.mark.parametrize("name,Nsim,N", CASES, ids=[c[0] for c in CASES])
def test_example_matches_fixture(name, Nsim, N):
    path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip("fixture not recorded")
    ref, meta = load_history(path)
    H = run_case(name, Nsim, N)
    for key in ("U", "Yp", "D_HAT"):
        if key not in ref or key not in H or not len(ref[key]):
            continue
        dev = np.abs(np.asarray(H[key]) - ref[key]).max()
        assert dev <= 1e-4, f"{name}: {key} deviates by {dev:.2e}"


# the two cheap full-dimension pins (~60 s combined) run in the DEFAULT
# suite so the regimes where ignition/stiffness/drift actually bite are
# exercised every round (round-4 VERDICT item 8); the long ones (nmpc_dis
# Nsim=1000, nmpc Nsim=201, ...) stay behind MPC_TPU_SLOW=1
_DEFAULT_FULL = {"lmpc_wb_full", "enmpc_full"}


@pytest.mark.parametrize("name,Nsim,N,out", FULL_CASES, ids=[c[3] for c in FULL_CASES])
def test_full_size_matches_fixture(name, Nsim, N, out):
    # each example at the reference's own dimensions (Ex_*.py Nsim/N) —
    # pins the regimes where ignition/stiffness/drift actually bite
    if out not in _DEFAULT_FULL and os.environ.get("MPC_TPU_SLOW") != "1":
        pytest.skip("full-size run takes minutes; set MPC_TPU_SLOW=1")
    path = os.path.join(FIXTURE_DIR, f"{out}.npz")
    if not os.path.exists(path):
        pytest.skip("fixture not recorded")
    ref, meta = load_history(path)
    H = run_case(name, Nsim, N, full=True)
    for key in ("U", "Yp", "D_HAT"):
        if key not in ref or key not in H or not len(ref[key]):
            continue
        dev = np.abs(np.asarray(H[key]) - ref[key]).max()
        assert dev <= 1e-4, f"{out}: {key} deviates by {dev:.2e}"
