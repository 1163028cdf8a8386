"""Scaled-down runs of the reference example configs (integration level).

Full-size runs (N=50, Nsim=100+) are exercised by parity/bench scripts; here
each config runs a short horizon/loop so the suite stays fast while touching
every model/estimator/cost combination the examples exercise.
"""

import numpy as np
import pytest

from mpc_code_tpu.loop import ClosedLoop


def _run(name, steps, N):
    mod = __import__(f"mpc_code_tpu.examples.{name}", fromlist=["make_config"])
    cfg = mod.make_config(Nsim=steps).replace(N=N)
    return ClosedLoop(cfg).run()


def test_lmpc_cstr():
    H = _run("lmpc_cstr", 25, 12)
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    # early steps are genuinely infeasible (plant excursion beyond output
    # bounds with pinned x0) — the freeze-input fallback must keep running
    assert H["U"].shape == (25, 2)
    assert np.isfinite(H["Yp"]).all()
    # tracks the first setpoint (y1 -> 0.2) direction
    assert abs(H["Yp"][15][0] - 0.2) < 0.2


def test_lmpc_nlplant():
    H = _run("lmpc_nlplant", 20, 12)
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert np.isfinite(H["Yp"]).all()
    assert (H["U"][:, 0] >= 295 - 1e-9).all() and (H["U"][:, 0] <= 305 + 1e-9).all()


def test_lmpcxp_nlplant():
    H = _run("lmpcxp_nlplant", 20, 12)
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # nx=4 model vs nxp=3 plant: histories carry their own dims
    assert H["X_HAT"].shape[1] == 4 and H["Xp"].shape[1] == 3
    assert abs(H["Yp"][-1][0] - 0.5) < 0.05


def test_nmpc_ekf():
    H = _run("nmpc", 12, 10)
    assert (np.asarray(H["STATUS_SS"]) != 2).all()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # EKF estimates the feed-flow disturbance d2 near its true 0.1
    assert abs(H["D_HAT"][-1][1] - 0.1) < 0.05
    # d-hat saturation bounds respected
    assert (np.abs(H["D_HAT"]) <= 100 + 1e-12).all()


def test_nmpc_dis():
    # slow tank dynamics + persistent scheduled disturbance: assert the
    # control direction, not convergence (reference runs Nsim=1000)
    H = _run("nmpc_dis", 16, 10)
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    # after the t=50 setpoint change, y2 must move from ~12.2 toward 6
    assert H["Yp"][-1][1] < H["Yp"][9][1] - 1.0
    # the output-disturbance estimate tracks the rising level-1 disturbance
    assert H["D_HAT"][-1][0] > 1.0
    # Delta-u bounds
    du = np.diff(H["U"], axis=0)
    assert (np.abs(du) <= 50 + 1e-6).all()
