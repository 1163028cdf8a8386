"""Full-fidelity parity: traced `lax.scan` loop vs the host-driven
`ClosedLoop` on the reference example configs.

The traced batched step (loop/batched.py) must reproduce the host loop's
closed-loop semantics end to end — time-varying parameter schedules
(MPC_code.py:489-515), time-varying setpoints (677-680), white noise
(537-541, 823-827), real plant parameters, infeasibility fallbacks, and
the modifier-adaptation solves (829-874).  The host loop and the traced
loop share the schedule evaluation (loop/schedules.py) and the noise
stream (same `np.random.default_rng(noise_seed)` draw order), so on
CPU/f64 with the same (dense) solver the trajectories agree to solver
tolerance; with the structured Riccati fast path they agree to the
documented structured-vs-dense solver tolerance.
"""

import numpy as np
import pytest

from mpc_code_tpu.loop import ClosedLoop
from mpc_code_tpu.loop.batched import run_traced

KEYS = ("U", "Xp", "XS", "US", "D_HAT", "Yp")


def _cfg(name, steps, N):
    mod = __import__(f"mpc_code_tpu.examples.{name}", fromlist=["make_config"])
    return mod.make_config(Nsim=steps).replace(N=N)


def _compare(cfg, steps, rtol, atol, use_structured=None, keys=KEYS):
    H = ClosedLoop(cfg).run()
    _, Ht = run_traced(cfg, Nsim=steps, use_structured=use_structured)
    assert (Ht["STATUS_DYN"] == np.asarray(H["STATUS_DYN"])).all()
    assert (Ht["STATUS_SS"] == np.asarray(H["STATUS_SS"])).all()
    for k in keys:
        np.testing.assert_allclose(Ht[k], H[k], rtol=rtol, atol=atol,
                                    err_msg=f"history key {k}")


def test_wb_dense_exact():
    # same dense solver on both paths: agreement limited only by
    # iteration-order effects, so the tolerance is near roundoff
    cfg = _cfg("lmpc_wb", 20, 10)
    _compare(cfg, 20, rtol=1e-9, atol=1e-10, use_structured=False)


def test_wb_structured():
    cfg = _cfg("lmpc_wb", 20, 10)
    _compare(cfg, 20, rtol=1e-6, atol=1e-7)


def test_cstr_schedules():
    # def_pxp/def_pyp disturbance schedules + defSP setpoint steps +
    # state/output bounds with infeasible early steps (fallback parity);
    # structured fast path vs host dense (production configuration)
    cfg = _cfg("lmpc_cstr", 25, 12)
    _compare(cfg, 25, rtol=1e-4, atol=1e-5)


def test_nlplant():
    # dense path on both sides -> threading fidelity at solver roundoff
    cfg = _cfg("lmpc_nlplant", 16, 10)
    _compare(cfg, 16, rtol=1e-8, atol=1e-8, use_structured=False)


def test_nlplant_structured():
    # production configuration: structured Riccati solver inside the scan
    # (what bench.py/closed_loop_bench run) vs the host dense loop —
    # agreement bounded by structured-vs-dense solver tolerance
    cfg = _cfg("lmpc_nlplant", 16, 10)
    _compare(cfg, 16, rtol=1e-4, atol=1e-5)


def test_xp_nlplant():
    # nx=4 model vs nxp=3 plant: exercises the nx != nxp threading
    cfg = _cfg("lmpcxp_nlplant", 16, 10)
    _compare(cfg, 16, rtol=1e-8, atol=1e-8, use_structured=False)


def test_xp_nlplant_structured():
    cfg = _cfg("lmpcxp_nlplant", 16, 10)
    _compare(cfg, 16, rtol=1e-4, atol=1e-5)


def test_nmpc_noise_ekf():
    # EKF + measurement white noise: the traced noise stream must match
    # the host rng draw order exactly
    cfg = _cfg("nmpc", 12, 10)
    _compare(cfg, 12, rtol=1e-8, atol=1e-8, use_structured=False)


def test_nmpc_structured():
    cfg = _cfg("nmpc", 12, 10)
    _compare(cfg, 12, rtol=1e-4, atol=1e-5)


def test_nmpc_dis_schedules():
    # discrete quadruple tank + def_pxp schedule + Delta-u bounds
    cfg = _cfg("nmpc_dis", 14, 10)
    _compare(cfg, 14, rtol=1e-8, atol=1e-8, use_structured=False)


def test_nmpc_dis_structured():
    cfg = _cfg("nmpc_dis", 14, 10)
    _compare(cfg, 14, rtol=1e-4, atol=1e-5)


def test_adaptation_traced():
    # modifier adaptation fully inside the traced step: ssp solve, lambda
    # IFT update, ssp2 plant optimum (MPC_code.py:829-874)
    from tests.test_adaptation import make_adaptation_config

    cfg = make_adaptation_config(Nsim=12)
    H = ClosedLoop(cfg).run()
    _, Ht = run_traced(cfg, Nsim=12)
    for k in ("U", "XS", "US", "LAMBDA", "COR", "Upopt", "Ypopt"):
        np.testing.assert_allclose(Ht[k], H[k], rtol=1e-6, atol=1e-8,
                                    err_msg=f"history key {k}")


def test_checkpointed_run_matches_and_resumes(tmp_path):
    # segmented checkpointed scan == single scan, and a resume from the
    # mid-sweep checkpoint reproduces the remainder exactly
    from mpc_code_tpu.examples.lmpc_wb import make_config
    from mpc_code_tpu.loop.batched import run_traced_checkpointed

    cfg = make_config(Nsim=14)
    path = str(tmp_path / "sweep.npz")
    _, H1 = run_traced(cfg, Nsim=14)
    _, H2 = run_traced_checkpointed(cfg, path, segment=5, Nsim=14,
                                    resume=False)
    for key in ("U", "Yp", "XS"):
        assert np.abs(H2[key] - H1[key]).max() < 1e-10, key

    # simulate a kill after the first segment: re-create the file with
    # only segment 1 done, then resume
    _, H_seg1 = run_traced_checkpointed(cfg, path, segment=5, Nsim=5,
                                        resume=False)
    _, H3 = run_traced_checkpointed(cfg, path, segment=5, Nsim=14,
                                    resume=True)
    assert H3["U"].shape == H1["U"].shape
    for key in ("U", "Yp", "XS"):
        assert np.abs(H3[key] - H1[key]).max() < 1e-10, key


def test_collocation_traced_matches_host():
    # collocated OCPs ride the structured (condensed) path in the traced
    # step; the host loop solves the dense simultaneous transcription —
    # cross-path agreement incl. the infeasibility-fallback semantics
    import dataclasses as dc

    from mpc_code_tpu.config import StageCost
    from mpc_code_tpu.examples import enmpc as ex
    from mpc_code_tpu.models.costs import xQx

    Q = np.eye(2)
    R = np.eye(1)

    def cost(x, u, y, xs, us, ys, s_coll):
        return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

    cfg = ex.make_config(Nsim=6).replace(
        N=6, stage_cost=StageCost(f_coll=cost), ContForm=False,
        Collocation=True)
    cfg.estimator = dc.replace(cfg.estimator, kind="ekf",
                               Q_kf=1e-5 * np.eye(4), R_kf=1e-4 * np.eye(2))
    Hh = ClosedLoop(cfg).run()
    _, Ht = run_traced(cfg, Nsim=6)
    assert np.array_equal(np.asarray(Ht["STATUS_DYN"]),
                          np.asarray(Hh["STATUS_DYN"]))
    assert np.abs(Ht["U"] - Hh["U"]).max() < 1e-5
