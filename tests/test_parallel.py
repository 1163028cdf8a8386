"""SPMD scaling tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4:
multi-chip without a pod)."""

import jax
import numpy as np
import pytest

from mpc_code_tpu.parallel import batched_closed_loop, make_mesh, shard_batch


def _cfg():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    return ge._small_cfg(N=4)


def test_mesh_sharded_batched_loop():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = _cfg()
    mesh = make_mesh(8)
    B = 16
    x0s = np.tile(np.asarray(cfg.x0_p, float), (B, 1)) + 0.05 * np.arange(B)[:, None]
    carry, out = batched_closed_loop(cfg, x0s, n_steps=3, mesh=mesh,
                                     ysp=np.array([0.2, 0.0, 0.0]))
    assert out.u.shape == (3, B, cfg.nu)
    assert (np.asarray(out.status_dyn) != 2).all()
    # the batch axis is actually sharded over the mesh
    shards = carry.x.sharding
    assert len(shards.device_set) == 8


def test_sharded_equals_unsharded():
    cfg = _cfg()
    B = 8
    x0s = np.tile(np.asarray(cfg.x0_p, float), (B, 1)) + 0.1 * np.arange(B)[:, None]
    _, out_m = batched_closed_loop(cfg, x0s, n_steps=2, mesh=make_mesh(8),
                                   ysp=np.array([0.2, 0.0, 0.0]))
    _, out_s = batched_closed_loop(cfg, x0s, n_steps=2, mesh=None,
                                   ysp=np.array([0.2, 0.0, 0.0]))
    assert np.allclose(np.asarray(out_m.u), np.asarray(out_s.u), atol=1e-10)


def _sharded_vs_unsharded(cfg, n_steps, B=8, atol=1e-10, x0=None,
                          jitter=0.02):
    """Run the FULL traced closed loop (schedules + noise + estimator +
    adaptation, `make_step_inputs`) for a batch of scenarios, sharded over
    the 8-device mesh and unsharded, and compare trajectories.

    Round-4 VERDICT item 3: the sharded pins previously covered only the
    linear-KF toy config; these run the flagship estimator-rich families.
    """
    from mpc_code_tpu.loop.schedules import make_step_inputs
    from mpc_code_tpu.parallel import make_closed_loop_runner

    x0 = np.asarray(cfg.x0_p, float) if x0 is None else np.asarray(x0, float)
    x0s = np.tile(x0, (B, 1)) * (1.0 + jitter * np.linspace(0, 1, B)[:, None])
    inputs = make_step_inputs(cfg, n_steps)
    out = {}
    for mesh in (make_mesh(8), None):
        runner = make_closed_loop_runner(cfg, n_steps, B, mesh=mesh)
        carry, o = runner(x0s, inputs)
        if mesh is not None:
            assert len(carry.x.sharding.device_set) == 8
        out[mesh is None] = o
    assert (np.asarray(out[True].status_dyn) != 2).all()
    for field in ("u", "status_dyn", "xhat", "dhat"):
        a = np.asarray(getattr(out[True], field))
        b = np.asarray(getattr(out[False], field))
        assert np.allclose(a, b, atol=atol), field
    return out[True]


def test_sharded_nmpc_structured():
    # nonlinear CSTR NMPC: EKF + structured Riccati solver + noise stream
    from mpc_code_tpu.examples.nmpc import make_config

    cfg = make_config(Nsim=3).replace(N=6)
    _sharded_vs_unsharded(cfg, 3, jitter=0.01)


def test_sharded_mhe_smooth():
    # ENMPC flagship: smooth MHE (traced growing-horizon warmup) +
    # economic ContForm OCP, sharded over the mesh
    import dataclasses as dc

    from mpc_code_tpu.examples.enmpc import make_config

    cfg = make_config(Nsim=3).replace(N=6)
    cfg = cfg.replace(estimator=dc.replace(cfg.estimator, N_mhe=3))
    _sharded_vs_unsharded(cfg, 3, B=8, x0=cfg.x0_p, jitter=0.01)


def test_sharded_adaptation():
    # modifier adaptation (ssp solve + IFT lambda update + ssp2) inside
    # the sharded traced step
    import sys as _sys
    sys_path_dir = __file__
    from test_adaptation import make_adaptation_config

    cfg = make_adaptation_config(Nsim=3).replace(N=6)
    _sharded_vs_unsharded(cfg, 3, jitter=0.01)


def test_aggregate_metrics_psum():
    # shard_map + psum/pmax metric aggregation over the virtual 8-device
    # mesh matches the host computation (SURVEY.md §2.4 collectives)
    from mpc_code_tpu.parallel.mesh import aggregate_metrics, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    st = rng.integers(0, 3, size=64).astype(np.int32)
    it = rng.integers(1, 40, size=64).astype(np.int32)
    out = aggregate_metrics(st, it, mesh)
    assert out["n_ok"] == int((st != 2).sum())
    assert out["n_total"] == 64
    assert out["max_iters"] == int(it.max())
    assert out["sum_iters"] == int(it.sum())


def test_closed_loop_runner_reuse_and_aot(tmp_path, monkeypatch):
    # make_closed_loop_runner: one build, many calls, matches the one-shot
    # wrapper; with aot_key the traced scan persists and a reloaded
    # artifact reproduces the run exactly (utils/aot.py)
    from mpc_code_tpu.parallel import make_closed_loop_runner

    monkeypatch.setenv("MPC_TPU_AOT_CACHE", str(tmp_path))
    cfg = _cfg()
    B = 4
    x0s = np.tile(np.asarray(cfg.x0_p, float), (B, 1)) + 0.1 * np.arange(B)[:, None]
    ysp = np.array([0.2, 0.0, 0.0])

    _, ref = batched_closed_loop(cfg, x0s, n_steps=2, ysp=ysp)
    runner = make_closed_loop_runner(cfg, 2, B, ysp=ysp)
    _, o1 = runner(x0s)
    _, o2 = runner(x0s + 1e-6)
    assert np.allclose(np.asarray(o1.u), np.asarray(ref.u), atol=0)
    assert not np.array_equal(np.asarray(o2.u), np.asarray(o1.u))

    r_aot = make_closed_loop_runner(cfg, 2, B, ysp=ysp, aot_key="test-clr")
    _, oa = r_aot(x0s)
    assert np.allclose(np.asarray(oa.u), np.asarray(ref.u), atol=0)
    assert len(list(tmp_path.glob("*.jaxexp"))) == 1
    # second build LOADS the artifact and agrees bitwise
    r_aot2 = make_closed_loop_runner(cfg, 2, B, ysp=ysp, aot_key="test-clr")
    _, ob = r_aot2(x0s)
    assert np.array_equal(np.asarray(ob.u), np.asarray(oa.u))
