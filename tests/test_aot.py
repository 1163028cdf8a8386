"""AOT artifact cache (utils/aot.py): export -> persist -> reload parity."""

import numpy as np
import pytest


def test_export_cached_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from mpc_code_tpu.config import (
        Bounds, LinearModel, MPCConfig, SolverOptions, SSCost, StageCost,
        DisturbanceModel, LinearPlant,
    )
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )
    from mpc_code_tpu.utils.aot import export_cached

    A = np.array([[0.9, 0.1], [0.0, 0.8]])
    B = np.array([[0.0], [1.0]])
    cfg = MPCConfig(
        nx=2, nu=1, ny=2, nd=2, Nsim=5, N=4, h=1.0,
        model=LinearModel(A=A, B=B, C=np.eye(2)),
        plant=LinearPlant(Ap=A, Bp=B, Cp=np.eye(2)),
        dist=DisturbanceModel(offree="no"),
        x0_p=np.ones(2), x0_m=np.ones(2), u0=np.zeros(1),
        ss_cost=SSCost(Qss=np.eye(2), Rss=np.zeros((1, 1))),
        stage_cost=StageCost(Q=np.eye(2), R=0.1 * np.eye(1)),
        bounds=Bounds(umin=np.array([-2.0]), umax=np.array([2.0])),
    )
    model = build_model(cfg)
    socp = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                build_terminal_cost(cfg))
    solve = make_structured_solver(socp, SolverOptions(max_iter=30))

    def lane(x0):
        par = dict(x0=x0, xs=jnp.zeros(2), us=jnp.zeros(1), d=jnp.zeros(2),
                   um1=jnp.zeros(1), t=jnp.asarray(0.0),
                   lam=jnp.zeros((2, 1)),
                   px=jnp.zeros((4, cfg.npx)), py=jnp.zeros((4, cfg.npy)))
        X0 = jnp.tile(x0[None], (5, 1))
        U0 = jnp.zeros((4, 1))
        return solve(par, X0, U0)

    fn = jax.jit(jax.vmap(lane))
    shapes = (jax.ShapeDtypeStruct((8, 2), jnp.float64),)
    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))

    ref = fn(x0s)
    c1 = export_cached(fn, "test-lane", shapes, cache_dir=str(tmp_path))
    files = list(tmp_path.glob("*.jaxexp"))
    assert len(files) == 1, "artifact should be persisted"

    # second construction must LOAD (not re-export): poison detection via
    # artifact mtime
    mtime = files[0].stat().st_mtime
    c2 = export_cached(fn, "test-lane", shapes, cache_dir=str(tmp_path))
    assert files[0].stat().st_mtime == mtime, "should load, not re-export"

    for c in (c1, c2):
        out = c(x0s)
        np.testing.assert_array_equal(np.asarray(out.status),
                                      np.asarray(ref.status))
        np.testing.assert_allclose(np.asarray(out.U), np.asarray(ref.U),
                                   rtol=0, atol=0)

    # a different key produces a different artifact (no collisions)
    export_cached(fn, "test-lane-2", shapes, cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("*.jaxexp"))) == 2


def test_content_hash_config_identity():
    """utils.aot.content_hash (round-5): two independently-constructed
    identical MPCConfigs hash identically (automatic artifact sharing);
    any one-field change — a number, an array entry, or the SOURCE of a
    model callable — changes the hash."""
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.utils.aot import content_hash

    h1 = content_hash(make_config())
    h2 = content_hash(make_config())
    assert h1 == h2

    assert content_hash(make_config().replace(N=49)) != h1
    cfg3 = make_config()
    q = np.asarray(cfg3.stage_cost.Q).copy()
    q[0, 0] += 1e-9
    import dataclasses as dc

    cfg3 = cfg3.replace(stage_cost=dc.replace(cfg3.stage_cost, Q=q))
    assert content_hash(cfg3) != h1

    # callable identity follows SOURCE + captured values, not object id
    a = np.array([1.0, 2.0])

    def mk(arr):
        def f(x):
            return x + arr
        return f

    assert content_hash(mk(a)) == content_hash(mk(a.copy()))
    assert content_hash(mk(a)) != content_hash(mk(np.array([1.0, 3.0])))


def test_runner_auto_aot_key(tmp_path, monkeypatch):
    """make_closed_loop_runner(aot_key='auto'): same config -> shared
    artifact with NO hand-written key; a config change misses."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    from mpc_code_tpu.parallel import make_closed_loop_runner

    monkeypatch.setenv("MPC_TPU_AOT_CACHE", str(tmp_path))
    cfg = ge._small_cfg(N=4)
    ysp = np.array([0.2, 0.0, 0.0])
    x0s = np.tile(np.asarray(cfg.x0_p, float), (4, 1))

    r1 = make_closed_loop_runner(cfg, 2, 4, ysp=ysp, aot_key="auto")
    _, o1 = r1(x0s)
    files = sorted(tmp_path.glob("*.jaxexp"))
    assert len(files) == 1
    mtime = files[0].stat().st_mtime

    # an independently-built identical config LOADS the artifact
    r2 = make_closed_loop_runner(ge._small_cfg(N=4), 2, 4, ysp=ysp,
                                 aot_key="auto")
    _, o2 = r2(x0s)
    assert len(list(tmp_path.glob("*.jaxexp"))) == 1
    assert files[0].stat().st_mtime == mtime
    assert np.array_equal(np.asarray(o1.u), np.asarray(o2.u))

    # a one-field change misses (new artifact)
    r3 = make_closed_loop_runner(ge._small_cfg(N=5), 2, 4, ysp=ysp,
                                 aot_key="auto")
    r3(x0s)
    assert len(list(tmp_path.glob("*.jaxexp"))) == 2
