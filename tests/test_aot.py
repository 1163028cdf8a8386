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
