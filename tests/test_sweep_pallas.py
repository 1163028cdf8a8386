"""Fused Pallas dynamics sweep (ops/sweep_pallas.py) vs the jacfwd paths.

Interpret mode on CPU: validates the lanes-dense packing/padding, the
in-kernel tangent propagation, the scalar-literal clip guard, and the
solver-level integration against the generic batch-major jacfwd sweep.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _ode(x, t, u, d, px):
    return jnp.stack([x[1] * u[0] - jnp.exp(-x[0]) + px[0] + d[0],
                      -x[0] * x[2] + u[1] * t,
                      x[0] - 0.5 * x[2] + d[1] * u[0]])


def _data(B, N, nx=3, nu=2, npx=1, nd=2, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(B, N, nx)) * 0.3),
            jnp.asarray(rng.normal(size=(B, N, nu)) * 0.2),
            jnp.asarray(rng.normal(size=(B, N, npx)) * 0.1),
            jnp.asarray(rng.normal(size=(B,)) * 0.1),
            jnp.full((B,), 0.2),
            jnp.asarray(rng.normal(size=(B, nd)) * 0.1))


def test_rk4_pallas_matches_jacfwd(monkeypatch):
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
    from mpc_code_tpu.ops.integrators import rk4_stage_jac

    F = rk4_stage_jac(_ode, 4)
    xs, us, pxs, t, h, d = _data(5, 3)
    bat = jax.jit(jax.vmap(F))(xs, us, pxs, t, h, d)   # pallas rule
    ref = [F(xs[b], us[b], pxs[b], t[b], h[b], d[b]) for b in range(5)]
    for i in range(3):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-10


def test_rk4_pallas_clip_guard(monkeypatch):
    """Scalar-literal in-kernel clip == composed jnp.clip semantics,
    including the zero-derivative region outside the box."""
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    from mpc_code_tpu.ops.integrators import rk4_stage_jac

    lo = np.array([-0.2, -np.inf, -0.25])
    hi = np.array([0.2, 0.3, np.inf])
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
    Fp = rk4_stage_jac(_ode, 4, clip_lo=lo, clip_hi=hi)
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "lanes")
    Fl = rk4_stage_jac(_ode, 4, clip_lo=lo, clip_hi=hi)

    xs, us, pxs, t, h, d = _data(4, 3, seed=2)
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
    got = jax.vmap(Fp)(xs, us, pxs, t, h, d)
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "lanes")
    ref = jax.vmap(Fl)(xs, us, pxs, t, h, d)
    for g, r in zip(got, ref):
        assert np.abs(np.asarray(g) - np.asarray(r)).max() < 1e-10


def test_map_pallas_matches_jacfwd(monkeypatch):
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
    from mpc_code_tpu.ops.integrators import map_stage_jac

    def Fmap(x, u, d, t, px):
        return jnp.stack([0.9 * x[0] + 0.1 * jnp.tanh(x[1]) + u[0],
                          x[1] - 0.2 * x[0] * u[0] + px[0] + d[0] * t])

    F = map_stage_jac(Fmap)
    rng = np.random.default_rng(1)
    B, N = 4, 3
    xs = jnp.asarray(rng.normal(size=(B, N, 2)))
    us = jnp.asarray(rng.normal(size=(B, N, 1)))
    pxs = jnp.asarray(rng.normal(size=(B, N, 1)))
    t = jnp.asarray(rng.normal(size=(B,)))
    d = jnp.asarray(rng.normal(size=(B, 1)))
    bat = jax.jit(jax.vmap(F))(xs, us, pxs, t, d)
    ref = [F(xs[b], us[b], pxs[b], t[b], d[b]) for b in range(B)]
    for i in range(3):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-10


def test_solver_pallas_sweep_matches_generic(monkeypatch):
    """Solver-level: the split sweep with the Pallas kernel converges to
    the generic batch-major jacfwd solver's solution on the CSTR NMPC
    (same per-lane statuses, inputs to solver tolerance)."""
    import dataclasses as dc
    import os

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.nmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    N = 8
    cfg = make_config().replace(N=N, R_wn=None)
    cfg = cfg.replace(model=dc.replace(
        cfg.model, Mx=4,
        clip_lo=np.array([0.0, 280.0, 0.4]),
        clip_hi=np.array([2.0, 420.0, 1.0])))
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    xs = np.array([0.874317, 325.0, 0.6528])
    us = np.array([300.157, 0.1])
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform([0.4, 320, 0.56], [0.9, 334, 0.67],
                                  size=(4, 3)))

    res = {}
    for mode in ("pallas", "generic"):
        if mode == "pallas":
            monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
            monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
            monkeypatch.setenv("MPC_TPU_FAST_SWEEP", "1")
        else:
            monkeypatch.delenv("MPC_TPU_PALLAS_INTERPRET", raising=False)
            monkeypatch.delenv("MPC_TPU_SWEEP_IMPL", raising=False)
            monkeypatch.setenv("MPC_TPU_FAST_SWEEP", "0")
        socp = build_structured_ocp(cfg, model, f_obj, vfin)
        assert (socp.stage_dyn_jac is not None) == (mode == "pallas")
        solve = make_structured_solver(
            socp, SolverOptions(max_iter=60, tol=1e-8,
                                hessian="gauss_newton"))
        nxa = socp.nxa

        def lane(x0):
            par = dict(x0=x0, xs=jnp.asarray(xs), us=jnp.asarray(us),
                       d=jnp.asarray([0.0, 0.1]), um1=jnp.asarray(us),
                       t=jnp.asarray(0.0),
                       lam=jnp.zeros((cfg.ny, cfg.nu)),
                       px=jnp.zeros((N, cfg.npx)),
                       py=jnp.zeros((N, cfg.npy)))
            xa0 = jnp.zeros(nxa).at[:cfg.nx].set(x0)
            X0 = jnp.tile(xa0[None], (N + 1, 1))
            U0 = jnp.zeros((N, socp.nu)).at[:, :cfg.nu].set(jnp.asarray(us))
            return solve(par, X0, U0)

        res[mode] = jax.jit(jax.vmap(lane))(x0s)

    assert (np.asarray(res["pallas"].status) != 2).all()
    assert (np.asarray(res["pallas"].status)
            == np.asarray(res["generic"].status)).all()
    # same KKT point to solver tolerance (op orderings differ)
    assert np.abs(np.asarray(res["pallas"].U)
                  - np.asarray(res["generic"].U)).max() < 1e-5


def test_autotune_probe_and_cache(tmp_path, monkeypatch):
    """MPC_TPU_SWEEP_AUTOTUNE: the probe times the available sweep impls
    on the actual model, returns a valid name, and caches the decision
    (second call is instant, same answer)."""
    import time

    monkeypatch.setenv("MPC_TPU_AOT_CACHE", str(tmp_path))
    from mpc_code_tpu.examples.nmpc import model_fxm
    from mpc_code_tpu.ops.sweep_autotune import autotune_sweep_impl

    def _ode(xx, tt, uu, dd, pp):
        return model_fxm(xx, uu, dd, tt, pp)

    w = autotune_sweep_impl(_ode, 3, None, None, 16, 5, 3, 2, 3, 2)
    assert w in ("pallas", "lanes", "jacfwd")
    t0 = time.time()
    w2 = autotune_sweep_impl(_ode, 3, None, None, 16, 5, 3, 2, 3, 2)
    assert w2 == w and time.time() - t0 < 0.5
    # a different shape signature re-probes (separate cache line)
    w3 = autotune_sweep_impl(_ode, 3, None, None, 32, 5, 3, 2, 3, 2)
    assert w3 in ("pallas", "lanes", "jacfwd")


def test_contform_pallas_matches_generic(monkeypatch):
    """ContForm joint sweep kernel (value+J+quadrature grad/Hessian via
    nested jvp) vs the per-stage jacfwd+hessian fallback."""
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
    from mpc_code_tpu.ops.integrators import rk4_quad_stage_hess

    def ode(x, t, u, d, px, xs, us, py):
        return jnp.stack([x[1] * u[0] - jnp.exp(-x[0]) + px[0] + d[0],
                          -x[0] * x[1] * 0.5 + u[0] * t + xs[0] * 0.01])

    def quad(x, t, u, d, px, xs, us, py):
        y = jnp.stack([x[0], x[1]])
        return u[0] * (1.3 - 0.7 * y[1]) + 0.1 * (x[0] - xs[0]) ** 2

    F = rk4_quad_stage_hess(ode, quad, 3)
    rng = np.random.default_rng(0)
    B, N, nx, nu = 4, 3, 2, 1
    args = (jnp.asarray(rng.normal(size=(B, N, nx)) * 0.3),
            jnp.asarray(rng.normal(size=(B, N, nu)) * 0.2),
            jnp.asarray(rng.normal(size=(B, N, 1)) * 0.1),
            jnp.asarray(rng.normal(size=(B, N, 1)) * 0.1),
            jnp.asarray(rng.normal(size=(B,)) * 0.1),
            jnp.full((B,), 0.2),
            jnp.asarray(rng.normal(size=(B, 2)) * 0.1),
            jnp.asarray(rng.normal(size=(B, nx)) * 0.1),
            jnp.asarray(rng.normal(size=(B, nu)) * 0.1))
    bat = jax.jit(jax.vmap(F))(*args)          # pallas rule
    ref = [F(*[a[b] for a in args]) for b in range(B)]
    for i in range(6):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-10, i


def test_solver_contform_pallas_matches_generic(monkeypatch):
    """ENMPC-style economic OCP solved through the Pallas ContForm sweep
    vs the generic dense sweep: same statuses, same KKT point."""
    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.examples.enmpc import make_config
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )
    import dataclasses as dc

    N = 6
    cfg = make_config().replace(N=N)
    cfg = cfg.replace(model=dc.replace(cfg.model, Mx=4))
    model = build_model(cfg)
    f_obj = build_stage_cost(cfg.stage_cost)
    vfin = build_terminal_cost(cfg)
    x0_b = np.asarray(cfg.x0_m, float)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(x0_b + rng.uniform(-0.15, 0.15, size=(4, 2)))
    us0 = np.asarray(cfg.u0, float)

    res = {}
    for mode in ("pallas", "generic"):
        if mode == "pallas":
            monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
            monkeypatch.setenv("MPC_TPU_SWEEP_IMPL", "pallas")
            monkeypatch.setenv("MPC_TPU_FAST_SWEEP", "1")
        else:
            monkeypatch.delenv("MPC_TPU_PALLAS_INTERPRET", raising=False)
            monkeypatch.delenv("MPC_TPU_SWEEP_IMPL", raising=False)
            monkeypatch.setenv("MPC_TPU_FAST_SWEEP", "0")
        socp = build_structured_ocp(cfg, model, f_obj, vfin)
        assert (socp.stage_cf is not None) == (mode == "pallas")
        solve = make_structured_solver(
            socp, SolverOptions(max_iter=80, tol=1e-8,
                                hessian="gauss_newton"))

        def lane(x0):
            par = dict(x0=x0, xs=jnp.asarray(x0_b), us=jnp.asarray(us0),
                       d=jnp.zeros(2), um1=jnp.asarray(us0),
                       t=jnp.asarray(0.0),
                       lam=jnp.zeros((cfg.ny, cfg.nu)),
                       px=jnp.zeros((N, cfg.npx)),
                       py=jnp.zeros((N, cfg.npy)))
            X0 = jnp.tile(x0[None], (N + 1, 1))
            U0 = jnp.tile(jnp.asarray(us0), (N, 1))
            return solve(par, X0, U0)

        res[mode] = jax.jit(jax.vmap(lane))(x0s)

    assert (np.asarray(res["pallas"].status)
            == np.asarray(res["generic"].status)).all()
    ok = np.asarray(res["generic"].status) != 2
    assert ok.any()
    dev = np.abs(np.asarray(res["pallas"].U)
                 - np.asarray(res["generic"].U))[ok].max()
    assert dev < 1e-5, dev


def test_rk4_pallas_zero_size_leaves(monkeypatch):
    """Zero-size d/px leaves never enter the kernel (Mosaic rejects
    zero-size operands) and are reconstructed as dead trace-time values —
    chip-verified on TPU v5e (round 5), pinned here in interpret mode."""
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    from mpc_code_tpu.ops.sweep_pallas import rk4_stage_jac_pallas

    def ode(x, t, u, d, px):   # ignores d and px entirely
        return jnp.stack([x[1] * u[0] - jnp.exp(-x[0]),
                          -x[0] * 0.5 + u[1] * t])

    F = rk4_stage_jac_pallas(ode, 3)
    rng = np.random.default_rng(4)
    B, N = 4, 3
    xs = jnp.asarray(rng.normal(size=(B, N, 2)) * 0.3)
    us = jnp.asarray(rng.normal(size=(B, N, 2)) * 0.2)
    out = F(xs, us, jnp.zeros((B, N, 0)), jnp.zeros((B,)),
            jnp.full((B,), 0.2), jnp.zeros((B, 0)))
    assert np.isfinite(np.asarray(out[0])).all()
    assert out[1].shape == (B, N, 2, 2) and out[2].shape == (B, N, 2, 2)
