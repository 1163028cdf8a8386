"""Fused stage-sweep Pallas kernel (solver/sweep_kernel.py) vs the plain
vmapped sweep — interpret mode on CPU (the Mosaic path itself is exercised
on the chip by bench.py / the driver compile check).

Reference analog: the sweep is the per-iteration derivative work CasADi's
Function VM + IPOPT callbacks perform (SURVEY.md section 2.2).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_code_tpu.examples.nmpc import make_config
from mpc_code_tpu.models import (
    build_model, build_stage_cost, build_terminal_cost,
)
from mpc_code_tpu.solver.riccati import build_structured_ocp, make_stage_derivs
from mpc_code_tpu.solver.sweep_kernel import make_stage_sweep

N = 7
B = 5


@pytest.fixture(scope="module")
def problem():
    # build under x64-off, mirroring the chip: an x64 build would bake
    # f64 closure constants into the stage functions and the f32 kernel
    # would (correctly) refuse and fall back
    with jax.enable_x64(False):
        cfg = make_config().replace(N=N, R_wn=None)
        model = build_model(cfg)
        s = build_structured_ocp(cfg, model, build_stage_cost(cfg.stage_cost),
                                 build_terminal_cost(cfg))
        sd = make_stage_derivs(s, "gauss_newton")
    return cfg, s, sd


def _args(cfg, s, batched_p=True):
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    Xs = jnp.asarray(rng.uniform(0.3, 0.9, (B, N, s.nxa)), f32)
    Us = jnp.asarray(rng.uniform(0.1, 0.5, (B, N, s.nu)), f32)
    lam = jnp.asarray(rng.normal(0, 0.1, (B, N, s.nxa)), f32)
    nus = jnp.asarray(rng.normal(0, 0.1, (B, N, s.ni)), f32)
    muh = jnp.zeros((B, N, s.n_eq), f32)
    p = dict(
        x0=jnp.asarray(rng.uniform(0.3, 0.9, (B, s.nxa)), f32),
        xs=jnp.asarray(np.tile([0.87, 325.0, 0.65], (B, 1)), f32),
        us=jnp.asarray(np.tile([300.0, 0.1], (B, 1)), f32),
        d=jnp.asarray(np.tile([0.0, 0.1], (B, 1)), f32),
        um1=jnp.asarray(np.tile([300.0, 0.1], (B, 1)), f32),
        t=jnp.zeros((B,), f32),
        lam=jnp.zeros((B, cfg.ny, cfg.nu), f32),
        px=jnp.asarray(rng.normal(0, 0.01, (B, N, cfg.npx)), f32),
        py=jnp.asarray(rng.normal(0, 0.01, (B, N, cfg.npy)), f32),
        _sf=jnp.ones((B,), f32),
    )
    shared = () if batched_p else ("xs", "us", "d", "um1", "t", "lam", "_sf")
    p_axes = {k: (None if k in shared else 0) for k in p}
    p = {k: (v[0] if k in shared else v) for k, v in p.items()}
    return (Xs, Us, p, lam, nus, muh), (0, 0, p_axes, 0, 0, 0)


def _reference(cfg, s, sd, args):
    Xs, Us, p, lam, nus, muh = args
    ks = jnp.arange(N)
    v_stage = jax.vmap(sd, in_axes=(0, 0, 0, None, 0, 0, 0))
    # broadcast every leaf to (B, ...) batch-major for the reference vmap
    p_full = {}
    for k, v in p.items():
        if v.ndim and v.shape[0] == B:
            p_full[k] = v
        else:
            p_full[k] = jnp.broadcast_to(v, (B,) + v.shape)
    return jax.vmap(lambda X, U, pp, l, nu_, mh: v_stage(X, U, ks, pp, l,
                                                         nu_, mh))(
        Xs, Us, p_full, lam, nus, muh)


def _compare(ref, got, rtol):
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(ref),
                                   jax.tree_util.tree_leaves(got))):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        if a.size:
            rel = (np.abs(a - b) / (np.abs(a) + 1e-6)).max()
            assert rel < rtol, (i, rel)


def test_fallback_identical(problem):
    """Off-TPU (no interpret flag) the sweep is the plain vmapped sweep."""
    cfg, s, sd = problem
    args, in_axes = _args(cfg, s)
    sweep = make_stage_sweep(sd, N)
    ref = _reference(cfg, s, sd, args)
    got = jax.vmap(sweep, in_axes=in_axes)(*args)
    _compare(ref, got, rtol=1e-12)


def test_interpret_kernel_matches(problem, monkeypatch):
    """Pallas interpret mode reproduces the sweep (f32 association tol)."""
    cfg, s, sd = problem
    args, in_axes = _args(cfg, s)
    ref = _reference(cfg, s, sd, args)
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    sweep = make_stage_sweep(sd, N)
    got = jax.vmap(sweep, in_axes=in_axes)(*args)
    _compare(ref, got, rtol=1e-4)


def test_interpret_kernel_chunked(problem, monkeypatch):
    """MPC_TPU_SWEEP_CHUNK splits the stages over several pallas_calls."""
    cfg, s, sd = problem
    args, in_axes = _args(cfg, s)
    ref = _reference(cfg, s, sd, args)
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MPC_TPU_SWEEP_CHUNK", "3")  # N=7 -> 3+3+1
    sweep = make_stage_sweep(sd, N)
    got = jax.vmap(sweep, in_axes=in_axes)(*args)
    _compare(ref, got, rtol=1e-4)


def test_interpret_kernel_shared_leaves(problem, monkeypatch):
    """Lane-invariant (unbatched) p leaves ride the shared input path."""
    cfg, s, sd = problem
    args, in_axes = _args(cfg, s, batched_p=False)
    ref = _reference(cfg, s, sd, args)
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    sweep = make_stage_sweep(sd, N)
    got = jax.vmap(sweep, in_axes=in_axes)(*args)
    _compare(ref, got, rtol=1e-4)
