"""One-shot timed autotune of the derivative-sweep implementation.

Round-3/4 froze the lanes-minor/batch-major crossover as a constant
(`MPC_TPU_FAST_SWEEP_MAX_B=2048`) from one chip's A/B; round-4 VERDICT
item 7 asked for a self-healing choice.  With `MPC_TPU_SWEEP_AUTOTUNE=1`,
`build_structured_ocp` probes the available implementations (pallas /
lanes-minor XLA / batch-major jacfwd) ON THE ACTUAL MODEL at the build's
``batch_hint`` shapes, picks the fastest, and caches the decision in a
JSON file keyed by a content hash of (model function, shapes, platform,
jax version, library source) — a fresh toolchain or chip re-probes
instead of inheriting a stale constant.  Probe cost: one compile per
implementation on first use (~20-60 s total on the remote toolchain),
0 s afterwards.

Opt-in because the default ('pallas' on TPU/f32) is already the measured
winner across every round-5 regime; the probe exists so future hardware
does not need a human re-running `tools/sweep_microbench.py`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _cache_path() -> str:
    d = os.environ.get("MPC_TPU_AOT_CACHE", "/tmp/mpc_tpu_aot_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "sweep_autotune.json")


def autotune_sweep_impl(f, Mx, clip_lo, clip_hi, batch, N, nx, nu, npx, nd,
                        verbose: bool = False) -> str:
    """Return the fastest impl name ('pallas' | 'lanes' | 'jacfwd') for
    this (model, shapes, platform), timing each once and caching."""
    import jax
    import jax.numpy as jnp

    from mpc_code_tpu.utils.aot import _source_tree_hash, content_hash

    key = content_hash(f, Mx, clip_lo, clip_hi, int(batch), int(N),
                       int(nx), int(nu), int(npx), int(nd),
                       jax.default_backend(), jax.__version__,
                       _source_tree_hash())
    path = _cache_path()
    try:
        with open(path) as fh:
            cache = json.load(fh)
    except (OSError, ValueError):
        cache = {}
    if key in cache:
        return cache[key]

    from mpc_code_tpu.ops import integrators
    from mpc_code_tpu.ops.sweep_pallas import (
        pallas_sweep_available, rk4_stage_jac_pallas,
    )

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.asarray(
        0.0).dtype
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(batch, N, nx)).astype(dtype))
    us = jnp.asarray(rng.normal(size=(batch, N, nu)).astype(dtype))
    pxs = jnp.zeros((batch, N, npx), dtype)
    t = jnp.zeros((batch,), dtype)
    h = jnp.full((batch,), 0.1, dtype)
    d = jnp.zeros((batch, nd), dtype)

    candidates = {}
    if pallas_sweep_available(dtype):
        candidates["pallas"] = jax.jit(rk4_stage_jac_pallas(
            f, Mx, clip_lo=clip_lo, clip_hi=clip_hi))
    for name in ("lanes", "jacfwd"):
        def mk(nm):
            def run(xs_, us_, pxs_, t_, h_, d_):
                # env read happens at TRACE time (first jit call), which
                # executes synchronously inside the wrapper below
                old = os.environ.get("MPC_TPU_SWEEP_IMPL")
                os.environ["MPC_TPU_SWEEP_IMPL"] = nm
                try:
                    F = integrators.rk4_stage_jac(f, Mx, clip_lo=clip_lo,
                                                  clip_hi=clip_hi)
                    return jax.vmap(F)(xs_, us_, pxs_, t_, h_, d_)
                finally:
                    if old is None:
                        os.environ.pop("MPC_TPU_SWEEP_IMPL", None)
                    else:
                        os.environ["MPC_TPU_SWEEP_IMPL"] = old
            return jax.jit(run)
        candidates[name] = mk(name)

    times = {}
    for name, fn in candidates.items():
        try:
            out = fn(xs, us, pxs, t, h, d)
            np.asarray(out[0][0, 0])  # compile + materialize
            best = np.inf
            for r in range(2):
                xr = xs + jnp.asarray(1e-6 * (r + 1), dtype)
                t0 = time.time()
                np.asarray(fn(xr, us, pxs, t, h, d)[0][0, 0])
                best = min(best, time.time() - t0)
            times[name] = best
        except Exception as e:  # compile failure -> candidate unavailable
            if verbose:
                print(f"# autotune: {name} failed ({type(e).__name__})",
                      flush=True)
    if not times:
        return "jacfwd"
    winner = min(times, key=times.get)
    if verbose:
        print("# autotune sweep impl: "
              + ", ".join(f"{k}={v*1e3:.1f}ms" for k, v in times.items())
              + f" -> {winner}", flush=True)
    cache[key] = winner
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(cache, fh)
    os.replace(tmp, path)
    return winner
