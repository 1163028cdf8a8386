"""Ahead-of-time solver artifacts: persistent jax.export cache.

Tracing + lowering the structured solver is the dominant start-up cost on
the remote-TPU toolchain — measured ~57 s per (function, shape) at the
bench point, vs ~13 s of backend compile (served by the XLA persistent
cache) and 0.1 s of execution.  ``jax.export`` snapshots the traced
StableHLO; deserializing it in a later process skips Python tracing
entirely (measured: 0.0 s deserialize + 5.3 s compile-from-cache for the
same artifact that costs ~107 s to rebuild from source).

`export_cached` wraps a jitted function in a content-addressed artifact
cache keyed by (jax version, platform, caller key, arg shapes, SOURCE
TREE HASH) — the source hash makes edits to the library invalidate stale
artifacts instead of silently serving old behavior.

This is also the deployment story for production serving: ship the
``.jaxexp`` artifacts with the model config and a fresh replica starts
solving in seconds instead of minutes.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache
from typing import Any, Callable, Sequence

import jax


@lru_cache(maxsize=1)
def _register_serializations() -> bool:
    """Register the library's result NamedTuples for jax.export pytree
    serialization (needed both to export and to deserialize)."""
    from jax import export as jexport

    from mpc_code_tpu.estimators.mhe import MHECarry, MHESmoothState
    from mpc_code_tpu.loop.batched import MPCCarry, MPCStepOut
    from mpc_code_tpu.loop.schedules import StepInput
    from mpc_code_tpu.solver.nlp import IPMResult
    from mpc_code_tpu.solver.riccati import StructResult

    for t in (StructResult, IPMResult, MPCCarry, MPCStepOut, MHECarry,
              MHESmoothState, StepInput):
        try:
            jexport.register_namedtuple_serialization(
                t, serialized_name=f"mpc_code_tpu.{t.__name__}")
        except ValueError:
            pass  # already registered (e.g. by a consumer)
    return True


@lru_cache(maxsize=1)
def _source_tree_hash() -> str:
    """Content hash over the library's .py sources (order-stable)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fname in sorted(filenames):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            h.update(fname.encode())
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def export_cached(fn: Callable, key: str, args_shapes: Sequence[Any],
                  cache_dir: str | None = None,
                  verbose: bool = False) -> Callable:
    """Return a jitted callable for ``fn`` specialized to ``args_shapes``
    (a sequence of ``jax.ShapeDtypeStruct``), loading the traced artifact
    from ``cache_dir`` when a valid one exists and exporting + persisting
    it otherwise.

    ``key`` should identify everything that shapes the computation beyond
    the arg shapes (solver options, problem constants); the cache key also
    folds in the jax version, the default backend platform, and the
    library source hash, so artifacts can never go stale silently — any
    mismatch falls back to a fresh trace.
    """
    from jax import export as jexport

    _register_serializations()
    cache_dir = cache_dir or os.environ.get(
        "MPC_TPU_AOT_CACHE", "/tmp/mpc_tpu_aot_cache")
    platform = jax.default_backend()
    flat_shapes, treedef = jax.tree_util.tree_flatten(tuple(args_shapes))
    full = hashlib.sha256("|".join(
        [jax.__version__, platform, key, _source_tree_hash(), str(treedef)]
        + [f"{tuple(s.shape)}:{s.dtype}" for s in flat_shapes]
    ).encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"{full}.jaxexp")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
            if verbose:
                print(f"# aot: loaded {path}", flush=True)
            return jax.jit(exp.call)
        except Exception as e:  # version skew, corrupt file -> re-export
            if verbose:
                print(f"# aot: stale artifact ({type(e).__name__}), "
                      "re-exporting", flush=True)

    jfn = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    exp = jexport.export(jfn)(*args_shapes)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(exp.serialize())
    os.replace(tmp, path)
    if verbose:
        print(f"# aot: exported {path}", flush=True)
    return jax.jit(exp.call)
