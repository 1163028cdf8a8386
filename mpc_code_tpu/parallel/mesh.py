"""Device-mesh utilities and the sharded batched closed loop.

The reference is strictly serial single-process Python (SURVEY.md §2.4 —
no distributed code exists to port).  The TPU-native scaling design:

- **batch (data) parallelism** over independent MPC scenarios is the
  natural axis: each scenario's solve chain is independent, so the batch is
  sharded over ICI with `jax.sharding.NamedSharding(mesh, P('batch'))` and
  XLA runs every lane without cross-chip communication inside the solve.
- **cross-chip reductions** (`psum` via standard collectives under jit)
  appear only for metric aggregation (convergence counters, benchmark
  reductions).
- **multi-host** runs initialize `jax.distributed` over DCN
  (`init_distributed`) and use the same mesh spanning all processes.
- **within-solve parallelism** across chips is deliberately out of scope at
  reference problem sizes (N <= 50, nx <= 6; SURVEY.md §2.4(c)): the
  horizon dimension is exploited on-chip (vmapped stages; Riccati
  recursion), not across chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.loop.batched import init_carry, make_mpc_step


def init_distributed(**kw):
    """Multi-host initialization over DCN (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError:
        pass  # already initialized / single-process run


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every leaf's leading axis on the mesh's batch axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_closed_loop_runner(cfg: MPCConfig, n_steps: int, batch: int,
                            mesh: Optional[Mesh] = None, ysp=None, usp=None,
                            xsp=None, aot_key: Optional[str] = None):
    """Build a REUSABLE jitted closed-loop runner: ``runner(x0_batch,
    inputs=None) -> (final_carry, outputs)``.

    Building the step (`make_mpc_step`) and tracing the scan graph is
    Python work that costs tens of seconds for solver-bearing steps —
    measured 25 s at B=1024/steps=20 on the round-4 chip, vs 0.9 s of
    device execution for the same call.  Constructing the runner once and
    calling it many times pays that tracing cost once; calling
    `batched_closed_loop` in a loop pays it per call (its pre-round-4
    behavior, which understated closed-loop throughput ~25x).

    ``aot_key``: opt-in persistent artifact cache for the traced scan
    graph (utils/aot.py).  Pass ``"auto"`` (recommended) to derive the
    key from a canonical content hash of the config and setpoints
    (``utils.aot.content_hash``) — two processes building the same
    MPCConfig share the artifact with no hand-written key, and any
    one-field change misses.  An explicit string is also accepted and
    must then uniquely identify the CONFIG (the cache key additionally
    folds in shapes, platform, jax version, and the library source
    hash, so artifacts can never silently go stale).  A warm process
    skips tracing entirely: the deployment restart path.  Only the
    unsharded no-inputs runner supports it (mesh/input shardings are
    not part of the exported artifact).

    Calls may supply a ``StepInput`` stack (leading ``(n_steps,)`` axis
    from ``make_step_inputs``) as ``runner(x0_batch, inputs)``; under a
    mesh it is replicated across devices at call time.
    """
    step = make_mpc_step(cfg, ysp=ysp, usp=usp, xsp=xsp, batch_hint=batch)
    vstep = jax.vmap(step, in_axes=(0, None))

    def run(carry, inp):
        def body(c, i):
            return vstep(c, i)

        return lax.scan(body, carry, inp, length=n_steps)

    init_b = jax.jit(jax.vmap(lambda x0: init_carry(cfg, x0)))

    if aot_key is not None:
        if mesh is not None:
            raise ValueError("aot_key supports the unsharded runner only")
        from mpc_code_tpu.utils.aot import content_hash, export_cached

        if aot_key == "auto":
            aot_key = content_hash(cfg, ysp, usp, xsp)

        # canonical float (f64 under x64, f32 otherwise) — the template
        # dtypes must match what runner calls will actually pass
        fdt = jnp.asarray(0.0).dtype
        carry_tpl = jax.eval_shape(
            init_b, jax.ShapeDtypeStruct((batch, cfg.nx), fdt))
        run_j = export_cached(
            jax.jit(lambda carry: run(carry, None)),
            f"closed_loop|{aot_key}|steps={n_steps}", (carry_tpl,))

        def runner(x0_batch, inputs=None):
            if inputs is not None:
                raise ValueError("the AOT runner is exported without a "
                                 "StepInput stack; build it with the input "
                                 "shapes instead (aot_key=None)")
            return run_j(init_b(jnp.asarray(x0_batch)))

        return runner

    if mesh is not None:
        sharding = NamedSharding(mesh, P("batch"))
        repl = NamedSharding(mesh, P())
        carry_tpl = jax.eval_shape(init_b,
                                   jax.ShapeDtypeStruct((batch, cfg.nx),
                                                        jnp.float32))
        in_sh = (jax.tree_util.tree_map(lambda _: sharding, carry_tpl), None)
        run_j = jax.jit(run, in_shardings=in_sh)

        def runner(x0_batch, inputs=None):
            carry0 = init_b(jnp.asarray(x0_batch))
            carry0 = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), carry0)
            if inputs is not None:
                inputs = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, repl), inputs)
            return run_j(carry0, inputs)
    else:
        run_j = jax.jit(run)

        def runner(x0_batch, inputs=None):
            return run_j(init_b(jnp.asarray(x0_batch)), inputs)

    return runner


def batched_closed_loop(cfg: MPCConfig, x0_batch, n_steps: int,
                        mesh: Optional[Mesh] = None, ysp=None, usp=None,
                        xsp=None, inputs=None):
    """Run `n_steps` of the full MPC loop for a batch of initial states,
    vmapped over scenarios and (optionally) sharded over a mesh.

    ``inputs``: optional ``StepInput`` stack (leading ``(n_steps,)`` axis,
    from ``make_step_inputs``) carrying time-varying parameter/setpoint
    schedules and noise, shared across scenario lanes (replicated over the
    mesh).  Without it the step runs at fixed setpoints with zero
    schedules — the steady benchmark configuration.

    Returns (final_carry, outputs) with outputs leaves shaped
    (n_steps, batch, ...).  One-shot convenience wrapper: every call
    rebuilds and re-traces the step — for repeated runs (benchmarks,
    sweeps) build a :func:`make_closed_loop_runner` once instead.
    """
    x0_batch = jnp.asarray(x0_batch)
    runner = make_closed_loop_runner(cfg, n_steps, int(x0_batch.shape[0]),
                                     mesh=mesh, ysp=ysp, usp=usp, xsp=xsp)
    return runner(x0_batch, inputs)


def aggregate_metrics(statuses, iters, mesh: Mesh, axis: str = "batch"):
    """Cross-chip reduction of per-lane solve metrics via shard_map + psum
    (SURVEY.md §2.4: collectives appear only for metric/convergence
    aggregation — the solves themselves are embarrassingly parallel).

    ``statuses``/``iters``: per-lane arrays sharded over ``axis``.
    Returns a replicated dict {n_ok, n_total, max_iters, sum_iters} —
    identical on every device, so any process can read it without a
    gather.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    @jax.jit
    def agg(st, it):
        def local(st_s, it_s):
            n_ok = jnp.sum((st_s != 2).astype(jnp.int32))
            n = jnp.asarray(st_s.shape[0], jnp.int32)
            mx = jnp.max(it_s, initial=0).astype(jnp.int32)
            sm = jnp.sum(it_s).astype(jnp.int32)
            out = jnp.stack([n_ok, n, mx, sm])
            s = lax.psum(out[:2], axis)          # sums across shards
            m = lax.pmax(out[2:3], axis)         # max across shards
            s2 = lax.psum(out[3:4], axis)
            return jnp.concatenate([s, m, s2])

        return shard_map(local, mesh=mesh,
                         in_specs=(P(axis), P(axis)),
                         out_specs=P())(st, it)

    out = np.asarray(agg(jnp.asarray(statuses), jnp.asarray(iters)))
    return dict(n_ok=int(out[0]), n_total=int(out[1]),
                max_iters=int(out[2]), sum_iters=int(out[3]))
