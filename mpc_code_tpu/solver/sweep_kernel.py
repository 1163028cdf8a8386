"""Pallas TPU kernel for the batched per-iteration stage-derivative sweep.

After the Riccati KKT solve was fused (`riccati_kernel.py`), the structured
IPM's remaining per-iteration wall time on TPU is dominated not by FLOPs but
by XLA op count: the generic sweep — `vmap` over stages of
`make_stage_derivs` under `vmap` over scenarios — lowers to thousands of
small HBM-roundtripping ops per iteration (xprof round-3 measurement:
~3,300 op executions and ~78 ms per iteration at B=16384, of which the
sweep's traced busy time is ~18 ms but its share of wall is ~2x that).

This module fuses the ENTIRE sweep into one Pallas program per batch tile.
OUTCOME (round-3 chip measurement): the fused kernel is correct but does
not beat XLA through the current remote toolchain — see `_use_pallas` for
the numbers — so it ships OPT-IN (`MPC_TPU_SWEEP_PALLAS=1`), kept for
future Mosaic versions.  Design:

- **generic by construction**: the kernel evaluates the jaxpr of the SAME
  per-stage `stage_derivs` function the XLA path runs — a static python
  loop over stages, `vmap` over lanes (lane axis minor) — so every
  model/cost/constraint family the structured solver supports runs through
  the identical math, with all intermediates held in VMEM instead of
  round-tripping HBM between ops.
- layout: scenario batch on the 128-wide lane axis (same convention as
  `riccati_kernel.py`); every block is (rows, 128) with the per-lane
  structure flattened onto rows.
- closed-over constants (model matrices, scaling vectors, cost weights)
  cannot be captured by a Pallas kernel; the stage function is traced to a
  jaxpr once and its consts become explicit lane-independent kernel inputs.
- stage-indexed parameters: `build_structured_ocp`'s stage functions index
  `p["px"][k]` / `p["py"][k]` with the stage index k, and also read row 0
  (`p["py"][0]`, the reference's target-output convention; `p["px"][0]`,
  the collocation stage-0 freeze quirk, Control_Calc.py:473-474).  Mosaic
  (this version) lowers neither `gather` nor `dynamic_slice`, so the stage
  function is traced once PER STAGE with a STATIC python stage index k
  (`_stage_jaxprs_cached`): every stage-indexed access becomes a static
  row slice inside that stage's jaxpr, and the kernel is a static python
  loop over the N per-stage jaxprs.
- zero-size leaves (no user equalities/inequalities, empty px/py, ...) are
  baked into the stage jaxpr as unused constants — Mosaic rejects
  zero-size vectors, so they must never materialize inside the kernel.
- integration: `make_stage_sweep` returns a `custom_vmap` function; the
  per-lane solver calls it exactly like the vmapped sweep, and `vmap`
  dispatches the batch to the kernel on TPU/f32 (CPU/f64 and non-TPU
  backends fall back to the plain vmapped sweep automatically).

Reference analog: this is the work CasADi's C++ `Function` VM + IPOPT's
callback evaluations do per NLP iteration (grad_f/jac_g/hess_l evaluations;
SURVEY.md section 2.2) — here as one fused TPU kernel over the whole batch.
See /opt/skills/guides/pallas_guide.md for the kernel-programming model.
"""

from __future__ import annotations

import os
import weakref

import jax
import jax.numpy as jnp
import numpy as np

_LANES = int(os.environ.get("MPC_TPU_PALLAS_TILE", "128"))
_SUBL = int(os.environ.get("MPC_TPU_SWEEP_SUBLANES", "8"))

_STAGE_KEYS = ("px", "py")  # p-dict leaves indexed by the stage number


def sweep_opt_in() -> bool:
    """True when the fused-sweep path is requested at all.

    The custom_vmap wrapper is NOT graph-neutral even when its rule falls
    back to the plain vmapped sweep: at B=16384 the wrapped bench graph ran
    ~14x slower on chip (7.3 s vs 0.94 s/batch) while B=8192 was slightly
    FASTER (520 vs 606 ms) — a fusion/peak-memory cliff in how XLA handles
    the rule-generated nest.  The solver therefore only wraps the sweep
    when the kernel is explicitly requested."""
    return (os.environ.get("MPC_TPU_SWEEP_PALLAS", "0") == "1"
            or os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1")


def _use_pallas(dtype) -> bool:
    """OPT-IN (MPC_TPU_SWEEP_PALLAS=1), unlike the Riccati kernel.

    Round-3 chip measurements (B=256, N=50, monotone/GN):

    - lanes-only layout (scenarios on the 128 lanes, per-dim (dims, 128)
      values): compiles in ~8 min, runs correctly (statuses identical to
      the XLA sweep), but 2.1x SLOWER end to end (245 vs 117 ms/batch) —
      every op uses 1/8th of the VPU's sublanes.
    - (8, 128)-tile layout (1024 scenarios per program, full vregs):
      Mosaic/remote-compiler build exceeded 40 min at N=50 (19+ min even
      at N=10) — compile-impractical through the current toolchain.

    The XLA batch-major sweep therefore remains the production path; this
    kernel stays available for future toolchains where Mosaic's small-op
    scheduling or compile scaling improves."""
    if os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1":
        return True  # interpret-mode testing on CPU
    if os.environ.get("MPC_TPU_SWEEP_PALLAS", "0") != "1":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and dtype == jnp.float32


def make_stage_sweep(stage_derivs, N: int):
    """Build `sweep(Xs, Us, p, lam, nus, mu_h)` for the full-output sweep.

    Per-lane semantics are EXACTLY
    ``vmap(stage_derivs, (0, 0, 0, None, 0, 0, 0))(Xs, Us, arange(N), p,
    lam, nus, mu_h)`` (the structured solver's generic phase-1 sweep);
    under `vmap` over scenarios the whole batch runs as one fused Pallas
    kernel per 128-lane tile on TPU/f32.
    """
    from jax.custom_batching import custom_vmap

    v_stage = jax.vmap(stage_derivs, in_axes=(0, 0, 0, None, 0, 0, 0))

    def _plain(Xs, Us, p, lam, nus, mu_h):
        return v_stage(Xs, Us, jnp.arange(N), p, lam, nus, mu_h)

    @custom_vmap
    def sweep(Xs, Us, p, lam, nus, mu_h):
        return _plain(Xs, Us, p, lam, nus, mu_h)

    @sweep.def_vmap
    def _rule(axis_size, in_batched, Xs, Us, p, lam, nus, mu_h):
        args = (Xs, Us, p, lam, nus, mu_h)
        flat_b, _ = jax.tree_util.tree_flatten(in_batched)
        flat_a, treedef = jax.tree_util.tree_flatten(args)

        # per-lane abstract shapes (to size the kernel and its outputs)
        lane_avals = [
            jax.ShapeDtypeStruct(np.shape(a)[1:] if b else np.shape(a),
                                 jnp.asarray(a).dtype)
            for a, b in zip(flat_a, flat_b)
        ]
        lane_args = jax.tree_util.tree_unflatten(treedef, lane_avals)
        out_shapes = jax.eval_shape(_plain, *lane_args)
        out_flat, out_tree = jax.tree_util.tree_flatten(out_shapes)
        out_batched = jax.tree_util.tree_unflatten(
            out_tree, [True] * len(out_flat))

        dtype = jnp.result_type(*[a.dtype for a in lane_avals])
        if not _use_pallas(dtype):
            in_axes = jax.tree_util.tree_unflatten(
                treedef, [0 if b else None for b in flat_b])
            outs = jax.vmap(_plain, in_axes=in_axes)(*args)
            return outs, out_batched

        B = axis_size
        # each program hosts SUBL x LANES scenarios so every in-kernel op
        # is a full (8, 128) f32 VPU tile — a (dims, 128) layout would use
        # 1/8th of the sublanes (measured 2x SLOWER than the XLA sweep)
        tile = _SUBL * _LANES
        T = -(-B // tile) * tile

        lane_shapes = tuple(s.shape for s in lane_avals)
        live = tuple(i for i, s in enumerate(lane_shapes)
                     if np.prod(s, dtype=int))
        # lane-invariant (unbatched) leaves enter the kernel as shared 2D
        # blocks OUTSIDE the lane vmap — no per-lane copies, less traffic
        shared = tuple(i for i in live if not flat_b[i])

        def pack(x):
            flat = jnp.asarray(x, dtype).reshape((B, -1))
            flat = jnp.pad(flat, ((0, T - B), (0, 0)))
            # (rows, T//LANES, LANES): a program block (rows, SUBL, LANES)
            # is its scenarios' values as native (8, 128) vregs
            return jnp.moveaxis(flat, 0, -1).reshape(
                (flat.shape[1], T // _LANES, _LANES))

        packed = [
            (jnp.asarray(flat_a[i], dtype).reshape(_as2d(lane_shapes[i]))
             if i in shared else pack(flat_a[i]))
            for i in live
        ]

        out_lane_shapes = tuple(s.shape for s in out_flat)
        out_live = tuple(i for i, s in enumerate(out_lane_shapes)
                         if np.prod(s, dtype=int))

        sj = _stage_jaxprs(stage_derivs, treedef, lane_shapes, N, dtype)
        consts, f64_taint = sj[2], sj[4]
        if f64_taint:
            in_axes = jax.tree_util.tree_unflatten(
                treedef, [0 if b else None for b in flat_b])
            outs = jax.vmap(_plain, in_axes=in_axes)(*args)
            return outs, out_batched
        const2d = [jnp.asarray(c).reshape(_as2d(np.shape(c)))
                   for c in consts]
        const_sig = tuple(
            (np.shape(c), np.dtype(jnp.asarray(c).dtype).name)
            for c in consts)

        # MPC_TPU_SWEEP_CHUNK=C splits the N stages over ceil(N/C) smaller
        # pallas_calls (less Mosaic compile time / VMEM per kernel; a few
        # more dispatches per iteration)
        chunk = int(os.environ.get("MPC_TPU_SWEEP_CHUNK", str(N)))
        interp = os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1"
        chunk_outs = []
        for k0 in range(0, N, chunk):
            k1 = min(k0 + chunk, N)
            call = _get_kernel(
                stage_derivs, N, k0, k1, lane_shapes, live, shared,
                out_lane_shapes, out_live, const_sig, treedef,
                np.dtype(dtype).name, interp)
            chunk_outs.append(call(T, *packed, *const2d))
        if len(chunk_outs) == 1:
            kernel_outs = chunk_outs[0]
        else:
            kernel_outs = [jnp.concatenate([co[j] for co in chunk_outs],
                                           axis=0)
                           for j in range(len(chunk_outs[0]))]

        def unpack(x3d, shape):
            x2d = x3d.reshape((x3d.shape[0], T))
            flat = jnp.moveaxis(x2d, -1, 0)[:B]
            return flat.reshape((B,) + shape)

        outs_flat = []
        ko = iter(kernel_outs)
        for i, s in enumerate(out_lane_shapes):
            if i in out_live:
                outs_flat.append(unpack(next(ko), s))
            else:
                outs_flat.append(jnp.zeros((B,) + s, dtype))
        return jax.tree_util.tree_unflatten(out_tree, outs_flat), out_batched

    return sweep


def _dot_as_mulsum(l, r, dn):
    """dot_general decomposed into broadcast-multiply + sum.

    The sweep's contractions are tiny (nx, nu <= ~8 per lane) — on the VPU
    the decomposition is at least as fast as an MXU dot, and it sidesteps
    a Mosaic/remote-compiler version skew on batched `tpu.matmul` attrs
    (observed: TPU_DotDimensionNumbersAttr parse failure via the tunnel).
    """
    (lc, rc), (lb, rb) = dn
    l_free = [i for i in range(l.ndim) if i not in tuple(lc) + tuple(lb)]
    r_free = [i for i in range(r.ndim) if i not in tuple(rc) + tuple(rb)]
    lt = jnp.transpose(l, tuple(lb) + tuple(l_free) + tuple(lc))
    rt = jnp.transpose(r, tuple(rb) + tuple(r_free) + tuple(rc))
    nb, nlf, nrf, nc = len(lb), len(l_free), len(r_free), len(lc)
    lt = lt.reshape(lt.shape[: nb + nlf] + (1,) * nrf + lt.shape[nb + nlf:])
    rt = rt.reshape(rt.shape[:nb] + (1,) * nlf + rt.shape[nb:])
    prod = lt * rt
    return jnp.sum(prod, axis=tuple(range(nb + nlf + nrf, nb + nlf + nrf + nc)))


def _eval_nodot(jaxpr, consts, *args):
    """eval_jaxpr with dot_general decomposed and scans inlined.

    Recurses into pjit/closed-call sub-jaxprs; `lax.scan` (static length —
    the RK4 Mx sub-steps, collocation Newton) is unrolled as a python loop,
    which is free inside the kernel (everything lives in VMEM) and removes
    in-kernel loop machinery Mosaic would otherwise have to lower.
    """
    from jax._src.core import Literal
    from jax import lax

    env = {}

    def read(a):
        if isinstance(a, Literal):
            # literal values may keep pre-canonicalization (f64) dtypes
            return np.asarray(a.val, a.aval.dtype)
        return env[a]

    def write(v, val):
        env[v] = val

    def sub_consts(cj):
        # sub-jaxpr consts may also keep pre-canonicalization dtypes
        return [c if getattr(c, "dtype", None) == v.aval.dtype
                else np.asarray(c, v.aval.dtype)
                for c, v in zip(cj.consts, cj.jaxpr.constvars)]

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)
    for eqn in jaxpr.eqns:
        invals = [read(a) for a in eqn.invars]
        prim = eqn.primitive
        name = prim.name
        if name == "dot_general":
            outs = [_dot_as_mulsum(invals[0], invals[1],
                                   eqn.params["dimension_numbers"])]
        elif name == "scan":
            cj = eqn.params["jaxpr"]
            n_c = eqn.params["num_consts"]
            n_car = eqn.params["num_carry"]
            length = eqn.params["length"]
            reverse = eqn.params["reverse"]
            cs = invals[:n_c]
            carry0 = list(invals[n_c : n_c + n_car])
            xs = invals[n_c + n_car:]
            body_consts = sub_consts(cj)
            n_ys = len(cj.jaxpr.outvars) - n_car
            if not xs and n_ys == 0:
                # carry-only scan (RK4 sub-steps, collocation Newton): keep
                # it ROLLED as a fori_loop with the dot-decomposed body
                # (Mosaic lowers fori_loop; a plain tensor-carry scan fails
                # its fori pattern-match).  Inlining would multiply the
                # kernel by `length` and blow Mosaic compile time.  With
                # neither xs nor ys, reverse and forward execute the same
                # body `length` times — the index is unused.  Scans WITH
                # xs/ys would need in-loop dynamic slicing (absent in
                # Mosaic) and are inlined below instead.
                from jax import lax as _lax

                def body(_, carry):
                    return tuple(_eval_nodot(cj.jaxpr, body_consts,
                                             *cs, *carry))

                carry_f = _lax.fori_loop(0, length, body, tuple(carry0))
                outs = list(carry_f)
            else:
                carry = carry0
                steps = (range(length - 1, -1, -1) if reverse
                         else range(length))
                order = []
                for i in steps:
                    x_i = [x[i] for x in xs]
                    res = _eval_nodot(cj.jaxpr, body_consts,
                                      *cs, *carry, *x_i)
                    carry = list(res[:n_car])
                    order.append(res[n_car:])
                ys_acc = None
                if order and order[0]:
                    if reverse:
                        order = order[::-1]
                    ys_acc = [jnp.stack([step[j] for step in order])
                              for j in range(len(order[0]))]
                outs = carry + (ys_acc or [])
        elif name in ("pjit", "closed_call", "core_call", "xla_call"):
            cj = eqn.params["jaxpr"]
            outs = list(_eval_nodot(cj.jaxpr, sub_consts(cj), *invals))
        elif name in ("custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr"):
            cj = (eqn.params.get("call_jaxpr")
                  or eqn.params.get("fun_jaxpr"))
            outs = list(_eval_nodot(cj.jaxpr, sub_consts(cj), *invals))
        elif name == "remat" or name == "checkpoint":
            cj = eqn.params["jaxpr"]
            outs = list(_eval_nodot(cj, (), *invals))
        else:
            outs = prim.bind(*invals, **eqn.params)
            if not prim.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def _as2d(shape):
    """2D kernel-input shape for a lane-independent constant."""
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (1, shape[0])
    return (int(np.prod(shape[:-1], dtype=int)), shape[-1])


def _roles(treedef):
    """Flat-leaf index of each positional arg / p-dict key."""
    n = treedef.num_leaves
    tok = jax.tree_util.tree_unflatten(treedef, list(range(n)))
    Xs_i, Us_i, p_idx, lam_i, nus_i, muh_i = tok
    return Xs_i, Us_i, dict(p_idx), lam_i, nus_i, muh_i


def _stage_shapes(treedef, lane_shapes, N):
    """Per-stage leaf shapes: per-stage args drop the leading N; the
    stage-indexed p leaves (px/py) stay full — with a STATIC stage index
    their row selects are static slices inside each per-stage jaxpr."""
    Xs_i, Us_i, p_idx, lam_i, nus_i, muh_i = _roles(treedef)
    per_stage = {Xs_i, Us_i, lam_i, nus_i, muh_i}
    out = []
    for i, s in enumerate(lane_shapes):
        out.append(tuple(s[1:]) if i in per_stage else tuple(s))
    return tuple(out)


# Both per-solver caches are keyed WEAKLY on the stage_derivs closure:
# with a plain lru_cache every solver instance ever built would pin its
# traced jaxprs / pallas_call builders for the process lifetime (unbounded
# growth in long-lived hosts that construct many solvers).  The sub-key
# (shapes/dtype/flags) lives in a dict attached to the weak entry, so the
# whole cache line dies with the solver's stage function.
_CACHE_BY_FN = weakref.WeakKeyDictionary()


def _fn_cache(fn, tag, key, build):
    per_fn = _CACHE_BY_FN.setdefault(fn, {})
    per_tag = per_fn.setdefault(tag, {})
    if key not in per_tag:
        per_tag[key] = build()
    return per_tag[key]


def _stage_jaxprs_cached(stage_derivs, treedef, lane_shapes, N, dtype_name):
    key = (treedef, lane_shapes, N, dtype_name)
    return _fn_cache(stage_derivs, "jaxprs", key,
                     lambda: _stage_jaxprs_impl(stage_derivs, treedef,
                                                lane_shapes, N, dtype_name))


def _stage_jaxprs_impl(stage_derivs, treedef, lane_shapes, N, dtype_name):
    """Trace stage_derivs once PER STAGE with a static stage index.

    Mosaic (this version) lowers neither `gather` nor `dynamic_slice`, so
    every stage-indexed access (`p["px"][k]`, `p["py"][0]`, `where(k==0)`)
    must be static — N small jaxprs, traced once and cached per solver
    instance.  Zero-size leaves are baked in as (unused) trace-time
    constants so they never appear as kernel values (Mosaic rejects
    zero-size vectors); zero-size outputs are filtered the same way.

    Returns (jaxprs per stage, live-stage-leaf indices, deduped const
    list, per-stage const slot maps).
    """
    dtype = jnp.dtype(dtype_name)
    stage_shapes = _stage_shapes(treedef, lane_shapes, N)
    s_live = tuple(i for i, s in enumerate(stage_shapes)
                   if np.prod(s, dtype=int))
    ex_live = [jax.ShapeDtypeStruct(stage_shapes[i], dtype) for i in s_live]

    def make_f(k):
        def f(*flat_live):
            flat = []
            it = iter(flat_live)
            for i, s in enumerate(stage_shapes):
                flat.append(next(it) if i in s_live else jnp.zeros(s, dtype))
            a = jax.tree_util.tree_unflatten(treedef, flat)
            Xk, Uk, pk, lam_k, nu_k, mu_k = a
            outs = stage_derivs(Xk, Uk, k, pk, lam_k, nu_k, mu_k)
            of, _ = jax.tree_util.tree_flatten(outs)
            # live outputs only: zero-size values never exist in-kernel
            return tuple(o for o in of if o.size)
        return f

    import contextlib

    # trace at the working precision: under a suite-enabled x64, float64
    # closure constants would otherwise bake f64 promotions into the
    # jaxprs and the kernel's f32 output refs would reject the values
    def x64_ctx():
        return (jax.enable_x64(False)
                if dtype == jnp.float32 else contextlib.nullcontext())

    jaxprs, const_list, const_keys, const_maps = [], [], {}, []
    f64_taint = False
    for k in range(N):
        with x64_ctx():
            closed = jax.make_jaxpr(make_f(k))(*ex_live)
        if dtype == jnp.float32:
            # closures may hold jnp-f64 arrays created under an x64 build
            # (CPU test regimes); the traced jaxpr then carries f64 ops the
            # f32 kernel cannot host — the caller must fall back
            f64_taint = f64_taint or any(
                v.aval.dtype == jnp.float64
                for v in (list(closed.jaxpr.constvars)
                          + list(closed.jaxpr.outvars)))
        slots = []
        for c, cv in zip(closed.consts, closed.jaxpr.constvars):
            # the jaxpr records canonicalized (x64-off) avals but keeps the
            # original const VALUES — cast to the recorded aval dtype
            ca = np.asarray(c, dtype=cv.aval.dtype)
            key = (ca.shape, ca.dtype.str, ca.tobytes())
            if key not in const_keys:
                const_keys[key] = len(const_list)
                const_list.append(ca)
            slots.append(const_keys[key])
        jaxprs.append(closed.jaxpr)
        const_maps.append(tuple(slots))
    return (tuple(jaxprs), s_live, tuple(const_list), tuple(const_maps),
            f64_taint)


def _stage_jaxprs(stage_derivs, treedef, lane_shapes, N, dtype):
    return _stage_jaxprs_cached(stage_derivs, treedef, lane_shapes, N,
                                np.dtype(dtype).name)


def _get_kernel(stage_derivs, N, k0, k1, lane_shapes, live, shared,
                out_lane_shapes, out_live, const_sig, treedef, dtype_name,
                interpret):
    key = (N, k0, k1, lane_shapes, live, shared, out_lane_shapes, out_live,
           const_sig, treedef, dtype_name, interpret)
    return _fn_cache(stage_derivs, "kernel", key,
                     lambda: _get_kernel_impl(
                         stage_derivs, N, k0, k1, lane_shapes, live, shared,
                         out_lane_shapes, out_live, const_sig, treedef,
                         dtype_name, interpret))


def _get_kernel_impl(stage_derivs, N, k0, k1, lane_shapes, live, shared,
                     out_lane_shapes, out_live, const_sig, treedef,
                     dtype_name, interpret):
    """Build the pallas_call for stages [k0, k1) of one (stage function,
    shapes) signature.

    Cached on the stage-function identity + static shape signature, so each
    jitted solver instance builds its kernel(s) once.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    L = _LANES
    n_stages = k1 - k0
    jaxprs, s_live, _, const_maps, _ = _stage_jaxprs(
        stage_derivs, treedef, lane_shapes, N, dtype)
    Xs_i, Us_i, p_idx, lam_i, nus_i, muh_i = _roles(treedef)
    per_stage = {Xs_i, Us_i, lam_i, nus_i, muh_i}

    S = _SUBL

    def kernel(*refs):
        in_refs = refs[: len(live)]
        c_refs = refs[len(live) : len(live) + len(const_sig)]
        out_refs = refs[len(live) + len(const_sig):]

        # leaf values: batched leaves get trailing (SUBL, LANES) scenario
        # axes; shared (lane-invariant) leaves keep their per-lane shape
        vals = {}
        it = iter(in_refs)
        for i, s in enumerate(lane_shapes):
            if i in live:
                r = next(it)
                vals[i] = (r[:, :].reshape(tuple(s)) if i in shared
                           else r[:, :, :].reshape(tuple(s) + (S, L)))
        consts = [r[:, :].reshape(cs) for r, (cs, _) in zip(c_refs, const_sig)]

        def stage_lane(k):
            cs_k = [consts[j] for j in const_maps[k]]
            # per-stage leaf values, live only; shared leaves map as None
            sv, ax_sub, ax_lane = [], [], []
            for i in s_live:
                v = vals[i]
                sv.append(v[k] if i in per_stage else v)
                ax_sub.append(None if i in shared else -2)
                ax_lane.append(None if i in shared else -1)
            fn = lambda *a: tuple(_eval_nodot(jaxprs[k], cs_k, *a))
            # scenarios ride BOTH the sublane and the lane axis: every op
            # in the double-vmapped trace is a full (SUBL, LANES) VPU tile
            inner = jax.vmap(fn, in_axes=tuple(ax_lane), out_axes=-1)
            outer = jax.vmap(inner, in_axes=tuple(ax_sub), out_axes=-2)
            return outer(*sv)

        for k in range(k0, k1):
            outs_flat = stage_lane(k)  # live outputs only, ref order
            for ref, o in zip(out_refs, outs_flat):
                rows_i = int(np.prod(o.shape[:-2], dtype=int))
                ref[(k - k0) * rows_i : (k - k0 + 1) * rows_i, :, :] = (
                    o.reshape((rows_i, S, L)))

    def bs(rows):
        # (rows, SUBL, LANES) block of a (rows, T//LANES, LANES) array:
        # program i's scenarios as native (8, 128) vregs
        return pl.BlockSpec((rows, S, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def bs_const(shape2d):
        return pl.BlockSpec(shape2d, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _chunk_rows(i):
        # out shapes are (N, dims...): this kernel covers n_stages of them
        s = out_lane_shapes[i]
        return n_stages * int(np.prod(s[1:], dtype=int))

    def call(T, *packed_and_consts):
        n_tiles = T // (S * L)
        in_specs = ([bs_const(_as2d(lane_shapes[i])) if i in shared
                     else bs(int(np.prod(lane_shapes[i], dtype=int)))
                     for i in live]
                    + [bs_const(_as2d(cs)) for cs, _ in const_sig])
        out_shape = tuple(
            jax.ShapeDtypeStruct((_chunk_rows(i), T // L, L), dtype)
            for i in out_live)
        out_specs = tuple(bs(_chunk_rows(i)) for i in out_live)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*packed_and_consts)

    return call
