"""Fixed-step Runge-Kutta integrators as `lax.scan` rollouts.

TPU-native replacement for the CasADi `simpleRK` integrator factory the
reference uses to discretize continuous models (reference:
Utilities.py:70,168,757).  The reference integrates the time-augmented
system [x; t]' = [f(x,t,...); 1] with an RK4 scheme and `Mx` sub-steps over
one sampling interval; advancing `t` explicitly through the RK stages is
arithmetically identical, so that is what we do — no augmented state, no
expression-graph VM, just a traced scan that XLA unrolls/fuses.

`rk4_quad` additionally accumulates a quadrature of a running cost along
the trajectory, replacing the reference's adaptive SUNDIALS/IDAS quadrature
for continuous-time economic objectives (reference: Control_Calc.py:102-111)
with a fixed-step RK4 quadrature fused into the same rollout (documented
accuracy difference: fixed- vs adaptive-step).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

def _unroll() -> bool:
    """Unroll the Mx sub-step RK4 scan.  OFF by default everywhere: the
    hypothesized HBM-round-trip win never materialized on real TPU v5e —
    chip measurement (round 3) shows unrolling makes the bench ~35%
    SLOWER (7,930 vs 5,884 solves/s at B=4096 with the lane-packed sweep
    on; 10,196 vs 6,162 with it off) and inflates compile time.  At
    B>=4096 the batched sub-step is already MXU/VPU-bound, so unrolling
    only bloats the program and defeats XLA's scan-level scheduling.
    Kept behind MPC_TPU_RK4_UNROLL=1 for small-batch latency experiments.
    Evaluated at trace time."""
    env = os.environ.get("MPC_TPU_RK4_UNROLL")
    return env == "1"


def rk4(f: Callable, Mx: int) -> Callable:
    """Build a one-interval integrator for ``x' = f(x, t, *args)``.

    Returns ``F(x, t0, h, *args) -> x(t0 + h)`` using ``Mx`` RK4 sub-steps.
    Matches CasADi ``simpleRK(f_aug, Mx)`` on the time-augmented system
    (reference: Utilities.py:157-183).
    """

    def step(x, t0, h, *args):
        dt = h / Mx

        def body(carry, _):
            xk, tk = carry
            k1 = f(xk, tk, *args)
            k2 = f(xk + dt / 2 * k1, tk + dt / 2, *args)
            k3 = f(xk + dt / 2 * k2, tk + dt / 2, *args)
            k4 = f(xk + dt * k3, tk + dt, *args)
            x_next = xk + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return (x_next, tk + dt), None

        (xf, _), _ = lax.scan(body, (x, jnp.asarray(t0, dtype=jnp.result_type(x))), None, length=Mx, unroll=_unroll())
        return xf

    return step


def rk4_quad(f: Callable, q: Callable, Mx: int) -> Callable:
    """Integrate ``x' = f(x, t, *args)`` and the quadrature ``L' = q(x, t, *args)``.

    Returns ``F(x, t0, h, *args) -> (x(t0+h), ∫ q dt)``.  Replaces the
    reference's ``integrator('F','idas', dae, {'quad': ...})`` used for
    ContForm economic objectives (reference: Control_Calc.py:109-111).
    """

    def step(x, t0, h, *args):
        dt = h / Mx
        dtype = jnp.result_type(x)

        def body(carry, _):
            xk, tk, acc = carry
            k1 = f(xk, tk, *args)
            q1 = q(xk, tk, *args)
            k2 = f(xk + dt / 2 * k1, tk + dt / 2, *args)
            q2 = q(xk + dt / 2 * k1, tk + dt / 2, *args)
            k3 = f(xk + dt / 2 * k2, tk + dt / 2, *args)
            q3 = q(xk + dt / 2 * k2, tk + dt / 2, *args)
            k4 = f(xk + dt * k3, tk + dt, *args)
            q4 = q(xk + dt * k3, tk + dt, *args)
            x_next = xk + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            acc_next = acc + dt / 6 * (q1 + 2 * q2 + 2 * q3 + q4)
            return (x_next, tk + dt, acc_next), None

        init = (x, jnp.asarray(t0, dtype=dtype), jnp.zeros((), dtype=dtype))
        (xf, _, qf), _ = lax.scan(body, init, None, length=Mx, unroll=_unroll())
        return xf, qf

    return step


# ---------------------------------------------------------------------------
# shared helpers for the lanes-minor custom_vmap rules: the flattened
# scenario-stage axis (index = b*N + n) rides the MINOR dimension
# ---------------------------------------------------------------------------


def _bcast_unbatched(axis_size, in_batched, args):
    return [jnp.broadcast_to(a, (axis_size,) + jnp.shape(a)) if not b else a
            for a, b in zip(args, in_batched)]


def _pack_st(a, L):
    """Per-stage data: (B, N, dim) -> (dim, B*N)."""
    return jnp.moveaxis(a.reshape(L, -1), 0, -1)


def _pack_sh(a, N):
    """Per-scenario shared data: (B, dim) -> (dim, B*N)."""
    return jnp.repeat(jnp.moveaxis(a, 0, -1), N, axis=-1)


def _unpack(a, Bsz, N, shape):
    """(..., B*N) -> (B, N, *shape)."""
    return jnp.moveaxis(a, -1, 0).reshape((Bsz, N) + shape)


def _tangent_basis(nx, nu, L, dtype):
    """One-hot (x, u) tangent pairs for the nx+nu directions, lane-wide."""
    eye = jnp.eye(nx + nu, dtype=dtype)
    tx = [jnp.broadcast_to(eye[i, :nx, None], (nx, L)) for i in range(nx + nu)]
    tu = [jnp.broadcast_to(eye[i, nx:, None], (nu, L)) for i in range(nx + nu)]
    return tx, tu


def _sweep_impl() -> str:
    """Batched-sweep implementation policy (trace-time).

    MPC_TPU_SWEEP_IMPL: 'pallas' | 'lanes' | 'auto' (default).  'auto'
    prefers the fused Pallas kernel on TPU/f32 (round-5 chip trace: the
    kernel runs the whole Mx-substep value+tangent sweep in ~2 ms at
    B*N = 819200 vs ~18.5 ms for the batch-major jacfwd loop and ~2x
    that for the lanes-minor XLA layout) and falls back to the
    lanes-minor XLA rule elsewhere (CPU/f64 — the small-batch
    closed-loop win of rounds 3-4).
    """
    return os.environ.get("MPC_TPU_SWEEP_IMPL", "auto")


def _compose_clip(f: Callable, clip_lo, clip_hi) -> Callable:
    """Saturation guard for the XLA sweep paths: clip the ODE input state
    (per-dim bounds broadcast across the optional lanes axis)."""
    if clip_lo is None and clip_hi is None:
        return f
    import numpy as _np

    _lo = (jnp.asarray(_np.asarray(clip_lo, float))
           if clip_lo is not None else -jnp.inf)
    _hi = (jnp.asarray(_np.asarray(clip_hi, float))
           if clip_hi is not None else jnp.inf)

    def fc(xx, tt, uu, dd, pp):
        lo = _lo[:, None] if (jnp.ndim(_lo) and jnp.ndim(xx) == 2) else _lo
        hi = _hi[:, None] if (jnp.ndim(_hi) and jnp.ndim(xx) == 2) else _hi
        return f(jnp.clip(xx, lo, hi), tt, uu, dd, pp)

    return fc


def rk4_stage_jac(f: Callable, Mx: int, clip_lo=None, clip_hi=None,
                  impl=None):
    """Stage-sweep RK4 rollout WITH first-order Jacobians, batch-friendly.

    ``f`` is the RAW reordered model ODE ``f(x, t, u, d, px)``;
    ``clip_lo/clip_hi`` optionally saturate the ODE input state
    (ContinuousModel's stability guard).  Passing the guard separately —
    instead of pre-composing it into ``f`` — lets the fused Pallas sweep
    apply it from scalar literals (Mosaic rejects the array-const
    broadcast form); the XLA paths compose it via `_compose_clip`.

    Returns ``F(xs, us, pxs, t, h, d) -> (xf (N,nx), Jx (N,nx,nx),
    Ju (N,nx,nu))`` for ``x' = f(x, t, u, d, px)`` integrated over one
    sampling interval per stage (N independent stage points, Mx sub-steps
    each) — the IPM derivative sweep's dominant term.

    Unbatched (host loop): vmap-over-stages of jacfwd, the plain path.

    Under ``vmap`` (the batched solver): a ``custom_vmap`` rule lays the
    flattened (B*N) scenario-stage axis out as the MINOR dimension and
    propagates the nx+nu tangent directions with ``jax.linearize`` (one
    primal linearization per sub-step, nz cheap linear applications).
    Rationale, measured on TPU v5e at the bench point: the batch-major
    jacfwd sweep costs ~35x the primal rollout (tiny stride-nx slices of
    (B,N,nx) arrays retile on every elementwise op), while lanes-minor
    layout makes every ``x[0]``-style access a contiguous row of
    (8,128)-tiles.  The user ODE must be shape-polymorphic in the sense
    that ``x`` may arrive as (nx,) or (nx, L) with elementwise/indexing/
    matvec ops — true for every reference model form.

    When this wins (chip A/B, TPU v5e round 3): the lane-packed layout is
    FASTER in the warm-started small-batch closed-loop regime (B~1024:
    880 vs 699 steps/s) and SLOWER in the cold big-batch regime (B>=4096:
    7.9k vs 10.2k solves/s) — the solver picks per-regime at build time
    via ``build_structured_ocp(..., batch_hint=...)``; ``MPC_TPU_FAST_SWEEP``
    remains a manual override only.
    """
    from jax.custom_batching import custom_vmap

    fc = _compose_clip(f, clip_lo, clip_hi)
    _pallas_sweep = []  # built lazily on first batched TPU/f32 trace

    def _substep(xv, uv, tv, dt, d, px):
        k1 = fc(xv, tv, uv, d, px)
        k2 = fc(xv + dt / 2 * k1, tv + dt / 2, uv, d, px)
        k3 = fc(xv + dt / 2 * k2, tv + dt / 2, uv, d, px)
        k4 = fc(xv + dt * k3, tv + dt, uv, d, px)
        return xv + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def _one_jac(x, u, px, t, h, d):
        nx = x.shape[0]
        z = jnp.concatenate([x, u])

        def roll(zz):
            xf = zz[:nx]
            dt = h / Mx
            tv = t
            for _ in range(Mx):
                xf = _substep(xf, zz[nx:], tv, dt, d, px)
                tv = tv + dt
            return xf, xf

        J, xf = jax.jacfwd(roll, has_aux=True)(z)
        return xf, J[:, :nx], J[:, nx:]

    @custom_vmap
    def stage_jac(xs, us, pxs, t, h, d):
        return jax.vmap(_one_jac, in_axes=(0, 0, 0, None, None, None))(
            xs, us, pxs, t, h, d)

    @stage_jac.def_vmap
    def _rule(axis_size, in_batched, xs, us, pxs, t, h, d):
        xs, us, pxs, t, h, d = _bcast_unbatched(
            axis_size, in_batched, [xs, us, pxs, t, h, d])

        eff_impl = impl or _sweep_impl()
        if eff_impl in ("auto", "pallas"):
            from mpc_code_tpu.ops.sweep_pallas import (
                pallas_sweep_available, rk4_stage_jac_pallas,
            )

            if pallas_sweep_available(xs.dtype):
                if not _pallas_sweep:
                    _pallas_sweep.append(rk4_stage_jac_pallas(
                        f, Mx, clip_lo=clip_lo, clip_hi=clip_hi))
                t_b = jnp.broadcast_to(jnp.asarray(t, xs.dtype).reshape(-1),
                                       (xs.shape[0],))
                h_b = jnp.broadcast_to(jnp.asarray(h, xs.dtype).reshape(-1),
                                       (xs.shape[0],))
                return _pallas_sweep[0](xs, us, pxs, t_b, h_b, d), (True,) * 3
        if eff_impl == "jacfwd":
            # batch-major vmap(vmap(jacfwd)) — the generic layout, kept
            # as an explicit escape hatch / autotune candidate
            v1 = jax.vmap(_one_jac, in_axes=(0, 0, 0, None, None, None))
            vv = jax.vmap(v1, in_axes=(0, 0, 0, 0, 0, 0))
            t_b = jnp.broadcast_to(jnp.asarray(t).reshape(-1),
                                   (xs.shape[0],))
            h_b = jnp.broadcast_to(jnp.asarray(h).reshape(-1),
                                   (xs.shape[0],))
            d_b = jnp.broadcast_to(jnp.asarray(d),
                                   (xs.shape[0],) + jnp.shape(d)[-1:])
            return vv(xs, us, pxs, t_b, h_b, d_b), (True,) * 3

        Bsz, N, nx = xs.shape
        nu = us.shape[-1]
        L = Bsz * N

        xT, uT, pxT = _pack_st(xs, L), _pack_st(us, L), _pack_st(pxs, L)
        dT = _pack_sh(d, N)
        tT = jnp.repeat(t.reshape(Bsz), N)
        hT = jnp.repeat(h.reshape(Bsz), N)
        dt = hT / Mx

        def sub_l(xv, uv, tv):
            return _substep(xv, uv, tv, dt, dT, pxT)

        nz = nx + nu
        tx, tu = _tangent_basis(nx, nu, L, xs.dtype)

        xv, tv = xT, tT
        for _ in range(Mx):
            xv, f_lin = jax.linearize(lambda xx, uu: sub_l(xx, uu, tv), xv, uT)
            tx = [f_lin(tx[i], tu[i]) for i in range(nz)]
            tv = tv + dt

        xf = _unpack(xv, Bsz, N, (nx,))
        Jcols = jnp.stack(tx, axis=1)          # (nx, nz, L)
        J = _unpack(Jcols.reshape(nx * nz, L), Bsz, N, (nx, nz))
        return (xf, J[..., :nx], J[..., nx:]), (True, True, True)

    return stage_jac


def map_stage_jac(f: Callable):
    """Discrete-map analog of `rk4_stage_jac`.

    ``F(xs, us, pxs, t, d) -> (xf (N,nx), Jx, Ju)`` for a one-step map
    ``x_next = f(x, u, d, t, px)`` (the NL-discrete model form,
    Utilities.py:186-198) evaluated at N independent stage points.
    Unbatched: vmap of jacfwd.  Under vmap: lanes-minor layout, one
    `jax.linearize` + nx+nu tangent applications — same rationale AND the
    same per-regime win/lose profile as `rk4_stage_jac` (wins warm
    small-batch, loses cold big-batch; selected via ``batch_hint``)
    (hand-rolled integrators inside user maps, e.g. the
    quadruple tank's internal RK4, hit the identical batch-major layout
    pathology).
    """
    from jax.custom_batching import custom_vmap

    def _one_jac(x, u, px, t, d):
        nx = x.shape[0]
        z = jnp.concatenate([x, u])

        def g(zz):
            v = f(zz[:nx], zz[nx:], d, t, px)
            return v, v

        J, xf = jax.jacfwd(g, has_aux=True)(z)
        return xf, J[:, :nx], J[:, nx:]

    @custom_vmap
    def stage_jac(xs, us, pxs, t, d):
        return jax.vmap(_one_jac, in_axes=(0, 0, 0, None, None))(
            xs, us, pxs, t, d)

    _pallas_sweep = []

    @stage_jac.def_vmap
    def _rule(axis_size, in_batched, xs, us, pxs, t, d):
        xs, us, pxs, t, d = _bcast_unbatched(
            axis_size, in_batched, [xs, us, pxs, t, d])

        impl = _sweep_impl()
        if impl in ("auto", "pallas"):
            from mpc_code_tpu.ops.sweep_pallas import (
                map_stage_jac_pallas, pallas_sweep_available,
            )

            if pallas_sweep_available(xs.dtype):
                if not _pallas_sweep:
                    _pallas_sweep.append(map_stage_jac_pallas(f))
                t_b = jnp.broadcast_to(jnp.asarray(t, xs.dtype).reshape(-1),
                                       (xs.shape[0],))
                return _pallas_sweep[0](xs, us, pxs, t_b, d), (True,) * 3

        Bsz, N, nx = xs.shape
        nu = us.shape[-1]
        L = Bsz * N

        xT, uT, pxT = _pack_st(xs, L), _pack_st(us, L), _pack_st(pxs, L)
        dT = _pack_sh(d, N)
        tT = jnp.repeat(t.reshape(Bsz), N)

        nz = nx + nu
        tx, tu = _tangent_basis(nx, nu, L, xs.dtype)
        xv, f_lin = jax.linearize(lambda xx, uu: f(xx, uu, dT, tT, pxT), xT, uT)
        cols = [f_lin(tx[i], tu[i]) for i in range(nz)]

        xf = _unpack(xv, Bsz, N, (nx,))
        J = _unpack(jnp.stack(cols, axis=1).reshape(nx * nz, L), Bsz, N, (nx, nz))
        return (xf, J[..., :nx], J[..., nx:]), (True, True, True)

    return stage_jac


def rk4_quad_stage_hess(f: Callable, q: Callable, Mx: int):
    """ContForm stage sweep: dynamics value+Jacobians AND quadrature-cost
    value/gradient/Hessian in one lane-packed pass.

    ``F(xs, us, pxs, pys, t, h, d, x_ss, u_ss) -> (xf (N,nx), Jx, Ju,
    qv (N,), gq (N,nx+nu), Hq (N,nz,nz))`` for the joint rollout
    ``x' = f(x,t,u,d,px,xs,us,py)``, ``L' = q(...)`` over one sampling
    interval per stage — the economic-MPC (Ex_ENMPC / ContForm)
    transcription, where the IPM's stage cost Hessian traverses the same
    RK4 rollout as the dynamics Jacobian (Control_Calc.py:102-111,153-158).

    Unbatched: jacfwd + jax.hessian per stage (the generic path).
    Under vmap: lanes-minor layout; first-order via one `jax.linearize`
    (A/B columns and the cost gradient share tangents), second-order via
    forward-over-reverse (jvp of the vjp-gradient, one pass per tangent
    direction).  Per-lane independence makes a ones-cotangent vjp return
    exact per-lane gradients.

    When this wins: same per-regime profile as `rk4_stage_jac` (warm
    small-batch yes, cold big-batch no) — selected at build time via
    ``batch_hint``; `MPC_TPU_FAST_SWEEP` overrides manually.
    """
    from jax.custom_batching import custom_vmap

    def _roll(x, u, t, h, d, px, py, x_ss, u_ss):
        dt = h / Mx
        acc = jnp.zeros(jnp.shape(t), jnp.result_type(x))
        tv = t
        for _ in range(Mx):
            k1 = f(x, tv, u, d, px, x_ss, u_ss, py)
            q1 = q(x, tv, u, d, px, x_ss, u_ss, py)
            x2 = x + dt / 2 * k1
            k2 = f(x2, tv + dt / 2, u, d, px, x_ss, u_ss, py)
            q2 = q(x2, tv + dt / 2, u, d, px, x_ss, u_ss, py)
            x3 = x + dt / 2 * k2
            k3 = f(x3, tv + dt / 2, u, d, px, x_ss, u_ss, py)
            q3 = q(x3, tv + dt / 2, u, d, px, x_ss, u_ss, py)
            x4 = x + dt * k3
            k4 = f(x4, tv + dt, u, d, px, x_ss, u_ss, py)
            q4 = q(x4, tv + dt, u, d, px, x_ss, u_ss, py)
            x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            acc = acc + dt / 6 * (q1 + 2 * q2 + 2 * q3 + q4)
            tv = tv + dt
        return x, acc

    def _one(xk, uk, pxk, pyk, t, h, d, x_ss, u_ss):
        nx = xk.shape[0]
        z = jnp.concatenate([xk, uk])

        def roll_z(zz):
            out = _roll(zz[:nx], zz[nx:], t, h, d, pxk, pyk, x_ss, u_ss)
            return out, out

        (Jf, gq), (xf, qv) = jax.jacfwd(roll_z, has_aux=True)(z)
        Hq = jax.hessian(lambda zz: roll_z(zz)[0][1])(z)
        return xf, Jf[:, :nx], Jf[:, nx:], qv, gq, Hq

    @custom_vmap
    def stage_sweep(xs, us, pxs, pys, t, h, d, x_ss, u_ss):
        return jax.vmap(_one, in_axes=(0, 0, 0, 0) + (None,) * 5)(
            xs, us, pxs, pys, t, h, d, x_ss, u_ss)

    _pallas_sweep = []

    @stage_sweep.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _bcast_unbatched(axis_size, in_batched, args)
        xs, us, pxs, pys, t, h, d, x_ss, u_ss = args

        if _sweep_impl() in ("auto", "pallas"):
            from mpc_code_tpu.ops.sweep_pallas import (
                pallas_sweep_available, rk4_quad_stage_hess_pallas,
            )

            if pallas_sweep_available(xs.dtype):
                if not _pallas_sweep:
                    _pallas_sweep.append(rk4_quad_stage_hess_pallas(
                        f, q, Mx))
                B = xs.shape[0]
                t_b = jnp.broadcast_to(jnp.asarray(t, xs.dtype).reshape(-1),
                                       (B,))
                h_b = jnp.broadcast_to(jnp.asarray(h, xs.dtype).reshape(-1),
                                       (B,))
                return (_pallas_sweep[0](xs, us, pxs, pys, t_b, h_b, d,
                                         x_ss, u_ss), (True,) * 6)

        Bsz, N, nx = xs.shape
        nu = us.shape[-1]
        L = Bsz * N
        nz = nx + nu

        xT, uT = _pack_st(xs, L), _pack_st(us, L)
        pxT, pyT = _pack_st(pxs, L), _pack_st(pys, L)
        dT, xsT, usT = _pack_sh(d, N), _pack_sh(x_ss, N), _pack_sh(u_ss, N)
        tT = jnp.repeat(t.reshape(Bsz), N)
        hT = jnp.repeat(h.reshape(Bsz), N)

        def roll_l(xv, uv):
            return _roll(xv, uv, tT, hT, dT, pxT, pyT, xsT, usT)

        tx, tu = _tangent_basis(nx, nu, L, xs.dtype)

        (xv, qv), f_lin = jax.linearize(roll_l, xT, uT)
        tans = [f_lin(tx[i], tu[i]) for i in range(nz)]   # (dx_i, dq_i)

        def grad_q(xv_, uv_):
            out, vjp_fn = jax.vjp(roll_l, xv_, uv_)
            gx, gu = vjp_fn((jnp.zeros_like(out[0]), jnp.ones_like(out[1])))
            return gx, gu

        hcols = []
        for i in range(nz):
            _, (hx, hu) = jax.jvp(grad_q, (xT, uT), (tx[i], tu[i]))
            hcols.append(jnp.concatenate([hx, hu], axis=0))   # (nz, L)

        xf = _unpack(xv, Bsz, N, (nx,))
        qvo = _unpack(qv[None], Bsz, N, ())
        J = _unpack(jnp.stack([tans[i][0] for i in range(nz)], axis=1)
                    .reshape(nx * nz, L), Bsz, N, (nx, nz))
        gq = _unpack(jnp.stack([tans[i][1] for i in range(nz)], axis=0),
                     Bsz, N, (nz,))
        Hq = _unpack(jnp.stack(hcols, axis=1).reshape(nz * nz, L),
                     Bsz, N, (nz, nz))
        Hq = 0.5 * (Hq + jnp.swapaxes(Hq, -1, -2))
        return (xf, J[..., :nx], J[..., nx:], qvo, gq, Hq), (True,) * 6

    return stage_sweep
