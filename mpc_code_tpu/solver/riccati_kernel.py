"""Pallas TPU kernel for the batched Riccati KKT solve.

The structured IPM's per-iteration bottleneck on TPU is the backward/forward
Riccati recursion: ~50 sequential steps of tiny (nz x nz) ops, each a
separate XLA kernel launch when expressed as `lax.scan` under `vmap`.  This
module fuses the ENTIRE backward factorization + forward rollout into one
Pallas kernel per 128-lane batch tile:

- layout: the scenario batch rides the 128-wide lane axis; every small-
  matrix element is a (128,)-lane vector, so each stage update is a few
  hundred fully-vectorized VPU ops executing from VMEM with zero kernel-
  launch overhead between stages.
- small-dimension linear algebra (Cholesky of the nu x nu Quu, triangular
  solves) is unrolled at trace time over the static dims (nu, nxa <= ~8).
- integration: `riccati_kkt` is a `jax.custom_batching.custom_vmap`
  function — the per-lane structured solver calls it exactly like the
  sequential scan, and `vmap` dispatches the whole batch to the kernel
  (CPU/f64 and non-TPU backends fall back to the vmapped reference
  implementation automatically).

See /opt/skills/guides/pallas_guide.md for the kernel-programming model.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from mpc_code_tpu.ops.smalllin import chol as _schol, cho_solve as _scho_solve

_LANES = int(os.environ.get("MPC_TPU_PALLAS_TILE", "128"))


# ---------------------------------------------------------------------------
# reference (per-lane) implementation — also the custom_vmap fallback
# ---------------------------------------------------------------------------


def _riccati_ref(Hs, q, A, B, rd, PN, pN, delta, *, nxa, nu):
    """Sequential Riccati backward + forward for one lane.

    Hs (N, nz, nz), q (N, nz), A (N, nxa, nxa), B (N, nxa, nu), rd (N, nxa),
    PN (nxa, nxa), pN (nxa,), delta scalar.
    Returns (ok, Ks (N,nu,nxa), kf (N,nu), P_seq (N,nxa,nxa), p_seq (N,nxa),
    dX (N+1,nxa), dU (N,nu)).
    """
    N = Hs.shape[0]
    dtype = Hs.dtype

    def bk(carry, inp):
        P, pv, ok = carry
        Hk, qk, Ak, Bk, rdk = inp
        Qxx = Hk[:nxa, :nxa] + Ak.T @ P @ Ak
        Quu = Hk[nxa:, nxa:] + Bk.T @ P @ Bk + delta * jnp.eye(nu, dtype=dtype)
        Qxu = Hk[:nxa, nxa:] + Ak.T @ P @ Bk
        Pr = pv + P @ rdk
        qx = qk[:nxa] + Ak.T @ Pr
        qu = qk[nxa:] + Bk.T @ Pr
        L = _schol(Quu)
        ok = ok & jnp.all(jnp.isfinite(L))
        Kk = -_scho_solve(L, Qxu.T)
        kk = -_scho_solve(L, qu)
        P_new = Qxx + Qxu @ Kk
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + Qxu @ kk
        return (P_new, p_new, ok), (Kk, kk, P, pv)

    (_, _, ok), (Ks, kf, P_seq, p_seq) = lax.scan(
        bk, (PN, pN, jnp.asarray(True)), (Hs, q, A, B, rd), reverse=True)

    def fwd(dx, inp):
        Kk, kk, Ak, Bk, rdk = inp
        du = kk + Kk @ dx
        dx_next = Ak @ dx + Bk @ du + rdk
        return dx_next, (dx, du)

    dxN, (dX_head, dU) = lax.scan(fwd, jnp.zeros(nxa, dtype=dtype), (Ks, kf, A, B, rd))
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return ok, Ks, kf, P_seq, p_seq, dX, dU


# ---------------------------------------------------------------------------
# Pallas kernel (batched; lanes = batch)
# ---------------------------------------------------------------------------


def _make_kernel(N, nxa, nu, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nz = nxa + nu

    def kernel(hs_ref, q_ref, a_ref, b_ref, rd_ref, pn_ref, pnv_ref, delta_ref,
               ok_ref, ks_ref, kf_ref, pseq_ref, psv_ref, dx_ref, du_ref,
               P_scr, p_scr):
        # ----- load terminal value function into scratch
        for i in range(nxa):
            for j in range(nxa):
                P_scr[i * nxa + j, :] = pn_ref[i * nxa + j, :]
            p_scr[i, :] = pnv_ref[i, :]
        ok_ref[0, :] = jnp.ones_like(ok_ref[0, :])
        delta = delta_ref[0, :]
        tiny = 1e-30

        # ----- backward pass (unrolled over stages; all lane-vector math)
        def backward_step(k):
            P = [[P_scr[i * nxa + j, :] for j in range(nxa)] for i in range(nxa)]
            pv = [p_scr[i, :] for i in range(nxa)]
            Hk = lambda i, j: hs_ref[k, i * nz + j, :]
            Ak = lambda i, j: a_ref[k, i * nxa + j, :]
            Bk = lambda i, j: b_ref[k, i * nu + j, :]
            rk = lambda i: rd_ref[k, i, :]
            qk = lambda i: q_ref[k, i, :]

            # emit P_{k+1}, p_{k+1} before the update (lam recovery)
            for i in range(nxa):
                for j in range(nxa):
                    pseq_ref[k, i * nxa + j, :] = P[i][j]
                psv_ref[k, i, :] = pv[i]

            PB = [[sum(P[a][b] * Bk(b, j) for b in range(nxa)) for j in range(nu)]
                  for a in range(nxa)]
            PA = [[sum(P[a][b] * Ak(b, j) for b in range(nxa)) for j in range(nxa)]
                  for a in range(nxa)]
            Quu = [[Hk(nxa + i, nxa + j)
                    + sum(Bk(a, i) * PB[a][j] for a in range(nxa))
                    + (delta if i == j else 0.0)
                    for j in range(nu)] for i in range(nu)]
            Qxu = [[Hk(i, nxa + j) + sum(Ak(a, i) * PB[a][j] for a in range(nxa))
                    for j in range(nu)] for i in range(nxa)]
            Qxx = [[Hk(i, j) + sum(Ak(a, i) * PA[a][j] for a in range(nxa))
                    for j in range(nxa)] for i in range(nxa)]
            Pr = [pv[a] + sum(P[a][b] * rk(b) for b in range(nxa)) for a in range(nxa)]
            qx = [qk(i) + sum(Ak(a, i) * Pr[a] for a in range(nxa)) for i in range(nxa)]
            qu = [qk(nxa + i) + sum(Bk(a, i) * Pr[a] for a in range(nxa))
                  for i in range(nu)]

            # Cholesky of Quu (unrolled), with per-lane validity tracking
            L = [[None] * nu for _ in range(nu)]
            okv = ok_ref[0, :]
            for i in range(nu):
                d = Quu[i][i] - sum(L[i][m] * L[i][m] for m in range(i))
                okv = okv * (d > tiny).astype(okv.dtype)
                d = jnp.maximum(d, tiny)
                L[i][i] = jnp.sqrt(d)
                for j in range(i + 1, nu):
                    L[j][i] = (Quu[j][i] - sum(L[j][m] * L[i][m] for m in range(i))) / L[i][i]
            ok_ref[0, :] = okv

            def cho_solve_vec(rhs):
                # solve L L' x = rhs (rhs: list of nu lane-vectors)
                y = [None] * nu
                for i in range(nu):
                    y[i] = (rhs[i] - sum(L[i][m] * y[m] for m in range(i))) / L[i][i]
                x = [None] * nu
                for i in reversed(range(nu)):
                    x[i] = (y[i] - sum(L[j][i] * x[j] for j in range(i + 1, nu))) / L[i][i]
                return x

            # K = -Quu^{-1} Qxu' ; kk = -Quu^{-1} qu
            Kcols = []
            for c in range(nxa):
                col = cho_solve_vec([Qxu[c][i] for i in range(nu)])
                Kcols.append([-v for v in col])
            kk = [-v for v in cho_solve_vec(qu)]

            for i in range(nu):
                for j in range(nxa):
                    ks_ref[k, i * nxa + j, :] = Kcols[j][i]
                kf_ref[k, i, :] = kk[i]

            # P_new = Qxx + Qxu K ; p_new = qx + Qxu kk (symmetrized)
            P_new = [[Qxx[i][j] + sum(Qxu[i][a] * Kcols[j][a] for a in range(nu))
                      for j in range(nxa)] for i in range(nxa)]
            for i in range(nxa):
                for j in range(nxa):
                    sym = 0.5 * (P_new[i][j] + P_new[j][i])
                    P_scr[i * nxa + j, :] = sym
                p_scr[i, :] = qx[i] + sum(Qxu[i][a] * kk[a] for a in range(nu))

        for kk_idx in range(N - 1, -1, -1):
            backward_step(kk_idx)

        # ----- forward rollout
        dx = [jnp.zeros_like(p_scr[0, :]) for _ in range(nxa)]
        for i in range(nxa):
            dx_ref[0, i, :] = dx[i]
        for k in range(N):
            du = [kf_ref[k, i, :] + sum(ks_ref[k, i * nxa + j, :] * dx[j]
                                        for j in range(nxa)) for i in range(nu)]
            dx_next = [sum(a_ref[k, i * nxa + j, :] * dx[j] for j in range(nxa))
                       + sum(b_ref[k, i * nu + j, :] * du[j] for j in range(nu))
                       + rd_ref[k, i, :] for i in range(nxa)]
            for i in range(nu):
                du_ref[k, i, :] = du[i]
            for i in range(nxa):
                dx_ref[k + 1, i, :] = dx_next[i]
            dx = dx_next

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nzz = nz * nz

    def call(Hs, q, A, B, rd, PN, pN, delta):
        # inputs lane-packed with trailing axis T (a multiple of 128);
        # grid-tile the lane axis so each program handles one 128-lane tile
        # entirely in VMEM
        T = Hs.shape[-1]
        n_tiles = T // _LANES
        L = _LANES

        def bs2(d0):
            return pl.BlockSpec((d0, L), lambda i: (0, i), memory_space=pltpu.VMEM)

        def bs3(d0, d1):
            return pl.BlockSpec((d0, d1, L), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)

        in_specs = [
            bs3(N, nz * nz),      # Hs
            bs3(N, nz),           # q
            bs3(N, nxa * nxa),    # A
            bs3(N, nxa * nu),     # B
            bs3(N, nxa),          # rd
            bs2(nxa * nxa),       # PN
            bs2(nxa),             # pN
            bs2(1),               # delta
        ]
        out_shape = (
            jax.ShapeDtypeStruct((1, T), Hs.dtype),            # ok
            jax.ShapeDtypeStruct((N, nu * nxa, T), Hs.dtype),  # Ks
            jax.ShapeDtypeStruct((N, nu, T), Hs.dtype),        # kf
            jax.ShapeDtypeStruct((N, nxa * nxa, T), Hs.dtype), # P_seq
            jax.ShapeDtypeStruct((N, nxa, T), Hs.dtype),       # p_seq
            jax.ShapeDtypeStruct((N + 1, nxa, T), Hs.dtype),   # dX
            jax.ShapeDtypeStruct((N, nu, T), Hs.dtype),        # dU
        )
        out_specs = (
            bs2(1), bs3(N, nu * nxa), bs3(N, nu), bs3(N, nxa * nxa),
            bs3(N, nxa), bs3(N + 1, nxa), bs3(N, nu),
        )
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nxa * nxa, L), Hs.dtype),
                pltpu.VMEM((nxa, L), Hs.dtype),
            ],
            interpret=interpret,
        )(Hs, q, A, B, rd, PN, pN, delta)

    return call


@functools.lru_cache(maxsize=None)
def _get_kernel(N, nxa, nu, interpret):
    return _make_kernel(N, nxa, nu, interpret=interpret)


def _use_pallas(dtype) -> bool:
    if os.environ.get("MPC_TPU_PALLAS", "1") == "0":
        return False
    if os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1":
        return True  # interpret-mode testing on CPU
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and dtype == jnp.float32


def make_riccati_kkt(N, nxa, nu):
    """Build the custom-vmapped `riccati_kkt(Hs, q, A, B, rd, PN, pN, delta)`.

    Unbatched: sequential per-lane recursion.  Batched (under `vmap`): one
    fused Pallas kernel over 128-lane tiles when on TPU/f32, otherwise the
    vmapped reference implementation.
    """
    from jax.custom_batching import custom_vmap

    ref = functools.partial(_riccati_ref, nxa=nxa, nu=nu)

    @custom_vmap
    def riccati_kkt(Hs, q, A, B, rd, PN, pN, delta):
        return ref(Hs, q, A, B, rd, PN, pN, delta)

    @riccati_kkt.def_vmap
    def _rule(axis_size, in_batched, Hs, q, A, B, rd, PN, pN, delta):
        out_batched = (True,) * 7
        if not all(in_batched):
            # broadcast unbatched args and proceed
            Hs, q, A, B, rd, PN, pN, delta = [
                jnp.broadcast_to(x, (axis_size,) + jnp.shape(x)) if not b else x
                for x, b in zip((Hs, q, A, B, rd, PN, pN, delta), in_batched)
            ]
        dtype = Hs.dtype
        interpret = os.environ.get("MPC_TPU_PALLAS_INTERPRET", "0") == "1"
        if not _use_pallas(dtype):
            outs = jax.vmap(ref)(Hs, q, A, B, rd, PN, pN, delta)
            return outs, out_batched

        Bsz = axis_size
        T = -(-Bsz // _LANES) * _LANES  # pad to lane multiple

        def pack(x, lead_shape):
            # (B, *dims) -> (*dims_flat..., T) with batch on the lane axis
            flat = x.reshape((Bsz, -1))
            flat = jnp.pad(flat, ((0, T - Bsz), (0, 0)))
            return jnp.moveaxis(flat, 0, -1).reshape(lead_shape + (T,))

        nz = nxa + nu
        Hs_p = pack(Hs, (N, nz * nz))
        q_p = pack(q, (N, nz))
        A_p = pack(A, (N, nxa * nxa))
        B_p = pack(B, (N, nxa * nu))
        rd_p = pack(rd, (N, nxa))
        PN_p = pack(PN, (nxa * nxa,))
        pN_p = pack(pN, (nxa,))
        d_p = pack(delta.reshape(Bsz, 1), (1,))

        call = _get_kernel(N, nxa, nu, interpret)
        ok_p, Ks_p, kf_p, Pse_p, pse_p, dX_p, dU_p = call(
            Hs_p, q_p, A_p, B_p, rd_p, PN_p, pN_p, d_p)

        def unpack(x, shape):
            flat = jnp.moveaxis(x.reshape((-1, T)), -1, 0)[:Bsz]
            return flat.reshape((Bsz,) + shape)

        ok = unpack(ok_p, ()) > 0.5
        Ks = unpack(Ks_p, (N, nu, nxa))
        kf = unpack(kf_p, (N, nu))
        P_seq = unpack(Pse_p, (N, nxa, nxa))
        p_seq = unpack(pse_p, (N, nxa))
        dX = unpack(dX_p, (N + 1, nxa))
        dU = unpack(dU_p, (N, nu))
        return (ok, Ks, kf, P_seq, p_seq, dX, dU), out_batched

    return riccati_kkt
