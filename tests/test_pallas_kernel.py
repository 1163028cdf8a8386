"""Pallas Riccati kernel vs the per-lane reference (interpret mode on CPU).

The kernel fuses the whole backward factorization + forward rollout per
128-lane batch tile; this validates the lane packing/padding and the
unrolled small-matrix algebra against the scan implementation.
"""

import functools
import os

import numpy as np
import pytest


def test_pallas_kernel_matches_reference(monkeypatch):
    monkeypatch.setenv("MPC_TPU_PALLAS_INTERPRET", "1")
    import jax
    import jax.numpy as jnp

    from mpc_code_tpu.solver.riccati_kernel import _riccati_ref, make_riccati_kkt

    N, nxa, nu = 8, 3, 2
    nz = nxa + nu
    B = 5  # exercises padding to the 128-lane tile
    rng = np.random.default_rng(0)

    def mk():
        Hs = []
        for _ in range(N):
            M = rng.normal(size=(nz, nz)).astype(np.float32)
            Hs.append(M @ M.T + np.diag([1.0] * nxa + [2.0] * nu).astype(np.float32))
        return (np.stack(Hs),
                rng.normal(size=(N, nz)).astype(np.float32),
                (rng.normal(size=(N, nxa, nxa)) * 0.5).astype(np.float32),
                rng.normal(size=(N, nxa, nu)).astype(np.float32),
                (rng.normal(size=(N, nxa)) * 0.1).astype(np.float32))

    data = [mk() for _ in range(B)]
    Hs = jnp.asarray(np.stack([d[0] for d in data]))
    q = jnp.asarray(np.stack([d[1] for d in data]))
    A = jnp.asarray(np.stack([d[2] for d in data]))
    Bm = jnp.asarray(np.stack([d[3] for d in data]))
    rd = jnp.asarray(np.stack([d[4] for d in data]))
    Mt = rng.normal(size=(nxa, nxa)).astype(np.float32)
    PN = jnp.asarray(np.stack([Mt @ Mt.T + np.eye(nxa, dtype=np.float32)] * B))
    pN = jnp.asarray(rng.normal(size=(B, nxa)).astype(np.float32))
    delta = jnp.zeros(B, jnp.float32)

    kkt = make_riccati_kkt(N, nxa, nu)
    outs = jax.vmap(kkt)(Hs, q, A, Bm, rd, PN, pN, delta)
    ref = jax.vmap(functools.partial(_riccati_ref, nxa=nxa, nu=nu))(
        Hs, q, A, Bm, rd, PN, pN, delta)

    assert (np.asarray(outs[0]) == np.asarray(ref[0])).all()   # ok flags
    for a, b in zip(outs[1:], ref[1:]):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()
        assert d < 1e-4, d
