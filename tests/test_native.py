"""Native host-core library tests (builds native/libhostcore.so with g++).

Oracles: scipy.linalg.solve_discrete_are and the pure-numpy smoother the
MHE runtime otherwise uses.
"""

import numpy as np
import pytest
import scipy.linalg as scla

from mpc_code_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native hostcore not built")


def test_native_dare_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(4):
        n, m = 5, 2
        A = rng.normal(size=(n, n)) * 0.6
        B = rng.normal(size=(n, m))
        Q = np.eye(n)
        R = 0.5 * np.eye(m)
        P = native.dare(A, B, Q, R)
        P_ref = scla.solve_discrete_are(A, B, Q, R)
        assert np.allclose(P, P_ref, rtol=1e-9, atol=1e-9)


def test_native_kalman_gain():
    rng = np.random.default_rng(1)
    n, p = 4, 2
    A = rng.normal(size=(n, n)) * 0.5
    C = rng.normal(size=(p, n))
    Q = np.eye(n)
    R = 0.1 * np.eye(p)
    K = native.kalman_gain(A, C, Q, R)
    Pe = scla.solve_discrete_are(A.T, C.T, Q, R)
    K_ref = Pe @ C.T @ np.linalg.inv(C @ Pe @ C.T + R)
    assert np.allclose(K, K_ref, rtol=1e-8, atol=1e-10)


def test_native_riccati_smoother_matches_numpy():
    rng = np.random.default_rng(2)
    N, n = 6, 4
    bigP, bigPc, bigA = [], [], []
    for _ in range(N):
        M = rng.normal(size=(n, n))
        P = M @ M.T + np.eye(n)
        bigP.append(P)
        bigPc.append(P - 0.1 * np.eye(n))
        bigA.append(rng.normal(size=(n, n)) * 0.5)
    Pis_native = native.riccati_smoother(bigP, bigPc, bigA)
    # numpy oracle (reference Estimator.py:654-664)
    Pis = [None] * N
    Pis[N - 1] = bigPc[N - 1]
    for i in range(N - 2, -1, -1):
        Pim = np.linalg.inv(bigP[i + 1])
        Pis[i] = bigPc[i] + bigPc[i] @ bigA[i].T @ Pim @ (
            Pis[i + 1] - bigP[i + 1]) @ Pim @ bigA[i] @ bigPc[i]
    for i in range(N):
        sym = 0.5 * (Pis[i] + Pis[i].T)
        assert np.allclose(Pis_native[i], sym, rtol=1e-10, atol=1e-10)


def test_mhe_uses_native_smoother():
    # the ENMPC MHE 'smooth' path runs through the native smoother when the
    # library is available; this just exercises the integration end-to-end
    from mpc_code_tpu.examples.enmpc import make_config
    from mpc_code_tpu.loop import ClosedLoop

    cfg = make_config(Nsim=8).replace(N=8)
    cfg.estimator.N_mhe = 4
    H = ClosedLoop(cfg).run()
    assert (np.asarray(H["STATUS_DYN"]) != 2).all()
    assert np.abs(H["D_HAT"][-1]).max() < 5e-2
