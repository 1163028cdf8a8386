"""Unit tests for integrators and Riccati solvers (SURVEY.md §4 item 2)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg as scla

from mpc_code_tpu.ops import rk4, rk4_quad, solve_dare, dare_gain, sqrtm_psd


def test_rk4_linear_exact():
    # x' = a x has solution x0 exp(a h); RK4 error O(h^5/Mx^4)
    a = -0.7
    f = lambda x, t: a * x
    step = rk4(f, 10)
    x0 = jnp.array([2.0])
    out = step(x0, 0.0, 1.0)
    assert np.allclose(out, x0 * np.exp(a), rtol=2e-7)


def test_rk4_time_varying():
    # x' = t  ->  x(h) = x0 + h^2/2 ; time must advance through sub-steps
    f = lambda x, t: jnp.ones_like(x) * t
    step = rk4(f, 4)
    out = step(jnp.array([1.0]), 0.0, 2.0)
    assert np.allclose(out, 1.0 + 2.0, rtol=1e-12)


def test_rk4_with_args():
    f = lambda x, t, u: -x + u
    step = rk4(f, 20)
    out = step(jnp.array([0.0]), 0.0, 5.0, jnp.array([3.0]))
    assert np.allclose(out, 3.0 * (1 - np.exp(-5.0)), rtol=1e-5)


def test_rk4_quad_accumulates():
    # x' = -x, q = x^2 -> integral over [0,T] = x0^2 (1 - e^{-2T})/2
    f = lambda x, t: -x
    q = lambda x, t: jnp.sum(x**2)
    step = rk4_quad(f, q, 50)
    xf, qf = step(jnp.array([1.0]), 0.0, 1.0)
    assert np.allclose(qf, (1 - np.exp(-2.0)) / 2, rtol=1e-6)
    assert np.allclose(xf, np.exp(-1.0), rtol=1e-8)


def test_dare_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n, m = 4, 2
        A = rng.normal(size=(n, n)) * 0.6
        B = rng.normal(size=(n, m))
        Q = np.eye(n) * rng.uniform(0.5, 2.0)
        R = np.eye(m) * rng.uniform(0.5, 2.0)
        P_ref = scla.solve_discrete_are(A, B, Q, R)
        P = np.asarray(solve_dare(A, B, Q, R))
        assert np.allclose(P, P_ref, rtol=1e-9, atol=1e-9)


def test_dare_wb_terminal_cost_case():
    # the exact matrices Ex_LMPC_WB feeds to the Riccati terminal cost
    # (reference: Ex_LMPC_WB.py:41-45,119-122 -> Utilities.py:409)
    A = np.diag([0.8871, 0.8324, 0.9092, 0.8703]) + 2 * np.diag([0.01, -0.01, -0.01, 0.01])
    B = np.array([[1, 0], [1, 0], [0.0, 1.0], [0, 2.0]])
    C = np.array([[1.4447, 0.0, -1.7169, 0.0], [0.0, 1.1064, 0.0, -1.2579]])
    Q = C.T @ np.diag([1, 1]) @ C
    S = np.diag([10, 20])
    P_ref = scla.solve_discrete_are(A, B, Q, S)
    P = np.asarray(solve_dare(A, B, Q, S))
    assert np.allclose(P, P_ref, rtol=1e-9, atol=1e-8)


def test_dare_gain_matches_reference_formula():
    # steady-state KF gain as computed in Estimator.Kkalss (Estimator.py:213-223)
    rng = np.random.default_rng(1)
    n, p = 5, 2
    A = rng.normal(size=(n, n)) * 0.5
    C = rng.normal(size=(p, n))
    Q = np.eye(n)
    R = 0.1 * np.eye(p)
    Pe = scla.solve_discrete_are(A.T, C.T, Q, R)
    K_ref = Pe @ C.T @ np.linalg.inv(C @ Pe @ C.T + R)
    K, _ = dare_gain(A, C, Q, R)
    assert np.allclose(np.asarray(K), K_ref, rtol=1e-8, atol=1e-10)


def test_sqrtm_psd():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(4, 4))
    M = X @ X.T + 0.1 * np.eye(4)
    S = np.asarray(sqrtm_psd(M))
    assert np.allclose(S @ S, M, rtol=1e-10, atol=1e-10)


def test_history_csv_roundtrip(tmp_path):
    from mpc_code_tpu.utils.io import load_history_csv, save_history_csv

    H = {"U": np.arange(12.0).reshape(6, 2),
         "Yp": np.arange(18.0).reshape(6, 3) * 0.5,
         "TIME_DYN": np.linspace(0.1, 0.6, 6),
         "LAMBDA": np.ones((4, 2))}  # ragged: padded with NaN
    p = str(tmp_path / "h.csv")
    save_history_csv(p, H)
    R = load_history_csv(p)
    assert np.allclose(R["U"], H["U"])
    assert np.allclose(R["Yp"], H["Yp"])
    assert np.allclose(R["TIME_DYN"], H["TIME_DYN"])
    assert np.allclose(R["LAMBDA"][:4], H["LAMBDA"].reshape(4, -1)[:, :2])
    assert np.isnan(R["LAMBDA"][4:]).all()
