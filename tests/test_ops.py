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


def test_rk4_stage_jac_matches_jacfwd():
    # lanes-minor batched rule vs the per-stage jacfwd fallback (and the
    # plain rk4 primal) for the continuous stage sweep
    import jax

    from mpc_code_tpu.ops.integrators import rk4_stage_jac

    def ode(x, t, u, d, px):
        return jnp.stack([x[1] * u[0] - jnp.exp(-x[0]) + px[0] + d[0],
                          -x[0] * x[2] + u[1] * t,
                          x[0] - 0.5 * x[2] + d[1] * u[0]])

    F = rk4_stage_jac(ode, 4)
    rng = np.random.default_rng(0)
    B, N = 5, 3
    xs = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3)
    us = jnp.asarray(rng.normal(size=(B, N, 2)) * 0.2)
    pxs = jnp.asarray(rng.normal(size=(B, N, 1)) * 0.1)
    t = jnp.asarray(rng.normal(size=(B,)) * 0.1)
    h = jnp.full((B,), 0.2)
    d = jnp.asarray(rng.normal(size=(B, 2)) * 0.1)
    bat = jax.jit(jax.vmap(F))(xs, us, pxs, t, h, d)
    ref = [F(xs[b], us[b], pxs[b], t[b], h[b], d[b]) for b in range(B)]
    for i in range(3):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-12

    prim = rk4(lambda xx, tt, uu, dd, pp: ode(xx, tt, uu, dd, pp), 4)(
        xs[0, 0], t[0], 0.2, us[0, 0], d[0], pxs[0, 0])
    assert np.abs(np.asarray(prim) - np.asarray(bat[0][0, 0])).max() < 1e-14


def test_map_stage_jac_matches_jacfwd():
    import jax

    from mpc_code_tpu.ops.integrators import map_stage_jac

    def Fmap(x, u, d, t, px):
        return jnp.stack([0.9 * x[0] + 0.1 * jnp.tanh(x[1]) + u[0],
                          x[1] - 0.2 * x[0] * u[0] + px[0] + d[0] * t])

    F = map_stage_jac(Fmap)
    rng = np.random.default_rng(1)
    B, N = 4, 3
    xs = jnp.asarray(rng.normal(size=(B, N, 2)))
    us = jnp.asarray(rng.normal(size=(B, N, 1)))
    pxs = jnp.asarray(rng.normal(size=(B, N, 1)))
    t = jnp.asarray(rng.normal(size=(B,)))
    d = jnp.asarray(rng.normal(size=(B, 1)))
    bat = jax.jit(jax.vmap(F))(xs, us, pxs, t, d)
    ref = [F(xs[b], us[b], pxs[b], t[b], d[b]) for b in range(B)]
    for i in range(3):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-12


def test_rk4_quad_stage_hess_matches_generic():
    # joint dynamics+quadrature sweep: value/Jacobian/gradient/Hessian vs
    # per-stage jacfwd + jax.hessian (the ContForm generic path)
    import jax

    from mpc_code_tpu.ops.integrators import rk4_quad_stage_hess

    def ode(x, t, u, d, px, xss, uss, py):
        return jnp.stack([x[1] - jnp.exp(-x[0]) + u[0] + px[0],
                          -x[0] * x[1] + d[0] + 0.1 * t])

    def quad(x, t, u, d, px, xss, uss, py):
        return u[0] * (0.3 - x[1]) + 0.5 * (x[0] - xss[0]) ** 2 + py[0] * u[0] ** 2

    F = rk4_quad_stage_hess(ode, quad, 3)
    rng = np.random.default_rng(2)
    B, N = 4, 3
    a = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3)
    xs, us, pxs, pys = a(B, N, 2), a(B, N, 1), a(B, N, 1), a(B, N, 1)
    t, h = a(B), jnp.full((B,), 0.25)
    d, xss, uss = a(B, 1), a(B, 2), a(B, 1)
    bat = jax.jit(jax.vmap(F))(xs, us, pxs, pys, t, h, d, xss, uss)
    ref = [F(xs[b], us[b], pxs[b], pys[b], t[b], h[b], d[b], xss[b], uss[b])
           for b in range(B)]
    for i in range(6):
        r = np.stack([np.asarray(rr[i]) for rr in ref])
        assert np.abs(np.asarray(bat[i]) - r).max() < 1e-12, i
