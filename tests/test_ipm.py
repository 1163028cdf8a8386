"""Solver-level tests for the interior-point NLP solver (SURVEY.md §4 item 3).

Oracles: analytic QP solutions, scipy.optimize (SLSQP/trust-constr), and KKT
residuals — the environment has no CasADi/IPOPT, so correctness is
established against independent solvers and first principles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

from mpc_code_tpu.config import SolverOptions
from mpc_code_tpu.solver import NLP, make_solver

INF = np.inf


def _solve(nlp, w0, p, lbw, ubw, lbg, ubg, **kw):
    solver = make_solver(nlp, SolverOptions(**kw)) if kw else make_solver(nlp)
    return jax.jit(solver)(jnp.asarray(w0, float), p,
                           jnp.asarray(lbw, float), jnp.asarray(ubw, float),
                           jnp.asarray(lbg, float), jnp.asarray(ubg, float))


def test_unconstrained_qp():
    H = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    c = jnp.array([1.0, -2.0])
    nlp = NLP(f=lambda w, p: 0.5 * w @ (H @ w) + c @ w, g=lambda w, p: jnp.zeros(0), nw=2, ng=0)
    res = _solve(nlp, np.zeros(2), None, [-INF, -INF], [INF, INF], [], [])
    w_star = np.linalg.solve(np.asarray(H), -np.asarray(c))
    assert res.status == 0
    assert np.allclose(res.w, w_star, atol=1e-7)


def test_equality_qp():
    # min 0.5||w||^2 s.t. sum(w) = 1 -> w = 1/n
    n = 5
    nlp = NLP(f=lambda w, p: 0.5 * w @ w, g=lambda w, p: jnp.sum(w)[None], nw=n, ng=1)
    res = _solve(nlp, np.zeros(n), None, [-INF] * n, [INF] * n, [1.0], [1.0])
    assert res.status == 0
    assert np.allclose(res.w, np.full(n, 1.0 / n), atol=1e-7)


def test_box_constrained_qp_active_bounds():
    # min (w0-2)^2 + (w1+3)^2 with -1 <= w <= 1 -> w = (1, -1)
    nlp = NLP(f=lambda w, p: (w[0] - 2) ** 2 + (w[1] + 3) ** 2,
              g=lambda w, p: jnp.zeros(0), nw=2, ng=0)
    res = _solve(nlp, np.zeros(2), None, [-1, -1], [1, 1], [], [])
    assert res.status == 0
    assert np.allclose(res.w, [1.0, -1.0], atol=1e-6)


def test_fixed_variable_pinning():
    # pin w0 = 0.3 via lbw=ubw (how the OCP pins x0, MPC_code.py:734)
    nlp = NLP(f=lambda w, p: (w[0] - 1) ** 2 + (w[1] - w[0]) ** 2,
              g=lambda w, p: jnp.zeros(0), nw=2, ng=0)
    res = _solve(nlp, np.zeros(2), None, [0.3, -INF], [0.3, INF], [], [])
    assert res.status == 0
    assert np.allclose(res.w, [0.3, 0.3], atol=1e-7)


def test_inequality_constraint():
    # min (w0-2)^2+(w1-2)^2 s.t. w0 + w1 <= 1 -> w = (0.5, 0.5)
    nlp = NLP(f=lambda w, p: (w[0] - 2) ** 2 + (w[1] - 2) ** 2,
              g=lambda w, p: (w[0] + w[1])[None], nw=2, ng=1)
    res = _solve(nlp, np.zeros(2), None, [-INF, -INF], [INF, INF], [-INF], [1.0])
    assert res.status == 0
    assert np.allclose(res.w, [0.5, 0.5], atol=1e-6)


def test_two_sided_inequality():
    # min w0^2 + w1^2 s.t. 1 <= w0 + 2 w1 <= 3 (lower side active)
    nlp = NLP(f=lambda w, p: w @ w, g=lambda w, p: (w[0] + 2 * w[1])[None], nw=2, ng=1)
    res = _solve(nlp, np.zeros(2), None, [-INF, -INF], [INF, INF], [1.0], [3.0])
    assert res.status == 0
    assert np.allclose(res.w, [0.2, 0.4], atol=1e-6)


def test_parametric_objective():
    nlp = NLP(f=lambda w, p: jnp.sum((w - p) ** 2), g=lambda w, p: jnp.zeros(0), nw=3, ng=0)
    res = _solve(nlp, np.zeros(3), jnp.array([1.0, 2.0, 3.0]), [-INF] * 3, [INF] * 3, [], [])
    assert np.allclose(res.w, [1, 2, 3], atol=1e-7)


def test_rosenbrock_constrained_vs_scipy():
    def f_np(w):
        return 100 * (w[1] - w[0] ** 2) ** 2 + (1 - w[0]) ** 2

    def g_np(w):
        return np.array([w[0] ** 2 + w[1] ** 2])

    nlp = NLP(
        f=lambda w, p: 100 * (w[1] - w[0] ** 2) ** 2 + (1 - w[0]) ** 2,
        g=lambda w, p: (w[0] ** 2 + w[1] ** 2)[None],
        nw=2, ng=1,
    )
    # disc constraint x^2+y^2 <= 1.5
    res = _solve(nlp, np.array([0.5, 0.5]), None, [-INF, -INF], [INF, INF], [-INF], [1.5])
    ref = sopt.minimize(f_np, [0.5, 0.5], method="SLSQP",
                        constraints=[{"type": "ineq", "fun": lambda w: 1.5 - g_np(w)[0]}])
    assert res.status == 0
    assert np.allclose(res.w, ref.x, atol=1e-5)


def test_nonconvex_vs_trust_constr():
    # a small nonconvex NLP with equality + bounds
    def f(w, p=None):
        mod = jnp if isinstance(w, jnp.ndarray) else np
        return mod.sin(w[0]) * w[1] + 0.5 * (w[2] - 1) ** 2 + 0.1 * (w @ w)

    def g(w, p=None):
        mod = jnp if isinstance(w, jnp.ndarray) else np
        return mod.stack([w[0] + w[1] + w[2] - 1.0, w[0] * w[1] - 0.1])

    nlp = NLP(f=f, g=g, nw=3, ng=2)
    w0 = np.array([0.4, 0.3, 0.3])
    res = _solve(nlp, w0, None, [-2, -2, -2], [2, 2, 2], [0.0, 0.0], [0.0, 0.0])
    ref = sopt.minimize(
        lambda w: float(f(jnp.asarray(w))), w0, method="trust-constr",
        constraints=[sopt.NonlinearConstraint(lambda w: np.asarray(g(jnp.asarray(w))), 0, 0)],
        bounds=sopt.Bounds([-2] * 3, [2] * 3), options={"gtol": 1e-10, "xtol": 1e-12},
    )
    assert res.status == 0
    assert np.allclose(np.asarray(g(res.w)), 0.0, atol=1e-7)
    assert float(res.f) <= float(ref.fun) + 1e-6


def test_infeasible_detection():
    # w <= -1 and w >= 1 via two g rows: infeasible
    nlp = NLP(f=lambda w, p: w @ w, g=lambda w, p: jnp.stack([w[0], w[0]]), nw=1, ng=2)
    res = _solve(nlp, np.zeros(1), None, [-INF], [INF], [-INF, 1.0], [-1.0, INF], max_iter=60)
    assert res.status == 2


def test_vmap_batch_of_qps():
    # batched parametric QP: min ||w - p||^2 s.t. sum(w) = 1
    n, B = 4, 16
    nlp = NLP(f=lambda w, p: jnp.sum((w - p) ** 2), g=lambda w, p: jnp.sum(w)[None], nw=n, ng=1)
    solver = make_solver(nlp)
    batched = jax.jit(jax.vmap(solver, in_axes=(None, 0, None, None, None, None)))
    P = jnp.asarray(np.random.default_rng(3).normal(size=(B, n)))
    res = batched(jnp.zeros(n), P,
                  jnp.full(n, -INF), jnp.full(n, INF), jnp.array([1.0]), jnp.array([1.0]))
    # analytic: w = p + (1 - sum p)/n
    w_ref = P + (1 - P.sum(axis=1, keepdims=True)) / n
    assert np.all(np.asarray(res.status) == 0)
    assert np.allclose(res.w, w_ref, atol=1e-6)


def test_warm_start_helps():
    nlp = NLP(f=lambda w, p: 100 * (w[1] - w[0] ** 2) ** 2 + (1 - w[0]) ** 2,
              g=lambda w, p: jnp.zeros(0), nw=2, ng=0)
    cold = _solve(nlp, np.array([-1.2, 1.0]), None, [-INF] * 2, [INF] * 2, [], [])
    warm = _solve(nlp, np.array([1.0 - 1e-3, 1.0 - 2e-3]), None, [-INF] * 2, [INF] * 2, [], [])
    assert cold.status == 0 and warm.status == 0
    assert int(warm.iters) <= int(cold.iters)
