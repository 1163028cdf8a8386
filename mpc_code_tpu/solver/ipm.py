"""Batched primal-dual interior-point NLP solver in pure JAX.

TPU-native replacement for IPOPT (+MUMPS), which the reference invokes
through CasADi ``nlpsol`` for every target/OCP/MHE/adaptation solve
(reference: MPC_code.py:261-263 options; solve sites at MPC_code.py:704,
776, 837, 861 and Estimator.py:525).  Design:

- Slack reformulation identical to IPOPT: ``g(w) - s = 0`` with box bounds
  on ``w`` and ``s``; log-barrier on all finite bounds; primal-dual Newton
  on the KKT system; fraction-to-boundary; monotone Fiacco-McCormick mu
  schedule; l1-penalty backtracking line search; primal inertia
  regularization by exact eigenvalue shift of the condensed Hessian block.
- Everything is fixed-shape `lax.while_loop` + dense linear algebra, so one
  ``jit`` compiles the whole solve and ``vmap`` batches thousands of
  instances per chip (the reference's serial per-step IPOPT calls have no
  batch axis at all).
- Derivatives come from `jax.grad` / `jax.jacfwd` / `jax.hessian` on the
  traced problem functions — the CasADi AD layer has no equivalent here
  because XLA differentiates the same rollout code the simulator uses.

Fixed variables (lbw == ubw — how the closed loop pins x0, reference
MPC_code.py:734) are handled exactly: pinned at their bound, their KKT
rows/columns replaced by identity.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mpc_code_tpu.config import SolverOptions
from mpc_code_tpu.ops.smalllin import (
    MAX_UNROLL, MIN_BATCH, chol_unrolled, solve_lu_unrolled,
)
from mpc_code_tpu.solver.nlp import (
    IPMResult,
    NLP,
    STATUS_ACCEPTABLE,
    STATUS_INFEASIBLE,
    STATUS_SOLVED,
)

_INF = 1e18          # bounds beyond this are treated as absent (IPOPT: 1e19)
_KAPPA_1 = 1e-2      # interior push (IPOPT kappa_1/kappa_2)
_KAPPA_2 = 1e-2
_KAPPA_SIGMA = 1e10  # dual safeguard corridor (f64; f32 uses 1e6)
_KAPPA_EPS = 10.0    # barrier sufficient-progress factor
_KAPPA_MU = 0.2      # linear mu decrease
_THETA_MU = 1.5      # superlinear mu decrease
_TAU_MIN = 0.99
_ETA_LS = 1e-4       # Armijo constant
_MAX_BACKTRACK = 25
_DELTA_C = 1e-11     # constant dual regularization (f64; f32 uses 1e-6)


class _State(NamedTuple):
    w: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray       # l1 merit penalty
    delta: jnp.ndarray    # persistent extra primal regularization
    it: jnp.ndarray
    done: jnp.ndarray
    kkt0: jnp.ndarray     # unscaled KKT error at mu=0
    feas: jnp.ndarray


def _masked_div(num, den, mask):
    den_safe = jnp.where(mask, den, 1.0)
    return jnp.where(mask, num / den_safe, 0.0)


def make_solver(nlp: NLP, opts: SolverOptions = SolverOptions(),
                batch_hint=None) -> Callable:
    """Build ``solve(w0, p, lbw, ubw, lbg, ubg) -> IPMResult``.

    The returned callable is jit/vmap friendly; wrap it yourself, e.g.::

        solve = jax.jit(make_solver(nlp))
        batched = jax.jit(jax.vmap(make_solver(nlp), in_axes=(0, 0, None, None, None, None)))

    ``batch_hint``: expected vmap batch of the caller.  With a hint
    >= smalllin.MIN_BATCH the KKT factorizations use the unrolled
    small-matrix kernels (ops/smalllin.py — the batched-TPU win that
    took the ENMPC step 9.1k -> 41k steps/s); without one they keep
    the LAPACK custom-calls, which win the single-lane latency
    regime (chip A/B: nmpc target p50 90 vs 123 ms).
    """
    import os as _os

    _unroll_hint = (batch_hint is not None and batch_hint >= MIN_BATCH
                    and _os.environ.get("MPC_TPU_SMALLLIN", "1") != "0")

    def _schol(M):
        if _unroll_hint and M.dtype == jnp.float32 and M.shape[-1] <= MAX_UNROLL:
            return chol_unrolled(M)
        return jnp.linalg.cholesky(M)

    def _ssolve(A, b):
        if _unroll_hint and A.dtype == jnp.float32 and A.shape[-1] <= MAX_UNROLL:
            return solve_lu_unrolled(A, b)
        return jnp.linalg.solve(A, b)

    # hessian='gauss_newton' is accepted but this dense path always uses the
    # exact Lagrangian Hessian (GN is a structured-solver speed lever; the
    # dense solver is the correctness oracle)
    if opts.hessian not in ("exact", "gauss_newton"):
        raise ValueError(f"unknown hessian {opts.hessian!r}: "
                         "use 'exact' or 'gauss_newton'")
    nw, ng = nlp.nw, nlp.ng
    nz = nw + ng

    raw_grad_f = jax.grad(nlp.f)
    if ng > 0:
        raw_jac_g = jax.jacfwd(nlp.g) if ng >= nw else jax.jacrev(nlp.g)

    def scaled_lagrangian(w, p, yf, yg):
        if ng > 0:
            return yf * nlp.f(w, p) + yg @ nlp.g(w, p)
        return yf * nlp.f(w, p)

    raw_hess_l = jax.hessian(scaled_lagrangian)

    def solve(w0, p, lbw, ubw, lbg, ubg) -> IPMResult:
        dtype = jnp.result_type(jnp.asarray(w0).dtype, jnp.float32)
        w0 = jnp.asarray(w0, dtype=dtype)
        lbw = jnp.asarray(lbw, dtype=dtype)
        ubw = jnp.asarray(ubw, dtype=dtype)
        lbg_u = jnp.asarray(lbg, dtype=dtype).reshape(ng)
        ubg_u = jnp.asarray(ubg, dtype=dtype).reshape(ng)

        fixed_w = (ubw - lbw) <= 0.0
        fixed_s = (ubg_u - lbg_u) <= 0.0

        mu0 = jnp.asarray(opts.mu_init, dtype=dtype)
        f32 = jnp.finfo(dtype).eps > 1e-10
        tiny = 1e-30 if f32 else 1e-300
        delta_c = 1e-6 if f32 else _DELTA_C
        kappa_sigma = 1e6 if f32 else _KAPPA_SIGMA

        # --- interior initialization (IPOPT eq. (23)-(24) style push) ---
        def push_interior(z, lb, ub, has_lb, has_ub, fixed):
            pl = jnp.minimum(_KAPPA_1 * jnp.maximum(1.0, jnp.abs(lb)),
                             _KAPPA_2 * jnp.where(has_ub, ub - lb, jnp.inf))
            pu = jnp.minimum(_KAPPA_1 * jnp.maximum(1.0, jnp.abs(ub)),
                             _KAPPA_2 * jnp.where(has_lb, ub - lb, jnp.inf))
            zlo = jnp.where(has_lb, lb + pl, -jnp.inf)
            zhi = jnp.where(has_ub, ub - pu, jnp.inf)
            return jnp.where(fixed, lb, jnp.clip(z, zlo, zhi))

        has_lbw = (lbw > -_INF) & ~fixed_w
        has_ubw = (ubw < _INF) & ~fixed_w
        w_init = push_interior(w0, lbw, ubw, has_lbw, has_ubw, fixed_w)

        # --- gradient-based problem scaling (IPOPT nlp_scaling_method=
        # gradient-based, gmax=100): scale f and each g row so the largest
        # first-derivative entry at the start point is <= 100.  Essential for
        # physically-scaled problems (states ~1e2 next to states ~1e-1).
        gmax = 100.0
        gf0 = raw_grad_f(w_init, p)
        sf = jnp.minimum(1.0, gmax / jnp.maximum(jnp.max(jnp.abs(gf0)), 1e-8))
        if ng > 0:
            J0 = raw_jac_g(w_init, p)
            sg = jnp.minimum(1.0, gmax / jnp.maximum(jnp.max(jnp.abs(J0), axis=1), 1e-8))
        else:
            sg = jnp.zeros(0, dtype=dtype)

        lbg_s = sg * lbg_u
        ubg_s = sg * ubg_u

        def grad_f(w, p):
            return sf * raw_grad_f(w, p)

        def jac_g(w, p):
            return sg[:, None] * raw_jac_g(w, p)

        def jac_g_val(w, p):
            # Jacobian AND value from one AD pass (the primal is evaluated
            # inside jacfwd/jacrev anyway; returning it as aux saves the
            # separate g evaluation per iteration)
            def g_aux(ww):
                v = nlp.g(ww, p)
                return v, v

            ad = jax.jacfwd if ng >= nw else jax.jacrev
            J, gv = ad(g_aux, has_aux=True)(w)
            return sg[:, None] * J, sg * gv

        def hess_l(w, p, y):
            return raw_hess_l(w, p, sf, y * sg)

        def g_scaled(w, p):
            return sg * nlp.g(w, p)

        lb = jnp.concatenate([lbw, lbg_s])
        ub = jnp.concatenate([ubw, ubg_s])
        fixed = jnp.concatenate([fixed_w, fixed_s])
        has_lb = (lb > -_INF) & ~fixed
        has_ub = (ub < _INF) & ~fixed

        g0 = g_scaled(w_init, p) if ng > 0 else jnp.zeros(0, dtype=dtype)
        s_init = push_interior(g0, lbg_s, ubg_s, has_lb[nw:], has_ub[nw:], fixed_s)

        z0 = jnp.concatenate([w_init, s_init])
        zl0 = jnp.where(has_lb, jnp.clip(mu0 / jnp.where(has_lb, z0 - lb, 1.0), 1e-8, 1e8), 0.0)
        zu0 = jnp.where(has_ub, jnp.clip(mu0 / jnp.where(has_ub, ub - z0, 1.0), 1e-8, 1e8), 0.0)

        state = _State(
            w=w_init,
            s=s_init,
            y=jnp.zeros(ng, dtype=dtype),
            zl=zl0,
            zu=zu0,
            mu=mu0,
            nu=jnp.asarray(1.0, dtype=dtype),
            delta=jnp.asarray(0.0, dtype=dtype),
            it=jnp.asarray(0, dtype=jnp.int32),
            done=jnp.asarray(False),
            kkt0=jnp.asarray(jnp.inf, dtype=dtype),
            feas=jnp.asarray(jnp.inf, dtype=dtype),
        )

        def barrier_phi(w, s, mu):
            z = jnp.concatenate([w, s])
            tl = jnp.where(has_lb, jnp.log(jnp.where(has_lb, jnp.maximum(z - lb, tiny), 1.0)), 0.0)
            tu = jnp.where(has_ub, jnp.log(jnp.where(has_ub, jnp.maximum(ub - z, tiny), 1.0)), 0.0)
            return sf * nlp.f(w, p) - mu * (jnp.sum(tl) + jnp.sum(tu))

        def constraint_res(w, s):
            if ng == 0:
                return jnp.zeros(0, dtype=dtype)
            return g_scaled(w, p) - s

        def kkt_errors(w, s, y, zl, zu, mu):
            z = jnp.concatenate([w, s])
            gf = grad_f(w, p)
            if ng > 0:
                J = jac_g(w, p)
                r_w = gf + J.T @ y - zl[:nw] + zu[:nw]
            else:
                r_w = gf - zl[:nw] + zu[:nw]
            r_s = -y - zl[nw:] + zu[nw:]
            r_stat = jnp.concatenate([jnp.where(fixed_w, 0.0, r_w), jnp.where(fixed_s, 0.0, r_s)])
            r_c = constraint_res(w, s)
            comp_l = jnp.where(has_lb, (z - lb) * zl - mu, 0.0)
            comp_u = jnp.where(has_ub, (ub - z) * zu - mu, 0.0)
            s_max = 100.0
            denom = nz + ng
            s_d = jnp.maximum(s_max, (jnp.sum(jnp.abs(y)) + jnp.sum(zl) + jnp.sum(zu)) / denom) / s_max
            s_c = jnp.maximum(s_max, (jnp.sum(zl) + jnp.sum(zu)) / nz) / s_max
            e_stat = jnp.max(jnp.abs(r_stat), initial=0.0) / s_d
            e_feas = jnp.max(jnp.abs(r_c), initial=0.0)
            e_comp = jnp.maximum(jnp.max(jnp.abs(comp_l), initial=0.0),
                                 jnp.max(jnp.abs(comp_u), initial=0.0)) / s_c
            return jnp.maximum(jnp.maximum(e_stat, e_feas), e_comp), e_feas

        def body(st: _State) -> _State:
            w, s, y, zl, zu, mu = st.w, st.s, st.y, st.zl, st.zu, st.mu
            z = jnp.concatenate([w, s])

            gf = grad_f(w, p)
            H = hess_l(w, p, y)
            if ng > 0:
                J, g_w = jac_g_val(w, p)
                r_c = g_w - s
            else:
                r_c = jnp.zeros(0, dtype=dtype)

            dzl_gap = jnp.where(has_lb, z - lb, 1.0)
            dzu_gap = jnp.where(has_ub, ub - z, 1.0)
            sig_l = _masked_div(zl, dzl_gap, has_lb)
            sig_u = _masked_div(zu, dzu_gap, has_ub)
            sigma = sig_l + sig_u
            sigma_w, sigma_s = sigma[:nw], sigma[nw:]

            # barrier gradient pieces  mu/(z-lb) - mu/(ub-z)
            bgrad = _masked_div(mu * jnp.ones_like(z), dzl_gap, has_lb) - _masked_div(
                mu * jnp.ones_like(z), dzu_gap, has_ub
            )
            bgrad_w, bgrad_s = bgrad[:nw], bgrad[nw:]

            # condensed Hessian block with fixed-variable masking
            Hbar = H + jnp.diag(sigma_w)
            free_w = ~fixed_w
            maskmat = jnp.outer(free_w, free_w)
            Hbar = jnp.where(maskmat, Hbar, 0.0) + jnp.diag(jnp.where(fixed_w, 1.0, 0.0))

            # Inertia correction (IPOPT's delta_w ladder): the KKT matrix has
            # the right inertia (nw positive, ng negative) iff the Schur
            # complement Hbar + J' D^{-1} J is positive definite, where D is
            # the slack-sigma block (equality rows -> 1/delta_c penalty).
            # Note: PD on the *constraint null space* only — shifting the
            # full Hessian spectrum instead cripples Newton on locally
            # nonconvex but second-order-sufficient problems.
            rhs_w = jnp.where(free_w, -(gf + (J.T @ y if ng > 0 else 0.0)) + bgrad_w, 0.0)

            if ng > 0:
                sinv = _masked_div(jnp.ones_like(sigma_s), sigma_s, (~fixed_s) & (sigma_s > 0))
                Jm = jnp.where(free_w[None, :], J, 0.0)
                dinv = 1.0 / (sinv + delta_c)
                M_test = 0.5 * (Hbar + Hbar.T) + Jm.T @ (dinv[:, None] * Jm)
            else:
                M_test = 0.5 * (Hbar + Hbar.T)

            deltas = jnp.asarray([0.0, 1e-8, 1e-6, 1e-4, 1e-2, 1.0, 1e2, 1e4], dtype=dtype)
            eye_free = jnp.diag(jnp.where(free_w, 1.0, 0.0))

            def _pd_ok(d):
                L = _schol(M_test + d * eye_free)
                return jnp.all(jnp.isfinite(L))

            ok = jax.vmap(_pd_ok)(deltas)
            first = jnp.argmax(ok)
            delta_w = jnp.where(jnp.any(ok), deltas[first], 1e6) + st.delta
            Hbar = Hbar + delta_w * jnp.diag(jnp.where(free_w, 1.0, 0.0))

            if ng > 0:
                K = jnp.block([
                    [Hbar, Jm.T],
                    [Jm, -jnp.diag(sinv + delta_c)],
                ])
                rhs_c = -r_c + sinv * (y + bgrad_s)
                rhs = jnp.concatenate([rhs_w, rhs_c])
                sol = _ssolve(K, rhs)
                dw, dy = sol[:nw], sol[nw:]
                ds = jnp.where(fixed_s, 0.0, sinv * (dy + y + bgrad_s))
            else:
                dw = _ssolve(Hbar, rhs_w)
                dy = jnp.zeros(0, dtype=dtype)
                ds = jnp.zeros(0, dtype=dtype)

            dw = jnp.where(fixed_w, 0.0, dw)
            dw = jnp.nan_to_num(dw, nan=0.0, posinf=0.0, neginf=0.0)
            ds = jnp.nan_to_num(ds, nan=0.0, posinf=0.0, neginf=0.0)
            dy = jnp.nan_to_num(dy, nan=0.0, posinf=0.0, neginf=0.0)

            def ftb_primal(dz_v, mu_v):
                """Fraction-to-boundary step cap for a primal direction."""
                tau = jnp.maximum(_TAU_MIN, 1.0 - mu_v)
                a_l = jnp.where(has_lb & (dz_v < 0),
                                -tau * dzl_gap / jnp.where(dz_v < 0, dz_v, -1.0), jnp.inf)
                a_u = jnp.where(has_ub & (dz_v > 0),
                                tau * dzu_gap / jnp.where(dz_v > 0, dz_v, 1.0), jnp.inf)
                return jnp.minimum(1.0, jnp.minimum(jnp.min(a_l, initial=jnp.inf),
                                                    jnp.min(a_u, initial=jnp.inf)))

            dz = jnp.concatenate([dw, ds])
            alpha_max = ftb_primal(dz, mu)

            # l1 merit machinery.  The penalty must dominate the current
            # multiplier estimate, but a transiently huge estimate (e.g. the
            # first iteration after an interior push against a violated
            # bound) must not poison every later line search — so nu may
            # decay geometrically instead of being monotone.
            nu = jnp.maximum(1.5 * jnp.max(jnp.abs(y + dy), initial=0.0) + 1e-4,
                             0.5 * st.nu)
            c_norm = jnp.sum(jnp.abs(r_c))
            phi0 = barrier_phi(w, s, mu)
            psi0 = phi0 + nu * c_norm
            dphi = (gf @ dw) - jnp.sum(bgrad * dz)   # directional derivative of phi
            dpsi = dphi - nu * c_norm

            def merit_of(w_t, s_t, c_t):
                # caller supplies the constraint residual to avoid a second
                # nlp.g evaluation at the same trial point
                return barrier_phi(w_t, s_t, mu) + nu * jnp.sum(jnp.abs(c_t))

            def merit(w_t, s_t):
                return merit_of(w_t, s_t, constraint_res(w_t, s_t))

            # Near a KKT point the merit decrease falls below f64 roundoff and
            # Armijo would reject spuriously; take the full (fraction-to-
            # boundary-limited) Newton step there to keep local quadratic
            # convergence (IPOPT's filter achieves the same via relative
            # margins).
            eps_mach = jnp.finfo(dtype).eps
            slack = 10.0 * eps_mach * (jnp.abs(psi0) + 1.0)
            near_opt = st.kkt0 < 1e-5

            # --- full-step trial + second-order correction (Maratos fix;
            # IPOPT's SOC, its eq. (27)): if the full step is rejected because
            # constraint curvature spikes the merit, re-solve the same KKT
            # system with the corrected residual c_soc = alpha*c + c(trial)
            # and try the corrected direction at its own boundary cap.
            c_trial_full = constraint_res(w + alpha_max * dw, s + alpha_max * ds)
            ok_full = merit_of(w + alpha_max * dw, s + alpha_max * ds,
                               c_trial_full) <= (
                psi0 + _ETA_LS * alpha_max * dpsi + slack)

            if ng > 0:
                c_trial = c_trial_full
                c_soc = alpha_max * r_c + c_trial
                rhs_c_soc = -c_soc + sinv * (y + bgrad_s)
                sol_soc = _ssolve(K, jnp.concatenate([rhs_w, rhs_c_soc]))
                dw_soc = jnp.where(fixed_w, 0.0, sol_soc[:nw])
                dy_soc = sol_soc[nw:]
                ds_soc = jnp.where(fixed_s, 0.0, sinv * (dy_soc + y + bgrad_s))
                a_soc = ftb_primal(jnp.concatenate([dw_soc, ds_soc]), mu)
                ok_soc = (~ok_full) & (merit(w + a_soc * dw_soc, s + a_soc * ds_soc) <= (
                    psi0 + _ETA_LS * a_soc * dpsi + slack))
            else:
                dw_soc, dy_soc, ds_soc = dw, dy, ds
                a_soc = alpha_max
                ok_soc = jnp.asarray(False)

            use_soc = ok_soc & ~near_opt
            dw = jnp.where(use_soc, dw_soc, dw)
            dy = jnp.where(use_soc, dy_soc, dy)
            ds = jnp.where(use_soc, ds_soc, ds)
            dz = jnp.concatenate([dw, ds])
            alpha_max = jnp.where(use_soc, a_soc, alpha_max)

            dzl = jnp.where(has_lb, -zl + _masked_div(mu - zl * dz, dzl_gap, has_lb), 0.0)
            dzu = jnp.where(has_ub, -zu + _masked_div(mu + zu * dz, dzu_gap, has_ub), 0.0)
            bad = ~jnp.all(jnp.isfinite(jnp.concatenate([dz, dy, dzl, dzu])))

            tau = jnp.maximum(_TAU_MIN, 1.0 - mu)
            a_zl = jnp.where(has_lb & (dzl < 0), -tau * zl / jnp.where(dzl < 0, dzl, -1.0), jnp.inf)
            a_zu = jnp.where(has_ub & (dzu < 0), -tau * zu / jnp.where(dzu < 0, dzu, -1.0), jnp.inf)
            alpha_dual = jnp.minimum(1.0, jnp.minimum(jnp.min(a_zl, initial=jnp.inf),
                                                      jnp.min(a_zu, initial=jnp.inf)))

            def ls_cond(carry):
                j, accepted, _ = carry
                return (~accepted) & (j < _MAX_BACKTRACK)

            psi0_finite = jnp.isfinite(psi0)

            def capped(r):
                return jnp.sum(jnp.abs(jnp.nan_to_num(r, posinf=1e30, neginf=-1e30)))

            c0_capped = capped(r_c)   # current-point residual already computed

            def ls_body(carry):
                # ONE constraint evaluation per trial point feeds both tests
                j, _, _ = carry
                alpha = alpha_max * (0.5 ** j)
                w_t = w + alpha * dw
                s_t = s + alpha * ds
                c_t = constraint_res(w_t, s_t)
                ok_merit = merit_of(w_t, s_t, c_t) <= (
                    psi0 + _ETA_LS * alpha * dpsi + slack)
                # merit overflow (runaway dynamics): require feasibility decrease
                ok_resto = capped(c_t) <= 0.99 * c0_capped
                ok = jnp.where(psi0_finite, ok_merit, ok_resto)
                return (j + 1, ok, alpha)

            _, accepted, alpha = lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(0, jnp.int32), near_opt | ok_full | use_soc, alpha_max))
            accepted = accepted | near_opt | ok_full | use_soc
            alpha = jnp.where(accepted, alpha, alpha_max * (0.5 ** _MAX_BACKTRACK))
            alpha = jnp.where(bad, 0.0, alpha)

            w_n = w + alpha * dw
            s_n = s + alpha * ds
            y_n = y + alpha * dy
            zl_n = zl + jnp.where(bad, 0.0, alpha_dual) * dzl
            zu_n = zu + jnp.where(bad, 0.0, alpha_dual) * dzu

            # dual safeguard corridor (IPOPT kappa_Sigma)
            z_n = jnp.concatenate([w_n, s_n])
            gl = jnp.where(has_lb, jnp.maximum(z_n - lb, tiny), 1.0)
            gu = jnp.where(has_ub, jnp.maximum(ub - z_n, tiny), 1.0)
            zl_n = jnp.where(has_lb, jnp.clip(zl_n, mu / (kappa_sigma * gl), kappa_sigma * mu / gl), 0.0)
            zu_n = jnp.where(has_ub, jnp.clip(zu_n, mu / (kappa_sigma * gu), kappa_sigma * mu / gu), 0.0)

            # regularization memory: grow when the step failed, decay otherwise
            delta_n = jnp.where(bad | ~accepted,
                                jnp.maximum(st.delta * 10.0, 1e-8),
                                st.delta / 3.0)

            e_mu, _ = kkt_errors(w_n, s_n, y_n, zl_n, zu_n, mu)
            e_0, feas = kkt_errors(w_n, s_n, y_n, zl_n, zu_n, jnp.zeros_like(mu))

            mu_n = jnp.where(
                e_mu <= _KAPPA_EPS * mu,
                jnp.maximum(opts.tol / 10.0, jnp.minimum(_KAPPA_MU * mu, mu ** _THETA_MU)),
                mu,
            )
            done_n = e_0 <= opts.tol

            if opts.debug:
                jax.debug.print(
                    "it={it} mu={mu:.2e} a={a:.2e} ad={ad:.2e} amax={am:.2e} acc={acc} "
                    "|dw|={ndw:.2e} nu={nu:.2e} dlt={d:.1e} kkt={k:.3e} feas={f:.2e}",
                    it=st.it, mu=mu, a=alpha, ad=alpha_dual, am=alpha_max, acc=accepted,
                    ndw=jnp.max(jnp.abs(dw)), nu=nu, d=delta_w, k=e_0, f=feas)

            new = _State(w=w_n, s=s_n, y=y_n, zl=zl_n, zu=zu_n, mu=mu_n, nu=nu,
                         delta=delta_n, it=st.it + 1, done=done_n, kkt0=e_0, feas=feas)
            # freeze lanes that already converged (relevant under vmap)
            return jax.tree_util.tree_map(
                lambda old_leaf, new_leaf: jnp.where(st.done, old_leaf, new_leaf), st, new
            )

        def cond(st: _State):
            return (~st.done) & (st.it < opts.max_iter)

        final = lax.while_loop(cond, body, state)

        # unscaled constraint violation for the status decision (the
        # infeasibility fallback semantics must not depend on scaling)
        if ng > 0:
            g_u = nlp.g(final.w, p)
            feas_u = jnp.maximum(
                jnp.max(jnp.maximum(g_u - ubg_u, 0.0), initial=0.0),
                jnp.max(jnp.maximum(lbg_u - g_u, 0.0), initial=0.0),
            )
        else:
            feas_u = jnp.zeros((), dtype=dtype)

        status = jnp.where(
            final.kkt0 <= opts.tol,
            STATUS_SOLVED,
            jnp.where(feas_u <= opts.constr_viol_tol, STATUS_ACCEPTABLE, STATUS_INFEASIBLE),
        ).astype(jnp.int32)

        return IPMResult(
            w=final.w,
            f=nlp.f(final.w, p),
            lam_g=final.y * sg / jnp.maximum(sf, tiny),  # unscale multipliers
            status=status,
            iters=final.it,
            kkt_err=final.kkt0,
            feas_err=feas_u,
        )

    return solve


def kkt_error(nlp: NLP, res: IPMResult, p, lbw, ubw, lbg, ubg):
    """Unscaled stationarity/feasibility/complementarity residuals at a
    solution — test oracle for solver correctness."""
    w = res.w
    g = nlp.g(w, p) if nlp.ng > 0 else jnp.zeros(0)
    feas = jnp.maximum(jnp.max(jnp.maximum(g - ubg, 0.0), initial=0.0),
                       jnp.max(jnp.maximum(lbg - g, 0.0), initial=0.0))
    box = jnp.maximum(jnp.max(jnp.maximum(w - ubw, 0.0), initial=0.0),
                      jnp.max(jnp.maximum(lbw - w, 0.0), initial=0.0))
    return {"feas_g": feas, "feas_box": box, "kkt": res.kkt_err}
