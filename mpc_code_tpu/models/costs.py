"""Cost constructors: stage, steady-state, MHE, terminal.

TPU-native replacement for the reference's CasADi cost factories
`defF_obj` (Utilities.py:323-381), `defFss_obj` (Utilities.py:267-321),
`defF_obj_mhe` (Utilities.py:675-709) and `defVfin` (Utilities.py:383-420).
All returned objects are plain callables over JAX arrays.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from mpc_code_tpu.config import MHECost, MPCConfig, SSCost, StageCost, LinearModel
from mpc_code_tpu.ops.dare import solve_dare


def xQx(x, Q):
    """x' Q x (reference: Utilities.xQx, Utilities.py:247-265)."""
    return x @ (jnp.asarray(Q, dtype=float) @ x)


def build_stage_cost(sc: StageCost) -> Callable:
    """F_obj(x, u, y, xs, us, ys) — reference Utilities.defF_obj.

    LP:   r_x·|x| + r_{u|Du}·|u|        (Utilities.py:341-352)
    QP:   0.5 (x'Qx + u'{R|S}u)         (Utilities.py:353-367)
    user: f_dis(x,u,y,xs,us,ys), f_cont (used under quadrature),
          f_coll(x,u,y,xs,us,ys,s_coll) (Utilities.py:368-379)
    """
    if sc.r_x is not None:
        r_x = jnp.asarray(sc.r_x, dtype=float)
        r_u = jnp.asarray(sc.r_u if sc.r_u is not None else sc.r_Du, dtype=float)

        def f_obj(x, u, y, xs, us, ys):
            return jnp.sum(r_x @ jnp.abs(x)) + jnp.sum(r_u @ jnp.abs(u))

        return f_obj
    if sc.Q is not None:
        Q = jnp.asarray(sc.Q, dtype=float)
        Ru = jnp.asarray(sc.R if sc.R is not None else sc.S, dtype=float)

        def f_obj(x, u, y, xs, us, ys):
            return 0.5 * (x @ (Q @ x) + u @ (Ru @ u))

        return f_obj
    if sc.f_cont is not None:
        return sc.f_cont
    if sc.f_dis is not None:
        return sc.f_dis
    if sc.f_coll is not None:
        return sc.f_coll
    raise ValueError("stage cost is empty")


def build_ss_cost(ssc: SSCost) -> Callable:
    """Fss_obj(x, u, y, xsp, usp, ysp) — reference Utilities.defFss_obj.

    LP:   rss_y·y + rss_{u|Du}·|u|      (Utilities.py:284-296; note y is NOT
          passed through abs, and the rss_Du branch is identical to rss_u —
          a documented reference quirk we mirror)
    QP:   0.5 (y'Qss y + u'{Rss|Sss}u)  (Utilities.py:299-313)
    user: f_obj(x,u,y,xsp,usp,ysp)      (Utilities.py:315-317)
    """
    if ssc.rss_y is not None:
        r_y = jnp.asarray(ssc.rss_y, dtype=float)
        r_u = jnp.asarray(ssc.rss_u if ssc.rss_u is not None else ssc.rss_Du, dtype=float)

        def f(x, u, y, xsp, usp, ysp):
            return jnp.sum(r_y @ y) + jnp.sum(r_u @ jnp.abs(u))

        return f
    if ssc.Qss is not None:
        Q = jnp.asarray(ssc.Qss, dtype=float)
        Ru = jnp.asarray(ssc.Rss if ssc.Rss is not None else ssc.Sss, dtype=float)

        def f(x, u, y, xsp, usp, ysp):
            return 0.5 * (y @ (Q @ y) + u @ (Ru @ u))

        return f
    if ssc.f_obj is not None:
        return ssc.f_obj
    raise ValueError("steady-state cost is empty")


def build_mhe_cost(mc: MHECost) -> Callable:
    """F_obj_mhe(w, v, t) — reference Utilities.defF_obj_mhe.

    LP: r_w·w + r_v·v (no abs — reference quirk, Utilities.py:692-696);
    QP: 0.5 (w'Qw + v'Rv); user f(w,v,t).
    """
    if mc.r_w is not None:
        r_w = jnp.asarray(mc.r_w, dtype=float)
        r_v = jnp.asarray(mc.r_v, dtype=float)

        def f(w, v, t):
            return jnp.sum(r_w @ w) + jnp.sum(r_v @ v)

        return f
    if mc.Q is not None:
        Q = jnp.asarray(mc.Q, dtype=float)
        R = jnp.asarray(mc.R, dtype=float)

        def f(w, v, t):
            return 0.5 * (w @ (Q @ w) + v @ (R @ v))

        return f
    if mc.f_obj is not None:
        return mc.f_obj
    raise ValueError("MHE cost is empty")


def build_terminal_cost(cfg: MPCConfig) -> Callable:
    """Vfin(dx, xs) — reference Utilities.defVfin (Utilities.py:383-420).

    The caller passes dx already shifted by xs when QForm is on
    (Control_Calc.py:194-196, 209), matching the reference's call convention.
    Riccati mode: P solves DARE(A, B, Q, R-or-S) (MPC_code.py:253-255 swaps
    S for R when only S is given).
    """
    tc = cfg.terminal
    if tc.vfin is not None:
        return tc.vfin
    if tc.riccati:
        m = cfg.model
        if not isinstance(m, LinearModel):
            raise ValueError("Riccati terminal cost requires a linear model")
        sc = cfg.stage_cost
        R = sc.R if sc.R is not None else sc.S
        P = solve_dare(jnp.asarray(m.A, dtype=float), jnp.asarray(m.B, dtype=float),
                       jnp.asarray(sc.Q, dtype=float), jnp.asarray(R, dtype=float))

        def vfin(dx, xs):
            return 0.5 * (dx @ (P @ dx))

        return vfin

    def vfin(dx, xs):
        return jnp.zeros((), dtype=jnp.result_type(dx))

    return vfin
