"""Steady-state NLP builders: target optimizer, plant steady state, plant
optimum, and steady-state identification.

TPU-native replacements for the reference factories:
- `opt_ss`     (Target_Calc.py:20-160)  — steady-state target problem
- `opt_ssp`    (Utilities.py:543-583)   — plant steady state for fixed u
                                          (modifier adaptation)
- `opt_ssp2`   (Utilities.py:585-672)   — true plant economic optimum
- `opt_ss_id`  (SS_JAC_ID.py:124-201)   — steady-state hunt for
                                          auto-linearization
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import MPCConfig
from mpc_code_tpu.models.model import ModelFns, PlantFns
from mpc_code_tpu.solver.nlp import NLP
from mpc_code_tpu.ops.smalllin import solve_lu as _ssolve


@dataclass(frozen=True)
class TargetSpec:
    nlp: NLP
    lbw: np.ndarray
    ubw: np.ndarray
    lbg: np.ndarray
    ubg: np.ndarray


def _dim_of(fn, cfg: MPCConfig) -> int:
    if fn is None:
        return 0
    out = jax.eval_shape(
        fn,
        jnp.zeros(cfg.nx), jnp.zeros(cfg.nu), jnp.zeros(cfg.ny), jnp.zeros(cfg.nd),
        jnp.zeros(()), jnp.zeros(cfg.npx), jnp.zeros(cfg.npy),
    )
    return int(np.prod(out.shape))


def build_target(cfg: MPCConfig, model: ModelFns, fss_obj: Callable) -> TargetSpec:
    """Target problem over wss = [xs, us, ys].

    g = [Fx(xs,us)-xs ; Fy(xs,us)+lam(us-us_prev)-ys ; G_ss<=0 ; H_ss==0]
    (Target_Calc.py:71-109); cost with QForm_ss / DUssForm shifts
    (Target_Calc.py:111-124).  Parameters:
    {usp, ysp, xsp, d, us_prev, lam, t, px, py}.
    """
    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
    nxu, nxuy = nx + nu, nx + nu + ny
    ngss = _dim_of(cfg.G_ineq_SS, cfg)
    nhss = _dim_of(cfg.H_eq_SS, cfg)

    def split(w):
        return w[:nx], w[nx:nxu], w[nxu:nxuy]

    def g_fn(w, p):
        xs, us, ys = split(w)
        x_next = model.fx(xs, us, cfg.h, p["d"], p["t"], p["px"])
        y_next = model.fy(xs, us, p["d"], p["t"], p["py"]) + p["lam"] @ (us - p["us_prev"])
        rows = [x_next - xs, y_next - ys]
        if cfg.G_ineq_SS is not None:
            rows.append(cfg.G_ineq_SS(xs, us, ys, p["d"], p["t"], p["px"], p["py"]).reshape(-1))
        if cfg.H_eq_SS is not None:
            rows.append(cfg.H_eq_SS(xs, us, ys, p["d"], p["t"], p["px"], p["py"]).reshape(-1))
        return jnp.concatenate(rows)

    def f_fn(w, p):
        xs, us, ys = split(w)
        dx, du, dy = xs, us, ys
        if cfg.QForm_ss:                       # Target_Calc.py:116-119
            dx = dx - p["xsp"]
            dy = dy - p["ysp"]
            du = du - p["usp"]
        if cfg.DUssForm:                       # Target_Calc.py:121-122
            du = us - p["us_prev"]
        return fss_obj(dx, du, dy, p["xsp"], p["usp"], p["ysp"])

    b = cfg.bounds
    lbw = np.full(nxuy, -np.inf)
    ubw = np.full(nxuy, np.inf)
    for name, sl in (("xmin", slice(0, nx)), ("umin", slice(nx, nxu)), ("ymin", slice(nxu, nxuy))):
        v = b.resolved("ss", name)
        if v is not None:
            lbw[sl] = v
    for name, sl in (("xmax", slice(0, nx)), ("umax", slice(nx, nxu)), ("ymax", slice(nxu, nxuy))):
        v = b.resolved("ss", name)
        if v is not None:
            ubw[sl] = v

    ng = nx + ny + ngss + nhss
    lbg = np.zeros(ng)
    ubg = np.zeros(ng)
    if ngss:
        lbg[nx + ny : nx + ny + ngss] = -np.inf  # Target_Calc.py:152-153

    return TargetSpec(nlp=NLP(f=f_fn, g=g_fn, nw=nxuy, ng=ng),
                      lbw=lbw, ubw=ubw, lbg=lbg, ubg=ubg)


def build_ssp(cfg: MPCConfig, plant: PlantFns) -> TargetSpec:
    """Plant steady state for fixed input (modifier adaptation step (a)).

    w = xs_plant; g = Fx_p(xs,u)-xs == 0; f = ||Fx_p(xs,u)-xs||^2
    (Utilities.py:543-583).  Parameters: {t, us, pxp, pxmp}.
    """
    nxp = cfg.nxp

    def resid(w, p):
        if plant.nominal:
            x_next = plant.fx(w, p["us"], cfg.h, p["d"], p["t"], p["pxmp"])
        else:
            x_next = plant.fx(w, p["us"], p["pxp"], p["t"], cfg.h, p["pxmp"])
        return x_next - w

    def g_fn(w, p):
        return resid(w, p)

    def f_fn(w, p):
        r = resid(w, p)
        return r @ r

    b = cfg.bounds
    xpmin = b.xpmin if b.xpmin is not None else b.xmin   # MPC_code.py:268-269
    xpmax = b.xpmax if b.xpmax is not None else b.xmax
    lbw = np.full(nxp, -np.inf) if xpmin is None else np.asarray(xpmin, float).reshape(-1)
    ubw = np.full(nxp, np.inf) if xpmax is None else np.asarray(xpmax, float).reshape(-1)
    return TargetSpec(nlp=NLP(f=f_fn, g=g_fn, nw=nxp, ng=nxp),
                      lbw=lbw, ubw=ubw, lbg=np.zeros(nxp), ubg=np.zeros(nxp))


def build_ssp2(cfg: MPCConfig, plant: PlantFns, fss_obj2: Callable) -> TargetSpec:
    """True plant economic optimum over wss = [xs_p, us, ys]
    (Utilities.py:585-672).  Parameters: {usp, ysp, xsp, pyp, t, pxp, pxmp, pymp}.

    Mirrors the reference's QForm_ss quirk where dx = Xs - Xs = 0
    (Utilities.py:647-650).
    """
    nxp, nu, ny = cfg.nxp, cfg.nu, cfg.ny
    nxu, nxuy = nxp + nu, nxp + nu + ny

    def split(w):
        return w[:nxp], w[nxu - nu : nxu], w[nxu:nxuy]

    def g_fn(w, p):
        xs, us, ys = split(w)
        x_next = plant.fx(xs, us, p["pxp"], p["t"], cfg.h, p["pxmp"])
        y_next = plant.fy(xs, us, p["pyp"], p["t"], p["pymp"])
        return jnp.concatenate([x_next - xs, y_next - ys])

    def f_fn(w, p):
        xs, us, ys = split(w)
        dx, du, dy = xs, us, ys
        if cfg.QForm_ss:
            dx = dx - xs          # reference quirk: identically zero
            dy = dy - p["ysp"]
            du = du - p["usp"]
        return fss_obj2(dx, du, dy, p["xsp"], p["usp"], p["ysp"])

    b = cfg.bounds
    xpmin = b.xpmin if b.xpmin is not None else b.xmin
    xpmax = b.xpmax if b.xpmax is not None else b.xmax
    lbw = np.full(nxuy, -np.inf)
    ubw = np.full(nxuy, np.inf)
    if xpmin is not None:
        lbw[:nxp] = np.asarray(xpmin, float).reshape(-1)
    if xpmax is not None:
        ubw[:nxp] = np.asarray(xpmax, float).reshape(-1)
    if b.umin is not None:
        lbw[nxp:nxu] = np.asarray(b.umin, float).reshape(-1)
    if b.umax is not None:
        ubw[nxp:nxu] = np.asarray(b.umax, float).reshape(-1)
    if b.ymin is not None:
        lbw[nxu:] = np.asarray(b.ymin, float).reshape(-1)
    if b.ymax is not None:
        ubw[nxu:] = np.asarray(b.ymax, float).reshape(-1)
    ng = nxp + ny
    return TargetSpec(nlp=NLP(f=f_fn, g=g_fn, nw=nxuy, ng=ng),
                      lbw=lbw, ubw=ubw, lbg=np.zeros(ng), ubg=np.zeros(ng))


def make_lambda_update(cfg: MPCConfig, model: ModelFns, plant: PlantFns) -> Callable:
    """Modifier-adaptation lambda update (reference: defLambdaT,
    Utilities.py:498-541): steady-state output sensitivities of model and
    plant via the implicit-function theorem
    ``dy/du = dFy/dx (I - dFx/dx)^{-1} dFx/du``, filtered with alpha_mod
    (Utilities.py:535-537).  Pure JAX — used by both the host simulator and
    the traced batched step.
    """

    def grad_model(xs, us, d, t, px, py):
        Ax = jax.jacfwd(lambda x: model.fx(x, us, cfg.h, d, t, px))(xs)
        Bu = jax.jacfwd(lambda u: model.fx(xs, u, cfg.h, d, t, px))(us)
        Cx = jax.jacfwd(lambda x: model.fy(x, us, d, t, py))(xs)
        n = Ax.shape[0]
        return Cx @ _ssolve(jnp.eye(n, dtype=Ax.dtype) - Ax, Bu)

    def grad_plant(xps, us, pxp, t, pxmp, pyp, pymp):
        if plant.nominal:
            fx = lambda x, u: plant.fx(x, u, cfg.h, jnp.zeros(cfg.nd), t, pxmp)
            fy = lambda x: plant.fy(x, us, jnp.zeros(cfg.nd), t, pyp)
        else:
            fx = lambda x, u: plant.fx(x, u, pxp, t, cfg.h, pxmp)
            fy = lambda x: plant.fy(x, us, pyp, t, pymp)
        Ax = jax.jacfwd(lambda x: fx(x, us))(xps)
        Bu = jax.jacfwd(lambda u: fx(xps, u))(us)
        Cx = jax.jacfwd(fy)(xps)
        n = Ax.shape[0]
        return Cx @ _ssolve(jnp.eye(n, dtype=Ax.dtype) - Ax, Bu)

    alpha = cfg.alpha_mod

    def lambda_update(lam_prev, xps, xs, us, d, t, pxp, pyp, px, py, pxmp, pymp):
        gp = grad_plant(xps, us, pxp, t, pxmp, pyp, pymp)
        gm = grad_model(xs, us, d, t, px, py)
        return (1 - alpha) * lam_prev + alpha * (gp - gm)   # Utilities.py:535-537

    return lambda_update


def build_ss_id(cfg: MPCConfig, model: ModelFns) -> TargetSpec:
    """Steady-state hunt for auto-linearization (SS_JAC_ID.opt_ss_id,
    SS_JAC_ID.py:124-201): minimize ||Fx-xs||^2 + ||Fy-ys||^2 subject to the
    same maps as equality constraints and the base box bounds.
    Parameters: {d, t, px, py}.
    """
    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
    nxu, nxuy = nx + nu, nx + nu + ny

    def split(w):
        return w[:nx], w[nx:nxu], w[nxu:nxuy]

    def resids(w, p):
        xs, us, ys = split(w)
        rx = model.fx(xs, us, cfg.h, p["d"], p["t"], p["px"]) - xs
        ry = model.fy(xs, us, p["d"], p["t"], p["py"]) - ys
        return rx, ry

    def g_fn(w, p):
        rx, ry = resids(w, p)
        return jnp.concatenate([rx, ry])

    def f_fn(w, p):
        rx, ry = resids(w, p)
        return rx @ rx + ry @ ry

    b = cfg.bounds
    lbw = np.full(nxuy, -np.inf)
    ubw = np.full(nxuy, np.inf)
    for name, sl, lo in (("xmin", slice(0, nx), True), ("umin", slice(nx, nxu), True),
                         ("ymin", slice(nxu, nxuy), True)):
        v = getattr(b, name)
        if v is not None:
            lbw[sl] = np.asarray(v, float).reshape(-1)
    for name, sl in (("xmax", slice(0, nx)), ("umax", slice(nx, nxu)), ("ymax", slice(nxu, nxuy))):
        v = getattr(b, name)
        if v is not None:
            ubw[sl] = np.asarray(v, float).reshape(-1)
    ng = nx + ny
    return TargetSpec(nlp=NLP(f=f_fn, g=g_fn, nw=nxuy, ng=ng),
                      lbw=lbw, ubw=ubw, lbg=np.zeros(ng), ubg=np.zeros(ng))
