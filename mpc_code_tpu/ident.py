"""Steady-state identification / auto-linearization.

TPU-native replacement for the reference's `SS_JAC_ID.ss_p_jac_id`
(SS_JAC_ID.py:14-121): find a model steady state by minimizing
||Fx(x,u)-x||^2 + ||Fy(x,u)-y||^2 subject to the same maps as equalities
and the base box bounds, then linearize the model there via `jax.jacfwd`
(the reference uses CasADi symbolic jacobians, SS_JAC_ID.py:99-119).

The driver hook (MPC_code.py:84-91) then rebuilds the controller model as
the affine linearization — `apply_ss_jac_id` returns the updated config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import LinearModel, MPCConfig
from mpc_code_tpu.models.model import build_model
from mpc_code_tpu.ocp.target import build_ss_id
from mpc_code_tpu.solver.ipm import make_solver


def ss_p_jac_id(cfg: MPCConfig):
    """Returns (A, B, C, D, xlin, ulin, ylin) at the identified steady state."""
    # linear-disturbance injection is temporarily dropped while identifying
    # (SS_JAC_ID.py:19-23)
    offree = cfg.dist.offree
    cfg_id = cfg.replace(dist=dataclasses.replace(
        cfg.dist, offree="no" if offree == "lin" else offree))
    model = build_model(cfg_id)

    spec = build_ss_id(cfg_id, model)
    solve = jax.jit(make_solver(spec.nlp))

    nx, nu, ny = cfg.nx, cfg.nu, cfg.ny
    d0 = jnp.zeros(cfg.nd)
    px0 = jnp.zeros(cfg.npx)
    py0 = jnp.zeros(cfg.npy)
    x0m = jnp.asarray(np.asarray(cfg.x0_m, float).reshape(-1))
    u0 = jnp.asarray(np.asarray(cfg.u0, float).reshape(-1))
    y0 = model.fy(x0m, u0, d0, 0.0, py0)
    w0 = jnp.concatenate([x0m, u0, y0])               # SS_JAC_ID.py:78-82
    par = dict(d=d0, t=jnp.asarray(0.0), px=px0, py=py0)
    res = solve(w0, par, spec.lbw, spec.ubw, spec.lbg, spec.ubg)
    w = np.asarray(res.w)
    xlin, ulin, ylin = w[:nx], w[nx : nx + nu], w[nx + nu :]

    xl, ul = jnp.asarray(xlin), jnp.asarray(ulin)
    A = np.asarray(jax.jacfwd(lambda x: model.fx(x, ul, cfg.h, d0, 0.0, px0))(xl))
    B = np.asarray(jax.jacfwd(lambda u: model.fx(xl, u, cfg.h, d0, 0.0, px0))(ul))
    C = np.asarray(jax.jacfwd(lambda x: model.fy(x, ul, d0, 0.0, py0))(xl))
    D = np.asarray(jax.jacfwd(lambda u: model.fy(xl, u, d0, 0.0, py0))(ul))
    return A, B, C, D, xlin, ulin, ylin


def apply_ss_jac_id(cfg: MPCConfig) -> MPCConfig:
    """Rebuild the config with the identified affine linear model
    (MPC_code.py:86-91)."""
    A, B, C, D, xlin, ulin, ylin = ss_p_jac_id(cfg)
    return cfg.replace(model=LinearModel(A=A, B=B, C=C, xlin=xlin, ulin=ulin,
                                         ylin=ylin))
