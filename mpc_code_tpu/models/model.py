"""Controller-model and plant constructors.

TPU-native replacement for the reference's CasADi `Function` factories
`defF_model` (Utilities.py:102-245), `defF_p` (Utilities.py:21-100) and
`defFx_mhe` (Utilities.py:713-823).  Instead of building symbolic
expression graphs, these return plain Python callables over JAX arrays with
the same positional signatures, which trace once into XLA wherever they are
used (rollouts, Jacobians via `jax.jacfwd`, NLP residuals).

Signatures (matching the reference's `Function` signatures exactly):

- ``Fx_model(x, u, k, d, t, px) -> x_next``   (k = integration interval h)
- ``Fy_model(x, u, d, t, py) -> y``
- ``Fx_p(x, u, pxp, t, k, pxmp) -> x_next``
- ``Fy_p(x, u, pyp, t, pymp) -> y``
- ``Fx_mhe(csi, u, k, t, w, px) -> csi_next`` over augmented csi=[x; d]
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from mpc_code_tpu.config import (
    ContinuousModel,
    ContinuousPlant,
    DiscreteModel,
    DiscretePlant,
    LinearModel,
    LinearPlant,
    MPCConfig,
)
from mpc_code_tpu.ops.integrators import rk4


class ModelFns(NamedTuple):
    fx: Callable  # Fx_model(x, u, k, d, t, px)
    fy: Callable  # Fy_model(x, u, d, t, py)


class PlantFns(NamedTuple):
    fx: Callable  # Fx_p(x, u, pxp, t, k, pxmp)  [nominal: model signature]
    fy: Callable  # Fy_p(x, u, pyp, t, pymp)     [nominal: model signature]
    nominal: bool


def _asarr(M):
    return None if M is None else jnp.asarray(M, dtype=float)


def build_model(cfg: MPCConfig) -> ModelFns:
    """Build (Fx_model, Fy_model) from the config.

    Covers every reference form: linear (optionally affine around
    xlin/ulin/ylin), NL-continuous (+RK4 with Mx sub-steps), NL-discrete,
    StateFeedback output, offree in {no, lin, nl}, LinPar additive params.
    Reference: Utilities.defF_model (Utilities.py:102-245) and the dispatch
    ladder MPC_code.py:94-167.
    """
    m = cfg.model
    dist = cfg.dist
    Bd = _asarr(dist.Bd)
    Cd = _asarr(dist.Cd)
    offree = dist.offree
    lin_par = cfg.LinPar

    # ----- state map -----
    if isinstance(m, LinearModel):
        A, B = _asarr(m.A), _asarr(m.B)
        xlin, ulin = _asarr(m.xlin), _asarr(m.ulin)

        def fx(x, u, k, d, t, px):
            if xlin is not None:
                out = A @ (x - xlin) + B @ (u - ulin) + xlin  # Utilities.py:142
            else:
                out = A @ x + B @ u                            # Utilities.py:147
            if offree == "lin":
                out = out + Bd @ d                             # Utilities.py:150
            return out + px                                    # Utilities.py:153 (always)

    elif isinstance(m, ContinuousModel):
        if m.clip_lo is not None or m.clip_hi is not None:
            lo = jnp.asarray(m.clip_lo, dtype=float) if m.clip_lo is not None else -jnp.inf
            hi = jnp.asarray(m.clip_hi, dtype=float) if m.clip_hi is not None else jnp.inf
            user_fx = m.fx

            def _fx_sat(xx, uu, dd, tt, pp):
                # ODE-input saturation (the reference's own stability guard
                # pattern, Ex_NMPC_dis.py:75-77)
                return user_fx(jnp.clip(xx, lo, hi), uu, dd, tt, pp)

            fx_eval = _fx_sat
        else:
            fx_eval = m.fx
        integ = rk4(lambda xx, tt, uu, dd, pp: fx_eval(xx, uu, dd, tt, pp), m.Mx)

        def fx(x, u, k, d, t, px):
            out = integ(x, t, k, u, d, px)                     # Utilities.py:157-172
            if offree == "lin":
                out = out + Bd @ d                             # Utilities.py:174-177
            if lin_par:
                out = out + px                                 # Utilities.py:180-183
            return out

    elif isinstance(m, DiscreteModel):

        def fx(x, u, k, d, t, px):
            out = m.Fx(x, u, d, t, px)                         # Utilities.py:186-190
            if offree == "lin":
                out = out + Bd @ d
            if lin_par:
                out = out + px
            return out

    else:
        raise TypeError(f"unsupported model spec {type(m)}")

    # ----- output map -----
    if cfg.StateFeedback:

        def fy_base(x, u, d, t, py):
            out = x                                            # Utilities.py:201-205
            if offree == "lin":
                out = out + Cd @ d
            return out

    elif isinstance(m, LinearModel) and m.C is not None and getattr(m, "_use_fy", None) is None:
        C = _asarr(m.C)
        xlin, ylin = _asarr(m.xlin), _asarr(m.ylin)

        def fy_base(x, u, d, t, py):
            if ylin is not None and xlin is not None:
                out = C @ (x - xlin) + ylin                    # Utilities.py:216
            elif ylin is not None:
                out = C @ x + ylin                             # Utilities.py:222
            else:
                out = C @ x                                    # Utilities.py:227
            if offree == "lin":
                out = out + Cd @ d
            return out

    elif isinstance(m, (ContinuousModel, DiscreteModel)) and m.fy is None and m.C is not None:
        C = _asarr(m.C)

        def fy_base(x, u, d, t, py):
            out = C @ x
            if offree == "lin":
                out = out + Cd @ d
            return out

    else:
        user_fy = m.fy if isinstance(m, (ContinuousModel, DiscreteModel)) else None
        if user_fy is None:
            raise ValueError("model output map missing: provide C, fy, or StateFeedback")

        def fy_base(x, u, d, t, py):
            out = user_fy(x, u, d, t, py)                      # Utilities.py:232-238
            if offree == "lin":
                out = out + Cd @ d
            return out

    if lin_par:

        def fy(x, u, d, t, py):
            return fy_base(x, u, d, t, py) + py                # Utilities.py:240-243

    else:
        fy = fy_base

    return ModelFns(fx=fx, fy=fy)


def build_plant(cfg: MPCConfig, model: ModelFns) -> PlantFns:
    """Build (Fx_p, Fy_p) from the config.

    Reference: Utilities.defF_p (Utilities.py:21-100) and dispatch
    MPC_code.py:171-198.  With Fp_nominal the plant aliases the model and is
    called with the *model* signature in the loop (MPC_code.py:532, 814).
    """
    if cfg.Fp_nominal or cfg.plant is None:
        return PlantFns(fx=model.fx, fy=model.fy, nominal=True)

    p = cfg.plant
    lin_par = cfg.LinPar

    if isinstance(p, LinearPlant):
        Ap, Bp = _asarr(p.Ap), _asarr(p.Bp)

        def fxp(x, u, pxp, t, k, pxmp):
            return Ap @ x + Bp @ u + pxp + pxmp                # Utilities.py:48

    elif isinstance(p, ContinuousPlant):
        if p.clip_lo is not None or p.clip_hi is not None:
            plo = (jnp.asarray(p.clip_lo, dtype=float)
                   if p.clip_lo is not None else -jnp.inf)
            phi = (jnp.asarray(p.clip_hi, dtype=float)
                   if p.clip_hi is not None else jnp.inf)
            user_fxp = p.fx

            def _fxp_sat(xx, tt, uu, pp, pm):
                # ODE-input saturation (same guard as ContinuousModel;
                # reference pattern Ex_NMPC_dis.py:75-77)
                return user_fxp(jnp.clip(xx, plo, phi), tt, uu, pp, pm)

            fxp_eval = _fxp_sat
        else:
            fxp_eval = p.fx
        integ = rk4(lambda xx, tt, uu, pp, pm: fxp_eval(xx, tt, uu, pp, pm),
                    p.Mx)

        def fxp(x, u, pxp, t, k, pxmp):
            out = integ(x, t, k, u, pxp, pxmp)                 # Utilities.py:58-75
            if lin_par:
                out = out + pxp + pxmp                         # Utilities.py:78-82
            return out

    elif isinstance(p, DiscretePlant):

        def fxp(x, u, pxp, t, k, pxmp):
            out = p.Fx(x, t, u, pxp, pxmp)                     # Utilities.py:51-56
            if lin_par:
                out = out + pxp + pxmp
            return out

    else:
        raise TypeError(f"unsupported plant spec {type(p)}")

    if cfg.StateFeedback:

        def fyp(x, u, pyp, t, pymp):
            return x                                           # Utilities.py:84-86

    elif isinstance(p, LinearPlant) or getattr(p, "fy", None) is None:
        Cp = _asarr(p.Cp)
        if Cp is None:
            raise ValueError("plant output map missing: provide Cp, fy, or StateFeedback")

        def fyp(x, u, pyp, t, pymp):
            return Cp @ x + pyp + pymp                         # Utilities.py:88-91

    else:
        user_fyp = p.fy

        def fyp(x, u, pyp, t, pymp):
            out = user_fyp(x, u, t, pyp, pymp)                 # Utilities.py:93-98
            if lin_par:
                out = out + pyp + pymp
            return out

    return PlantFns(fx=fxp, fy=fyp, nominal=False)


def build_mhe_model(cfg: MPCConfig, model: ModelFns) -> Callable:
    """Augmented-state MHE dynamics ``Fx_mhe(csi, u, k, t, w, px) -> csi_next``
    over csi = [x; d] with process noise w injected through G.

    Reference: Utilities.defFx_mhe (Utilities.py:713-823).  When the user
    supplies a dedicated MHE state map (fx_mhe_cont/fx_mhe_dis) it is used;
    otherwise the controller model is augmented the same way the driver does
    for non-MHE estimators (MPC_code.py:546-558).
    """
    nx, nd = cfg.nx, cfg.nd
    est = cfg.estimator
    offree = cfg.dist.offree
    lin_par = cfg.LinPar
    naug = nx + nd
    G = est.G_mhe
    G = jnp.eye(naug) if G is None else jnp.asarray(G, dtype=float)
    Bd = _asarr(cfg.dist.Bd)

    if est.fx_mhe_cont is not None:
        integ = rk4(
            lambda xx, tt, uu, dd, pp, ww: est.fx_mhe_cont(xx, uu, dd, tt, pp, ww),
            est.Mx_mhe,
        )

        def core(x, u, k, d, t, px, w):
            return integ(x, t, k, u, d, px, w)                 # Utilities.py:746-762

    elif est.fx_mhe_dis is not None:

        def core(x, u, k, d, t, px, w):
            return est.fx_mhe_dis(x, u, d, t, px, w)           # Utilities.py:776-780

    if est.fx_mhe_cont is not None or est.fx_mhe_dis is not None:

        def fx_mhe(csi, u, k, t, w, px):
            x1, d1 = csi[:nx], csi[nx : nx + nd]
            xn = core(x1, u, k, d1, t, px, w)
            if offree == "lin":
                xn = xn + Bd @ d1                              # Utilities.py:804-808
            out = jnp.concatenate([xn, d1])                    # d carried constant
            out = out + G @ w                                  # Utilities.py:813-821
            if lin_par:
                out = out + jnp.concatenate([px, jnp.zeros(nd, dtype=out.dtype)])
            return out

    else:
        # Driver-style augmentation of the controller model with additive
        # noise through G (covers MHE configs without a dedicated noise map).
        def fx_mhe(csi, u, k, t, w, px):
            if nd > 0:
                x1, d1 = csi[:nx], csi[nx : nx + nd]
                xn = model.fx(x1, u, k, d1, t, px)
                out = jnp.concatenate([xn, d1])
            else:
                out = model.fx(csi, u, k, jnp.zeros(0, dtype=csi.dtype), t, px)
            return out + G @ w

    return fx_mhe
