"""Per-step schedules for the closed loop: time-varying parameters,
setpoints, and white-noise draws.

The reference evaluates its schedule hooks at the top of every sampling
instant (MPC_code.py:489-515 parameters, 677-680 setpoints) and draws
white noise inline (MPC_code.py:537-541, 823-827).  The host simulator
calls :func:`eval_step_params` / :func:`eval_setpoints` per instant; the
traced TPU loop precomputes the whole simulation's schedule ONCE with
:func:`make_step_inputs` into a :class:`StepInput` pytree with a leading
``(Nsim,)`` axis and feeds it to ``lax.scan`` — same semantics, zero
host round-trips inside the loop.

Noise parity: :func:`make_step_inputs` replicates the simulator's draw
order exactly (per step: output noise then process noise, drawn only when
the corresponding covariance is configured) from the same
``np.random.default_rng(cfg.noise_seed)`` stream, so a traced run with the
default schedule reproduces a ``ClosedLoop.run()`` bit-for-bit on CPU/f64.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from mpc_code_tpu.config import MPCConfig


class StepInput(NamedTuple):
    """Per-instant exogenous data of one closed-loop step (all static
    shapes; stack over a leading ``(Nsim,)`` axis for ``lax.scan``)."""

    px_h: jnp.ndarray   # (N, npx)  model state params over the horizon
    py_h: jnp.ndarray   # (N, npy)  model output params over the horizon
    pxp: jnp.ndarray    # (npxp,)   plant state params (non-measurable)
    pyp: jnp.ndarray    # (npyp,)   plant output params (non-measurable)
    pxmp: jnp.ndarray   # (npxp,)   measurable plant state params
    pymp: jnp.ndarray   # (npyp,)   measurable plant output params
    ysp: jnp.ndarray    # (ny,)     output setpoint
    usp: jnp.ndarray    # (nu,)     input setpoint
    xsp: jnp.ndarray    # (nx,)     state setpoint
    v_wn: jnp.ndarray   # (ny,)     standard-normal output-noise draw
    w_wn: jnp.ndarray   # (nxp,)    standard-normal process-noise draw


def _call(fn, t, n):
    if fn is None:
        return np.zeros(n)
    return np.asarray(fn(t), dtype=float).reshape(n)


def eval_step_params(cfg: MPCConfig, t_k: float):
    """The reference's per-instant parameter block (MPC_code.py:489-515):
    horizon schedules sampled at ``t_k + i`` for i in range(N), measurable
    plant params defaulting to the model schedule when absent."""
    N = cfg.N
    npx, npy, npxp, npyp = cfg.npx, cfg.npy, cfg.npxp, cfg.npyp
    if cfg.def_px is not None:
        px_h = np.stack([_call(cfg.def_px, t_k + i, npx) for i in range(N)])
    else:
        px_h = np.zeros((N, npx))
    if cfg.def_py is not None:
        py_h = np.stack([_call(cfg.def_py, t_k + i, npy) for i in range(N)])
    else:
        py_h = np.zeros((N, npy))
    if cfg.def_px is not None and cfg.def_pxmp is not None:
        pxmp = _call(cfg.def_pxmp, t_k, npxp)
    elif cfg.def_px is not None:
        pxmp = px_h[0]
    else:
        pxmp = np.zeros(npxp)
    if cfg.def_py is not None and cfg.def_pymp is not None:
        pymp = _call(cfg.def_pymp, t_k, npyp)
    elif cfg.def_py is not None:
        pymp = py_h[0]
    else:
        pymp = np.zeros(npyp)
    pxp = _call(cfg.def_pxp, t_k, npxp)
    pyp = _call(cfg.def_pyp, t_k, npyp)
    return px_h, py_h, pxp, pyp, pxmp, pymp


def eval_setpoints(cfg: MPCConfig, t_k: float):
    """Setpoint schedule (MPC_code.py:677-680): ``defSP(t) -> (ysp, usp,
    xsp)``; zeros when absent."""
    if cfg.defSP is not None:
        ysp, usp, xsp = (np.asarray(v, float).reshape(-1) for v in cfg.defSP(t_k))
        return ysp, usp, xsp
    return np.zeros(cfg.ny), np.zeros(cfg.nu), np.zeros(cfg.nx)


def default_step_input(cfg: MPCConfig, ysp=None, usp=None, xsp=None) -> StepInput:
    """A single fixed StepInput (no schedules, no noise) — the traced
    step's default when called without explicit inputs."""
    return StepInput(
        px_h=jnp.zeros((cfg.N, cfg.npx)),
        py_h=jnp.zeros((cfg.N, cfg.npy)),
        pxp=jnp.zeros(cfg.npxp), pyp=jnp.zeros(cfg.npyp),
        pxmp=jnp.zeros(cfg.npxp), pymp=jnp.zeros(cfg.npyp),
        ysp=jnp.zeros(cfg.ny) if ysp is None else jnp.asarray(ysp, float).reshape(-1),
        usp=jnp.zeros(cfg.nu) if usp is None else jnp.asarray(usp, float).reshape(-1),
        xsp=jnp.zeros(cfg.nx) if xsp is None else jnp.asarray(xsp, float).reshape(-1),
        v_wn=jnp.zeros(cfg.ny), w_wn=jnp.zeros(cfg.nxp),
    )


def make_step_inputs(cfg: MPCConfig, Nsim: Optional[int] = None,
                     t0: float = 0.0, k0: int = 0,
                     rng: Optional[np.random.Generator] = None,
                     noise: bool = True, dtype=None) -> StepInput:
    """Precompute the full simulation's StepInput stack, leading ``(Nsim,)``.

    ``t0``/``k0``: start time / start index (for continuing a host-warmed
    run, pass ``k0 = warmup_steps`` so the noise stream stays aligned with
    a fresh ``ClosedLoop.run()`` of the full length).
    ``noise=False`` zeroes the noise fields without consuming the stream.
    """
    Nsim = cfg.Nsim if Nsim is None else Nsim
    if rng is None:
        rng = np.random.default_rng(cfg.noise_seed)
        # burn the pre-k0 draws so a continuation sees the same stream a
        # full-length run would at step k0
        for _ in range(k0):
            if cfg.R_wn is not None:
                rng.standard_normal(cfg.ny)
            if cfg.Q_wn is not None and cfg.G_wn is not None:
                rng.standard_normal(cfg.nxp)

    rows = []
    for k in range(Nsim):
        t_k = t0 + k * cfg.h
        px_h, py_h, pxp, pyp, pxmp, pymp = eval_step_params(cfg, t_k)
        ysp, usp, xsp = eval_setpoints(cfg, t_k)
        v = (rng.standard_normal(cfg.ny) if cfg.R_wn is not None
             else np.zeros(cfg.ny))
        w = (rng.standard_normal(cfg.nxp)
             if cfg.Q_wn is not None and cfg.G_wn is not None
             else np.zeros(cfg.nxp))
        if not noise:
            v = np.zeros(cfg.ny)
            w = np.zeros(cfg.nxp)
        rows.append(StepInput(px_h, py_h, pxp, pyp, pxmp, pymp,
                              ysp, usp, xsp, v, w))
    stacked = StepInput(*(np.stack([getattr(r, f) for r in rows])
                          for f in StepInput._fields))
    if dtype is not None:
        stacked = StepInput(*(jnp.asarray(a, dtype=dtype) for a in stacked))
    return stacked
