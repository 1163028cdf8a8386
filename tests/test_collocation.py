"""Collocation transcription tests (reference: Control_Calc.opt_dyn_CM).

The reference never ships a runnable collocation example (the Ex_ENMPC
variant is commented out), so the oracle here is internal consistency: a
tracking problem transcribed with Gauss-Legendre collocation must produce
the same closed-loop behavior as the multiple-shooting transcription of the
same continuous dynamics.
"""

import numpy as np

from mpc_code_tpu.config import StageCost
from mpc_code_tpu.loop import ClosedLoop
from mpc_code_tpu.models.costs import xQx


def _reactor_cfg(collocation: bool):
    from mpc_code_tpu.examples import enmpc as ex

    Q = np.eye(2)
    R = np.eye(1)

    if collocation:
        def cost(x, u, y, xs, us, ys, s_coll):
            return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

        sc = StageCost(f_coll=cost)
    else:
        def cost(x, u, y, xs, us, ys):
            return 0.5 * (xQx(x - xs, Q) + xQx(u - us, R))

        sc = StageCost(f_dis=cost)

    cfg = ex.make_config(Nsim=8).replace(N=8, stage_cost=sc, ContForm=False,
                                         Collocation=collocation)
    cfg.estimator.N_mhe = 4
    return cfg


def test_collocation_tracks_like_shooting():
    H_sh = ClosedLoop(_reactor_cfg(False)).run()
    H_cm = ClosedLoop(_reactor_cfg(True)).run()
    assert (np.asarray(H_cm["STATUS_DYN"]) != 2).all()
    # same continuous dynamics, same cost: inputs must agree closely
    # (GL2 vs RK4 discretization error only)
    assert np.abs(H_cm["U"] - H_sh["U"]).max() < 5e-2
    assert np.abs(H_cm["Yp"][-1] - H_sh["Yp"][-1]).max() < 1e-2


def test_contform_wins_over_collocation():
    """ContForm x Collocation == ContForm shooting (reference semantics).

    opt_dyn_CM's ContForm branch never emits the collocation equations —
    the dynamics come from the integrator and the S1/S2 stage variables
    dangle unconstrained (Control_Calc.py:428-436, skipped rg1/rg2 at
    473-481) — so enabling Collocation on a ContForm problem must change
    nothing (here: no dangling variables at all).
    """
    from mpc_code_tpu.examples import enmpc as ex
    from mpc_code_tpu.solver.riccati import structured_supported

    cfg_cm = ex.make_config(Nsim=6).replace(N=8, Collocation=True)
    cfg_sh = ex.make_config(Nsim=6).replace(N=8)
    cfg_cm.estimator.N_mhe = 3
    cfg_sh.estimator.N_mhe = 3
    assert cfg_cm.ContForm and cfg_cm.Collocation
    assert structured_supported(cfg_cm)
    H_cm = ClosedLoop(cfg_cm).run()
    H_sh = ClosedLoop(cfg_sh).run()
    assert np.abs(np.asarray(H_cm["U"]) - np.asarray(H_sh["U"])).max() == 0.0

    # structured path: builds and solves the combined config identically
    import jax
    import jax.numpy as jnp

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.models import (
        build_model, build_stage_cost, build_terminal_cost,
    )
    from mpc_code_tpu.solver.riccati import (
        build_structured_ocp, make_structured_solver,
    )

    outs = []
    for cfg in (cfg_cm, cfg_sh):
        model = build_model(cfg)
        socp = build_structured_ocp(cfg, model,
                                    build_stage_cost(cfg.stage_cost),
                                    build_terminal_cost(cfg))
        solve = make_structured_solver(socp, SolverOptions(max_iter=120))
        N = cfg.N
        x0 = jnp.asarray(np.asarray(cfg.x0_m, float))
        us0 = jnp.asarray(np.asarray(cfg.u0, float))
        par = dict(x0=x0, xs=x0, us=us0, d=jnp.zeros(cfg.nd), um1=us0,
                   t=jnp.asarray(0.0), lam=jnp.zeros((cfg.ny, cfg.nu)),
                   px=jnp.zeros((N, cfg.npx)), py=jnp.zeros((N, cfg.npy)))
        X0 = jnp.tile(x0[None], (N + 1, 1))
        U0 = jnp.tile(us0[None], (N, 1))
        outs.append(jax.jit(solve)(par, X0, U0))
    assert int(outs[0].status) == 0
    assert np.abs(np.asarray(outs[0].U) - np.asarray(outs[1].U)).max() == 0.0
