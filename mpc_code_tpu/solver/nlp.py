"""Parametric NLP problem specification and result types.

The problem form intentionally matches CasADi's ``nlpsol`` interface, which
the reference uses at its 7 solver-construction sites (Control_Calc.py:258,
565; Target_Calc.py:159; Utilities.py:581,670,988; SS_JAC_ID.py:199):

    min_w  f(w, p)
    s.t.   lbg <= g(w, p) <= ubg       (equality rows where lbg == ubg)
           lbw <=     w   <= ubw

``p`` is an arbitrary pytree of per-instance data (the reference packs it
into a flat DM vector; we keep it structured).  Bounds are *data*, so the
closed loop can pin the initial state by setting lbw=ubw=xhat exactly as the
reference does (MPC_code.py:734), and everything vmaps over instances.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple


@dataclass(frozen=True)
class NLP:
    """Static problem definition: callables + sizes."""

    f: Callable  # f(w, p) -> scalar
    g: Callable  # g(w, p) -> (ng,) array (ng may be 0)
    nw: int
    ng: int


class NLPBounds(NamedTuple):
    lbw: Any
    ubw: Any
    lbg: Any
    ubg: Any


# Solver return statuses (reference analog: IPOPT return_status strings the
# driver checks at MPC_code.py:714, 786).
STATUS_SOLVED = 0          # KKT error <= tol
STATUS_ACCEPTABLE = 1      # iteration limit but feasible
STATUS_INFEASIBLE = 2      # terminated with constraint violation


class IPMResult(NamedTuple):
    w: Any          # primal solution (nw,)
    f: Any          # objective value
    lam_g: Any      # constraint multipliers (ng,)
    status: Any     # int32 status code (see above)
    iters: Any      # iterations used
    kkt_err: Any    # final unscaled KKT error (mu = 0)
    feas_err: Any   # final constraint violation (inf-norm)
