"""Fixed-step Runge-Kutta integrators as `lax.scan` rollouts.

TPU-native replacement for the CasADi `simpleRK` integrator factory the
reference uses to discretize continuous models (reference:
Utilities.py:70,168,757).  The reference integrates the time-augmented
system [x; t]' = [f(x,t,...); 1] with an RK4 scheme and `Mx` sub-steps over
one sampling interval; advancing `t` explicitly through the RK stages is
arithmetically identical, so that is what we do — no augmented state, no
expression-graph VM, just a traced scan that XLA unrolls/fuses.

`rk4_quad` additionally accumulates a quadrature of a running cost along
the trajectory, replacing the reference's adaptive SUNDIALS/IDAS quadrature
for continuous-time economic objectives (reference: Control_Calc.py:102-111)
with a fixed-step RK4 quadrature fused into the same rollout (documented
accuracy difference: fixed- vs adaptive-step).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

def _unroll() -> bool:
    """Unroll the Mx sub-step scan on TPU: the scan carry round-trips HBM
    every sub-step, and under jacfwd the carry is (1 + n_tangents) x the
    state — unrolling lets XLA fuse the whole interval into a few kernels.
    Off by default on CPU, where the suite's many f64 solver graphs would
    pay a large compile-time blowup for no win.  Override with
    MPC_TPU_RK4_UNROLL=0/1.  Evaluated at trace time, after the test
    conftest/bench have pinned the platform."""
    env = os.environ.get("MPC_TPU_RK4_UNROLL")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def rk4(f: Callable, Mx: int) -> Callable:
    """Build a one-interval integrator for ``x' = f(x, t, *args)``.

    Returns ``F(x, t0, h, *args) -> x(t0 + h)`` using ``Mx`` RK4 sub-steps.
    Matches CasADi ``simpleRK(f_aug, Mx)`` on the time-augmented system
    (reference: Utilities.py:157-183).
    """

    def step(x, t0, h, *args):
        dt = h / Mx

        def body(carry, _):
            xk, tk = carry
            k1 = f(xk, tk, *args)
            k2 = f(xk + dt / 2 * k1, tk + dt / 2, *args)
            k3 = f(xk + dt / 2 * k2, tk + dt / 2, *args)
            k4 = f(xk + dt * k3, tk + dt, *args)
            x_next = xk + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return (x_next, tk + dt), None

        (xf, _), _ = lax.scan(body, (x, jnp.asarray(t0, dtype=jnp.result_type(x))), None, length=Mx, unroll=_unroll())
        return xf

    return step


def rk4_quad(f: Callable, q: Callable, Mx: int) -> Callable:
    """Integrate ``x' = f(x, t, *args)`` and the quadrature ``L' = q(x, t, *args)``.

    Returns ``F(x, t0, h, *args) -> (x(t0+h), ∫ q dt)``.  Replaces the
    reference's ``integrator('F','idas', dae, {'quad': ...})`` used for
    ContForm economic objectives (reference: Control_Calc.py:109-111).
    """

    def step(x, t0, h, *args):
        dt = h / Mx
        dtype = jnp.result_type(x)

        def body(carry, _):
            xk, tk, acc = carry
            k1 = f(xk, tk, *args)
            q1 = q(xk, tk, *args)
            k2 = f(xk + dt / 2 * k1, tk + dt / 2, *args)
            q2 = q(xk + dt / 2 * k1, tk + dt / 2, *args)
            k3 = f(xk + dt / 2 * k2, tk + dt / 2, *args)
            q3 = q(xk + dt / 2 * k2, tk + dt / 2, *args)
            k4 = f(xk + dt * k3, tk + dt, *args)
            q4 = q(xk + dt * k3, tk + dt, *args)
            x_next = xk + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            acc_next = acc + dt / 6 * (q1 + 2 * q2 + 2 * q3 + q4)
            return (x_next, tk + dt, acc_next), None

        init = (x, jnp.asarray(t0, dtype=dtype), jnp.zeros((), dtype=dtype))
        (xf, _, qf), _ = lax.scan(body, init, None, length=Mx, unroll=_unroll())
        return xf, qf

    return step
