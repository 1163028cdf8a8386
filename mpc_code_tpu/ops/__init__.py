"""Numerical building blocks: fixed-step integrators, Riccati solvers, linalg."""

from mpc_code_tpu.ops.integrators import rk4, rk4_quad
from mpc_code_tpu.ops.dare import solve_dare, dare_gain
from mpc_code_tpu.ops.linalg import sqrtm_psd, solve_sym

__all__ = ["rk4", "rk4_quad", "solve_dare", "dare_gain", "sqrtm_psd", "solve_sym"]
