"""mpc_code_tpu — a TPU-native model-predictive-control framework.

A from-scratch JAX/XLA re-design of the capability surface of
CPCLAB-UNIPI/MPC-code (closed-loop MPC simulation toolkit): linear and
nonlinear MPC with multiple-shooting and Gauss-Legendre collocation
transcriptions, steady-state target optimization with offset-free
disturbance models, economic NMPC with modifier adaptation, and the full
estimator family (Luenberger, KF, steady-state KF, EKF, MHE with
filtering/smoothing arrival-cost updates).

Where the reference delegates to CasADi symbolics + IPOPT (C++), this
framework uses traced JAX functions (`jax.jacfwd`/`jax.hessian`) and a
batched primal-dual interior-point solver that jits once and `vmap`s over
thousands of problem instances per TPU chip, sharding the batch axis over
ICI meshes for multi-chip scaling.
"""

__version__ = "0.1.0"

from mpc_code_tpu import config
from mpc_code_tpu import ops
from mpc_code_tpu import models
from mpc_code_tpu import solver

__all__ = ["config", "ops", "models", "solver", "__version__"]
