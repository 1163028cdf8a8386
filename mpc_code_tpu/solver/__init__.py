"""Batched NLP solver (primal-dual interior point) in pure JAX."""

from mpc_code_tpu.solver.nlp import NLP, NLPBounds, IPMResult
from mpc_code_tpu.solver.ipm import make_solver, kkt_error

__all__ = ["NLP", "NLPBounds", "IPMResult", "make_solver", "kkt_error"]
