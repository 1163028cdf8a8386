"""NLP problem builders: dynamic OCP, steady-state target, MHE, adaptation."""

from mpc_code_tpu.ocp.shooting import build_ocp, OCPSpec
from mpc_code_tpu.ocp.target import (
    build_target,
    build_ssp,
    build_ssp2,
    build_ss_id,
    TargetSpec,
)

__all__ = ["build_ocp", "OCPSpec", "build_target", "build_ssp", "build_ssp2",
           "build_ss_id", "TargetSpec"]
