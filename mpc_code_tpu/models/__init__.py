"""Model, plant and cost constructors (pure JAX callables)."""

from mpc_code_tpu.models.model import ModelFns, PlantFns, build_model, build_plant, build_mhe_model
from mpc_code_tpu.models.costs import (
    build_stage_cost,
    build_ss_cost,
    build_mhe_cost,
    build_terminal_cost,
)

__all__ = [
    "ModelFns",
    "PlantFns",
    "build_model",
    "build_plant",
    "build_mhe_model",
    "build_stage_cost",
    "build_ss_cost",
    "build_mhe_cost",
    "build_terminal_cost",
]
