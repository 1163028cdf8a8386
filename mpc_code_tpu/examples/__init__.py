"""The seven reference example configurations as typed configs.

Each module exposes ``make_config() -> MPCConfig`` mirroring the matching
``Ex_*.py`` file of the reference (the acceptance workloads listed in
BASELINE.json `configs`).
"""

from mpc_code_tpu.examples import lmpc_wb

__all__ = ["lmpc_wb"]
