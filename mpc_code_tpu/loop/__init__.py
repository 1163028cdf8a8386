"""Closed-loop simulation runtime."""

from mpc_code_tpu.loop.simulator import ClosedLoop

__all__ = ["ClosedLoop"]
