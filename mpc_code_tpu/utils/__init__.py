"""Reporting utilities: plots, history export."""

from mpc_code_tpu.utils.plotting import makeplot, plot_history
from mpc_code_tpu.utils.io import save_history, load_history

__all__ = ["makeplot", "plot_history", "save_history", "load_history"]
