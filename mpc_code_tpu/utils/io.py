"""History checkpoint / resume.

The reference keeps all closed-loop history in Python lists and loses
everything on a crash (SURVEY.md §5 checkpoint/resume: none).  Here history
and loop state serialize to a single NPZ so long Nsim sweeps are resumable
and the files double as golden parity fixtures.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def save_history(path: str, H: Dict[str, np.ndarray], **meta):
    """Write history arrays (+ scalar metadata) to an .npz file."""
    payload = {f"H_{k}": np.asarray(v) for k, v in H.items()}
    for k, v in meta.items():
        payload[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_history(path: str):
    """Returns (history_dict, meta_dict)."""
    data = np.load(path, allow_pickle=False)
    H = {k[2:]: data[k] for k in data.files if k.startswith("H_")}
    meta = {k[5:]: data[k] for k in data.files if k.startswith("meta_")}
    return H, meta
