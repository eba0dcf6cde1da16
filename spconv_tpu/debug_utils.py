"""Debug helpers (parity: ``spconv/debug_utils.py`` —
``spconv_save_debug_data`` pickles problem coords for bug reports when a
rulebook build fails, gated by an env-var path)."""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import numpy as np

from .constants import SPCONV_DEBUG_SAVE_PATH

__all__ = ["spconv_save_debug_data"]


def spconv_save_debug_data(indices) -> str:
    if not SPCONV_DEBUG_SAVE_PATH:
        return ""
    path = Path(SPCONV_DEBUG_SAVE_PATH)
    path.mkdir(parents=True, exist_ok=True)
    fname = path / f"spconv_tpu_debug_{int(time.time() * 1000)}.pkl"
    with fname.open("wb") as f:
        pickle.dump(np.asarray(indices), f)
    return str(fname)
