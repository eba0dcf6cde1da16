"""Debug helpers (parity: ``spconv/debug_utils.py`` —
``spconv_save_debug_data`` pickles problem coords for bug reports when a
rulebook build fails, gated by an env-var path)."""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import numpy as np

from .constants import SPCONV_CHECK_OVERFLOW, SPCONV_DEBUG_SAVE_PATH

__all__ = ["spconv_save_debug_data", "maybe_assert_overflow"]


def maybe_assert_overflow(num_out_total, out_bound: int, context: str) -> None:
    """Under ``SPCONV_TPU_CHECK_OVERFLOW=1``, raise (via host callback —
    works inside jit) when a bounded output discovery dropped sites.
    Reference analog: the bounded stage-2 is opt-in there
    (``csrc/sparse/indices.py:460-499``); here bounded buffers are the only
    mode so truncation must be loud when the user asks for checking."""
    if not SPCONV_CHECK_OVERFLOW:
        return
    import jax

    bound = int(out_bound)

    def _cb(total):
        t = int(total)
        if t > bound:
            raise ValueError(
                f"[SPCONV_TPU_CHECK_OVERFLOW] {context}: {t} active output "
                f"sites exceed the static out_bound {bound}; raise "
                f"out_bound / out_bound_ratio on this layer."
            )

    jax.debug.callback(_cb, num_out_total)


def spconv_save_debug_data(indices) -> str:
    if not SPCONV_DEBUG_SAVE_PATH:
        return ""
    path = Path(SPCONV_DEBUG_SAVE_PATH)
    path.mkdir(parents=True, exist_ok=True)
    fname = path / f"spconv_tpu_debug_{int(time.time() * 1000)}.pkl"
    with fname.open("wb") as f:
        pickle.dump(np.asarray(indices), f)
    return str(fname)
