"""Config / flag system (parity: ``spconv/constants.py`` env-var flags,
SURVEY.md §5).  Flags that make sense under XLA are kept; CUDA-specific
ones (NVRTC modes, thrust switches) have no analog and are absent by
design."""

from __future__ import annotations

import os
from pathlib import Path

PACKAGE_ROOT = Path(__file__).parent

# dump conv params + indices on rulebook errors (parity: SPCONV_DEBUG_SAVE_PATH)
SPCONV_DEBUG_SAVE_PATH = os.getenv("SPCONV_TPU_DEBUG_SAVE_PATH", "")

# default dtype for fp32 matmul emulation: when True, fp32 matmuls on TPU
# use 3-pass bf16 (higher precision); analog of SPCONV_ALLOW_TF32 (which
# *lowers* precision on GPU — on TPU the default is already bf16-ish, so
# the switch points the other way)
SPCONV_FP32_HIGHEST = os.getenv("SPCONV_TPU_FP32_HIGHEST", "0") == "1"

# global default for conv out-buffer growth ratio (per-layer override via
# ctor args; analog of the reference's num_out_act_bound deployment knob)
SPCONV_OUT_BOUND_RATIO = float(os.getenv("SPCONV_TPU_OUT_BOUND_RATIO", "2.0"))

# layer default when algo is not given: "auto" resolves per call via
# the tuner; set SPCONV_TPU_ALGO=native/sk/dg to force one globally
SPCONV_DEFAULT_ALGO = os.getenv("SPCONV_TPU_ALGO", "auto")

# debug: every bounded output-discovery op host-asserts that its static
# out_bound did not truncate the active set (adds a host callback / sync
# per bounded op — debug only).  Eager equivalent without the flag:
# SparseConvTensor.check_overflow().
SPCONV_CHECK_OVERFLOW = os.getenv("SPCONV_TPU_CHECK_OVERFLOW", "0") == "1"

# directory for the tuner's on-disk cache (parity: spconv's tuner cache)
SPCONV_TUNE_CACHE = os.getenv(
    "SPCONV_TPU_TUNE_CACHE", str(Path.home() / ".cache" / "spconv_tpu")
)

import enum


class ConvAlgo(enum.Enum):
    """Drop-in shim for the reference enum (``spconv/core.py:25``:
    Native / MaskImplicitGemm / MaskSplitImplicitGemm).  Our algorithms
    are strings internally; modules accept either.  The two implicit-gemm
    variants both map to the fused sorted-key kernel — the TPU design
    that plays the masked-implicit-GEMM role."""

    Native = "native"
    MaskImplicitGemm = "sk"
    MaskSplitImplicitGemm = "sk"
