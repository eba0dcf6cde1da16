"""spconv_tpu — TPU-native spatially sparse convolution framework.

From-scratch JAX/XLA/Pallas re-creation of the capabilities of
traveller59/spconv (see SURVEY.md): sparse conv tensors, submanifold /
regular / inverse / transposed sparse convolutions, sparse pooling,
voxelization, int8 inference paths — designed for XLA's static-shape
compilation model and the TPU MXU rather than translated from CUDA.
"""

__version__ = "0.1.0"

from .core import SparseConvTensor, expand_nd, scatter_nd
from .module import Module, partition, combine, filter_grad, filter_value_and_grad
from . import ops
from . import functional
from .functional import sparse_add
from .modules import *  # noqa: F401,F403 — public layer API (mirrors spconv.pytorch)
from . import checkpoint
from . import tools
from .calibrate import calibrate_out_bounds, record_voxel_counts
from .hash import HashTable
from .tuner import CONV_TUNER, ConvTuner

__all__ = [
    "SparseConvTensor",
    "expand_nd",
    "scatter_nd",
    "Module",
    "partition",
    "combine",
    "filter_grad",
    "filter_value_and_grad",
    "ops",
    "functional",
    "sparse_add",
]

from .constants import ConvAlgo  # noqa: E402
