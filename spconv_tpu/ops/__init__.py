"""Op-level API (parity with ``spconv/pytorch/ops.py``'s public surface,
re-architected for XLA static shapes)."""

from .coords import (
    get_conv_output_size,
    get_deconv_output_size,
    kernel_offsets,
    linearize,
    delinearize,
)
from .rulebook import build_subm_rulebook, build_conv_rulebook, get_indice_pairs
from .gather_gemm import indice_conv, gather_mm, dgrad_gather_mm, wgrad_gather_mm
from .pool import indice_maxpool, indice_avgpool, global_pool
from .point2voxel import point_to_voxel, gather_features_by_pc_voxel_id
from .epilogue import Activation, apply_act, bias_add_act

__all__ = [
    "get_conv_output_size",
    "get_deconv_output_size",
    "kernel_offsets",
    "linearize",
    "delinearize",
    "build_subm_rulebook",
    "build_conv_rulebook",
    "get_indice_pairs",
    "indice_conv",
    "gather_mm",
    "dgrad_gather_mm",
    "wgrad_gather_mm",
    "indice_maxpool",
    "indice_avgpool",
    "global_pool",
    "point_to_voxel",
    "gather_features_by_pc_voxel_id",
    "Activation",
    "apply_act",
    "bias_add_act",
]
