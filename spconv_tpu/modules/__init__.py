from .conv import (
    SparseConvolution,
    SparseConv1d, SparseConv2d, SparseConv3d, SparseConv4d,
    SubMConv1d, SubMConv2d, SubMConv3d, SubMConv4d,
    SparseConvTranspose1d, SparseConvTranspose2d, SparseConvTranspose3d,
    SparseConvTranspose4d,
    SparseInverseConv1d, SparseInverseConv2d, SparseInverseConv3d,
    SparseInverseConv4d,
)
from .pool import (
    SparseMaxPool, SparseAvgPool,
    SparseMaxPool1d, SparseMaxPool2d, SparseMaxPool3d, SparseMaxPool4d,
    SparseAvgPool1d, SparseAvgPool2d, SparseAvgPool3d,
    SparseGlobalMaxPool, SparseGlobalAvgPool,
)
from .modules import (
    SparseModule, SparseSequential, Lambda,
    SparseIdentity, Identity, SparseReLU, SparseLeakyReLU, SparseSigmoid,
    BatchNorm1d, SparseBatchNorm, SparseSyncBatchNorm,
    ToDense, PrintTensorMeta, PrintCurrentTime,
    assign_name_for_sparse_modules,
)
from .tables import AddTable, ConcatTable, JoinTable
from .spatial import RemoveDuplicate
