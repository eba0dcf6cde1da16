from .second import SparseEncoder, SparseBasicBlock, second_encoder, centerpoint_encoder
from .unet import SparseUNet
from .classifier import SparseClassifier
