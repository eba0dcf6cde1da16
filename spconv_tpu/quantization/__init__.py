from .quantize import (
    QuantizedSparseConv,
    SparseConvAddReLU,
    MinMaxObserver,
    PerChannelMinMaxObserver,
    quantize_weight_per_channel,
    quantize_tensor,
    dequantize,
    calibrate,
    convert_to_int8,
)
from .fuse import fuse_bn_weights, fuse_conv_bn, fuse_bn_act_in_sequential
from .encoder import (QuantizedSparseEncoder, observe_encoder_scales,
                      quantize_encoder)
from .qat import (QATConvBnReLU, QATQuantStub, QuantizedSequential,
                  convert_qat, fake_quant, fake_quant_per_channel,
                  finalize_qat, prepare_qat, qat_observe)
