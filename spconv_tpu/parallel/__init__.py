from .mesh import (
    make_mesh,
    stack_sparse_batch,
    data_parallel_call,
    data_parallel_value_and_grad,
    channel_parallel_conv,
)
