"""Multi-device execution (SURVEY.md §2.5).

The reference is a single-GPU kernel library; multi-GPU training is
delegated to torch DDP/Horovod + ``SparseSyncBatchNorm``
(``modules.py:162``, ``test/fake_dist_train.py``).  The TPU-native
equivalent is JAX collectives over ICI: scans (batch elements) are
sharded across a mesh axis with ``shard_map``; gradients and BN statistics
are ``psum``-ed.  Rulebooks are per-scan, so every device builds its own —
no cross-device communication in the sparse-conv hot path at all.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import SparseConvTensor
from ..module import combine, is_array, partition

__all__ = [
    "make_mesh",
    "stack_sparse_batch",
    "data_parallel_call",
    "data_parallel_value_and_grad",
    "channel_parallel_conv",
]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stack_sparse_batch(tensors: Sequence[SparseConvTensor]):
    """Stack per-scan sparse tensors into leading-axis arrays for
    shard_map: features [D, N, C], indices [D, N, ndim+1].  All tensors
    must share buffer size, spatial shape; batch index inside each shard
    is re-zeroed (each device sees batch_size=1 scans)."""
    f = jnp.stack([t.features for t in tensors])
    i = jnp.stack([t.indices for t in tensors])
    return f, i


def data_parallel_call(
    net,
    mesh: Mesh,
    axis: str = "dp",
    keys_sorted: bool = False,
):
    """Wrap ``net(x) -> SparseConvTensor`` as a data-parallel function over
    stacked (features, indices).  Weights are replicated; each device
    processes its own scans.  Pass ``keys_sorted=True`` when every shard's
    rows are key-sorted (e.g. PointToVoxel output) to enable the fused
    sorted-key kernels per shard."""
    shard_map = jax.shard_map

    def call(params_net, feats, inds, spatial, batch_per_shard):
        def shard_fn(feats_s, inds_s):
            x = SparseConvTensor(
                feats_s[0], inds_s[0], spatial, batch_per_shard,
                keys_sorted=keys_sorted,
            )
            out = params_net(x)
            return out.features[None], out.indices[None]

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )(feats, inds)

    return call


def data_parallel_value_and_grad(
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "dp",
):
    """Data-parallel value_and_grad: ``loss_fn(net, feats, inds) -> scalar``
    per shard; returns mean loss and psum-averaged grads (the DDP
    contract).  ``net`` weights are replicated over the mesh."""
    shard_map = jax.shard_map

    def step(net, feats, inds):
        dyn, sta = partition(
            net, lambda x: is_array(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        )

        def shard_fn(dyn_s, feats_s, inds_s):
            def inner(d):
                m = combine(d, sta)
                return loss_fn(m, feats_s[0], inds_s[0])

            loss, grads = jax.value_and_grad(inner)(dyn_s)
            loss = jax.lax.pmean(loss, axis)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, axis) if g is not None else None,
                grads,
                is_leaf=lambda x: x is None,
            )
            return loss, grads

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(dyn, feats, inds)

    return step

def channel_parallel_conv(
    conv,
    mesh: Mesh,
    axis: str = "tp",
    keys_sorted: bool = False,
):
    """Column-parallel sparse conv: OUTPUT channels sharded across the
    mesh axis, activations replicated, shards all-gathered along the
    channel dim (the Megatron column-parallel pattern mapped onto
    KRSC conv weights; the reference has no TP at all — SURVEY §2.5).

    Returns ``fn(weight, bias, feats, inds, spatial, batch) ->
    (features [N, K], indices)``; pass the layer's full weight/bias —
    shard_map splits them on the K axis.  Works with every algo
    (the sorted-key kernel runs per shard with K/n_dev channels).
    """
    import copy

    ndev = mesh.shape[axis]
    assert conv.out_channels % ndev == 0, (
        f"out_channels {conv.out_channels} not divisible by mesh axis "
        f"{axis}={ndev}")
    shard_map = jax.shard_map

    def fn(weight, bias, feats, inds, spatial, batch):
        def shard_fn(w_s, b_s, feats_r, inds_r):
            m = copy.copy(conv)
            m.weight = w_s
            m.bias = b_s if bias is not None else None
            m.out_channels = conv.out_channels // ndev
            x = SparseConvTensor(feats_r, inds_r, spatial, batch,
                                 keys_sorted=keys_sorted)
            out = m(x)
            of = jax.lax.all_gather(out.features, axis, axis=1,
                                    tiled=True)
            return of, out.indices

        b_arg = bias if bias is not None else jnp.zeros(
            (conv.out_channels,), weight.dtype)
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(weight, b_arg, feats, inds)

    return fn
