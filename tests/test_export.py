"""StableHLO export round-trip (deployment-path smoke,
role parity: reference libspconv static-buffer inference)."""

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu.core import SparseConvTensor
from spconv_tpu.export import serialize, deserialize_and_call
from utils import generate_sparse_data, pad_sparse


def test_export_roundtrip(rng):
    shape = (9, 10, 11)
    feats, inds = generate_sparse_data(shape, 120, 4, batch_size=1, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, 256)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c1", act_type="relu"),
        spconv_tpu.SparseConv3d(8, 16, 3, stride=2, padding=1,
                                out_bound=512),
    )

    def infer(f, i):
        x = SparseConvTensor(f, i, shape, 1)
        out = net(x)
        return out.features, out.indices

    fj, ij = jnp.asarray(feats_p), jnp.asarray(inds_p)
    want_f, want_i = jax.jit(infer)(fj, ij)
    blob = serialize(infer, (fj, ij))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    got_f, got_i = deserialize_and_call(blob, fj, ij)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
