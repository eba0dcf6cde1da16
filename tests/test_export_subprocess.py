"""Deployment proof: serialize the CenterPoint encoder, reload it in a
FRESH PROCESS that never imports ``spconv_tpu``, and verify identical
outputs (VERDICT r2 #7; role parity: the reference's libspconv C++
pipeline, ``example/libspconv/main.cu:177-436``, which executes the
exported net with static buffers and no Python).

The artifact is a serialized jax.export StableHLO program — the entire
net (rulebook build + convs + pools + epilogues) as one static XLA
program.  C++ deployments load the same bytes through PJRT
(docs/DEPLOYMENT.md).
"""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spconv_tpu
from spconv_tpu.core import SparseConvTensor
from spconv_tpu.export import serialize
from spconv_tpu.models import centerpoint_encoder

from utils import generate_sparse_data, pad_sparse

_CHILD = """
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
assert "spconv_tpu" not in sys.modules
from jax import export as jexport

blob_path, in_path, out_path = sys.argv[1:4]
exported = jexport.deserialize(bytearray(open(blob_path, "rb").read()))
data = np.load(in_path)
outs = exported.call(jax.numpy.asarray(data["f"]),
                     jax.numpy.asarray(data["i"]))
np.savez(out_path, f=np.asarray(outs[0]), i=np.asarray(outs[1]))
assert "spconv_tpu" not in sys.modules
"""


@pytest.mark.slow
def test_centerpoint_export_subprocess(rng, tmp_path):
    shape = (21, 36, 36)
    feats, inds = generate_sparse_data(shape, 420, 5, batch_size=1,
                                       rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, 512)
    net = centerpoint_encoder(in_channels=5, bn=False,
                              dtype=jnp.float32, algo="native")

    def infer(f, i):
        x = SparseConvTensor(f, i, shape, 1)
        out = net.bev(x)
        return out, jnp.zeros((1,), jnp.int32)

    fj, ij = jnp.asarray(feats_p), jnp.asarray(inds_p)
    want_f, _ = jax.jit(infer)(fj, ij)

    blob = serialize(infer, (fj, ij))
    blob_path = tmp_path / "cp_encoder.stablehlo"
    blob_path.write_bytes(bytes(blob))
    in_path = tmp_path / "inputs.npz"
    np.savez(in_path, f=np.asarray(fj), i=np.asarray(ij))
    out_path = tmp_path / "outputs.npz"

    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(blob_path), str(in_path),
         str(out_path)],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": str(tmp_path)},
    )
    assert r.returncode == 0, f"child failed:\n{r.stderr[-2000:]}"
    got = np.load(out_path)
    np.testing.assert_allclose(got["f"], np.asarray(want_f), atol=1e-5)
