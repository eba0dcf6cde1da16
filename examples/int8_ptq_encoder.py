"""Whole-encoder int8 PTQ (parity: the reference's int8 deployment flow
— ``example/mnist`` PTQ + ``docs/TENSORRT_INT8_GUIDE.md`` — applied to a
SECOND/CenterPoint-style backbone with residual blocks).

Calibrates activation ranges on sample scans, converts every conv to an
int8 ``QuantizedSparseConv`` (residual blocks become the fused
conv+add+relu pair), and compares int8 output to the fp encoder.  On a
key-sorted TPU tensor, the int8 convs run the fused quad-packed Pallas
kernel (``ops/pallas/dg_conv.py``); on CPU they take the int8 gather
path — same semantics either way.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu.models import SparseEncoder
from spconv_tpu.quantization import quantize_encoder


def make_scan(rng, shape=(8, 24, 24), n=400, c=4, nbuf=512):
    vol = int(np.prod(shape))
    flat = np.sort(rng.choice(vol, size=n, replace=False))
    coords = np.stack(np.unravel_index(flat, shape), axis=-1)
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n, 0] = 0
    inds[:n, 1:] = coords
    feats = np.zeros((nbuf, c), np.float32)
    feats[:n] = rng.randn(n, c)
    return spconv_tpu.SparseConvTensor(
        jnp.asarray(feats), jnp.asarray(inds), shape, 1, keys_sorted=True)


def main():
    rng = np.random.RandomState(0)
    enc = SparseEncoder(in_channels=4, base_channels=8, channels=(8, 16),
                        blocks_per_stage=1, out_channels=16, bn=False,
                        out_bounds=(512,), key=jax.random.PRNGKey(0))

    calib = [make_scan(np.random.RandomState(s)) for s in range(4)]
    qenc = quantize_encoder(enc, calib)

    x = make_scan(rng)
    ref = enc(x).features
    out = qenc(x).features
    l2 = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
          / max(np.linalg.norm(np.asarray(ref)), 1e-9))
    bev = qenc.bev(x)
    print(f"int8 encoder vs fp: L2 rel err {l2:.4f}; BEV {bev.shape}")
    assert l2 < 0.1
    print("OK")


if __name__ == "__main__":
    main()
