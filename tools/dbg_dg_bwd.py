"""Minimal repro for the DG regular-conv dgrad mismatch (CPU interpret)."""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.pallas.dg_conv import dg_regular_conv
from spconv_tpu.ops.gather_gemm import indice_conv
from spconv_tpu.ops.rulebook import build_conv_rulebook

rs = np.random.RandomState(7)

n, ss, c, k, ks, stride, pad = 700, (20, 22, 24), 9, 13, (3, 3, 3), (2, 2, 2), (1, 1, 1)
pts = set()
while len(pts) < n:
    pts.add((0,) + tuple(int(rs.randint(0, v)) for v in ss))
arr = np.array(sorted(pts), np.int32)
keys0 = ((arr[:, 1] * ss[1] + arr[:, 2]) * ss[2] + arr[:, 3])
arr = arr[np.argsort(keys0)]
nbuf = 1024
indsp = np.full((nbuf, 1 + len(ss)), -1, np.int32)
indsp[:n] = arr
inds_j = jnp.asarray(indsp)

data = build_conv_rulebook(inds_j, spatial_shape=ss, batch_size=1,
                           ksize=ks, stride=stride, padding=pad,
                           dilation=(1,)*len(ss), out_bound=nbuf)
out_shape = tuple(int(v) for v in data.out_spatial_shape)
out_keys, _ = CO.linearize(data.out_indices, out_shape, 1)
order = jnp.argsort(out_keys)
out_keys_s = out_keys[order]
in_keys, _ = CO.linearize(inds_j, ss, 1)

feats = jnp.asarray(rs.randn(nbuf, c).astype(np.float32))
feats = jnp.where((jnp.arange(nbuf) < n)[:, None], feats, 0)
w = jnp.asarray(rs.randn(k, *ks, c).astype(np.float32) * 0.1)


def loss_dg(f, wv):
    o, _, _ = dg_regular_conv(
        f, in_keys, out_keys_s, wv, in_shape=ss, out_shape=out_shape,
        batch_size=1, stride=stride, padding=pad, dilation=(1,)*len(ss),
        window=128, interpret=True)
    return jnp.sum(o ** 2), o


(l1, o_dg), (gf1, gw1) = jax.value_and_grad(
    loss_dg, argnums=(0, 1), has_aux=True)(feats, w)


def loss_nat(f, wv):
    o = indice_conv(f, wv, data.pair_fwd, data.pair_bwd, is_subm=False)
    return jnp.sum(o[order] ** 2), o[order]


(l2, o_nat), (gf2, gw2) = jax.value_and_grad(
    loss_nat, argnums=(0, 1), has_aux=True)(feats, w)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)


print(f"fwd rel={rel(o_dg, o_nat):.2e}")
print(f"dgrad rel={rel(gf1, gf2):.2e}  wgrad rel={rel(gw1, gw2):.2e}")
bad = np.where(np.abs(np.asarray(gf1) - np.asarray(gf2)).max(1) > 1e-4)[0]
print(f"bad dgrad rows ({len(bad)}): {bad[:20]}")
if len(bad):
    i = int(bad[0])
    print(f"row {i}: site={indsp[i]}, dg={np.asarray(gf1)[i]}, "
          f"nat={np.asarray(gf2)[i]}")
bw = np.where(np.abs(np.asarray(gw1) - np.asarray(gw2)).reshape(k, -1)
              .max(1) > 1e-4)[0]
print(f"bad wgrad out-ch: {bw}")
