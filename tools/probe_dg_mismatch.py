"""Locate the DG-vs-SK mismatch on the real scan: compare both against
the exact native rulebook path (f32) on TPU, print offending rows."""
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.gather_gemm import indice_conv
from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv
from spconv_tpu.ops.pallas.sorted_conv import sk_subm_conv
from spconv_tpu.ops.rulebook import build_subm_rulebook

C = int(sys.argv[1]) if len(sys.argv) > 1 else 16

voxels, coors, spatial_shape = pickle.load(
    open('/root/reference/test/data/test_spconv.pkl', 'rb'))
ss = tuple(int(s) for s in spatial_shape)
keys = (((coors[:, 0].astype(np.int64)) * ss[0] + coors[:, 1]) * ss[1]
        + coors[:, 2]) * ss[2] + coors[:, 3]
order = np.argsort(keys)
coors = coors[order]
n = coors.shape[0]
nbuf = 131072
inds = np.full((nbuf, 4), -1, np.int32)
inds[:n] = coors
inds_j = jnp.asarray(inds)
keys_j, _ = CO.linearize(inds_j, ss, 1)
rs = np.random.RandomState(0)
feats = np.zeros((nbuf, C), np.float32)
feats[:n] = rs.randn(n, C)
fj = jnp.asarray(feats)
w = jnp.asarray(rs.randn(C, 3, 3, 3, C).astype(np.float32) * .1)

print("native rulebook f32 ...", flush=True)
data = build_subm_rulebook(inds_j, spatial_shape=ss, batch_size=1,
                           ksize=(3, 3, 3), dilation=(1, 1, 1))
o_nat = np.asarray(jax.jit(
    lambda f, wv: indice_conv(f, wv, data.pair_fwd, data.pair_bwd,
                              is_subm=True))(fj, w), np.float64)

print("dg f32 ...", flush=True)
o_dg = np.asarray(jax.jit(
    lambda f, wv: dg_subm_conv(f, keys_j, wv, spatial_shape=ss,
                               batch_size=1, dilation=(1, 1, 1)))(fj, w),
    np.float64)

print("sk f32 ...", flush=True)
o_sk = np.asarray(jax.jit(
    lambda f, wv: sk_subm_conv(f, inds_j, keys_j, wv, spatial_shape=ss,
                               batch_size=1, dilation=(1, 1, 1),
                               fallback=False))(fj, w), np.float64)

scale = np.abs(o_nat).max()
for name, o in (("dg", o_dg), ("sk", o_sk)):
    d = np.abs(o - o_nat).max(1)
    bad = np.where(d > 1e-3 * scale)[0]
    print(f"{name}: max|diff|={d.max():.4f} rel={d.max()/scale:.2e} "
          f"bad rows={len(bad)}")
    if len(bad):
        tiles = sorted(set(bad // 128))
        print(f"  bad tiles ({len(tiles)}): {tiles[:20]}")
        for i in bad[:5]:
            print(f"  row {i} t={i//128} lane={i%128} "
                  f"site={inds[i]} key={int(np.asarray(keys_j)[i])}")

print("bf16 variants vs f32 native ...", flush=True)
fb = fj.astype(jnp.bfloat16)
wb = w.astype(jnp.bfloat16)
o_dgb = np.asarray(jax.jit(
    lambda f, wv: dg_subm_conv(f, keys_j, wv, spatial_shape=ss,
                               batch_size=1, dilation=(1, 1, 1)))(fb, wb),
    np.float64)
o_skb = np.asarray(jax.jit(
    lambda f, wv: sk_subm_conv(f, inds_j, keys_j, wv, spatial_shape=ss,
                               batch_size=1, dilation=(1, 1, 1),
                               fallback=False))(fb, wb), np.float64)
for name, o in (("dg_bf16", o_dgb), ("sk_bf16", o_skb)):
    d = np.abs(o - o_nat).max(1)
    bad = np.where(d > 0.2)[0]
    print(f"{name}: max|diff vs f32 native|={d.max():.4f} "
          f"p99.9={np.percentile(d, 99.9):.4f} bad(>0.2) rows={len(bad)}")
    if len(bad):
        tiles = sorted(set(bad // 128))
        print(f"  bad tiles ({len(tiles)}): {tiles[:20]}")
        for i in bad[:5]:
            print(f"  row {i} t={i//128} lane={i%128} site={inds[i]}")
