"""Ablation timing of the DG subm fwd kernel on the real scan.

Runs each SPCONV_DG_ABLATE setting in a fresh subprocess (the flag is
read at import).  Usage: python tools/probe_dg_ablate.py [C]
"""
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CHILD = """
import pickle, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {root!r})
from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv

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
c = {c}
feats = jnp.asarray(rs.randn(nbuf, c).astype(np.float32),
                    dtype=jnp.bfloat16)
w = jnp.asarray(rs.randn(c, 3, 3, 3, c).astype(np.float32) * .1,
                dtype=jnp.bfloat16)
REP = 20

def chain(f0, w_):
    def body(i, acc):
        f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
        o = dg_subm_conv(f, keys_j, w_, spatial_shape=ss, batch_size=1,
                         dilation=(1, 1, 1))
        return jnp.sum(o.astype(jnp.float32))
    return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

f = jax.jit(chain)
t0 = time.perf_counter()
f(feats, w).block_until_ready()
t1 = time.perf_counter()
f(feats, w).block_until_ready()
t2 = time.perf_counter()
print(f"RESULT {{(t2-t1)/REP*1e3:.3f}} ms/iter (compile {{t1-t0:.0f}}s)")
"""


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "", "nosweep", "nosearch", "nogather", "nogemm", "nodma"]
    for ablate in which:
        env = dict(os.environ)
        if ablate:
            env["SPCONV_DG_ABLATE"] = ablate
        else:
            env.pop("SPCONV_DG_ABLATE", None)
        r = subprocess.run(
            [sys.executable, "-c", CHILD.format(root=str(ROOT), c=c)],
            env=env, capture_output=True, text=True, timeout=900)
        line = [l for l in r.stdout.splitlines() if "RESULT" in l]
        print(f"{ablate or 'full':>9}: "
              f"{line[0].replace('RESULT ', '') if line else 'FAILED'}")
        if not line:
            tail = (r.stderr or r.stdout).splitlines()[-3:]
            print("   ", "\n    ".join(tail))


if __name__ == "__main__":
    main()
