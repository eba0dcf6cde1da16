"""Per-stage cost breakdown of the bench_basic net on TPU.

Measures cumulative prefixes of the net (stage 0, stages 0-1, ...) and
isolated components (subm rulebook build, pool, conv compute) so the
59.6 ms round-1 total can be attributed.  Run alone (one tunnel client).
"""

import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.benchmark.basic import (
        BenchNet, load_basic_data, make_bench_input)
    from spconv_tpu.ops.rulebook import build_subm_rulebook
    from spconv_tpu.ops.gather_gemm import indice_conv

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    import json
    bounds = json.loads((Path(__file__).parent.parent
                         / ".bench_pool_bounds.json").read_text())
    net = BenchNet(spatial_shape, dtype=jnp.bfloat16, pool_bounds=bounds)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    def timed(fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); cs = time.time() - t0
        t0 = time.time()
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(*args))
            best = min(best, time.time() - t1)
        return best * 1000 / REP - floor / REP, cs

    # cumulative prefixes: after k layers (layer list = c0 c1 p0 c2 c3 p1 …)
    def prefix_run(m, feats, inds, upto):
        def fwd(f, ii):
            t = spconv_tpu.SparseConvTensor(f, ii, spatial_shape, 1)
            c, p = m.convs, m.pools
            li = 0
            for stage in range(6):
                for cc in (c[2 * stage], c[2 * stage + 1]):
                    t = cc(t); li += 1
                    if li >= upto:
                        return t
                t = p[stage](t); li += 1
                if li >= upto:
                    return t
            t = c[12](t); li += 1
            if li >= upto:
                return t
            t = c[13](t)
            return t

        def body(_, cnt):
            f = feats * (1.0 + 0.0 * cnt).astype(feats.dtype)
            ii = inds + jnp.isnan(cnt).astype(inds.dtype)
            return jnp.sum(fwd(f, ii).features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    labels = []
    for s in range(6):
        labels += [f"c{2*s}", f"c{2*s+1}", f"p{s}"]
    labels += ["c12", "c13"]
    prev = 0.0
    print("cumulative prefix timings:", flush=True)
    for upto in range(1, len(labels) + 1):
        ms, cs = timed(lambda f, u=upto: prefix_run(net, f, x.indices, u),
                       x.features)
        print(f"  +{labels[upto-1]:4s}: cum {ms:7.2f} ms  (+{ms-prev:6.2f}) "
              f"[compile {cs:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
