"""Per-layer cost breakdown of the bench_basic net in BLOCK mode on TPU.

Measures cumulative prefixes (pack, c0, c1, p0, c2, ...) so the net-level
block-mode total can be attributed per layer.  Run alone (one tunnel
client).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.benchmark.basic import (
        BenchNet, load_basic_data, make_bench_input)

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    root = Path(__file__).parent.parent
    pool_bounds = json.loads((root / ".bench_pool_bounds.json").read_text())
    brick_bounds = json.loads((root / ".bench_block_bounds.json").read_text())
    net = BenchNet(spatial_shape, dtype=jnp.bfloat16,
                   pool_bounds=pool_bounds, algo="block",
                   brick_bounds=brick_bounds)

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
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(*args))
            best = min(best, time.time() - t1)
        return best * 1000 / REP - floor / REP, cs

    def prefix_run(m, feats, inds, upto):
        def fwd(f):
            t = spconv_tpu.SparseConvTensor(f, inds, spatial_shape, 1)
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
            return jnp.sum(fwd(f).features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    labels = []
    for s in range(6):
        labels += [f"c{2*s}", f"c{2*s+1}", f"p{s}"]
    labels += ["c12", "c13"]
    prev = 0.0
    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--upto="):
            sel = [int(v) for v in a.split("=")[1].split(",")]
    print("cumulative prefix timings (block):", flush=True)
    for upto in range(1, len(labels) + 1):
        if sel and upto not in sel:
            continue
        ms, cs = timed(lambda f, u=upto: prefix_run(net, f, x.indices, u),
                       x.features)
        print(f"  +{labels[upto-1]:4s}: cum {ms:7.2f} ms  (+{ms-prev:6.2f}) "
              f"[compile {cs:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
