"""Primitive cost probe: scatter-set vs sort-back vs associative_scan vs
narrow int gathers, at rulebook-build sizes.  Run alone."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    def timed(fn, *args):
        f = jax.jit(fn)
        float(f(*args))
        t0 = time.time()
        for _ in range(3):
            float(f(*args))
        return (time.time() - t0) / 3 * 1000 / REP - floor / REP

    rng = np.random.RandomState(0)
    for n in (1_000_000, 3_400_000):
        ids = jnp.asarray(rng.permutation(n).astype(np.int32))
        vals = jnp.asarray(rng.randint(0, n, n).astype(np.int32))

        def scatter_set(ids, vals):
            def body(_, c):
                v = vals + c.astype(jnp.int32)
                r = jnp.zeros((n,), jnp.int32).at[ids].set(v)
                return c + r[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def sort_back(ids, vals):
            def body(_, c):
                v = vals + c.astype(jnp.int32)
                _, r = jax.lax.sort((ids, v), num_keys=1)
                return c + r[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def narrow_gather(ids, vals):
            def body(_, c):
                v = vals + c.astype(jnp.int32)
                r = v[ids]
                return c + r[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def seg_ffill(ids, vals):
            boundary = (vals % 7) == 0
            def body(_, c):
                v = jnp.where(boundary, vals + c.astype(jnp.int32), -1)
                def op(a, b):
                    return (a[0] | b[0],
                            jnp.where(b[0] | (b[1] >= 0), b[1], a[1]))
                _, r = jax.lax.associative_scan(op, (boundary, v))
                return c + r[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def cummax_gather(ids, vals):
            # current pattern: cummax group_start then order[group_start]
            def body(_, c):
                v = vals + c.astype(jnp.int32)
                pos = jnp.arange(n, dtype=jnp.int32)
                gs = jax.lax.cummax(jnp.where((v % 7) == 0, pos, 0))
                r = ids[gs]
                return c + r[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        for name, fn in [("scatter-set int32", scatter_set),
                         ("sort-back (2-op lax.sort)", sort_back),
                         ("narrow int32 gather (perm)", narrow_gather),
                         ("assoc-scan seg-ffill", seg_ffill),
                         ("cummax+monotone gather", cummax_gather)]:
            ms = timed(fn, ids, vals)
            print(f"n={n}: {name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
