"""Probe sort/join primitive costs at rulebook sizes (1.8M int32 keys).
Run alone (one tunnel client)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    N = 14 * 126976  # subm join size: table N + 13N queries

    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 2**28, size=N), jnp.int32)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000
    print(f"floor {floor:.1f} ms  N={N}", flush=True)

    def timed(label, fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); cs = time.time() - t0
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(*args))
            best = min(best, time.time() - t1)
        ms = best * 1000 / REP - floor / REP
        print(f"{label:46s}: {ms:7.2f} ms  [compile {cs:.0f}s]", flush=True)
        return ms

    def rep(body_fn):
        def run(k):
            def body(i, c):
                kk = k + (0 * c).astype(k.dtype)
                return body_fn(kk) + c * 0
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
        return run

    iota = jnp.arange(N, dtype=jnp.int32)

    timed("argsort unstable", rep(
        lambda k: jnp.sum(jnp.argsort(k).astype(jnp.float32))), keys)
    timed("argsort stable", rep(
        lambda k: jnp.sum(jnp.argsort(k, stable=True).astype(jnp.float32))),
        keys)
    timed("lax.sort (k,iota) stable", rep(
        lambda k: jnp.sum(jax.lax.sort((k, iota), num_keys=1,
                                       is_stable=True)[1]
                          .astype(jnp.float32))), keys)
    timed("lax.sort (k,iota) unstable", rep(
        lambda k: jnp.sum(jax.lax.sort((k, iota), num_keys=1,
                                       is_stable=False)[1]
                          .astype(jnp.float32))), keys)
    timed("argsort unstable + take(keys)", rep(
        lambda k: jnp.sum(jnp.take(k, jnp.argsort(k)).astype(jnp.float32))),
        keys)

    # int32 element scatter at join size
    pos = jnp.asarray(rng.permutation(N), jnp.int32)

    def scat(k):
        r = jnp.full((N,), -1, jnp.int32)
        r = r.at[pos].set(k, mode="drop")
        return jnp.sum(r.astype(jnp.float32))

    timed("int32 scatter .at[perm].set (N)", rep(scat), keys)

    # int32 element gather
    def gath(k):
        return jnp.sum(jnp.take(k, pos).astype(jnp.float32))

    timed("int32 gather take (N)", rep(gath), keys)

    # cummax at N
    timed("cummax (N)", rep(
        lambda k: jnp.sum(jax.lax.cummax(k).astype(jnp.float32))), keys)

    # full _join_lookup at subm size
    from spconv_tpu.ops.rulebook import _join_lookup
    t = 126976
    table = jnp.asarray(
        np.sort(rng.choice(2**28, size=t, replace=False)), jnp.int32)
    queries = jnp.asarray(rng.randint(0, 2**28, size=13 * t), jnp.int32)

    def jl(k):
        r = _join_lookup(table, queries + (k[0] * 0), jnp.int32(2**28))
        return jnp.sum(r.astype(jnp.float32))

    timed("_join_lookup (127k table, 1.65M q)", rep(jl), keys)


if __name__ == "__main__":
    main()
