"""Trustworthy sort-primitive probe: xor-chained inputs (cannot be hoisted
or folded) + two-REP slope timing (cancels dispatch floor).  Run alone."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    N = 1777664  # 14 * 126976

    rng = np.random.RandomState(0)
    keys_np = rng.randint(0, 2**28, size=N).astype(np.int32)
    keys = jnp.asarray(keys_np)
    # nearly-sorted variant (rulebook reality: shifted sorted keys)
    keys_sorted = jnp.asarray(np.sort(keys_np))

    def make_run(body_fn, rep):
        @jax.jit
        def run(k):
            def body(i, carry):
                kk = k ^ (carry & 1)  # int32-dependent, cannot fold
                r = body_fn(kk)
                return r ^ (r >> 31)
            return jax.lax.fori_loop(0, rep, body, jnp.int32(0))
        return run

    def timed(label, body_fn, k, r1=4, r2=12):
        f1, f2 = make_run(body_fn, r1), make_run(body_fn, r2)
        int(f1(k)); int(f2(k))
        b1 = b2 = 1e9
        for _ in range(3):
            t = time.time(); int(f1(k)); b1 = min(b1, time.time() - t)
            t = time.time(); int(f2(k)); b2 = min(b2, time.time() - t)
        ms = (b2 - b1) * 1000 / (r2 - r1)
        print(f"{label:46s}: {ms:7.2f} ms/iter", flush=True)
        return ms

    iota = jnp.arange(N, dtype=jnp.int32)

    timed("lax.sort key-only unstable",
          lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False)[0][0], keys)
    timed("lax.sort (k,iota) unstable",
          lambda k: jax.lax.sort((k, iota), num_keys=1, is_stable=False)[1][0],
          keys)
    timed("lax.sort (k,iota) stable",
          lambda k: jax.lax.sort((k, iota), num_keys=1, is_stable=True)[1][0],
          keys)
    timed("argsort unstable",
          lambda k: jnp.argsort(k)[0], keys)
    timed("argsort stable",
          lambda k: jnp.argsort(k, stable=True)[0], keys)
    timed("argsort stable + take",
          lambda k: jnp.take(k, jnp.argsort(k, stable=True))[0], keys)
    timed("lax.sort (k,iota) stable NEARLY-SORTED",
          lambda k: jax.lax.sort((k, iota), num_keys=1, is_stable=True)[1][0],
          keys_sorted)
    # gather/scatter/cummax of int32 at N
    pos = jnp.asarray(rng.permutation(N), jnp.int32)
    timed("int32 take perm (N)", lambda k: jnp.take(k, pos)[0], keys)
    timed("int32 scatter perm (N)",
          lambda k: jnp.full((N,), -1, jnp.int32).at[pos].set(k)[0], keys)
    timed("cummax (N)", lambda k: jax.lax.cummax(k)[0], keys)
    timed("cumsum (N)", lambda k: jnp.cumsum(k)[0], keys)


if __name__ == "__main__":
    main()
