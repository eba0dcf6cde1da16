"""Autotuner (parity: ``spconv/algo.py`` GemmTunerSimple/ConvTunerSimple +
the C++ twins in ``csrc/sparse/convops.py:457-1467``).

The reference profiles CUTLASS tile configs per (dtype, K, C, arch,
mask_width) and caches winners (``convops.py:1283-1301``).  The XLA
analog: the tunable axes are the *compute-path parameters we control* —
gather chunk width, accumulation dtype, and (once multiple algorithms
exist) algorithm choice.  Winners are measured with device-accurate in-jit
timing (``tools.benchmark_model``) and cached to disk keyed on the op
signature, surviving process restarts like the reference's tuner cache.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from .constants import SPCONV_TUNE_CACHE

__all__ = ["ConvTuner", "CONV_TUNER"]


class ConvTuner:
    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = Path(cache_dir or SPCONV_TUNE_CACHE)
        self._cache: Dict[str, dict] = {}
        self._loaded = False

    # -- persistence ----------------------------------------------------
    def _cache_file(self) -> Path:
        return self.cache_dir / "conv_tune_cache.json"

    def _load(self):
        if self._loaded:
            return
        self._loaded = True
        f = self._cache_file()
        if f.exists():
            try:
                self._cache.update(json.loads(f.read_text()))
            except Exception:
                pass

    def _save(self):
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._cache_file().write_text(json.dumps(self._cache, indent=1))

    # -- keys (reference parity: (dtype, K, C, arch, op) tuple keys) ----
    @staticmethod
    def key(op: str, n_bucket: int, c: int, k: int, kv: int, dtype: str) -> str:
        return f"{op}|n{n_bucket}|c{c}|k{k}|kv{kv}|{dtype}"

    @staticmethod
    def bucket_n(n: int) -> int:
        """Bucket row counts to powers of two so one tuning covers a range."""
        return 1 << max(10, int(np.ceil(np.log2(max(n, 1)))))

    # -- lookup ---------------------------------------------------------
    def get_tuned_params(self, op: str, n: int, c: int, k: int, kv: int,
                         dtype: str) -> dict:
        """Cached winner, else heuristic defaults."""
        self._load()
        kk = self.key(op, self.bucket_n(n), c, k, kv, dtype)
        if kk in self._cache:
            return self._cache[kk]
        # heuristic default: chunk bounded by a 64M-element gather buffer
        chunk = max(1, min(kv, (64 * 1024 * 1024) // max(1, n * c)))
        return {"chunk": chunk, "source": "heuristic"}

    # -- profiling ------------------------------------------------------
    def tune_and_cache(self, op: str, n: int, c: int, k: int, kv: int,
                       dtype: str,
                       variants: Dict[str, Callable],
                       args) -> dict:
        """Measure ``variants`` (name → callable(*args)) with in-jit
        repetition timing; cache and return the winner's params.  Variant
        names encode their params as 'chunk=9'-style fragments."""
        from .tools import benchmark_model

        results = {}
        for name, fn in variants.items():
            try:
                results[name] = benchmark_model(fn, args, rep=6, n_outer=2)
            except Exception as e:  # variant may not compile on this backend
                results[name] = float("inf")
        winner = min(results, key=results.get)
        params = {"source": "tuned", "ms": results[winner]}
        for frag in winner.split(","):
            if "=" in frag:
                key_, val = frag.split("=")
                params[key_] = int(val) if val.isdigit() else val
        self._load()
        self._cache[self.key(op, self.bucket_n(n), c, k, kv, dtype)] = params
        self._save()
        return params

    # -- algorithm selection (parity: ConvAlgo auto-pick, conv.py:110-125)
    def select_algo(self, *, subm: bool, sk_supported: bool, n: int,
                    c: int, k: int, kv: int, dtype: str,
                    backend: Optional[str] = None,
                    dg_supported: bool = False,
                    training: bool = False) -> str:
        """Resolve ``algo=None``/"auto" to a concrete algorithm.

        The reference auto-picks MaskImplicitGemm for kv<=32 and Native
        otherwise (``conv.py:110-125``), and its tuner caches winners
        per op type — kForward / kBackwardInput / kBackwardWeight
        (``convops.py:1283-1301``).  The JAX analog of per-op-type is
        the ``training`` axis: one winner for forward-only dispatch,
        another for the differentiated (fwd+bwd) call.

        Heuristics (measured on v5e, 125k-voxel scan, round-4 offmode
        kernels — DESIGN_NOTES r4 table):
        * inference: the DG kernel wins at every width (fwd ms at
          C=16/64/128/256: DG 3.6/4.6/6.0/9.7 vs SK 6.3/6.1/6.1/9.1;
          posmode lowers DG further).
        * training: DG wins up to C=64 (fwd+bwd 7.8/10.2 vs SK
          11.3/11.1) but the SK fused dgrad+wgrad takes over at wide
          channels (C=128: 11.0 vs 13.0; C=256: 19.1 vs 23.3).
        A cached tuned winner, when present, overrides the heuristic."""
        self._load()
        op = "algo_train" if training else "algo"
        kk = self.key(op, self.bucket_n(n), c, k, kv, dtype)
        cached = self._cache.get(kk)
        if cached and "algo" in cached:
            algo = cached["algo"]
            if ((algo != "sk" or sk_supported)
                    and (algo != "dg" or dg_supported)):
                return algo
        import jax

        backend = backend or jax.default_backend()
        if backend != "cpu":
            if (training and sk_supported and min(c, k) >= 128
                    and dtype in ("bfloat16", "float16")):
                return "sk"
            if dg_supported and dtype in ("bfloat16", "float16",
                                          "float32"):
                return "dg"
            if sk_supported and dtype in ("bfloat16", "float16"):
                return "sk"
        return "native"

    def cache_algo(self, *, n: int, c: int, k: int, kv: int, dtype: str,
                   algo: str, ms: Optional[float] = None,
                   training: bool = False):
        """Record a measured winner for :meth:`select_algo`."""
        self._load()
        rec = {"algo": algo, "source": "tuned"}
        if ms is not None:
            rec["ms"] = ms
        op = "algo_train" if training else "algo"
        self._cache[self.key(op, self.bucket_n(n), c, k, kv,
                             dtype)] = rec
        self._save()

    def has_algo(self, *, n: int, c: int, k: int, kv: int,
                 dtype: str, training: bool = False) -> bool:
        self._load()
        op = "algo_train" if training else "algo"
        rec = self._cache.get(self.key(op, self.bucket_n(n), c, k,
                                       kv, dtype))
        return bool(rec and "algo" in rec)

    # -- window geometry (DG/SK sorted-key kernels) ---------------------
    @staticmethod
    def window_key(*, n: int, kv: int, shape, batch: int,
                   tile: int = 128) -> str:
        ss = "x".join(str(int(s)) for s in shape)
        return (f"dgwin|n{ConvTuner.bucket_n(n)}|kv{kv}|s{ss}|b{batch}"
                f"|t{tile}")

    def get_dg_window(self, *, n: int, kv: int, shape, batch: int,
                      tile: int = 128) -> Optional[int]:
        """Cached tuned window size for this geometry, else None."""
        self._load()
        rec = self._cache.get(self.window_key(n=n, kv=kv, shape=shape,
                                              batch=batch, tile=tile))
        return int(rec["window"]) if rec and "window" in rec else None

    def cache_dg_window(self, *, n: int, kv: int, shape, batch: int,
                        window: int, tile: int = 128):
        self._load()
        self._cache[self.window_key(n=n, kv=kv, shape=shape, batch=batch,
                                    tile=tile)] = {
            "window": int(window), "source": "tuned"}
        self._save()

    @property
    def tune_enabled(self) -> bool:
        """Tune-on-first-call mode (reference: ConvTunerSimple profiles
        candidates on the live shapes at first dispatch and caches the
        winner, ``convops.py:1283-1301``).  Off by default — each
        candidate pays a compile; enable for a tuning run with
        ``SPCONV_TPU_TUNE=1`` or ``CONV_TUNER.force_tune = True``."""
        return getattr(self, "force_tune", False) or (
            os.environ.get("SPCONV_TPU_TUNE", "0") == "1")

    def tune_conv_algo(self, module, input, candidates, *, n, c, k, kv,
                       dtype, timer=None, training: bool = False) -> str:
        """Measure each candidate algo of ``module`` on the LIVE input
        tensor, cache and return the winner.  Training keys measure the
        full differentiated call (value_and_grad wrt features AND
        weight — the reference tunes kBackwardInput and kBackwardWeight
        separately, ``convops.py:1283-1301``; in JAX one algo serves the
        whole fwd+bwd, so the combined time is what must win).
        ``timer`` overrides the device measurement (tests)."""
        from .tools import benchmark_model

        import copy

        import jax
        import jax.numpy as jnp

        results = {}
        for a in candidates:
            m = copy.copy(module)
            m.algo = a
            try:
                if timer is not None:
                    results[a] = timer(a)
                elif training:
                    def step(f, w, m=m):
                        m2 = copy.copy(m)
                        m2.weight = w

                        def loss(fw):
                            f_, w_ = fw
                            m3 = copy.copy(m2)
                            m3.weight = w_
                            out = m3(input.replace_feature(f_),
                                     training=True)
                            return jnp.sum(
                                out.features.astype(jnp.float32) ** 2)

                        l, g = jax.value_and_grad(loss)((f, w))
                        return l + sum(
                            jnp.sum(gi.astype(jnp.float32)) for gi in g)

                    results[a] = benchmark_model(
                        step, (input.features, m.weight), rep=4,
                        n_outer=2)
                else:
                    results[a] = benchmark_model(
                        lambda f, m=m: m(input.replace_feature(f)).features,
                        (input.features,), rep=4, n_outer=2)
            except Exception:  # noqa: BLE001 — candidate may not compile
                results[a] = float("inf")
        winner = min(results, key=results.get)
        self.cache_algo(n=n, c=c, k=k, kv=kv, dtype=dtype, algo=winner,
                        ms=results[winner], training=training)
        return winner

    def tune_conv_chunk(self, features, weight_kv, pair_fwd, subm_center,
                        chunks=(3, 9, 14, 27)) -> dict:
        """Tune the gather-chunk width of the conv compute on real data."""
        from .ops import gather_gemm as gg

        n = pair_fwd.shape[1]
        c = features.shape[1]
        kv = pair_fwd.shape[0]
        k = weight_kv.shape[2]
        variants = {}
        for ch in chunks:
            if ch > kv:
                continue

            def make(ch_):
                def fn(f):
                    old = gg._CHUNK_BUDGET
                    try:
                        gg._CHUNK_BUDGET = ch_ * n * c
                        return gg.gather_mm(f, weight_kv, pair_fwd,
                                            subm_center)
                    finally:
                        gg._CHUNK_BUDGET = old
                return fn

            variants[f"chunk={ch}"] = make(ch)
        return self.tune_and_cache("gather_mm", n, c, k, kv,
                                   str(features.dtype), variants,
                                   (features,))


CONV_TUNER = ConvTuner()
