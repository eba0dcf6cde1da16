import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4 takeaway 4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: on the 1-core CI box XLA compiles dominate
# the suite wall time; warmed runs skip every unchanged compile (the
# driver's `pytest -q` reruns the same programs).  Lives beside the bench
# cache, gitignored.
from pathlib import Path as _Path

_cache = _Path(__file__).resolve().parents[1] / ".jax_cache_tests"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
