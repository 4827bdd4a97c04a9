"""Test env: force CPU JAX with 8 virtual devices so mesh/halo logic runs in CI
(SURVEY.md §4 'Multi-host without a cluster').

The session interpreter registers a live TPU backend via sitecustomize and
pins JAX_PLATFORMS before user code runs, so plain env vars are not enough:
we must override through jax.config after import, before first backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the wide-wavelet shard_map compiles take ~1 min
# each cold; warm runs of the suite drop from ~9 to ~2 minutes
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
