"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, per the driver contract) and float64 enabled for
1e-8 parity checks (the reference's accuracy bar, BASELINE.md).

Env vars alone are not enough: pytest plugins (jaxtyping) import jax before this
file runs, so we use the config API, which is honored until a backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the heavy forward-over-reverse graphs (Ogden,
# crystal, FeFp) compile once per machine instead of once per pytest run
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
