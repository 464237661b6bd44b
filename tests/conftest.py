"""Test config: force a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware.

Note: the ambient environment boots an 'axon' TPU-tunnel PJRT plugin via
sitecustomize and pins jax_platforms='axon,cpu', so the env var alone is not
enough — we must override the config after import, before any backend init.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the CPU test suite: the suite compiles
# ~hundreds of tiny distinct programs and that, not the math, is most of its
# wall time. A host-local cache dir (NOT the TPU cache: artifacts from the
# axon remote-compile host carry machine features this host may lack) makes
# warm re-runs fast; a cold first run is unchanged.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FNN_TEST_CACHE", "/root/.jax_cache_cpu_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
