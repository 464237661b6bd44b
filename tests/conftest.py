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
