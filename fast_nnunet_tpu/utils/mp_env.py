"""Worker-pool environment shielding.

Host-side worker processes (preprocessing, fingerprinting) must NOT attach to
the TPU: the ambient sitecustomize registers an 'axon' PJRT plugin in every
interpreter when PALLAS_AXON_POOL_IPS is set, and a second claim on the chip
kills the worker. Clear the trigger variables in the parent around pool
creation (children inherit the cleaned env) and restore afterwards."""
import contextlib
import os

_TPU_ENV_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                 "TPU_SKIP_MDS_QUERY", "AXON_LOOPBACK_RELAY")


@contextlib.contextmanager
def cpu_only_child_env():
    saved = {}
    for var in _TPU_ENV_VARS:
        if var in os.environ:
            saved[var] = os.environ.pop(var)
    saved_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        os.environ.update(saved)
        if saved_platforms is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = saved_platforms
