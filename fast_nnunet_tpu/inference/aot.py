"""AOT-serialized executables: the TPU answer to TensorRT's saved engines.

The reference's serving story is a PRE-COMPILED artifact: `trtexec
--saveEngine` writes a serialized TensorRT engine that loads in seconds
(ref docs/Engine.md:91), so a fresh process never pays the build cost. The
JAX equivalent is `jax.experimental.serialize_executable`: compile the
sweep program once, pickle the PJRT executable to disk, and have every
later process (including a cold driver benchmark) load it instead of
recompiling — the remote-compile endpoint behind the dev tunnel prices a
cold 512^3 sweep at up to ~14 minutes (docs/Performance.md round-3), which
is exactly the failure mode this removes.

Keying: the artifact is valid only for the exact program, so the cache key
is a hash of the lowered StableHLO text (WITHOUT source-location metadata —
comment-only source edits must not invalidate a multi-minute compile) plus
the jax version and device fingerprint. A mismatched or corrupt artifact
falls back to a fresh compile; a backend that cannot serialize executables
(PJRT clients may not implement it) silently degrades to jit behavior, so
this layer is never load-bearing for correctness.

Trust model: the cache dir must be PRIVATE and TRUSTED (it is created
0o700). Artifacts are pickle-based — ours through a restricted unpickler
that only resolves PyTreeDef machinery, but `deserialize_and_load` itself
unpickles jax-internal state, so a tampered artifact is still an
arbitrary-code risk at that layer. Never point `aot_cache`/`BENCH_AOT` at
a shared or world-writable directory.
"""
import hashlib
import logging
import os
import pickle
import re
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["aot_compile", "program_key"]

class _PayloadUnpickler(pickle.Unpickler):
    """Outer-payload unpickler that resolves ONLY the PyTreeDef machinery
    (plus builtins handled natively by pickle). Our payload is a dict of
    bytes / treedefs / int lists — any other global in the stream means a
    tampered or foreign artifact, and we refuse rather than import it."""

    _ALLOWED_PREFIXES = ("jax._src.tree_util", "jaxlib")

    def find_class(self, module, name):
        if module.startswith(self._ALLOWED_PREFIXES):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"aot payload references disallowed global {module}.{name}")


_LOC = re.compile(r"\s*loc\(.*?\)|#loc\d*(?: = .*)?$", re.MULTILINE)
# the module carries the jitted function's NAME (`module @jit_sweep ...`);
# renames must not invalidate a multi-minute compile any more than line
# shifts should
_MODNAME = re.compile(r"^module @\S+", re.MULTILINE)


def program_key(lowered, extra: str = "") -> str:
    """Stable content hash of a lowered program + runtime fingerprint.
    Source locations and the module name are stripped: comment-only edits,
    line shifts, and function renames keep the key (Lowered.as_text emits
    no debug info by default; the loc scrub is belt-and-braces)."""
    import jax
    txt = _MODNAME.sub("module @m", _LOC.sub("", lowered.as_text()))
    d = jax.devices()[0]
    h = hashlib.sha256()
    h.update(txt.encode())
    h.update(jax.__version__.encode())
    h.update(str((d.platform, getattr(d, "device_kind", ""),
                  jax.device_count())).encode())
    h.update(extra.encode())
    return h.hexdigest()[:32]


def aot_compile(jitted, example_args, cache_dir: Optional[str],
                tag: str = "prog"):
    """Compile ``jitted`` for ``example_args``, with a disk round-trip.

    Returns a ``jax.stages.Compiled``. When ``cache_dir`` holds an artifact
    whose program hash matches, the executable is DESERIALIZED (no compile);
    otherwise it is compiled and, if the backend supports executable
    serialization, written for the next process. ``cache_dir=None`` just
    compiles."""
    lowered = jitted.lower(*example_args)
    if not cache_dir:
        return lowered.compile()
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    key = program_key(lowered)
    path = os.path.join(cache_dir, f"{tag}-{key}.jaxexec")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = _PayloadUnpickler(f).load()
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            import jax
            devs = None
            ids = payload.get("device_ids")
            if ids is not None:
                by_id = {d.id: d for d in jax.devices()}
                devs = [by_id[i] for i in ids]
            compiled = deserialize_and_load(
                payload["bytes"], payload["in_tree"], payload["out_tree"],
                execution_devices=devs)
            logger.info("aot: loaded %s (%d MB, no compile)", path,
                        os.path.getsize(path) >> 20)
            return compiled
        except Exception as e:  # noqa: BLE001 - stale/corrupt/unsupported
            logger.warning("aot: load of %s failed (%r); recompiling",
                           path, e)
    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize
        blob, in_tree, out_tree = serialize(compiled)
        # record the executable's device assignment: deserialize_and_load
        # defaults to ALL of the backend's devices, which breaks a 1-device
        # program loaded under a multi-device (e.g. virtual 8-CPU) backend
        try:
            device_ids = [d.id for d in
                          compiled._executable.xla_executable.local_devices()]
        except Exception:  # noqa: BLE001 - layout varies across backends
            device_ids = None
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump({"bytes": blob, "in_tree": in_tree,
                         "out_tree": out_tree, "device_ids": device_ids}, f)
        os.replace(tmp, path)
        logger.info("aot: serialized %s (%d MB)", path,
                    os.path.getsize(path) >> 20)
    except Exception as e:  # noqa: BLE001 - backend may not support it
        logger.info("aot: serialization unavailable (%r)", e)
    return compiled
