"""First-class profiling hooks (SURVEY §5: the reference only has coarse epoch
timers; the TPU build adds jax.profiler traces and per-phase timing)."""
import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulating per-phase wall timers: with timer.phase('fwd'): ..."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])}

    def report(self) -> str:
        return "\n".join(f"  {k:<24s} {v['total_s']:>9.2f}s  x{v['count']:<6d} "
                         f"{v['mean_ms']:>8.2f} ms/it"
                         for k, v in self.summary().items())


@contextlib.contextmanager
def maybe_jax_trace(trace_dir: Optional[str] = None):
    """Wrap a region in a jax.profiler trace when FNNT_PROFILE_DIR (or the
    argument) is set; no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("FNNT_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


def environment_summary() -> dict:
    """debug.json-style environment dump (ref nnUNetTrainer.py:268-301)."""
    import platform
    import socket
    info = {
        "hostname": socket.gethostname(),
        "python": platform.python_version(),
        "platform": platform.platform(),
        "cpu_count": os.cpu_count(),
    }
    try:
        import jax
        info["jax_version"] = jax.__version__
        info["devices"] = [str(d) for d in jax.devices()]
        info["default_backend"] = jax.default_backend()
    except Exception as e:
        info["jax_error"] = str(e)
    for var in ("nnUNet_raw", "nnUNet_preprocessed", "nnUNet_results",
                "JAX_PLATFORMS", "XLA_FLAGS", "FNNT_ITERS_PER_EPOCH"):
        if var in os.environ:
            info.setdefault("env", {})[var] = os.environ[var]
    return info
