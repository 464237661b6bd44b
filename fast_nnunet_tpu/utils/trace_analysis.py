"""Device-time attribution from a jax.profiler trace (the round-3 recipe).

jax.profiler.trace works through the axon tunnel; the XLA-ops timeline lives
at pid=3/tid=3 of the chrome-trace JSON, `while`/`cond`/`jit_*` rows are
containers (their children carry the time), and grouping leaf durations by
op-name prefix reproduces the attribution tables in docs/Performance.md.

Usage:
    with jax.profiler.trace(trace_dir):
        run_the_program()
    print(format_attribution(attribute_trace(trace_dir)))

Ref role: the reference ships no profiler integration (its perf numbers are
wall-clock, docs/Engine.md:31-33); this is the TPU-native observability the
SURVEY §5 tracing row calls for.
"""
import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Tuple

_CONTAINER = re.compile(r"(while|cond|jit_)")

_BUCKETS = [
    ("convolution", lambda n: n.startswith("convolution")
     or ".convolution" in n),
    ("dus(acc RMW/seg)", lambda n: n.startswith("dynamic_update_slice")),
    ("dynamic_slice(gather)", lambda n: n.startswith("dynamic_slice")),
    ("reduce(instnorm/argmax)", lambda n: "reduce" in n),
    ("copy", lambda n: n.startswith("copy")),
    ("compare_select", lambda n: n.startswith("compare_select")),
    ("transpose", lambda n: n.startswith("transpose")),
    ("pallas(custom-call)", lambda n: "custom-call" in n or "tpu_custom_call"
     in n or n.startswith("pallas")),
    ("fusion(misc)", lambda n: n.startswith("fusion")),
]


def _latest_trace_file(trace_dir: str) -> str:
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return files[-1]


def attribute_trace(trace_dir: str, pid: int = 3, tid: int = 3
                    ) -> Dict[str, object]:
    """Parse the newest trace under trace_dir; return bucket + top-op tables.

    Returns {"total_s", "buckets": [(name, seconds)...],
             "top_ops": [(op_name, seconds)...]}; durations are device leaf
    time (containers excluded)."""
    with gzip.open(_latest_trace_file(trace_dir)) as f:
        tr = json.load(f)
    leaves = [e for e in tr["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == pid
              and e.get("tid") == tid and not _CONTAINER.match(e["name"])]
    buckets: collections.Counter = collections.Counter()
    top: collections.Counter = collections.Counter()
    for e in leaves:
        n, dur = e["name"], e["dur"]
        top[n] += dur
        for bname, pred in _BUCKETS:
            if pred(n):
                buckets[bname] += dur
                break
        else:
            buckets["other:" + n.split(".")[0]] += dur
    total = sum(buckets.values())
    return {"total_s": total / 1e6,
            "buckets": [(k, v / 1e6) for k, v in buckets.most_common()],
            "top_ops": [(k, v / 1e6) for k, v in top.most_common(15)]}


def format_attribution(att: Dict[str, object]) -> str:
    lines = [f"device leaf total: {att['total_s']:.2f} s"]
    for name, sec in att["buckets"]:
        lines.append(f"  {name:<32s} {sec:7.2f} s "
                     f"{100 * sec / max(att['total_s'], 1e-9):5.1f}%")
    lines.append("top ops:")
    for name, sec in att["top_ops"]:
        lines.append(f"  {name[:70]:<70s} {sec:6.2f} s")
    return "\n".join(lines)
