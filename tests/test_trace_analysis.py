"""Trace attribution utility (utils/trace_analysis.py) on a synthetic
chrome-trace file."""
import gzip
import json
import os

from fast_nnunet_tpu.utils.trace_analysis import (attribute_trace,
                                                  format_attribution)


def test_attribution_buckets_and_containers(tmp_path):
    events = [
        # containers (excluded)
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.1", "dur": 99_000_000},
        {"ph": "X", "pid": 3, "tid": 3, "name": "jit_sweep", "dur": 5},
        # other pid/tid (excluded)
        {"ph": "X", "pid": 1, "tid": 3, "name": "copy.9", "dur": 7_000_000},
        # leaves
        {"ph": "X", "pid": 3, "tid": 3, "name": "convolution.5",
         "dur": 2_000_000},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.12.remat",
         "dur": 1_000_000},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.144", "dur": 500_000},
        {"ph": "X", "pid": 3, "tid": 3,
         "name": "tpu_custom_call.accumulate", "dur": 250_000},
        {"ph": "X", "pid": 3, "tid": 3, "name": "iota_reduce_fusion.1",
         "dur": 250_000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    att = attribute_trace(str(tmp_path))
    assert abs(att["total_s"] - 4.0) < 1e-9
    b = dict(att["buckets"])
    assert b["convolution"] == 2.0
    assert b["fusion(misc)"] == 1.0
    assert b["copy"] == 0.5
    assert b["pallas(custom-call)"] == 0.25
    assert b["reduce(instnorm/argmax)"] == 0.25
    txt = format_attribution(att)
    assert "device leaf total: 4.00 s" in txt and "convolution" in txt
