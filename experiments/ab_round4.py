"""Round-4 hardware A/B harness: the round-3 Pallas kernel suite vs the XLA
default, judged by DEVICE time (jax.profiler traces) — wall clock through the
dev tunnel carries 2-5x dispatch noise (docs/Performance.md round-3), so the
trace is the only reliable optimization signal.

Variants (cumulative kernels over the default s2d-domain sweep):
    base        s2d sweep, all Pallas kernels off (round-3 shipped default)
    stats       + one-pass InstanceNorm moments (ops/pallas_stats.py)
    fin         + grouped-argmax finalize, no relayout copy (ops/pallas_finalize.py)
    s2dk        + fused head+gaussian+accumulate RMW (ops/pallas_s2d.py)
    s2dk_fin    s2dk + fin together = cyclic accumulator, no per-chunk shift
    all         stats + s2dk + fin

Usage: python experiments/ab_round4.py base stats fin ...   (one per call is
fine; each prints ONE JSON line and appends the full attribution to
/tmp/ab_round4_log.txt for docs/Performance.md.)
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZE = int(os.environ.get("AB_SIZE", 512))
CLASSES = int(os.environ.get("AB_CLASSES", 61))
REPEATS = int(os.environ.get("AB_REPEATS", 3))
LOG = os.environ.get("AB_LOG", "/tmp/ab_round4_log.txt")

VARIANTS = {
    "base":     dict(stats=False, fin=False, s2dk=False),
    "stats":    dict(stats=True,  fin=False, s2dk=False),
    "fin":      dict(stats=False, fin=True,  s2dk=False),
    "s2dk":     dict(stats=False, fin=False, s2dk=True),
    "s2dk_fin": dict(stats=False, fin=True,  s2dk=True),
    "all":      dict(stats=True,  fin=True,  s2dk=True),
}


def run_variant(name: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net
    from fast_nnunet_tpu.utils.trace_analysis import (attribute_trace,
                                                      format_attribution)

    v = VARIANTS[name]
    net = _bone_turbo_student(num_classes=CLASSES, dtype=jnp.bfloat16)
    patch = (96, 96, 160)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *patch, 1), jnp.bfloat16),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, _bone_turbo_student_kwargs(), CLASSES,
                              dtype=jnp.bfloat16, use_pallas_stats=v["stats"])
    params = s2d.convert_params(params)
    engine = SlidingWindowEngine(
        s2d, patch, CLASSES, tile_step_size=0.5, use_gaussian=True,
        mirror_axes=(), compute_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
        sweep_acc_dtype=jnp.bfloat16, shape_bucket=32, tile_batch=8,
        max_accumulator_bytes=4 * 1024 ** 3, use_s2d_sweep=True,
        use_pallas_s2d=v["s2dk"], use_pallas_finalize=v["fin"])

    rng = np.random.RandomState(0)
    vol = (rng.rand(1, SIZE, SIZE, SIZE).astype(np.float32) - 0.5) * 2

    t0 = time.perf_counter()
    seg = engine.predict_segmentation(params, vol)  # compile + warmup
    compile_wall = time.perf_counter() - t0
    assert seg.shape == (SIZE, SIZE, SIZE)

    walls = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        engine.predict_segmentation(params, vol)
        walls.append(round(time.perf_counter() - t0, 2))

    trace_dir = tempfile.mkdtemp(prefix=f"ab4_{name}_")
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        engine.predict_segmentation(params, vol)
        traced_wall = time.perf_counter() - t0
    att = attribute_trace(trace_dir)

    res = {"variant": name, "device_s": round(att["total_s"], 2),
           "walls": walls, "traced_wall": round(traced_wall, 2),
           "compile_wall": round(compile_wall, 1),
           "buckets": [(k, round(s, 2)) for k, s in att["buckets"][:8]],
           "checksum": int(np.asarray(seg, np.int64).sum())}
    with open(LOG, "a") as f:
        f.write(f"\n=== {name} (size {SIZE}, K {CLASSES}) ===\n")
        f.write(json.dumps(res) + "\n")
        f.write(format_attribution(att) + "\n")
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    names = sys.argv[1:] or ["base"]
    for n in names:
        try:
            run_variant(n)
        except Exception as e:  # noqa: BLE001 - record and continue the sweep
            import traceback
            with open(LOG, "a") as f:
                f.write(f"\n=== {n} FULL TRACEBACK ===\n")
                f.write(traceback.format_exc())
            msg = {"variant": n, "error": repr(e)[:400]}
            with open(LOG, "a") as f:
                f.write(json.dumps(msg) + "\n")
            print(json.dumps(msg))
