"""Trace probe: run the driver-default 512^3 x 61 s2d sweep once under
jax.profiler.trace and print the device-time attribution (the round-3
A/B recipe — device time is constant; the tunnel wall-clock is 2-3x noisy,
so variant decisions are made here, not on bench.py walls).

Usage: [BENCH_* env flags] python experiments/probe_trace.py [--size 512]
           [--repeats 2] [--no_trace]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--classes", type=int, default=61)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no_trace", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net
    from fast_nnunet_tpu.utils.trace_analysis import (attribute_trace,
                                                      format_attribution)

    num_classes = args.classes
    net = _bone_turbo_student(num_classes=num_classes, dtype=jnp.bfloat16)
    patch = (96, 96, 160)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *patch, 1), jnp.bfloat16),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, _bone_turbo_student_kwargs(), num_classes,
                              dtype=jnp.bfloat16)
    if s2d is None:
        print("error: architecture is not s2d-transformable "
              "(make_s2d_engine_net returned None)", file=sys.stderr)
        sys.exit(1)
    params = s2d.convert_params(params)
    engine = SlidingWindowEngine(
        s2d, patch, num_classes, tile_step_size=0.5, use_gaussian=True,
        mirror_axes=(), compute_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
        sweep_acc_dtype=jnp.bfloat16, shape_bucket=32,
        tile_batch=int(os.environ.get("BENCH_TILE_BATCH", 8)),
        max_accumulator_bytes=4 * 1024 ** 3, use_s2d_sweep=True,
        use_pallas_s2d=os.environ.get("BENCH_PALLAS_S2D", "0") == "1",
        use_pallas_finalize=os.environ.get("BENCH_PALLAS_FINALIZE", "0") == "1")

    rng = np.random.RandomState(0)
    vol = (rng.rand(1, args.size, args.size, args.size)
           .astype(np.float32) - 0.5) * 2

    t0 = time.perf_counter()
    seg = engine.predict_segmentation(params, vol)
    print(f"warmup (compile): {time.perf_counter() - t0:.1f} s; "
          f"seg sum={int(np.asarray(seg, np.int64).sum())}", flush=True)

    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        engine.predict_segmentation(params, vol)
        walls.append(round(time.perf_counter() - t0, 2))
    print("timed walls:", walls, flush=True)

    if not args.no_trace:
        trace_dir = tempfile.mkdtemp(prefix="fnn_trace_")
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            engine.predict_segmentation(params, vol)
            traced_wall = time.perf_counter() - t0
        print(f"traced wall: {traced_wall:.2f} s")
        print(format_attribution(attribute_trace(trace_dir)))


if __name__ == "__main__":
    main()
