"""Bit-identity + device-time A/B of the Pallas grouped-argmax finalize
kernel (ops/pallas_finalize.py) on the TURBO contract (normalize + resample
+ s2d sweep + revert in one device call) — the raw-grid A/B in
docs/Performance.md round-4 showed bit-identical and -0.08 s; this checks
the same holds on the bench's actual default contract before flipping the
kernel to default (VERDICT round-3 #1 "flip winners to default").

Run on the real chip:  python experiments/ab_finalize_turbo.py [--size 256]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(use_finalize: bool, num_classes: int):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    net = _bone_turbo_student(num_classes=num_classes, dtype=jnp.bfloat16)
    patch = (96, 96, 160)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *patch, 1), jnp.bfloat16),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, _bone_turbo_student_kwargs(), num_classes,
                              dtype=jnp.bfloat16)
    params = s2d.convert_params(params)
    engine = SlidingWindowEngine(
        s2d, patch, num_classes, tile_step_size=0.5, use_gaussian=True,
        mirror_axes=(), compute_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
        sweep_acc_dtype=jnp.bfloat16, shape_bucket=32, tile_batch=8,
        max_accumulator_bytes=4 * 1024 ** 3, use_s2d_sweep=True,
        use_pallas_finalize=use_finalize)
    cfg = TurboConfig.from_ini(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "engine", "config", "fast_nnunet_bone_turbo.ini"))
    pipe = TurboPipeline(engine, cfg, air_skip=True, host_revert=True)
    return pipe, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--classes", type=int, default=61)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from fast_nnunet_tpu.utils.synthetic_ct import make_synthetic_ct

    size = (args.size, args.size, max(64, int(round(args.size * 500 / 512))))
    vol, spacing = make_synthetic_ct(size, (0.8, 0.8, 1.0))

    results = {}
    for use in (False, True):
        pipe, params = build(use, args.classes)
        seg = np.asarray(pipe.predict_volume(params, vol, spacing))  # compile
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            pipe.predict_volume(params, vol, spacing)
            walls.append(round(time.perf_counter() - t0, 2))
        results[use] = (seg, walls)
        print(f"finalize={use}: walls={walls}", flush=True)

    a, b = results[False][0], results[True][0]
    same = np.array_equal(a, b)
    agree = float((a == b).mean())
    print(f"bit_identical={same} agree={agree:.6f}")
    if not same:
        diff = np.argwhere(a != b)
        print(f"n_diff={len(diff)} first={diff[:5].tolist()}")


if __name__ == "__main__":
    main()
