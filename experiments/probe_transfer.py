"""Decompose the turbo pipeline's wall-minus-device gap on the real chip:
H2D upload, dispatch+device, D2H fetch, and the host nearest revert, each
timed separately. Round-2 measured H2D at 358 MB/s while the round-4
host-revert win implies D2H ~36 MB/s — this probe replaces that inference
with one measurement so the next wall cut targets the right term.

Run: python experiments/probe_transfer.py [--size 512]
(round-2 lesson: block_until_ready is unreliable on the axon backend —
every timing here fetches real bytes to sync.)
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--classes", type=int, default=61)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import (TurboConfig, TurboPipeline,
                                                 _nearest_revert_host)
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net
    from fast_nnunet_tpu.utils.synthetic_ct import make_synthetic_ct

    num_classes = args.classes
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
        max_accumulator_bytes=4 * 1024 ** 3, use_s2d_sweep=True)
    cfg = TurboConfig.from_ini(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "engine", "config", "fast_nnunet_bone_turbo.ini"))
    pipe = TurboPipeline(engine, cfg, air_skip=True, host_revert=True)

    size = (args.size, args.size, max(64, int(round(args.size * 500 / 512))))
    vol, spacing = make_synthetic_ct(size, (0.8, 0.8, 1.0))
    mb = vol.nbytes / 1e6

    # ---- end-to-end wall (the bench number), also compiles everything
    walls = []
    for _ in range(args.repeats + 1):
        t0 = time.perf_counter()
        pipe.predict_volume(params, vol, spacing)
        walls.append(round(time.perf_counter() - t0, 2))
    print(f"predict_volume walls (run 0 = compile): {walls}", flush=True)

    # ---- replicate predict_volume's setup to call the device program directly
    volume = vol[None]
    vol_t = np.transpose(volume, [0] + [a + 1 for a in cfg.transpose_forward])
    spacing_t = [float(spacing[a]) for a in cfg.transpose_forward]
    new_shape = tuple(int(round(s * sp / tsp)) for s, sp, tsp in zip(
        vol_t.shape[1:], spacing_t, cfg.target_spacing))
    new_shape = tuple(max(n, p) for n, p in zip(new_shape, engine.patch_size))
    vol_shape, _ = engine.s2d_sweep_plan(new_shape)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[params])
    full, coords_b, valid_b = pipe._full_program(
        vol_t.shape[1:], new_shape, vol_shape, 1)

    # ---- H2D only: upload + sync via a 1-element fetch
    for what, arr in (("volume int16", volume),):
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            d = jnp.asarray(arr)
            _ = np.asarray(d[0, 0, 0, :1])  # sync
            ts.append(time.perf_counter() - t0)
            del d
        rate = [round(arr.nbytes / 1e6 / t, 1) for t in ts]
        print(f"H2D {what} ({arr.nbytes/1e6:.0f} MB): "
              f"{[round(t, 2) for t in ts]} s  ({rate} MB/s)", flush=True)

    # ---- dispatch + device only: args pre-resident, fetch 1 element
    d_vol = jnp.asarray(volume)
    _ = np.asarray(d_vol[0, 0, 0, :1])
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        seg_d = full(stacked, d_vol, coords_b, valid_b)
        _ = np.asarray(seg_d[:1, :1, :1])  # sync without fetching the mask
        ts.append(round(time.perf_counter() - t0, 2))
    print(f"dispatch+device (1-elem sync): {ts} s", flush=True)

    # ---- D2H only: fetch the coarse mask that is already on device
    ts, rates = [], []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        seg = np.asarray(seg_d)
        dt = time.perf_counter() - t0
        ts.append(round(dt, 2))
        rates.append(round(seg.nbytes / 1e6 / dt, 1))
    print(f"D2H coarse mask ({seg.nbytes/1e6:.0f} MB): {ts} s ({rates} MB/s)",
          flush=True)

    # ---- host nearest revert
    ts = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        _ = _nearest_revert_host(seg, vol_t.shape[1:])
        ts.append(round(time.perf_counter() - t0, 2))
    print(f"host nearest revert -> {vol_t.shape[1:]}: {ts} s", flush=True)

    # ---- params upload cost (stacked tree measured leaf by leaf)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(stacked))
    print(f"stacked params: {nbytes/1e6:.1f} MB (uploaded once per process, "
          f"device-resident across runs)", flush=True)


if __name__ == "__main__":
    main()
