"""Quantify what air skipping and the fill-bbox crop actually remove on the
realistic whole-body phantom (round-4 VERDICT weak #6: the '30-50% air'
value claims were projections; here the mechanisms' own decisions are
replayed host-side in numpy — identical math, no device programs — on the
same 512x512x500 HU phantom bench.py uses).

Reports:
  - upload bytes with/without the fill-bbox crop (TurboPipeline's
    _nonfill_bbox + bucket rounding, exactly as the streamed path crops);
  - tile/batch air statistics under the engine's sweep grid: exact per-tile
    all-air fraction, the conservative 8^3-block test the fused program
    uses, and the fraction of whole tile BATCHES skipped (compute is only
    saved when every tile in a batch is air — single tiles just get zero
    gaussian weight).

Usage: python experiments/measure_skip_crop.py [--size 512]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--classes", type=int, default=61)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import (
        TurboConfig, TurboPipeline, _fill_bf16_bits, _nonfill_bbox,
        _bucket_extent)
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net
    from fast_nnunet_tpu.utils import hostops
    from fast_nnunet_tpu.utils.synthetic_ct import make_synthetic_ct

    assert hostops.available(), "build engine/ first (libfnn_hostops.so)"

    num_classes = args.classes
    patch = (96, 96, 160)
    net = _bone_turbo_student(num_classes=num_classes, dtype=jnp.bfloat16)
    s2d = make_s2d_engine_net(net, _bone_turbo_student_kwargs(), num_classes,
                              dtype=jnp.bfloat16)
    eng = SlidingWindowEngine(
        s2d, patch, num_classes, tile_step_size=0.5, use_gaussian=True,
        mirror_axes=(), compute_dtype=jnp.bfloat16, shape_bucket=32,
        tile_batch=8, use_s2d_sweep=True)
    cfg = TurboConfig.from_ini(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "engine", "config", "fast_nnunet_bone_turbo.ini"))
    pipe = TurboPipeline(eng, cfg, air_skip=True)

    size = (args.size, args.size, max(64, int(round(args.size * 500 / 512))))
    vol, spacing = make_synthetic_ct(size, (0.8, 0.8, 1.0))

    # ---- the exact upload the turbo path builds (host preprocess) --------
    tf = cfg.transpose_forward
    spacing_t = tuple(np.asarray(spacing, np.float64)[tf])
    shape_t = tuple(np.asarray(vol.shape)[tf])
    new_shape = tuple(int(round(s / t * n)) for s, t, n in zip(
        spacing_t, cfg.target_spacing, shape_t))
    new_shape = tuple(max(n, p) for n, p in zip(new_shape, eng.patch_size))
    inv = cfg.transpose_backward
    new_shape_img = tuple(new_shape[inv[p]] for p in range(3))
    chs = cfg.channels
    grid = hostops.preprocess_ct_i16(
        vol[None], new_shape_img,
        [c["lower_bound"] for c in chs], [c["upper_bound"] for c in chs],
        [c["mean"] for c in chs], [c["std"] for c in chs])
    assert grid is not None

    bits = [_fill_bf16_bits(c) for c in chs]
    lo, hi = _nonfill_bbox(grid, bits, pipe.crop_bucket)
    img_shape = grid.shape[1:]
    box = tuple(_bucket_extent(lo[ax], hi[ax], img_shape[ax],
                               pipe.crop_bucket) for ax in range(3))
    full_vox = int(np.prod(img_shape))
    crop_vox = int(np.prod([b[1] - b[0] for b in box]))

    # ---- air statistics on the engine sweep grid ------------------------
    from fast_nnunet_tpu.ops.sliding_window import tile_coords_from_steps
    vol_shape, steps = eng.s2d_sweep_plan(new_shape)
    coords = tile_coords_from_steps(steps)
    # engine-order normalized volume, padded like the device program
    veng = np.transpose(np.asarray(grid, np.float32)[0], tf)
    pad = [(0, v - n) for v, n in zip(vol_shape, new_shape)]
    fill = float(np.asarray(grid[0].reshape(-1)[0]))  # corner is air fill
    veng = np.pad(veng, pad, constant_values=fill)
    thr = float(pipe.air_threshold)

    tile_air = np.empty(len(coords), bool)
    for i, c in enumerate(coords):
        t = veng[c[0]:c[0] + patch[0], c[1]:c[1] + patch[1],
                 c[2]:c[2] + patch[2]]
        tile_air[i] = t.max() <= thr

    # conservative 8^3-block test (the fused program's decision)
    bs = [-(-n // 8) * 8 for n in vol_shape]
    vb = np.pad(veng, [(0, b - n) for b, n in zip(bs, vol_shape)],
                constant_values=fill)
    blocks = vb.reshape(bs[0] // 8, 8, bs[1] // 8, 8,
                        bs[2] // 8, 8).max((1, 3, 5))
    tile_air_blk = np.empty(len(coords), bool)
    for i, c in enumerate(coords):
        b0, b1, b2 = c[0] // 8, c[1] // 8, c[2] // 8
        w = blocks[b0:b0 + patch[0] // 8 + 1, b1:b1 + patch[1] // 8 + 1,
                   b2:b2 + patch[2] // 8 + 1]
        tile_air_blk[i] = w.max() <= thr

    B = eng.tile_batch
    nb = -(-len(coords) // B)
    batch_skipped = sum(
        bool(tile_air_blk[i * B:(i + 1) * B].all())
        for i in range(nb))

    out = {
        "phantom": list(size), "resampled_grid": list(new_shape),
        "sweep_grid": list(vol_shape), "n_tiles": int(len(coords)),
        "tile_batch": B, "n_batches": nb,
        "crop_box": [list(b) for b in box],
        "upload_bytes_full": full_vox * 2 * len(chs),
        "upload_bytes_cropped": crop_vox * 2 * len(chs),
        "crop_cut_pct": round(100 * (1 - crop_vox / full_vox), 1),
        "tiles_all_air_exact_pct": round(100 * tile_air.mean(), 1),
        "tiles_all_air_block_pct": round(100 * tile_air_blk.mean(), 1),
        "batches_skipped_pct": round(100 * batch_skipped / nb, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
