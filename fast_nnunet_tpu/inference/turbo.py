"""TurboPipeline — END-TO-END on-device serving (read -> preprocess ->
sliding-window -> revert -> write), the TPU answer to the reference engine's
whole-pipeline latency claims (ref docs/Engine.md:31-33: every headline number
is read->predict->write, not network-only; the engine internals are
proprietary — ref engine/fast_nnunet.cpp is a 31-line stub — so this is free
TPU-first design space).

TPU-first decisions:
- Normalization AND resampling run ON DEVICE inside one jitted preprocess
  program (clip -> (x-mean)/std -> bf16 -> trilinear resize -> pad to the
  sweep's bucketed layout). The host ships the RAW volume once; no scipy
  multi-second spline resample on the hot path (the nnU-Net-exact cubic
  path remains the Python predictor's default for parity workloads).
- The sweep consumes the device-resident volume directly
  (SlidingWindowEngine.run_s2d_sweep / the plain sweep), so preprocess ->
  predict never round-trips the host.
- The segmentation reverts to the original grid on device too (uint8 nearest
  resize — argmax commutes with nearest interpolation), and only the final
  original-grid uint8 mask is D2H'd.
- Resize convention: half-pixel centers (jax.image.resize), matching the
  skimage/grid_mode=True convention of ops/resampling.py; trilinear without
  antialiasing, like nnU-Net's own order-1 path.
- Empty-tile (air) skipping: the preprocess program also emits a coarse
  per-block maximum map; the host thresholds it to drop all-air tile batches
  from the sweep (`air_skip=True`). Whole-body CTs are typically 30-50% air;
  the reference engine has no analogue.
"""
import argparse
import configparser
import os
import re
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from ..imageio.nifti import NiftiIOWithReorient


def _parse_tuple(s: str) -> Tuple[float, ...]:
    return tuple(float(x) for x in re.split(r"[x,()\s]+", str(s).strip()) if x)


#: device-path normalization schemes (subset of ops/normalization.py the
#: jitted preprocess program implements; class name -> short scheme tag)
_SCHEME_TAGS = {
    "CTNormalization": "ct",
    "ZScoreNormalization": "zscore",
    "NoNormalization": "nonorm",
    "RescaleTo01Normalization": "rescale01",
    "RGBTo01Normalization": "rgb01",
}


class TurboConfig:
    """bone_turbo-style deployment point (schema parity with the reference's
    engine INI, ref engine/config/fast_nnunet_bone_turbo.ini).

    Multi-channel (e.g. multi-sequence MR) inputs carry a per-channel
    ``channels`` list of scheme dicts:
    ``{"scheme": "ct", "mean": m, "std": s, "lower_bound": lb,
    "upper_bound": ub}`` or ``{"scheme": "zscore" | "rescale01" | "rgb01" |
    "nonorm"}``. ``zscore`` computes the volume's own statistics ON DEVICE
    (whole-volume stats: the turbo path does not run the nonzero crop, so
    ``use_mask_for_norm`` is approximated by whole-volume z-scoring — the
    parity-exact path is the Python predictor)."""

    def __init__(self, patch_size: Sequence[int],
                 target_spacing: Sequence[float],
                 mean: float = 0.0, std: float = 1.0,
                 lower_bound: float = -1024.0, upper_bound: float = 3071.0,
                 num_classes: int = 2,
                 step_size: float = 0.5, use_gaussian: bool = True,
                 channels: Optional[Sequence[dict]] = None):
        # INI order is (depth, height, width) = image axis order; the engine's
        # chunk axis (axis 0) must carry the SMALLEST patch extent so rolling
        # chunks fit HBM -> transpose so the 160-extent axis is last
        self.patch_size_image = tuple(int(p) for p in patch_size)
        # ascending-stable sort puts the largest patch axis LAST: for
        # bone_turbo (160,96,96) that is transpose (1,2,0) -> engine patch
        # (96,96,160) with the smallest extent on the rolling chunk axis
        self.transpose_forward = sorted(
            range(len(patch_size)), key=lambda a: self.patch_size_image[a])
        self.transpose_backward = list(np.argsort(self.transpose_forward))
        self.patch_size = tuple(self.patch_size_image[a]
                                for a in self.transpose_forward)
        self.target_spacing_image = tuple(float(s) for s in target_spacing)
        self.target_spacing = tuple(self.target_spacing_image[a]
                                    for a in self.transpose_forward)
        self.mean = float(mean)
        self.std = float(std)
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.num_classes = int(num_classes)
        self.step_size = float(step_size)
        self.use_gaussian = bool(use_gaussian)
        if channels is None:
            channels = [{"scheme": "ct", "mean": self.mean, "std": self.std,
                         "lower_bound": self.lower_bound,
                         "upper_bound": self.upper_bound}]
        self.channels = [dict(c) for c in channels]
        for c in self.channels:
            assert c.get("scheme") in ("ct", "zscore", "rescale01", "rgb01",
                                       "nonorm"), c

    @property
    def num_input_channels(self) -> int:
        return len(self.channels)

    @classmethod
    def from_ini(cls, path: str) -> "TurboConfig":
        cp = configparser.ConfigParser(inline_comment_prefixes=("#", ";"))
        cp.read(path)
        pre = cp["preprocessing"]
        return cls(
            patch_size=[int(x) for x in _parse_tuple(cp["input"]["patch_size"])],
            target_spacing=_parse_tuple(cp["input"]["target_spacing"]),
            mean=float(pre["mean"]),
            std=float(pre.get("std", pre.get("std_dev", "1.0"))),
            lower_bound=float(pre["lower_bound"]),
            upper_bound=float(pre["upper_bound"]),
            num_classes=int(cp["model"]["num_class"]),
            step_size=float(cp["inference"].get("step_size", 0.5)),
            use_gaussian=cp["inference"].getboolean("use_gaussian", True))


def _fill_bf16_bits(spec) -> int:
    """The CT fill value's exact bfloat16 bit pattern, replaying
    engine/src/host_ops.cpp's f32 arithmetic: (lb - mean) * (1/max(std,eps))
    with round-to-nearest-even to bf16."""
    import ml_dtypes
    inv = np.float32(1.0) / np.maximum(np.float32(spec["std"]),
                                       np.float32(1e-8))
    f = (np.float32(spec["lower_bound"]) - np.float32(spec["mean"])) * inv
    return int(f.astype(ml_dtypes.bfloat16).view(np.uint16))


def _nonfill_bbox(arr: np.ndarray, fill_bits, bucket: int):
    """Raw per-axis [lo, hi) extents of the voxels where ANY channel
    differs from its fill bit pattern. Returns all-zero lo and a minimal
    bucket-sized hi when nothing differs."""
    bits = arr.view(np.uint16)
    diff = np.zeros(arr.shape[1:], bool)
    for c in range(arr.shape[0]):
        diff |= bits[c] != np.uint16(fill_bits[c])
    if not diff.any():
        return ([0] * (arr.ndim - 1),
                [min(bucket, s) for s in arr.shape[1:]])
    lo, hi = [], []
    for ax in range(diff.ndim):
        other = tuple(a for a in range(diff.ndim) if a != ax)
        nz = np.flatnonzero(diff.any(axis=other))
        lo.append(int(nz[0]))
        hi.append(int(nz[-1]) + 1)
    return lo, hi


def _bucket_extent(l: int, h: int, s: int, bucket: int):
    """Floor lo to the bucket FIRST, then size the slab from the floored
    lo — sizing from the raw lo can leave [lf+size, h) uncovered."""
    lf = l // bucket * bucket
    size = min(-(-(h - lf) // bucket) * bucket, s - lf)
    return lf, lf + size


def _source_range_to_target(n_in: int, n_out: int, slo: int, shi: int):
    """Conservative map of a SOURCE-axis non-air range [slo, shi) to the
    TARGET-axis range of trilinear-output voxels that can differ from the
    fill: target j touches source samples lo[j]/hi[j] (jax.image.resize's
    half-pixel rule, f32 arithmetic like engine/src/host_ops.cpp
    linear_table); j can be non-fill only when [lo[j], hi[j]] intersects
    [slo, shi). Every excluded voxel interpolates equal clip-floor
    neighbors, so it lands on the fill bit pattern exactly — the bbox is a
    superset of the grid-scan one and crop reinsertion stays bit-exact."""
    i = np.arange(n_out, dtype=np.float32)
    x = (i + np.float32(0.5)) * (np.float32(n_in) / np.float32(n_out)) \
        - np.float32(0.5)
    lo = np.floor(x).astype(np.int64)
    hi = np.clip(lo + 1, 0, n_in - 1)
    lo = np.clip(lo, 0, n_in - 1)
    nz = np.flatnonzero((hi >= slo) & (lo <= shi - 1))
    if nz.size == 0:  # degenerate geometry; never drop voxels
        return 0, n_out
    return int(nz[0]), int(nz[-1]) + 1


def _crop_to_fill_bbox(arr: np.ndarray, fill_bits, bucket: int = 32):
    """arr: (C, d, h, w) bfloat16. Returns (crop_box, slab) where slab is
    the contiguous sub-volume outside of which EVERY channel equals its
    fill bit pattern (so padding with fill reconstructs arr exactly), with
    the slab shape rounded up to `bucket` multiples (compile-key hygiene).
    Returns (None, arr) when the bbox covers (almost) everything. A wrong
    fill pattern fails SAFE: nothing matches it, the bbox spans the whole
    array, and the crop becomes a no-op."""
    lo, hi = _nonfill_bbox(arr, fill_bits, bucket)
    box_lo, box_hi = [], []
    for l, h, s in zip(lo, hi, arr.shape[1:]):
        bl, bh = _bucket_extent(l, h, s, bucket)
        box_lo.append(bl)
        box_hi.append(bh)
    assert all(bl <= l and bh >= h
               for bl, bh, l, h in zip(box_lo, box_hi, lo, hi)), \
        (box_lo, box_hi, lo, hi)  # the slab must cover every non-fill voxel
    if all(h - l >= s for l, h, s in zip(box_lo, box_hi, arr.shape[1:])):
        return None, arr
    slab = np.ascontiguousarray(
        arr[:, box_lo[0]:box_hi[0], box_lo[1]:box_hi[1],
            box_lo[2]:box_hi[2]])
    return (tuple(box_lo), tuple(box_hi)), slab


def _fill_f64(spec) -> float:
    """Sweep-pad value in normalized units (python-float arithmetic): the
    HU clip floor for CT (air), 0 for the statistic-based schemes. This is
    the PAD-ring fill (the fused program's jnp.pad constant); the
    reinserted-slab base fill is the bf16 bit pattern `_fill_bf16_bits`."""
    if spec["scheme"] == "ct":
        return (spec["lower_bound"] - spec["mean"]) / max(spec["std"], 1e-8)
    return 0.0


def _unpack_mask6(packed: np.ndarray, shape) -> np.ndarray:
    """Inverse of the device-side 6-bit pack (4 voxels -> 3 bytes)."""
    b0, b1, b2 = packed[:, 0], packed[:, 1], packed[:, 2]
    v = np.empty((packed.shape[0], 4), np.uint8)
    v[:, 0] = b0 & 63
    v[:, 1] = (b0 >> 6) | ((b1 & 15) << 2)
    v[:, 2] = (b1 >> 4) | ((b2 & 3) << 4)
    v[:, 3] = b2 >> 2
    n = int(np.prod(shape))
    return v.reshape(-1)[:n].reshape(shape)


def _nearest_revert_host(seg: np.ndarray, out_shape) -> np.ndarray:
    """Nearest-neighbor upsample matching jax.image.resize(method="nearest")
    voxel-for-voxel: per axis, index = floor((i + 0.5) * in / out) computed in
    float32 (jax._src.image.scale._resize_nearest's exact rule)."""
    idx = [np.floor((np.arange(n, dtype=np.float32) + 0.5)
                    * np.float32(m) / np.float32(n)).astype(np.int32)
           for m, n in zip(seg.shape, out_shape)]
    return seg[np.ix_(*idx)]


class TurboPipeline:
    def __init__(self, engine, config: TurboConfig, air_skip: bool = False,
                 air_margin_hu: float = 200.0, host_revert: bool = False,
                 host_preprocess="auto"):
        """engine: a SlidingWindowEngine wrapping an S2DPlainConvUNet (built
        via make_s2d_engine_net + convert_params) whose patch/classes match
        `config` — the turbo path always runs the s2d-domain sweep.
        air_skip: drop tile batches whose voxels are all below
        lower_bound + air_margin_hu (pre-normalization HU).
        host_revert: fetch the TARGET-SPACING-grid mask and do the nearest
        revert to the original grid on the host (same half-pixel-center
        index map as jax.image.resize; voxel-identical). D2H moves the
        ~3x-smaller coarse mask instead of the original-grid mask — a win
        whenever the device link is the bottleneck (the dev tunnel runs at
        tens of MB/s; production PCIe makes this a wash).
        host_preprocess: run clip+z-score+trilinear-resample in the native
        host library (engine/src/host_ops.cpp via utils/hostops.py) and
        upload the ~3x-smaller target-spacing bf16 grid instead of the raw
        volume — the reference engine's own CPU-resample-then-infer shape
        (its INI target_spacing is applied before TensorRT sees the
        tensor). "auto" (default) = use it when the library is built, every
        channel is the CT scheme, and the input is int16; per-call fallback
        to the on-device preprocess otherwise. Implies the host revert for
        the output (the point is cutting link bytes both ways). Masks agree
        with the device path to ~1 bf16 ULP of preprocessing (pinned by
        tests/test_hostops.py); the device path stays the
        bit-reproducibility reference."""
        self.engine = engine
        self.config = config
        self.host_revert = bool(host_revert)
        if host_preprocess == "auto":
            from ..utils import hostops
            host_preprocess = (hostops.available() and
                               all(c["scheme"] == "ct"
                                   for c in config.channels))
        elif host_preprocess:
            from ..utils import hostops
            if not hostops.available():
                raise RuntimeError(
                    "host_preprocess=True but libfnn_hostops.so is not "
                    "built (cd engine && cmake -B build -G Ninja && "
                    "cmake --build build)")
            if not all(c["scheme"] == "ct" for c in config.channels):
                raise ValueError("host_preprocess supports CT channels only")
        self.host_preprocess = bool(host_preprocess)
        # slab-shape rounding for the fill-bbox upload crop (compile-key
        # hygiene: fewer distinct slab shapes -> fewer compiles)
        self.crop_bucket = int(os.environ.get("FNN_HOST_CROP_BUCKET", "32"))
        # 6-bit mask packing for the host-revert D2H (4 voxels -> 3 bytes,
        # lossless): only meaningful when the host fetches the coarse mask
        self.pack_mask = config.num_classes <= 64
        ch0 = config.channels[0]
        if air_skip and ch0["scheme"] != "ct":
            print("[turbo] air skipping needs a CT (HU-calibrated) channel 0; "
                  f"disabled for scheme {ch0['scheme']!r}")
            air_skip = False
        self.air_skip = bool(air_skip)
        # threshold in NORMALIZED units (the device program sees normalized
        # data): clip floor maps to (lower-mean)/std; skip decisions read
        # channel 0 only (the HU channel)
        if ch0["scheme"] == "ct":
            self.air_threshold = (min(ch0["lower_bound"] + air_margin_hu,
                                      ch0["upper_bound"])
                                  - ch0["mean"]) / ch0["std"]
        else:
            self.air_threshold = float("-inf")
        self._jit_cache = {}

    # ------------------------------------------------------------- device program
    def _full_program(self, in_shape, new_shape, vol_shape, n_folds: int,
                      pre_resampled: bool = False, crop_box=None):
        """ONE jitted program for the whole pipeline: normalize -> trilinear
        resample -> (air-flag computation on device) -> s2d sweep -> nearest
        revert to the original grid. Per-call dispatch through a tunneled
        runtime costs seconds, so the former three-dispatch design
        (preprocess / sweep / revert with a block-max D2H in between) is
        fused into a single device call per CT. Returns
        (fn(stacked_params, raw) -> seg(in_shape) uint8, coords_b, valid_b).

        raw is (C, *in_shape); each channel normalizes per its
        ``TurboConfig.channels`` scheme on device (CT clip+zscore with plan
        statistics, per-volume z-score with device-computed statistics,
        rescale-to-01, rgb/255, or none — ref
        distillation/nnunetv2/preprocessing/normalization/default_normalization_schemes.py:27-97)."""
        key = ("full", in_shape, new_shape, vol_shape, n_folds,
               self.air_skip, round(float(self.air_threshold), 6),
               self.host_revert, pre_resampled, self.pack_mask, crop_box)
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax
        import jax.numpy as jnp
        from jax import lax
        from ..ops.sliding_window import tile_coords_from_steps

        cfg = self.config
        eng = self.engine
        patch = eng.patch_size
        _, steps = eng.s2d_sweep_plan(new_shape)
        starts_x = tuple(steps[0])
        coords_yz = tile_coords_from_steps(steps[1:])
        coords_full = np.concatenate(
            [np.zeros((len(coords_yz), 1), np.int32), coords_yz], axis=1)
        coords_b, valid_b = eng._batched_coords(coords_full)
        nb, B = valid_b.shape
        n_chunks = len(starts_x)
        n_ch = cfg.num_input_channels
        builder = eng._build_sweep_runner_s2d_skip if self.air_skip \
            else eng._build_sweep_runner_s2d
        sweep = builder(vol_shape, starts_x, nb, n_folds, n_ch)

        def _normalize(xc, spec):
            # one channel, fp32; mirrors ops/normalization.py on device
            s = spec["scheme"]
            if s == "ct":
                xc = jnp.clip(xc, spec["lower_bound"], spec["upper_bound"])
                return (xc - spec["mean"]) / max(spec["std"], 1e-8)
            if s == "zscore":
                return (xc - xc.mean()) / jnp.maximum(xc.std(), 1e-8)
            if s == "rescale01":
                xc = xc - xc.min()
                return xc / jnp.clip(xc.max(), 1e-8)
            if s == "rgb01":
                return xc / 255.0
            return xc  # nonorm

        _fill = _fill_f64
        fill = _fill(cfg.channels[0])
        pad = [(0, v - n) for v, n in zip(vol_shape, new_shape)]
        thr = float(self.air_threshold)
        compute_dtype = eng.compute_dtype

        # static air-flag gather indices: tile (chunk ci, slot t) covers
        # blocks [idx, idx + win) per axis on the 8^3 block grid
        win = tuple(p // 8 + 1 for p in patch)
        bs = [(-(-n // 8)) * 8 for n in new_shape]
        xi = np.asarray([x0 // 8 for x0 in starts_x], np.int32)
        flat = coords_b.reshape(-1, 3)
        yi = np.asarray(flat[:, 1] // 8, np.int32)
        zi = np.asarray(flat[:, 2] // 8, np.int32)

        # plans transpose runs ON DEVICE (XLA folds it into the resample
        # gather): uploading the reader's original-order buffer avoids a
        # host-side strided copy of the whole volume (~0.65 s for a 512^3
        # int16 CT on a 1-core host) per prediction
        t_fwd = (0,) + tuple(a + 1 for a in cfg.transpose_forward)

        @jax.jit
        def full(stacked_params, raw, coords_b_d, valid_b_d):
            if pre_resampled:
                # raw: (C, *untransposed new_shape) bf16, already clipped,
                # z-scored, and trilinear-resampled by the native host op
                # (engine/src/host_ops.cpp) — only transpose remains
                xs = jnp.transpose(raw, t_fwd).astype(compute_dtype)
                if crop_box is not None:
                    # raw was only the non-fill bounding slab (the host
                    # crops what the CT clip floor made exactly equal to
                    # the fill — air): rebuild the full grid by inserting
                    # the slab into fill at its STATIC offset. The inserted
                    # fill must carry the HOST slab's exact air bit pattern
                    # (f32 arithmetic rounded to bf16, _fill_bf16_bits) —
                    # _fill() in float64 differs by an ULP for non-bf16-
                    # representable fills, shifting air-region logits
                    off = tuple(int(crop_box[0][p])
                                for p in cfg.transpose_forward)
                    import ml_dtypes
                    fills = [np.asarray(_fill_bf16_bits(cfg.channels[c]),
                                        np.uint16).view(ml_dtypes.bfloat16)
                             for c in range(n_ch)]
                    xs = jnp.stack([
                        lax.dynamic_update_slice(
                            jnp.full(new_shape, jnp.asarray(
                                fills[c], jnp.bfloat16), compute_dtype),
                            xs[c], off)
                        for c in range(n_ch)])
            else:
                # raw: (C, *untransposed in_shape) in the on-disk dtype
                raw_t = jnp.transpose(raw, t_fwd)
                chans = [_normalize(raw_t[c].astype(jnp.float32),
                                    cfg.channels[c]) for c in range(n_ch)]
                # one batched trilinear resize over all channels
                xs = jax.image.resize(jnp.stack(chans), (n_ch, *new_shape),
                                      method="trilinear",
                                      antialias=False).astype(compute_dtype)
            x = xs[0]  # channel 0 drives air skipping
            xp = jnp.stack(
                [jnp.pad(xs[c], pad,
                         constant_values=_fill(cfg.channels[c]))
                 for c in range(n_ch)], axis=-1)

            if self.air_skip:
                # 8^3 block maxima over the air-padded resampled volume, then
                # sliding-box maxima (reduce_window) give per-tile maxima at
                # static gather indices — the whole skip decision stays on
                # device; partial edge blocks are padded with the air floor
                # so they can never hide body voxels
                xb = jnp.pad(x, [(0, b - n) for b, n in zip(bs, new_shape)],
                             constant_values=fill)
                blocks = xb.reshape(bs[0] // 8, 8, bs[1] // 8, 8,
                                    bs[2] // 8, 8).max((1, 3, 5))
                neg = jnp.asarray(-jnp.inf, blocks.dtype)
                boxmax = lax.reduce_window(
                    blocks, neg, lax.max, win, (1, 1, 1),
                    [(0, w - 1) for w in win])
                flags = boxmax[xi[:, None], yi[None, :], zi[None, :]] > thr
                valid_chunks = flags.reshape(n_chunks, nb, B).astype(
                    jnp.float32) * valid_b_d[None]
                seg = sweep(stacked_params, xp, coords_b_d, valid_chunks)
            else:
                seg = sweep(stacked_params, xp, coords_b_d, valid_b_d)

            s = lax.slice(seg, (0, 0, 0), new_shape)
            if self.host_revert or pre_resampled:
                # coarse target-spacing mask; host does the revert. With
                # <= 64 classes the labels are 6-bit: pack 4 voxels into 3
                # bytes on device so D2H ships 25% fewer bytes (lossless;
                # host unpack is ~10 vectorized uint8 ops)
                if self.pack_mask:
                    n = int(np.prod(new_shape))
                    flat = s.reshape(-1)
                    if n % 4:
                        flat = jnp.concatenate(
                            [flat, jnp.zeros(((-n) % 4,), jnp.uint8)])
                    q = flat.reshape(-1, 4)
                    b0 = q[:, 0] | (q[:, 1] << 6)
                    b1 = (q[:, 1] >> 2) | (q[:, 2] << 4)
                    b2 = (q[:, 2] >> 4) | (q[:, 3] << 2)
                    return jnp.stack([b0, b1, b2], axis=-1)
                return s
            return jax.image.resize(s, in_shape, method="nearest")

        entry = (full, jnp.asarray(coords_b), jnp.asarray(valid_b))
        self._jit_cache[key] = entry
        return entry

    # ------------------------------------------------------------- streamed pipeline
    def _predict_streamed(self, stacked, grid, new_shape, n_folds: int,
                          lazy=None):
        """STREAMED turbo sweep: one jitted program per x-chunk so the strip
        uploads and finalized-row fetches OVERLAP device compute.

        The fused single-dispatch program (`_full_program`) serializes
        H2D -> sweep -> D2H; through a slow device link (the dev tunnel runs
        at 15-40 MB/s; experiments/probe_overlap.py measured pipelined
        strips+compute at max(transfer, compute) instead of the sum) the
        wall is their SUM. Here the host device_puts cropped bf16 x-strips
        two chunks ahead, each chunk program (donated rolling accumulator +
        slab) accumulates its tile grid, finalizes its OWNED rows (the rows
        no later tile touches), packs them, and hands them back via
        copy_to_host_async while later chunks compute.

        Numerics: per-chunk accumulate/finalize mirror the fused s2d sweep
        op-for-op (engine.py _build_sweep_runner_s2d), so masks match the
        fused path bit-for-bit with air_skip off. With air_skip on, the
        per-chunk air test uses the tile's EXACT x extent (the slab) where
        the fused program uses a conservative 8-voxel-aligned window — the
        streamed path skips strictly more all-air tiles; differences are
        confined to air regions (pinned by tests/test_turbo_stream.py).

        grid: (C, *new_shape_img) bf16 host-preprocessed volume (image axis
        order, from engine/src/host_ops.cpp) — or None with `lazy` set, in
        which case each x-strip is preprocessed from the RAW int16 volume
        on demand (hostops.preprocess_ct_i16_box, bit-identical per voxel
        to the whole-grid call) right when it is device_put: the ~1.2 s
        single-core C++ preprocess then overlaps the earlier strips'
        transfers and the device compute instead of preceding them. The
        crop bbox comes from a native raw-HU scan (hostops.nonair_bbox_i16)
        mapped conservatively to the target grid (_source_range_to_target);
        the extra included voxels are exactly-fill, so masks stay bit-equal
        to the fused path. lazy = {"raw": (C,D,H,W) int16 image-order
        volume, "img_shape": new_shape in image axis order}.

        Returns the uint8 seg on the engine-order new_shape grid, or None
        when the path does not apply (single chunk / pallas-s2d grid / odd
        rolls / lazy without box-capable hostops)."""
        import functools

        import jax
        import jax.numpy as jnp
        import ml_dtypes
        from jax import lax

        from ..ops.sliding_window import tile_coords_from_steps

        cfg = self.config
        eng = self.engine
        patch = eng.patch_size
        p0 = patch[0]
        if eng.use_pallas_s2d or eng.mirror_axes or p0 % 2:
            return None
        vol_shape, steps = eng.s2d_sweep_plan(new_shape)
        starts_x = [int(s) for s in steps[0]]
        n_starts = len(starts_x)
        if n_starts < 2:
            return None
        rolls = [starts_x[k + 1] - starts_x[k] for k in range(n_starts - 1)]
        if any(r % 2 for r in rolls):
            return None
        rolls_h = [r // 2 for r in rolls]

        coords_yz = tile_coords_from_steps(steps[1:])
        coords_full = np.concatenate(
            [np.zeros((len(coords_yz), 1), np.int32), coords_yz], axis=1)
        coords_b, valid_b = eng._batched_coords(coords_full)
        nb, B = valid_b.shape

        # fill-bbox crop, applied per strip: x is never cropped (strips tile
        # it); the two in-plane axes use the bucketed non-fill bbox
        bits = [_fill_bf16_bits(c) for c in cfg.channels]
        tf = cfg.transpose_forward
        t0 = tf[0]
        if lazy is not None:
            from ..utils import hostops
            if not hostops.has_box():
                return None  # caller falls back to the whole-grid path
            img_shape = tuple(int(s) for s in lazy["img_shape"])
            raw = np.ascontiguousarray(lazy["raw"])
        else:
            img_shape = grid.shape[1:]
        assert img_shape[t0] == new_shape[0], (img_shape, new_shape, tf)
        if os.environ.get("FNN_HOST_CROP", "1") == "1":
            if lazy is not None:
                res = hostops.nonair_bbox_i16(
                    raw, [c["lower_bound"] for c in cfg.channels])
                if res is None:
                    return None
                slo, shi = res
                if shi[0] <= slo[0]:  # all air (mirror _nonfill_bbox)
                    lo = [0] * 3
                    hi = [min(self.crop_bucket, s) for s in img_shape]
                else:
                    pairs = [_source_range_to_target(
                        raw.shape[1 + ax], img_shape[ax], slo[ax], shi[ax])
                        for ax in range(3)]
                    lo = [p[0] for p in pairs]
                    hi = [p[1] for p in pairs]
            else:
                lo, hi = _nonfill_bbox(grid, bits, self.crop_bucket)
        else:
            lo, hi = [0] * 3, list(img_shape)
        box = tuple(
            (0, img_shape[ax]) if ax == t0
            else _bucket_extent(lo[ax], hi[ax], img_shape[ax],
                                self.crop_bucket)
            for ax in range(3))

        air = self.air_skip
        thr = float(self.air_threshold)
        in_ch = cfg.num_input_channels
        pkey = ("stream", new_shape, vol_shape, n_folds, in_ch, box, air,
                round(thr, 6), self.pack_mask, tuple(rolls_h), nb, B)
        fns = self._jit_cache.setdefault(pkey, {})

        K = cfg.num_classes
        p0h, pyh, pzh = p0 // 2, patch[1] // 2, patch[2] // 2
        C8 = 8 * K
        acc_dtype = eng.sweep_acc_dtype
        g = eng._gaussian_for(acc_dtype)
        g_s2d = g.reshape(p0h, 2, pyh, 2, pzh, 2).transpose(
            0, 2, 4, 1, 3, 5).reshape(p0h, pyh, pzh, 8)
        plane = vol_shape[1:]
        plane_h = (plane[0] // 2, plane[1] // 2)
        use_features = n_folds == 1
        forward = eng._tile_step_fn(n_folds, s2d_output=True,
                                    s2d_features=use_features)
        network = eng.network
        compute_dtype = eng.compute_dtype
        ny, nz = new_shape[1], new_shape[2]
        t_fwd = (0,) + tuple(a + 1 for a in tf)
        fills_bf16 = [np.asarray(b, np.uint16).view(ml_dtypes.bfloat16)
                      for b in bits]
        off_eng = (0, box[tf[1]][0], box[tf[2]][0])
        win = (patch[1] // 8 + 1, patch[2] // 8 + 1)
        flat = coords_b.reshape(-1, 3)
        yi = np.asarray(flat[:, 1] // 8, np.int32)
        zi = np.asarray(flat[:, 2] // 8, np.int32)

        def make_prep(rows, rows_data):
            # strip (image-order, bbox-cropped in-plane) -> engine-layout
            # slab rows (rows, Yp, Zp, C): transpose, reinsert into the
            # bf16-bit-exact fill, pad ring with the f64 fill — the exact
            # construction _full_program uses, sliced to [row0, row0+rows)
            def prep(strip):
                s = jnp.transpose(strip, t_fwd).astype(compute_dtype)
                chans = []
                for c in range(in_ch):
                    inner = jnp.full(
                        (rows_data, ny, nz),
                        jnp.asarray(fills_bf16[c], jnp.bfloat16),
                        compute_dtype)
                    inner = lax.dynamic_update_slice(inner, s[c], off_eng)
                    inner = jnp.pad(
                        inner, [(0, rows - rows_data), (0, plane[0] - ny),
                                (0, plane[1] - nz)],
                        constant_values=_fill_f64(cfg.channels[c]))
                    chans.append(inner)
                return jnp.stack(chans, axis=-1)
            return prep

        # tile gather + s2d accumulate: op-for-op mirror of the fused sweep
        # (engine.py _build_sweep_runner_s2d gather_tiles/accumulate_batch)
        # so the streamed mask is bit-equal to the fused one
        def gather_tiles(vol, coords_b_):
            patches = []
            for b in range(coords_b_.shape[0]):
                start = (coords_b_[b][0], coords_b_[b][1], coords_b_[b][2], 0)
                patches.append(lax.dynamic_slice(
                    vol, start, patch + (in_ch,)))
            return jnp.stack(patches).astype(compute_dtype)

        def accumulate_batch(a, vol, coords_b_, valid_b_, stacked_params):
            out = forward(stacked_params, gather_tiles(vol, coords_b_))
            if use_features:
                single = jax.tree_util.tree_map(lambda t: t[0],
                                                stacked_params)
            for b in range(coords_b_.shape[0]):
                if use_features:
                    y = network.seg_head_apply(single, out[b]).astype(
                        jnp.float32)
                else:
                    y = out[b]
                y = y.reshape(p0h, pyh, pzh, 8, K)
                gw = (g_s2d * valid_b_[b])[..., None]
                contrib = (y * gw).astype(acc_dtype).reshape(
                    p0h, pyh, pzh, C8)
                start = (0, coords_b_[b][1] // 2, coords_b_[b][2] // 2, 0)
                cur = lax.dynamic_slice(a, start, (p0h, pyh, pzh, C8))
                a = lax.dynamic_update_slice(a, cur + contrib, start)
            return a

        def chunk_valid(slab, valid):
            # air test over the tile's EXACT x extent (this chunk's slab);
            # in-plane windows mirror the fused program's 8^3 block maxima
            if not air:
                return valid
            x = slab[..., 0]
            # pad to the 8^3 block grid with the air floor (mirrors the
            # fused program: partial edge blocks can never hide body voxels)
            bs = [-(-n // 8) * 8 for n in (p0, *plane)]
            x = jnp.pad(x, [(0, b - n) for b, n in zip(bs, (p0, *plane))],
                        constant_values=_fill_f64(cfg.channels[0]))
            blocks = x.reshape(bs[0] // 8, 8, bs[1] // 8, 8,
                               bs[2] // 8, 8).max((1, 3, 5)).max(0)
            neg = jnp.asarray(-jnp.inf, blocks.dtype)
            boxmax = lax.reduce_window(blocks, neg, lax.max, win, (1, 1),
                                       [(0, w - 1) for w in win])
            f = (boxmax[yi, zi] > thr).reshape(nb, B)
            return f.astype(jnp.float32) * valid

        def run_tiles(acc, slab, stacked_params, coords, valid):
            valid_c = chunk_valid(slab, valid)

            def tile_body(a, cv):
                coords_b_, valid_b_ = cv
                if air:
                    return lax.cond(
                        valid_b_.sum() > 0,
                        lambda a_: accumulate_batch(a_, slab, coords_b_,
                                                    valid_b_, stacked_params),
                        lambda a_: a_, a), None
                return accumulate_batch(a, slab, coords_b_, valid_b_,
                                        stacked_params), None

            acc, _ = lax.scan(tile_body, acc, (coords, valid_c))
            return acc

        def finalize(acc, n_rows_h):
            # mirror of the fused finalize_rows (engine.py)
            if eng.use_pallas_finalize:
                from ..ops.pallas_finalize import grouped_argmax
                cls8 = grouped_argmax(acc, K, n_rows_h,
                                      interpret=eng._pallas_interpret)
                cls8 = cls8.reshape(n_rows_h, 2, 2, 2, *plane_h)
                cls8 = cls8.transpose(0, 1, 4, 2, 5, 3)
                return cls8.reshape(2 * n_rows_h, *plane)
            r = acc[:n_rows_h].reshape(n_rows_h, *plane_h, 8, K)
            cls8 = r.argmax(-1).astype(jnp.uint8)
            cls8 = cls8.reshape(n_rows_h, *plane_h, 2, 2, 2)
            cls8 = cls8.transpose(0, 3, 1, 4, 2, 5)
            return cls8.reshape(2 * n_rows_h, *plane)

        def pack(s):
            if not self.pack_mask:
                return s
            n = int(np.prod(s.shape))
            flatm = s.reshape(-1)
            if n % 4:
                flatm = jnp.concatenate(
                    [flatm, jnp.zeros(((-n) % 4,), jnp.uint8)])
            q = flatm.reshape(-1, 4)
            b0 = q[:, 0] | (q[:, 1] << 6)
            b1 = (q[:, 1] >> 2) | (q[:, 2] << 4)
            b2 = (q[:, 2] >> 4) | (q[:, 3] << 2)
            return jnp.stack([b0, b1, b2], axis=-1)

        def make_chunk(roll_h, srows, srows_data):
            prep = make_prep(srows, srows_data)

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def chunk_fn(stacked_params, acc, slab, strip, coords, valid):
                acc = run_tiles(acc, slab, stacked_params, coords, valid)
                rows = finalize(acc, roll_h)[:, :ny, :nz]
                acc = jnp.concatenate(
                    [acc[roll_h:],
                     jnp.zeros((roll_h, *plane_h, C8), acc_dtype)], 0)
                slab = jnp.concatenate([slab[2 * roll_h:], prep(strip)], 0)
                return acc, slab, pack(rows)
            return chunk_fn

        def make_last():
            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def last_fn(stacked_params, acc, slab, coords, valid):
                acc = run_tiles(acc, slab, stacked_params, coords, valid)
                return pack(finalize(acc, p0h)[:, :ny, :nz])
            return last_fn

        aot_dir = getattr(eng, "aot_cache", None)

        def run(fn_key, jitted, tag, *args):
            # serialized-executable round trip per variant (inference/aot.py)
            if not aot_dir:
                return jitted(*args)
            c = fns.get(("aot", fn_key))
            if c is None:
                from .aot import aot_compile
                c = aot_compile(jitted, args, aot_dir, tag=tag)
                fns[("aot", fn_key)] = c
            return c(*args)

        # -------- host orchestration: prefetch strips 2 ahead, fetch rows async
        nx = new_shape[0]
        bounds = [(0, p0)] + [(starts_x[k - 1] + p0, starts_x[k] + p0)
                              for k in range(1, n_starts)]

        def strip_np(a, b):
            if lazy is not None:
                # preprocess exactly this strip's box of the target grid
                # from the raw volume — called right before its device_put,
                # so the CPU work overlaps the in-flight strips' transfers
                # and the device compute of earlier chunks
                box6 = []
                for ax in range(3):
                    box6 += ([a, min(b, img_shape[ax])] if ax == t0
                             else [box[ax][0], box[ax][1]])
                chs = cfg.channels
                s = hostops.preprocess_ct_i16_box(
                    raw, img_shape, box6,
                    [c["lower_bound"] for c in chs],
                    [c["upper_bound"] for c in chs],
                    [c["mean"] for c in chs], [c["std"] for c in chs])
                assert s is not None
                return s
            sl = [slice(None)]
            for ax in range(3):
                sl.append(slice(a, min(b, img_shape[ax])) if ax == t0
                          else slice(box[ax][0], box[ax][1]))
            return np.ascontiguousarray(grid[tuple(sl)])

        dstrips = [jax.device_put(strip_np(*bounds[0]))]
        if n_starts >= 2:
            dstrips.append(jax.device_put(strip_np(*bounds[1])))

        prep0 = fns.get("prep0")
        if prep0 is None:
            rd0 = min(p0, nx)
            prep0 = jax.jit(make_prep(p0, rd0))
            fns["prep0"] = prep0
        slab = run("prep0", prep0, "turbo_prep0", dstrips[0])
        acc = jnp.zeros((p0h, *plane_h, C8), acc_dtype)
        coords_d = jnp.asarray(coords_b)
        valid_d = jnp.asarray(valid_b)

        pieces = []
        for k in range(n_starts - 1):
            if k + 2 < len(bounds):
                dstrips.append(jax.device_put(strip_np(*bounds[k + 2])))
            a, b = bounds[k + 1]
            srows, srows_data = b - a, min(b, nx) - a
            ck = ("chunk", rolls_h[k], srows, srows_data)
            fn = fns.get(ck)
            if fn is None:
                fn = make_chunk(rolls_h[k], srows, srows_data)
                fns[ck] = fn
            acc, slab, packed = run(
                ck, fn, f"turbo_chunk_r{rolls_h[k]}_{srows}_{srows_data}",
                stacked, acc, slab, dstrips[k + 1], coords_d, valid_d)
            try:
                packed.copy_to_host_async()  # D2H overlaps later chunks
            except AttributeError:
                pass
            pieces.append((2 * rolls_h[k], packed))
            dstrips[k + 1] = None  # consumed; let the runtime free it

        last_fn = fns.get("last")
        if last_fn is None:
            last_fn = make_last()
            fns["last"] = last_fn
        packed = run("last", last_fn, "turbo_last", stacked, acc, slab,
                     coords_d, valid_d)
        pieces.append((p0, packed))

        if self.pack_mask:
            segs = [_unpack_mask6(np.asarray(p), (r, ny, nz))
                    for r, p in pieces]
        else:
            segs = [np.asarray(p) for r, p in pieces]
        return np.concatenate(segs, 0)[:nx]

    # ------------------------------------------------------------------ prediction
    def predict_volume(self, params_list, volume: np.ndarray,
                       spacing: Sequence[float]) -> np.ndarray:
        """(D, H, W) — or (C, D, H, W) multi-channel — raw volume in image
        axis order + its spacing -> uint8 segmentation on the ORIGINAL grid.
        ONE device call."""
        import jax
        import jax.numpy as jnp
        cfg = self.config
        eng = self.engine

        if volume.ndim == len(cfg.patch_size):
            volume = volume[None]
        assert volume.shape[0] == cfg.num_input_channels, \
            (f"{volume.shape[0]} input channels but TurboConfig declares "
             f"{cfg.num_input_channels} normalization schemes")
        # view only — shape/spacing bookkeeping; the actual transpose is
        # inside the device program (see _full_program)
        vol_t = np.transpose(volume,
                             [0] + [a + 1 for a in cfg.transpose_forward])
        spacing_t = [float(spacing[a]) for a in cfg.transpose_forward]
        new_shape = tuple(int(round(s * sp / tsp)) for s, sp, tsp in zip(
            vol_t.shape[1:], spacing_t, cfg.target_spacing))
        new_shape = tuple(max(n, p) for n, p in zip(new_shape, eng.patch_size))
        vol_shape, _ = eng.s2d_sweep_plan(new_shape)

        if not isinstance(params_list, (list, tuple)):
            params_list = [params_list]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         *params_list)

        # native host preprocess: clip+zscore+trilinear in C++ and upload
        # the ~3x-smaller bf16 target-spacing grid (image axis order; the
        # device program folds the plans transpose into its pad as before)
        upload = None
        pre = False
        crop_box = None
        if self.host_preprocess and volume.dtype == np.int16:
            from ..utils import hostops
            inv = cfg.transpose_backward
            new_shape_img = tuple(new_shape[inv[p]]
                                  for p in range(len(new_shape)))
            chs = cfg.channels

            def _finish_streamed(seg):
                if seg.shape != vol_t.shape[1:]:
                    rev = hostops.nearest_revert_u8(seg, vol_t.shape[1:])
                    seg = rev if rev is not None else \
                        _nearest_revert_host(seg, vol_t.shape[1:])
                return np.transpose(seg, cfg.transpose_backward)

            stream_on = os.environ.get("FNN_TURBO_STREAM", "1") == "1"
            lazy_on = os.environ.get("FNN_LAZY_PRE", "1") == "1"
            if stream_on and lazy_on and hostops.has_box():
                # streamed mode, LAZY preprocess: each x-strip is clipped/
                # z-scored/resampled from the raw int16 volume right before
                # its device_put, so the ~1.2 s single-core C++ preprocess
                # overlaps the earlier strips' transfers and device compute
                # instead of preceding them. None = geometry doesn't
                # stream, fall through to the fused single-dispatch program
                seg = self._predict_streamed(
                    stacked, None, new_shape, len(params_list),
                    lazy={"raw": volume, "img_shape": new_shape_img})
                if seg is not None:
                    return _finish_streamed(seg)
            upload = hostops.preprocess_ct_i16(
                volume, new_shape_img,
                [c["lower_bound"] for c in chs], [c["upper_bound"] for c in chs],
                [c["mean"] for c in chs], [c["std"] for c in chs])
            pre = upload is not None
            if pre and stream_on and not (lazy_on and hostops.has_box()):
                # no box API (old prebuilt hostops) or FNN_LAZY_PRE=0:
                # streamed mode over the whole preprocessed grid
                # (round-5 original form)
                seg = self._predict_streamed(stacked, upload, new_shape,
                                             len(params_list))
                if seg is not None:
                    return _finish_streamed(seg)
            if pre and os.environ.get("FNN_HOST_CROP", "1") == "1":
                # everything the CT clip floor mapped exactly to the fill
                # (air) need not cross the link: upload only the non-fill
                # bounding slab; the device reinserts it into fill at a
                # static offset (bit-exact; whole-body CTs are 40-70% air)
                crop_box, upload = _crop_to_fill_bbox(
                    upload, [_fill_bf16_bits(c) for c in chs],
                    bucket=self.crop_bucket)
        if upload is None:
            upload = np.ascontiguousarray(volume)

        full, coords_b, valid_b = self._full_program(
            upload.shape[1:] if pre else vol_t.shape[1:], new_shape,
            vol_shape, len(params_list), pre_resampled=pre,
            crop_box=crop_box)
        args = (stacked, jnp.asarray(upload), coords_b, valid_b)
        # serialized-executable round-trip (inference/aot.py, the TRT
        # saveEngine analogue): when the wrapped engine carries an aot_cache
        # dir, a cold process LOADS the whole-pipeline executable instead of
        # paying the remote compile
        aot_dir = getattr(eng, "aot_cache", None)
        if aot_dir:
            akey = ("aot_full", upload.shape, str(upload.dtype), new_shape,
                    vol_shape, len(params_list), self.air_skip, pre,
                    self.pack_mask, crop_box)
            fn = self._jit_cache.get(akey)
            if fn is None:
                from .aot import aot_compile
                fn = aot_compile(full, args, aot_dir, tag="turbo_full")
                self._jit_cache[akey] = fn
            seg = np.asarray(fn(*args))
        else:
            seg = np.asarray(full(*args))
        if self.host_revert or pre:
            if self.pack_mask:
                seg = _unpack_mask6(seg, new_shape)
            if seg.shape != vol_t.shape[1:]:
                from ..utils import hostops
                rev = hostops.nearest_revert_u8(seg, vol_t.shape[1:])
                seg = rev if rev is not None else \
                    _nearest_revert_host(seg, vol_t.shape[1:])
        return np.transpose(seg, cfg.transpose_backward)

    @classmethod
    def from_model_folder(cls, model_folder: str, fold=0,
                          checkpoint_name: str = "checkpoint_final.fnnx",
                          air_skip: bool = True, tile_batch: int = 8,
                          compute_dtype=None, **pipeline_kwargs):
        """Build (pipeline, params) from a trained model folder: loads the
        checkpoint, re-parameterizes the network with the space-to-depth
        transform (models/s2d.py; requires the standard PlainConvUNet outer
        octave), and derives the TurboConfig from plans.json (patch, target
        spacing, CT clip/zscore properties)."""
        import jax
        import jax.numpy as jnp
        from ..core.labels import determine_num_input_channels
        from ..core.plans import PlansManager
        from ..models.factory import get_network_from_plans
        from ..models.s2d import make_s2d_engine_net
        from ..models.students import build_student_arch_kwargs
        from ..training.checkpoint import load_checkpoint, restore_params
        from ..utils.io import join, load_json
        from .engine import SlidingWindowEngine

        compute_dtype = compute_dtype or jnp.bfloat16
        dataset_json = load_json(join(model_folder, "dataset.json"))
        pm = PlansManager(join(model_folder, "plans.json"))
        ckpt = load_checkpoint(join(model_folder, f"fold_{fold}",
                                    checkpoint_name))
        init_args = ckpt.get("init_args", {})
        cfg = pm.get_configuration(init_args.get("configuration", "3d_fullres"))
        lm = pm.get_label_manager(dataset_json)
        num_in = determine_num_input_channels(pm, cfg, dataset_json)
        num_out = lm.num_segmentation_heads
        arch = cfg.configuration["architecture"]
        kwargs = arch["arch_kwargs"]
        if "Distillation" in ckpt.get("trainer_name", ""):
            kwargs = build_student_arch_kwargs(
                kwargs, init_args.get("feature_reduction_factor", 2),
                init_args.get("block_reduction_strategy", "reduce"))
        net = get_network_from_plans(arch["network_class_name"], kwargs, (),
                                     num_in, num_out, dtype=compute_dtype)
        patch = tuple(cfg.patch_size)
        template = jax.device_get(net.init(
            jax.random.PRNGKey(0), np.zeros((1, *patch, num_in), np.float32),
            deep_supervision=False))
        params = restore_params(template, ckpt["network_weights"])

        s2d = make_s2d_engine_net(net, kwargs, num_out, dtype=compute_dtype)
        if s2d is None:
            raise ValueError(
                "turbo pipeline needs the standard PlainConvUNet outer "
                "octave (3^3 stride-1 then 3^3 stride-2); use the regular "
                "predictor for this architecture")
        params = s2d.convert_params(params)

        schemes = cfg.normalization_schemes
        if num_in != len(schemes):
            raise ValueError(
                f"turbo serves plain multi-channel input ({len(schemes)} "
                f"image channels) but the model wants {num_in} input "
                f"channels (cascade prev-stage one-hot?); use NNUNetPredictor")
        channels = []
        for c, scheme in enumerate(schemes):
            tag = _SCHEME_TAGS.get(scheme, "zscore")
            spec = {"scheme": tag}
            if tag == "ct":
                ip = pm.foreground_intensity_properties_per_channel[str(c)]
                spec.update(mean=ip["mean"], std=ip["std"],
                            lower_bound=ip["percentile_00_5"],
                            upper_bound=ip["percentile_99_5"])
            channels.append(spec)
        config = TurboConfig(
            patch_size=patch, target_spacing=cfg.spacing,
            num_classes=num_out, channels=channels)
        if channels[0]["scheme"] == "ct":
            ip0 = channels[0]
            config.mean, config.std = ip0["mean"], ip0["std"]
            config.lower_bound = ip0["lower_bound"]
            config.upper_bound = ip0["upper_bound"]
        # plans patch/spacing are already in the engine's (transposed) data
        # order — don't re-transpose
        config.transpose_forward = list(range(len(patch)))
        config.transpose_backward = list(range(len(patch)))
        config.patch_size = tuple(patch)
        config.target_spacing = tuple(float(s) for s in cfg.spacing)

        engine = SlidingWindowEngine(
            s2d, config.patch_size, num_out, tile_step_size=0.5,
            use_gaussian=True, mirror_axes=(), compute_dtype=compute_dtype,
            acc_dtype=jnp.float32,
            sweep_acc_dtype=compute_dtype, shape_bucket=32,
            tile_batch=tile_batch, use_s2d_sweep=True,
            # env-gated Pallas kernels (docs/Performance.md round-3/4 A/Bs):
            # the grouped-argmax finalize won on hardware (bit-identical,
            # -0.02..0.08 s device) and defaults on there ("auto" = on for
            # TPU backends, off where Pallas would interpret); s2d is opt-in
            use_pallas_s2d=os.environ.get("FNN_PALLAS_S2D", "0") == "1",
            use_pallas_finalize={"0": False, "1": True}.get(
                os.environ.get("FNN_PALLAS_FINALIZE", ""), "auto"))
        return cls(engine, config, air_skip=air_skip,
                   **pipeline_kwargs), params

    def predict_file(self, params_list, input_file,
                     output_file: str) -> dict:
        """read -> predict -> write; returns a timing breakdown (the e2e
        contract the reference benchmarks, ref docs/Engine.md:31-33).
        input_file: one path, or a list of per-channel paths (nnU-Net
        _0000/_0001/... convention) for multi-channel models."""
        t0 = time.perf_counter()
        rw = NiftiIOWithReorient()
        files = [input_file] if isinstance(input_file, str) else list(input_file)
        # keep the on-disk dtype (int16 HU for CT): the device program casts
        # to fp32 itself, and shipping int16 quarters host traffic + H2D
        data, props = rw.read_images(files, dtype=None)
        t_read = time.perf_counter()
        seg = self.predict_volume(params_list, data, props["spacing"])
        t_pred = time.perf_counter()
        rw.write_seg(seg, output_file, props)
        t_write = time.perf_counter()
        return {"seconds_total": round(t_write - t0, 3),
                "seconds_read": round(t_read - t0, 3),
                "seconds_predict": round(t_pred - t_read, 3),
                "seconds_write": round(t_write - t_pred, 3),
                "labels_present": sorted(int(x) for x in np.unique(seg))}


def turbo_predict_entry():
    """`fast_nnunet_turbo` — end-to-end on-device CT serving from a trained
    model folder (TPU answer to the reference engine binary's
    config->load->infer->save loop, ref engine/fast_nnunet.cpp:14-30)."""
    ap = argparse.ArgumentParser(
        description="TurboPipeline: read -> on-device preprocess+sweep -> "
                    "write, fastest serving path")
    ap.add_argument("-i", required=True, help="input NIfTI (or a folder)")
    ap.add_argument("-o", required=True, help="output NIfTI (or a folder)")
    ap.add_argument("-m", required=True, help="trained model folder "
                    "(contains plans.json + fold_X/)")
    ap.add_argument("-f", default=0, help="fold")
    ap.add_argument("-chk", default="checkpoint_final.fnnx")
    ap.add_argument("--no_air_skip", action="store_true",
                    help="disable empty-tile (air) skipping")
    ap.add_argument("--tile_batch", type=int, default=8)
    ap.add_argument("--host_revert", action="store_true",
                    help="D2H the coarse target-spacing mask and replay the "
                    "nearest revert on host (voxel-identical; wins when the "
                    "device link is slow). Also FNN_HOST_REVERT=1.")
    args = ap.parse_args()

    from ..utils.misc import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    pipe, params = TurboPipeline.from_model_folder(
        args.m, args.f, args.chk, air_skip=not args.no_air_skip,
        tile_batch=args.tile_batch,
        host_revert=args.host_revert or os.environ.get(
            "FNN_HOST_REVERT", "0") == "1")

    if os.path.isdir(args.i):
        os.makedirs(args.o, exist_ok=True)
        from ..utils.io import subfiles
        names = subfiles(args.i, suffix=".nii.gz", join_path=False)
        n_ch = pipe.config.num_input_channels
        if n_ch > 1:
            # nnU-Net folder convention: case_0000.nii.gz .. case_000{C-1}
            cases = {}
            for name in names:
                case = re.sub(r"_\d{4}\.nii\.gz$", "", name)
                cases.setdefault(case, []).append(name)
            for case, files in sorted(cases.items()):
                assert len(files) == n_ch, \
                    f"{case}: {len(files)} channel files, model wants {n_ch}"
                stats = pipe.predict_file(
                    params, [os.path.join(args.i, f) for f in sorted(files)],
                    os.path.join(args.o, case + ".nii.gz"))
                print(case, stats)
        else:
            for name in names:
                stats = pipe.predict_file(params, os.path.join(args.i, name),
                                          os.path.join(args.o, name))
                print(name, stats)
    else:
        stats = pipe.predict_file(params, args.i, args.o)
        print(stats)


if __name__ == "__main__":
    turbo_predict_entry()
