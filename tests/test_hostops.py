"""Native host ops (engine/src/host_ops.cpp via utils/hostops.py): the
C++ CT preprocess must match the device program's clip -> z-score ->
jax.image.resize(trilinear) -> bf16 chain to ~1 bf16 ULP, the nearest
revert must be voxel-identical to jax's index rule, and the turbo
pipeline's host_preprocess mode must produce (near-)identical masks to the
on-device preprocess. Skipped when libfnn_hostops.so isn't built
(cd engine && cmake -B build -G Ninja && cmake --build build)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_nnunet_tpu.utils import hostops

pytestmark = pytest.mark.skipif(
    not hostops.available(), reason="libfnn_hostops.so not built")


def test_preprocess_matches_jax_chain():
    rng = np.random.RandomState(0)
    vol = rng.randint(-1024, 3000, size=(2, 24, 31, 27)).astype(np.int16)
    out_shape = (19, 37, 27)  # down, up, and identity axes in one case
    lb, ub = [-60.0, -200.0], [2500.0, 3000.0]
    mean, std = [400.0, 10.0], [500.0, 250.0]
    got = hostops.preprocess_ct_i16(vol, out_shape, lb, ub, mean, std)
    assert got is not None and got.shape == (2, *out_shape)
    for c in range(2):
        x = jnp.clip(vol[c].astype(jnp.float32), lb[c], ub[c])
        x = (x - mean[c]) / std[c]
        ref = np.asarray(jax.image.resize(
            x[None], (1, *out_shape), method="trilinear",
            antialias=False).astype(jnp.bfloat16))[0]
        g = got[c].astype(np.float32)
        r = ref.astype(np.float32)
        # identical sample positions; f32 rounding-order differences land
        # within one bf16 ULP and almost always round identically
        assert (g == r).mean() > 0.999, f"channel {c}: {(g == r).mean()}"
        assert np.abs(g - r).max() <= 2 ** -7 * max(1.0, np.abs(r).max())


def test_nearest_revert_bit_identical():
    from fast_nnunet_tpu.inference.turbo import _nearest_revert_host
    rng = np.random.RandomState(1)
    seg = rng.randint(0, 61, size=(13, 19, 17)).astype(np.uint8)
    for out_shape in [(20, 31, 17), (13, 19, 17), (9, 40, 23)]:
        got = hostops.nearest_revert_u8(seg, out_shape)
        ref = _nearest_revert_host(seg, out_shape)
        np.testing.assert_array_equal(got, ref)
        # and vs jax itself
        jref = np.asarray(jax.image.resize(jnp.asarray(seg), out_shape,
                                           method="nearest"))
        np.testing.assert_array_equal(got, jref)


def test_turbo_host_preprocess_matches_device_path():
    """End-to-end: TurboPipeline(host_preprocess=True) vs the on-device
    preprocess on the same int16 volume — same mask up to the documented
    ~1-ULP preprocessing difference (agreement threshold, not bit-equality;
    the hardware A/B in docs/Performance.md tracks the real-chip number)."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    K = 4
    arch = {"n_stages": 3, "features_per_stage": [8, 16, 32],
            "kernel_sizes": [[3, 3, 3]] * 3,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
            "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
            "nonlin": "torch.nn.LeakyReLU"}
    patch = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    eng = SlidingWindowEngine(s2d, patch, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.2, 1.1),
                      mean=40.0, std=100.0, lower_bound=-60.0,
                      upper_bound=400.0, num_classes=K)
    rng = np.random.RandomState(7)
    vol = np.full((30, 26, 22), -1000, np.int16)
    vol[6:24, 5:21, 4:18] = (rng.rand(18, 16, 14) * 400 - 60).astype(np.int16)
    spacing = (1.0, 1.0, 1.5)

    seg_dev = TurboPipeline(eng, cfg, host_preprocess=False,
                            host_revert=True).predict_volume(sp, vol, spacing)
    pipe = TurboPipeline(eng, cfg, host_preprocess=True)
    assert pipe.host_preprocess
    seg_host = pipe.predict_volume(sp, vol, spacing)
    assert seg_host.shape == vol.shape and seg_host.dtype == np.uint8
    agree = (seg_dev == seg_host).mean()
    assert agree > 0.995, f"host/device path agreement too low: {agree}"


def test_turbo_host_preprocess_falls_back_on_float_input():
    """float32 volumes can't take the int16 native path; 'auto' must fall
    back to the device preprocess silently and still produce a mask."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    K = 3
    arch = {"n_stages": 2, "features_per_stage": [8, 16],
            "kernel_sizes": [[3, 3, 3]] * 2,
            "strides": [[1, 1, 1]], "n_conv_per_stage": [2, 2],
            "n_conv_per_stage_decoder": [2],
            "nonlin": "torch.nn.LeakyReLU"}
    arch["strides"] = [[1, 1, 1], [2, 2, 2]]
    patch = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    eng = SlidingWindowEngine(s2d, patch, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.0, 1.0),
                      mean=0.0, std=1.0, lower_bound=-3.0, upper_bound=3.0,
                      num_classes=K)
    vol = np.random.RandomState(3).randn(18, 14, 18).astype(np.float32)
    pipe = TurboPipeline(eng, cfg, host_preprocess="auto")
    seg = pipe.predict_volume(sp, vol, (1.0, 1.0, 1.0))
    assert seg.shape == vol.shape


def test_host_crop_bit_identical(monkeypatch):
    """The fill-bbox upload crop must be BIT-identical to uploading the
    full resampled grid (air clips exactly to the fill, so reinserting the
    slab into fill reconstructs the same device input)."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    K = 4
    arch = {"n_stages": 3, "features_per_stage": [8, 16, 32],
            "kernel_sizes": [[3, 3, 3]] * 3,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
            "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
            "nonlin": "torch.nn.LeakyReLU"}
    patch = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)

    def build():
        eng = SlidingWindowEngine(s2d, patch, K, tile_step_size=0.5,
                                  shape_bucket=4, compute_dtype=jnp.float32,
                                  sweep_acc_dtype=jnp.float32, tile_batch=2,
                                  use_s2d_sweep=True)
        cfg = TurboConfig(patch_size=(16, 8, 8),
                          target_spacing=(1.0, 1.2, 1.1), mean=40.0,
                          std=100.0, lower_bound=-60.0, upper_bound=400.0,
                          num_classes=K)
        return TurboPipeline(eng, cfg, host_preprocess=True)

    rng = np.random.RandomState(9)
    vol = np.full((40, 36, 30), -1000, np.int16)  # air everywhere...
    vol[8:22, 9:23, 6:20] = (rng.rand(14, 14, 14) * 400 - 60).astype(np.int16)
    spacing = (1.0, 1.0, 1.5)

    monkeypatch.setenv("FNN_HOST_CROP", "0")
    seg_full = build().predict_volume(sp, vol, spacing)
    monkeypatch.setenv("FNN_HOST_CROP", "1")
    seg_crop = build().predict_volume(sp, vol, spacing)
    np.testing.assert_array_equal(seg_full, seg_crop)


def test_host_crop_off_bucket_bbox_and_ulp_fill(monkeypatch):
    """Round-5 regression (advisor finding): (a) a non-fill extent that
    starts off-bucket with a bucket-multiple size must still be fully
    covered by the slab (the old code sized the slab BEFORE flooring lo and
    dropped body voxels past the high edge); (b) a non-bf16-representable
    fill (mean/std giving e.g. -3.6157... vs bf16 -3.609375) must reinsert
    with the host slab's exact bit pattern, keeping crop-on == crop-off."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
    from fast_nnunet_tpu.models.factory import get_network_from_plans
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    K = 3
    arch = {"n_stages": 3, "features_per_stage": [8, 16, 32],
            "kernel_sizes": [[3, 3, 3]] * 3,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
            "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
            "nonlin": "torch.nn.LeakyReLU"}
    patch = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)

    def build():
        eng = SlidingWindowEngine(s2d, patch, K, tile_step_size=0.5,
                                  shape_bucket=4, compute_dtype=jnp.float32,
                                  sweep_acc_dtype=jnp.float32, tile_batch=2,
                                  use_s2d_sweep=True)
        # (lb - mean)/std = (-1024 - 127.475)/318.463 = -3.61572... — not
        # bf16-representable (rounds to -3.609375)
        cfg = TurboConfig(patch_size=(16, 8, 8),
                          target_spacing=(1.0, 1.0, 1.0), mean=127.475,
                          std=318.463, lower_bound=-1024.0,
                          upper_bound=3071.0, num_classes=K)
        pipe = TurboPipeline(eng, cfg, host_preprocess=True)
        pipe.crop_bucket = 4
        return pipe

    rng = np.random.RandomState(11)
    # body extent [3, 19) per axis: lo=3 (off-bucket for bucket 4), size 16
    # (a bucket multiple) -> the old sizing dropped voxels [16, 19)
    vol = np.full((26, 24, 22), -1024, np.int16)
    vol[3:19, 3:19, 3:19] = (rng.rand(16, 16, 16) * 2000 - 500).astype(
        np.int16)
    spacing = (1.0, 1.0, 1.0)

    monkeypatch.setenv("FNN_HOST_CROP", "0")
    seg_full = build().predict_volume(sp, vol, spacing)
    monkeypatch.setenv("FNN_HOST_CROP", "1")
    pipe = build()
    # the crop must actually engage (guard against a silently-degenerate
    # no-op crop making this test vacuous)
    from fast_nnunet_tpu.inference.turbo import (_crop_to_fill_bbox,
                                                 _fill_bf16_bits)
    pre = __import__("fast_nnunet_tpu.utils.hostops",
                     fromlist=["hostops"]).preprocess_ct_i16(
        vol[None], vol.shape, [-1024.0], [3071.0], [127.475], [318.463])
    box, slab = _crop_to_fill_bbox(
        pre, [_fill_bf16_bits(c) for c in pipe.config.channels], bucket=4)
    assert box is not None and slab.shape != pre.shape
    seg_crop = pipe.predict_volume(sp, vol, spacing)
    np.testing.assert_array_equal(seg_full, seg_crop)


def test_crop_to_fill_bbox_reconstructs_exactly():
    """Property: padding the slab with the fill bit pattern at the returned
    box reconstructs the input bit-for-bit, for off-bucket extents."""
    import ml_dtypes
    from fast_nnunet_tpu.inference.turbo import _crop_to_fill_bbox

    fill_bits = 0xC067  # some bf16 pattern
    fill = np.asarray(fill_bits, np.uint16).view(ml_dtypes.bfloat16)
    rng = np.random.RandomState(5)
    cases = [((1, 70, 40, 40), (31, 63), (5, 20), (0, 40)),   # advisor repro
             ((1, 40, 40, 40), (3, 19), (3, 19), (3, 19)),
             ((2, 33, 65, 37), (32, 33), (1, 65), (36, 37)),
             ((1, 64, 64, 64), (0, 64), (63, 64), (31, 32))]
    for shape, *extents in cases:
        arr = np.full(shape, fill, ml_dtypes.bfloat16)
        sl = tuple(slice(l, h) for l, h in extents)
        body = rng.rand(*[h - l for l, h in extents]) + 1.0
        for c in range(shape[0]):
            arr[(c,) + sl] = body.astype(ml_dtypes.bfloat16)
        box, slab = _crop_to_fill_bbox(arr, [fill_bits] * shape[0], bucket=32)
        if box is None:
            continue
        rebuilt = np.full(shape, fill, ml_dtypes.bfloat16)
        rebuilt[:, box[0][0]:box[1][0], box[0][1]:box[1][1],
                box[0][2]:box[1][2]] = slab
        np.testing.assert_array_equal(rebuilt.view(np.uint16),
                                      arr.view(np.uint16))


def test_preprocess_box_bit_equal_to_full_grid():
    """fnn_preprocess_ct_i16_box must be bit-identical to the same region
    of a whole-grid call — the invariant that makes the lazy streamed
    preprocess (strips on demand) bit-equal to the round-5 eager form."""
    if not hostops.has_box():
        pytest.skip("hostops built without the box API")
    rng = np.random.RandomState(3)
    vol = (rng.rand(2, 37, 44, 29) * 900 - 300).astype(np.int16)
    out_shape = (29, 51, 23)
    lb, ub = [-60.0, -100.0], [400.0, 800.0]
    mean, std = [40.0, 10.0], [100.0, 221.7]
    full = hostops.preprocess_ct_i16(vol, out_shape, lb, ub, mean, std)
    for box in [(0, 29, 0, 51, 0, 23), (3, 17, 5, 40, 2, 21),
                (28, 29, 50, 51, 22, 23), (0, 1, 0, 51, 0, 23)]:
        sub = hostops.preprocess_ct_i16_box(vol, out_shape, box, lb, ub,
                                            mean, std)
        ref = full[:, box[0]:box[1], box[2]:box[3], box[4]:box[5]]
        assert np.array_equal(sub.view(np.uint16), ref.view(np.uint16)), box


def test_nonair_bbox_matches_numpy():
    """fnn_nonair_bbox_i16 == the numpy any-channel > clip-floor bbox,
    including non-integral floors and the all-air sentinel."""
    if not hostops.has_box():
        pytest.skip("hostops built without the box API")
    rng = np.random.RandomState(5)
    vol = np.full((2, 21, 34, 27), -1000, np.int16)
    vol[0, 4:17, 9:30, 3:22] = (rng.rand(13, 21, 19) * 500 - 70).astype(
        np.int16)
    vol[1, 2:5, 1:4, 24:26] = 77  # second channel widens the box
    for lb in ([-60.0, -59.5], [-60.0, 50.0]):
        got = hostops.nonair_bbox_i16(vol, lb)
        assert got is not None
        mask = np.zeros(vol.shape[1:], bool)
        for c in range(2):
            mask |= vol[c] > lb[c]
        lo = [int(np.flatnonzero(mask.any(axis=tuple(
            a for a in range(3) if a != ax)))[0]) for ax in range(3)]
        hi = [int(np.flatnonzero(mask.any(axis=tuple(
            a for a in range(3) if a != ax)))[-1]) + 1 for ax in range(3)]
        assert got == (lo, hi), (lb, got, (lo, hi))
    allair = np.full((1, 6, 6, 6), -1000, np.int16)
    assert hostops.nonair_bbox_i16(allair, [-60.0]) == ([0] * 3, [0] * 3)


def test_source_range_to_target_is_conservative():
    """Every trilinear-output voxel OUTSIDE the mapped target range must be
    exactly the fill bit pattern (its sample neighbors are all at the clip
    floor), for up-, down-, and non-uniform resampling factors."""
    if not hostops.has_box():
        pytest.skip("hostops built without the box API")
    from fast_nnunet_tpu.inference.turbo import (_fill_bf16_bits,
                                                 _source_range_to_target)
    rng = np.random.RandomState(11)
    for n_in, n_out in [(40, 29), (17, 43), (33, 33), (9, 64)]:
        vol = np.full((1, n_in, 10, 10), -1000, np.int16)
        slo, shi = 3, max(4, n_in // 2)
        vol[0, slo:shi] = (rng.rand(shi - slo, 10, 10) * 400).astype(np.int16)
        out_shape = (n_out, 10, 10)
        grid = hostops.preprocess_ct_i16(vol, out_shape, [-60.0], [400.0],
                                         [40.0], [100.0])
        fill = np.uint16(_fill_bf16_bits(
            {"lower_bound": -60.0, "mean": 40.0, "std": 100.0}))
        lo, hi = _source_range_to_target(n_in, n_out, slo, shi)
        bits = grid.view(np.uint16)[0]
        assert (bits[:lo] == fill).all() and (bits[hi:] == fill).all(), \
            (n_in, n_out, lo, hi)
