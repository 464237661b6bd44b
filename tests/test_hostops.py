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
