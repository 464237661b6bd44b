"""TurboPipeline: end-to-end on-device serving (device preprocess -> s2d sweep
-> device revert), CPU-validated against the host scipy path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
from fast_nnunet_tpu.inference.turbo import TurboConfig, TurboPipeline
from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

K = 4
ARCH = {"n_stages": 3, "features_per_stage": [8, 16, 32],
        "kernel_sizes": [[3, 3, 3]] * 3,
        "strides": [[1, 1, 1]] + [[2, 2, 2]] * 2,
        "n_conv_per_stage": [2, 2, 2], "n_conv_per_stage_decoder": [2, 2],
        "nonlin": "torch.nn.LeakyReLU"}


@pytest.fixture(scope="module")
def turbo_setup():
    patch_engine = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", ARCH, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *patch_engine, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, ARCH, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    eng = SlidingWindowEngine(s2d, patch_engine, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    # patch in IMAGE order (16, 8, 8) -> engine transpose (1, 2, 0)
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.2, 1.1),
                      mean=40.0, std=100.0, lower_bound=-60.0,
                      upper_bound=400.0, num_classes=K)
    return eng, cfg, sp, net, params


def test_turbo_config_transpose():
    cfg = TurboConfig(patch_size=(160, 96, 96),
                      target_spacing=(2.0, 0.9765625, 0.9765625),
                      mean=418.68, std=412.19, lower_bound=-60,
                      upper_bound=3068, num_classes=61)
    assert cfg.transpose_forward == [1, 2, 0]
    assert cfg.patch_size == (96, 96, 160)
    assert cfg.target_spacing == (0.9765625, 0.9765625, 2.0)
    assert np.array_equal(
        np.arange(3)[cfg.transpose_forward][cfg.transpose_backward],
        np.arange(3))


def test_turbo_ini_parsing(tmp_path):
    """Both our INI and the reference's key spellings (std_dev, comma lists)
    must parse (ref engine/config/fast_nnunet_bone_turbo.ini)."""
    ini = tmp_path / "ref_style.ini"
    ini.write_text(
        "[model]\nfile_name = m.trt\nnum_class = 61\n"
        "[input]\npatch_size = 160, 96, 96\n"
        "target_spacing = 2.0, 0.9765625, 0.9765625\n"
        "[preprocessing]\nmean = 418.6798\nstd_dev = 412.1883\n"
        "lower_bound = -60.0\nupper_bound = 3068.0\n"
        "[inference]\nuse_mirroring = false\nstep_size = 0.5\n"
        "use_gaussian = true\n")
    cfg = TurboConfig.from_ini(str(ini))
    assert cfg.num_classes == 61 and cfg.std == pytest.approx(412.1883)
    cfg2 = TurboConfig.from_ini("engine/config/fast_nnunet_bone_turbo.ini")
    assert cfg2.patch_size == (96, 96, 160)
    assert cfg2.lower_bound == -60.0


def test_turbo_matches_host_path(turbo_setup):
    """predict_volume == transpose -> normalize -> scipy order-1 resample ->
    s2d sweep -> nearest back, up to resize-boundary ties."""
    from fast_nnunet_tpu.ops.resampling import resample_data_or_seg_to_shape
    eng, cfg, sp, net, params = turbo_setup
    rng = np.random.RandomState(5)
    vol = np.full((30, 26, 22), -1000.0, np.float32)
    vol[6:24, 5:21, 4:18] = rng.rand(18, 16, 14) * 400 - 60
    spacing = (1.0, 1.0, 1.5)

    pipe = TurboPipeline(eng, cfg)
    seg = pipe.predict_volume(sp, vol, spacing)
    assert seg.shape == vol.shape
    assert seg.dtype == np.uint8

    # host reference path
    vt = np.transpose(vol, cfg.transpose_forward)
    st = [spacing[a] for a in cfg.transpose_forward]
    norm = (np.clip(vt, cfg.lower_bound, cfg.upper_bound) - cfg.mean) / cfg.std
    new_shape = tuple(max(int(round(s * sp_ / tsp)), p) for s, sp_, tsp, p in
                      zip(vt.shape, st, cfg.target_spacing, eng.patch_size))
    res = resample_data_or_seg_to_shape(norm[None], new_shape, st,
                                        cfg.target_spacing, is_seg=False,
                                        order=1, order_z=0,
                                        force_separate_z=False)
    seg_res = eng.predict_segmentation_sweep_s2d(sp, res.astype(np.float32))
    back = resample_data_or_seg_to_shape(
        seg_res[None].astype(np.float32), vt.shape, cfg.target_spacing, st,
        is_seg=True, order=0, order_z=0, force_separate_z=False)[0]
    ref = np.transpose(back, cfg.transpose_backward).astype(np.uint8)

    agree = (seg == ref).mean()
    assert agree > 0.97, f"turbo/host path agreement too low: {agree}"


def test_nearest_revert_host_matches_jax():
    """_nearest_revert_host replays jax.image.resize(method="nearest")'s
    half-pixel-center index map voxel-for-voxel, including awkward
    non-integer ratios and upsample/downsample mixes per axis."""
    from fast_nnunet_tpu.inference.turbo import _nearest_revert_host
    rng = np.random.RandomState(11)
    for in_shape, out_shape in [((7, 9, 5), (13, 30, 26)),
                                ((16, 8, 16), (16, 17, 5)),
                                ((3, 3, 3), (512, 7, 1)),
                                ((12, 20, 9), (12, 20, 9))]:
        seg = rng.randint(0, 61, size=in_shape).astype(np.uint8)
        ref = np.asarray(jax.image.resize(jnp.asarray(seg), out_shape,
                                          method="nearest"))
        np.testing.assert_array_equal(_nearest_revert_host(seg, out_shape),
                                      ref)


def test_turbo_host_revert_voxel_identical(turbo_setup):
    """host_revert=True (D2H the coarse target-spacing mask, replay the
    nearest index map on host) must be voxel-identical to the on-device
    revert for every transpose/anisotropy combination."""
    eng, cfg, sp, net, params = turbo_setup
    rng = np.random.RandomState(9)
    vol = np.full((28, 24, 21), -1000.0, np.float32)
    vol[5:23, 4:20, 3:17] = rng.rand(18, 16, 14) * 400 - 60
    spacing = (1.0, 0.8, 1.5)

    base = TurboPipeline(eng, cfg, host_revert=False).predict_volume(
        sp, vol, spacing)
    host = TurboPipeline(eng, cfg, host_revert=True).predict_volume(
        sp, vol, spacing)
    np.testing.assert_array_equal(host, base)


@pytest.mark.slow
def test_turbo_air_skip(turbo_setup):
    eng, cfg, sp, net, params = turbo_setup
    rng = np.random.RandomState(7)
    # body in the low corner so the far corner is farther than a patch away
    # from any body voxel (its covering tiles are all-air -> skipped)
    vol = np.full((48, 40, 36), -1000.0, np.float32)
    vol[2:14, 2:14, 2:14] = rng.rand(12, 12, 12) * 400 - 60
    spacing = (1.0, 1.0, 1.0)

    base = TurboPipeline(eng, cfg, air_skip=False).predict_volume(
        sp, vol, spacing)
    # threshold below every voxel -> nothing skipped -> bit-identical
    none_skipped = TurboPipeline(
        eng, cfg, air_skip=True,
        air_margin_hu=-1e6).predict_volume(sp, vol, spacing)
    np.testing.assert_array_equal(none_skipped, base)

    # real margin: the far all-air corner must come out background
    skipped = TurboPipeline(eng, cfg, air_skip=True).predict_volume(
        sp, vol, spacing)
    assert skipped.shape == vol.shape
    assert skipped[-8:, -8:, -8:].max() == 0
    # body region agrees with the unskipped sweep (air tiles contribute ~0)
    body = (base == skipped)[2:14, 2:14, 2:14]
    assert body.mean() > 0.95, f"air-skip body agreement: {body.mean()}"


def test_turbo_predict_file(turbo_setup, tmp_path):
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    eng, cfg, sp, net, params = turbo_setup
    vol = np.full((24, 22, 20), -1000.0, np.float32)
    vol[6:18, 5:17, 4:16] = 100.0
    f_in = str(tmp_path / "ct.nii.gz")
    write_nifti(f_in, vol.astype(np.int16), spacing=(1.0, 1.0, 1.5))
    f_out = str(tmp_path / "seg.nii.gz")
    stats = TurboPipeline(eng, cfg).predict_file(sp, f_in, f_out)
    assert stats["seconds_total"] > 0
    seg, _ = read_nifti(f_out)
    assert seg.shape == vol.shape


def test_turbo_from_model_folder(tmp_path):
    """fast_nnunet_turbo's loader: golden trained folder -> s2d pipeline ->
    segment the golden input; mask must agree with the committed expected
    mask on the body region (the turbo path resamples trilinear + skips the
    crop step, so bit-equality is not the contract — label recovery is)."""
    import os
    import jax.numpy as jnp
    from fast_nnunet_tpu.imageio.nifti import NiftiIO
    from fast_nnunet_tpu.inference.turbo import TurboPipeline

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ckpt")
    if not os.path.isdir(os.path.join(fix, "model")):
        pytest.skip("golden checkpoint fixture missing")
    pipe, params = TurboPipeline.from_model_folder(
        os.path.join(fix, "model"), 0, compute_dtype=jnp.float32,
        air_skip=False)
    out = str(tmp_path / "seg.nii.gz")
    stats = pipe.predict_file(params, os.path.join(fix, "input_0000.nii.gz"),
                              out)
    assert stats["seconds_total"] > 0
    seg = NiftiIO().read_seg(out)[0][0]
    expected = NiftiIO().read_seg(
        os.path.join(fix, "expected_mask.nii.gz"))[0][0]
    assert seg.shape == expected.shape
    agree = (seg == expected).mean()
    assert agree > 0.95, f"turbo vs golden mask agreement: {agree}"


@pytest.mark.slow
def test_turbo_fold_ensemble(turbo_setup):
    """Two-fold ensemble through the fused program: runs and differs from
    single-fold only where the folds disagree."""
    eng, cfg, sp, net, params = turbo_setup
    p2 = net.init(jax.random.PRNGKey(9), jnp.zeros((1, 8, 8, 16, 1)),
                  deep_supervision=False)
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net
    s2d = make_s2d_engine_net(net, ARCH, K, dtype=jnp.float32)
    sp2 = s2d.convert_params(p2)
    vol = np.full((26, 24, 20), -1000.0, np.float32)
    vol[4:22, 4:20, 4:16] = (np.random.RandomState(9).rand(18, 16, 12)
                             * 400 - 60)
    pipe = TurboPipeline(eng, cfg)
    seg_ens = pipe.predict_volume([sp, sp2], vol, (1.0, 1.0, 1.0))
    seg_one = pipe.predict_volume(sp, vol, (1.0, 1.0, 1.0))
    assert seg_ens.shape == seg_one.shape == vol.shape
    # ensemble equals the plain-engine 2-fold logit mean on the same grid
    res = eng.predict_segmentation_sweep_s2d([sp, sp2], (
        (np.clip(np.transpose(vol, cfg.transpose_forward), cfg.lower_bound,
                 cfg.upper_bound) - cfg.mean) / cfg.std)[None].astype(
                     np.float32))
    assert res.shape == tuple(np.array(vol.shape)[cfg.transpose_forward])


# ------------------------------------------------------------- multi-channel
@pytest.mark.slow
def test_turbo_multichannel_mr(tmp_path):
    """Multi-channel (MR-style) device normalization: a [ct, zscore] config
    on raw data must match a [nonorm, nonorm] config fed the host-normalized
    channels (same formulas as ops/normalization.py), proving the per-channel
    device path end-to-end. Air skipping auto-disables for non-CT channel 0."""
    patch_engine = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", ARCH, (), 2, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, *patch_engine, 2)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, ARCH, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    eng = SlidingWindowEngine(s2d, patch_engine, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    ct = {"scheme": "ct", "mean": 40.0, "std": 100.0,
          "lower_bound": -60.0, "upper_bound": 400.0}
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.2, 1.1),
                      num_classes=K, channels=[ct, {"scheme": "zscore"}])
    assert cfg.num_input_channels == 2

    rng = np.random.RandomState(11)
    raw = np.stack([
        rng.rand(30, 26, 22).astype(np.float32) * 1400 - 1000,   # HU-like
        rng.rand(30, 26, 22).astype(np.float32) * 900 + 50,      # MR-like
    ])
    spacing = (1.0, 1.0, 1.5)
    seg = TurboPipeline(eng, cfg).predict_volume(sp, raw, spacing)
    assert seg.shape == raw.shape[1:] and seg.dtype == np.uint8

    ch0 = (np.clip(raw[0], ct["lower_bound"], ct["upper_bound"])
           - ct["mean"]) / ct["std"]
    ch1 = (raw[1] - raw[1].mean()) / max(raw[1].std(), 1e-8)
    cfg_pre = TurboConfig(patch_size=(16, 8, 8),
                          target_spacing=(1.0, 1.2, 1.1), num_classes=K,
                          channels=[{"scheme": "nonorm"}] * 2)
    seg_pre = TurboPipeline(eng, cfg_pre).predict_volume(
        sp, np.stack([ch0, ch1]), spacing)
    agree = (seg == seg_pre).mean()
    assert agree > 0.995, f"device vs host normalization agreement: {agree}"


def test_turbo_multichannel_air_skip_gating(capsys):
    patch_engine = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", ARCH, (), 1, K,
                                 dtype=jnp.float32)
    s2d = make_s2d_engine_net(net, ARCH, K, dtype=jnp.float32)
    eng = SlidingWindowEngine(s2d, patch_engine, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.0, 1.0),
                      num_classes=K, channels=[{"scheme": "zscore"}])
    pipe = TurboPipeline(eng, cfg, air_skip=True)
    assert pipe.air_skip is False  # auto-disabled: no HU calibration


def test_turbo_multichannel_predict_file(tmp_path):
    """Per-channel file list (nnU-Net _0000/_0001 convention) reads and
    segments through the fused program."""
    from fast_nnunet_tpu.imageio.nifti import read_nifti, write_nifti
    patch_engine = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", ARCH, (), 2, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, *patch_engine, 2)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, ARCH, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    eng = SlidingWindowEngine(s2d, patch_engine, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2,
                              use_s2d_sweep=True)
    cfg = TurboConfig(patch_size=(16, 8, 8), target_spacing=(1.0, 1.0, 1.0),
                      num_classes=K,
                      channels=[{"scheme": "zscore"}, {"scheme": "zscore"}])
    rng = np.random.RandomState(3)
    f0, f1 = str(tmp_path / "c_0000.nii.gz"), str(tmp_path / "c_0001.nii.gz")
    write_nifti(f0, (rng.rand(24, 22, 20) * 500).astype(np.float32),
                spacing=(1.0, 1.0, 1.0))
    write_nifti(f1, (rng.rand(24, 22, 20) * 300).astype(np.float32),
                spacing=(1.0, 1.0, 1.0))
    f_out = str(tmp_path / "seg.nii.gz")
    stats = TurboPipeline(eng, cfg).predict_file(sp, [f0, f1], f_out)
    assert stats["seconds_total"] > 0
    seg, _ = read_nifti(f_out)
    assert seg.shape == (24, 22, 20)


def test_pack_mask6_roundtrip():
    """The device-side 6-bit pack (4 voxels -> 3 bytes) and the host unpack
    are exact inverses for any <64-class mask, odd sizes included."""
    from fast_nnunet_tpu.inference.turbo import _unpack_mask6
    rng = np.random.RandomState(0)
    for shape in [(5, 7, 9), (4, 4, 4), (3, 3, 3)]:
        v = rng.randint(0, 64, size=shape).astype(np.uint8)
        n = v.size
        flat = v.reshape(-1)
        if n % 4:
            flat = np.concatenate([flat, np.zeros(((-n) % 4,), np.uint8)])
        q = flat.reshape(-1, 4)
        packed = np.stack([q[:, 0] | (q[:, 1] << 6),
                           (q[:, 1] >> 2) | (q[:, 2] << 4),
                           (q[:, 2] >> 4) | (q[:, 3] << 2)], axis=-1)
        np.testing.assert_array_equal(_unpack_mask6(packed, shape), v)
