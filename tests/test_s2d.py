"""Space-to-depth inference transform: must be EXACT (same math, new layout).
See fast_nnunet_tpu/models/s2d.py for the derivation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.models.s2d import (S2DPlainConvUNet, depth_to_space,
                                        expand_kernel_downsample,
                                        expand_kernel_stride1,
                                        make_s2d_engine_net, space_to_depth)


def _arch(n_stages=3, features=(8, 16, 32), n_conv=(2, 2, 2), n_dec=(2, 2)):
    return {"n_stages": n_stages, "features_per_stage": list(features),
            "kernel_sizes": [[3, 3, 3]] * n_stages,
            "strides": [[1, 1, 1]] + [[2, 2, 2]] * (n_stages - 1),
            "n_conv_per_stage": list(n_conv),
            "n_conv_per_stage_decoder": list(n_dec),
            "nonlin": "torch.nn.LeakyReLU"}


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 4, 5),
                    jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_expand_kernel_stride1_exact():
    """The s2d conv must equal the full-res conv on random data."""
    rng = np.random.RandomState(1)
    W = rng.randn(3, 3, 3, 3, 5).astype(np.float32) * 0.2
    x = rng.randn(1, 8, 10, 6, 3).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x)), jnp.asarray(expand_kernel_stride1(W)),
        (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_expand_kernel_downsample_exact():
    rng = np.random.RandomState(2)
    W = rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2
    x = rng.randn(1, 8, 10, 6, 4).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (2, 2, 2),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(jnp.asarray(x)),
        jnp.asarray(expand_kernel_downsample(W)), (1, 1, 1),
        ((1, 0), (1, 0), (1, 0)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n_stages,features,n_conv,n_dec", [
    (3, (8, 16, 32), (2, 2, 2), (2, 2)),
    pytest.param(2, (4, 8), (2, 2), (2,), marks=pytest.mark.slow),
    pytest.param(4, (4, 8, 16, 32), (1, 2, 2, 2), (2, 2, 1),
                 marks=pytest.mark.slow),
])
def test_s2d_unet_matches_plain(n_stages, features, n_conv, n_dec):
    arch = _arch(n_stages, features, n_conv, n_dec)
    K = 5
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 16, 16, 32, 1) * 2 - 1, jnp.float32)
    params = net.init(jax.random.PRNGKey(4), x, deep_supervision=False)
    ref = np.asarray(net.apply(params, x, deep_supervision=False))

    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    assert s2d is not None
    sp = s2d.convert_params(params)
    got = np.asarray(jax.jit(
        lambda p, x: s2d.apply(p, x, deep_supervision=False))(sp, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_s2d_unsupported_architectures():
    arch = _arch()
    arch["strides"] = [[1, 1, 1], [1, 2, 2], [2, 2, 2]]  # anisotropic downsample
    assert make_s2d_engine_net(None, arch, 2) is None
    arch2 = _arch()
    arch2["kernel_sizes"][0] = [1, 3, 3]
    assert make_s2d_engine_net(None, arch2, 2) is None


@pytest.mark.slow
def test_s2d_output_mode_is_pre_depth_to_space():
    """apply(s2d_output=True) must equal the plain output space_to_depth'd."""
    from fast_nnunet_tpu.models.s2d import space_to_depth
    arch = _arch()
    K = 5
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(5).rand(1, 8, 8, 16, 1) * 2 - 1, jnp.float32)
    params = net.init(jax.random.PRNGKey(4), x, deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)
    full = s2d.apply(sp, x, deep_supervision=False)
    half = s2d.apply(sp, x, deep_supervision=False, s2d_output=True)
    assert half.shape == (1, 4, 4, 8, 8 * K)
    np.testing.assert_array_equal(np.asarray(space_to_depth(full)),
                                  np.asarray(half))


def test_s2d_sweep_matches_plain_engine():
    """The s2d-domain rolling sweep must reproduce the plain engine's argmax
    on the SAME (even) tile grid, fp32 accumulation on both sides."""
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    arch = _arch()
    K = 5
    PATCH = (8, 8, 16)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(4), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp = s2d.convert_params(params)

    vol = (np.random.RandomState(11).rand(1, 18, 20, 30).astype(np.float32)
           - 0.5) * 2

    eng_s2d = SlidingWindowEngine(s2d, PATCH, K, tile_step_size=0.5,
                                  shape_bucket=4, compute_dtype=jnp.float32,
                                  sweep_acc_dtype=jnp.float32, tile_batch=3,
                                  use_s2d_sweep=True)
    seg_s2d = eng_s2d.predict_segmentation_sweep_s2d(sp, vol)
    assert seg_s2d.shape == vol.shape[1:]

    # plain engine forced onto the s2d sweep's even grid
    eng = SlidingWindowEngine(net, PATCH, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              tile_batch=3)
    x_tight = max(vol.shape[1], PATCH[0]) + max(vol.shape[1], PATCH[0]) % 2
    tight_rest = tuple(max(s, p) + max(s, p) % 2
                       for s, p in zip(vol.shape[2:], PATCH[1:]))
    steps = eng_s2d._even_floor_steps((x_tight, *tight_rest))
    logits = eng.predict_logits(params, vol, steps=steps)
    seg_ref = logits.argmax(0)
    agree = (seg_s2d == seg_ref).mean()
    assert agree > 0.999, f"s2d sweep / plain argmax agreement too low: {agree}"

    # dispatch: a large-volume predict_segmentation picks the s2d sweep
    eng_s2d.max_accumulator_bytes = 1
    seg_disp = eng_s2d.predict_segmentation(sp, vol)
    np.testing.assert_array_equal(seg_disp, seg_s2d)


@pytest.mark.slow
def test_s2d_sweep_fold_ensembled():
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    arch = _arch()
    K = 4
    PATCH = (8, 8, 8)
    net = get_network_from_plans("PlainConvUNet", arch, (), 1, K,
                                 dtype=jnp.float32)
    p1 = net.init(jax.random.PRNGKey(1), jnp.zeros((1, *PATCH, 1)),
                  deep_supervision=False)
    p2 = net.init(jax.random.PRNGKey(2), jnp.zeros((1, *PATCH, 1)),
                  deep_supervision=False)
    s2d = make_s2d_engine_net(net, arch, K, dtype=jnp.float32)
    sp1, sp2 = s2d.convert_params(p1), s2d.convert_params(p2)
    vol = (np.random.RandomState(2).rand(1, 12, 14, 10).astype(np.float32)
           - 0.5) * 2
    eng = SlidingWindowEngine(s2d, PATCH, K, tile_step_size=0.5,
                              shape_bucket=4, compute_dtype=jnp.float32,
                              sweep_acc_dtype=jnp.float32, tile_batch=2)
    seg_ens = eng.predict_segmentation_sweep_s2d([sp1, sp2], vol)
    assert seg_ens.shape == vol.shape[1:]

    # logit-mean of the folds on the same grid (plain engine)
    engp = SlidingWindowEngine(net, PATCH, K, tile_step_size=0.5,
                               shape_bucket=4, compute_dtype=jnp.float32,
                               tile_batch=2)
    x_tight = max(vol.shape[1], PATCH[0]) + max(vol.shape[1], PATCH[0]) % 2
    tight_rest = tuple(max(s, p) + max(s, p) % 2
                       for s, p in zip(vol.shape[2:], PATCH[1:]))
    steps = eng._even_floor_steps((x_tight, *tight_rest))
    logits = engp.predict_logits([p1, p2], vol, steps=steps)
    agree = (seg_ens == logits.argmax(0)).mean()
    assert agree > 0.999, f"fold-ensembled s2d sweep agreement: {agree}"
